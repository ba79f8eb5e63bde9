package graft.cli

import java.io.{BufferedReader, PrintStream}
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

/** Interactive SQL console over the HTTP query endpoint — the analog of
  * the reference's `litebase sql` command (pkg/cli/cmd/sql.go +
  * pkg/cli/models/sql/frame.go): a `graft → ` prompt that accumulates
  * input until a line ends with `;` (continuation lines get the
  * `   ... → ` prompt, frame.go:63-66), splits the buffer into
  * `;`-separated statements (frame.go:217-231), runs each through
  * `POST /v1/databases/{db}/{branch}/query`, and renders either an
  * aligned column/row table with the `Results: (NNms)` latency header
  * (frame.go:130) or the changes/last-insert summary for DML.
  *
  * The transport is injected (`post`: request body → (status, body)) so a
  * spec can drive the console against an in-process [[graft.api.HttpApi]]
  * exactly like a user would over the wire; [[SqlConsole.main]] wires a
  * real JDK HttpClient from GRAFT_API_URL/GRAFT_DB/GRAFT_BRANCH or args.
  *
  * Meta commands (the plain-readline stand-ins for the reference TUI's
  * key bindings): `.quit`/`.exit` end the session, `.history` lists the
  * statements run so far, `.help` prints usage, and `.tables` runs the
  * sqlite3-shell idiom (`SELECT name FROM sqlite_master WHERE
  * type='table'`) through the same wire — so it also lands in
  * `.history` like any statement.
  */
class SqlConsole(in: BufferedReader, out: PrintStream,
    post: String => (Int, String)) {

  private val mapper = new ObjectMapper()
  private val history = scala.collection.mutable.ArrayBuffer.empty[String]
  private var nextId = 0

  def run(): Unit = {
    out.print("graft → "); out.flush()
    val buf = new StringBuilder
    var line = in.readLine()
    while (line != null) {
      val trimmed = line.trim
      if (buf.isEmpty && (trimmed == ".quit" || trimmed == ".exit")) {
        out.println("bye"); return
      } else if (buf.isEmpty && trimmed == ".history") {
        history.zipWithIndex.foreach { case (h, i) => out.println(s"${i + 1}  $h") }
        out.print("graft → "); out.flush()
      } else if (buf.isEmpty && trimmed == ".help") {
        out.println("statements end with ';' (multi-line input accumulates)")
        out.println(".tables   list tables   .history  statements run so far")
        out.println(".quit     exit          .exit     exit")
        out.print("graft → "); out.flush()
      } else if (buf.isEmpty && trimmed == ".tables") {
        // sqlite_master is a real synthesized table in the engine, so the
        // sqlite3-shell idiom works over the wire unchanged
        runStatement(
          "SELECT name FROM sqlite_master WHERE type = 'table' ORDER BY name")
        out.print("graft → "); out.flush()
      } else {
        buf.append(line).append('\n')
        // the terminating ';' must sit OUTSIDE any SQL string literal —
        // a line ending in "...;'" mid-string keeps accumulating
        if (trimmed.endsWith(";") && !inOpenString(buf.toString)) {
          statementsOf(buf.toString).foreach(runStatement)
          buf.clear()
          out.print("graft → "); out.flush()
        } else {
          // unterminated input keeps accumulating (frame.go:176-180)
          out.print("   ... → "); out.flush()
        }
      }
      line = in.readLine()
    }
  }

  /** Split on `;` OUTSIDE single-quoted SQL strings (`''` escapes a
    * quote, SQLite literal rules), trim, drop empties. The reference
    * console splits naively (frame.go:219-231); quote-awareness is the
    * one deliberate improvement — a naive split corrupts any statement
    * whose string literal contains a semicolon. */
  private[cli] def statementsOf(text: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var inStr = false
    var i = 0
    while (i < text.length) {
      val ch = text.charAt(i)
      if (inStr) {
        cur.append(ch)
        if (ch == '\'') {
          if (i + 1 < text.length && text.charAt(i + 1) == '\'') {
            cur.append('\''); i += 1
          } else inStr = false
        }
      } else if (ch == '\'') { inStr = true; cur.append(ch) }
      else if (ch == ';') { out += cur.toString; cur.clear() }
      else cur.append(ch)
      i += 1
    }
    out += cur.toString
    out.toSeq.map(_.trim).filter(_.nonEmpty)
  }

  /** True when `text` ends inside an unclosed single-quoted literal. */
  private[cli] def inOpenString(text: String): Boolean = {
    var inStr = false
    var i = 0
    while (i < text.length) {
      if (text.charAt(i) == '\'') {
        if (inStr && i + 1 < text.length && text.charAt(i + 1) == '\'') i += 1
        else inStr = !inStr
      }
      i += 1
    }
    inStr
  }

  private def runStatement(stmt: String): Unit = {
    history += stmt
    nextId += 1
    val body =
      s"""{"queries":[{"id":${jstr(s"q$nextId")},"statement":${jstr(stmt)}}]}"""
    val (status, respBody) =
      try post(body)
      catch { case e: Throwable => out.println(s"Error: ${e.getMessage}"); return }
    val root =
      try mapper.readTree(respBody)
      catch { case _: Throwable =>
        out.println(s"Error: unparseable response (HTTP $status)"); return }
    if (root.path("status").asText() != "success") {
      val msg = Option(root.path("message").asText(null))
        .orElse(Option(root.path("data").get(0)).map(_.path("error").asText()))
        .getOrElse(s"HTTP $status")
      out.println(s"Error: $msg")
      return
    }
    render(root.path("data").get(0))
  }

  private def render(r: JsonNode): Unit = {
    val latencyMs = r.path("latency").asDouble() * 1000.0
    val cols = (0 until r.path("columns").size())
      .map(r.path("columns").get(_).asText())
    if (cols.nonEmpty) {
      val rows = (0 until r.path("rows").size()).map { i =>
        val row = r.path("rows").get(i)
        (0 until row.size()).map(j => cellText(row.get(j)))
      }
      val widths = cols.indices.map { j =>
        (cols(j).length +: rows.map(_.apply(j).length)).max
      }
      def fmt(vals: Seq[String]): String =
        vals.zip(widths).map { case (v, w) => v.padTo(w, ' ') }.mkString("  ")
      out.println(f"Results: (${latencyMs}%.0fms)")
      out.println(fmt(cols))
      out.println(widths.map("-" * _).mkString("  "))
      rows.foreach(row => out.println(fmt(row)))
      out.println(s"${rows.size} row${if (rows.size == 1) "" else "s"}")
    } else {
      val changes = r.path("changes").asLong()
      val lastId = r.path("last_insert_row_id").asLong()
      val idNote = if (lastId != 0) s", last insert rowid $lastId" else ""
      out.println(f"OK: $changes change${if (changes == 1) "" else "s"}" +
        f"$idNote (${latencyMs}%.0fms)")
    }
  }

  private def cellText(n: JsonNode): String =
    if (n == null || n.isNull) "NULL" else n.asText()

  private def jstr(s: String): String = {
    val sb = new StringBuilder; graft.engine.Json.string(s, sb); sb.toString
  }
}

object SqlConsole {
  /** `runMain graft.cli.SqlConsole [url [db [branch]]]` — defaults from
    * GRAFT_API_URL / GRAFT_DB / GRAFT_BRANCH, then
    * http://127.0.0.1:8080 / db / main. */
  def main(args: Array[String]): Unit = {
    val url = args.lift(0).orElse(sys.env.get("GRAFT_API_URL"))
      .getOrElse("http://127.0.0.1:8080")
    val db = args.lift(1).orElse(sys.env.get("GRAFT_DB")).getOrElse("db")
    val branch = args.lift(2).orElse(sys.env.get("GRAFT_BRANCH")).getOrElse("main")
    val client = java.net.http.HttpClient.newHttpClient()
    val console = new SqlConsole(
      new BufferedReader(new java.io.InputStreamReader(System.in)),
      System.out,
      body => {
        val req = java.net.http.HttpRequest
          .newBuilder(java.net.URI.create(s"$url/v1/databases/$db/$branch/query"))
          .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body))
          .build()
        val resp = client.send(req,
          java.net.http.HttpResponse.BodyHandlers.ofString())
        (resp.statusCode(), resp.body())
      })
    console.run()
  }
}
