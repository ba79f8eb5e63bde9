package graft.tools

import org.apache.spark.sql.SparkSession
import graft.engine._

/** Consumer-style walkthrough of the engine's public API: databases,
  * branches, queries over the wire formats, transactions, PITR, metrics.
  * (What a reference user's integration would look like after switching.)
  */
object EngineDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", "4").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val engine = new GraftSession(spark,
      java.nio.file.Files.createTempDirectory("graft-demo"))

    engine.createDatabase("app")
    def run(stmt: String, params: Seq[Param] = Nil, txn: String = "") = {
      // round-trip through the binary wire protocol like a real client
      val bytes = Wire.encodeInput(QueryInput("q", stmt, params, txn))
      val r = engine.execute("app", "main", Wire.decodeInput(bytes))
      println(s"> $stmt")
      println("  " + Wire.responseJson(r).take(200))
      r
    }

    run("CREATE TABLE users (id INTEGER PRIMARY KEY, name TEXT, balance REAL)")
    run("INSERT INTO users (id, name, balance) VALUES (?, ?, ?)",
      Seq(Param.integer(1), Param.text("ada"), Param.float(10.5)))
    run("INSERT INTO users (id, name, balance) VALUES (2, 'grace', 20.0), (3, 'alan', 0.0)")
    run("SELECT name, balance FROM users WHERE balance > ? ORDER BY id",
      Seq(Param.float(5.0)))
    run("UPDATE users SET balance = balance * 2 WHERE name = 'ada'")
    run("PRAGMA table_info(users)")
    run("VACUUM")

    val txn = run("BEGIN").transactionId
    run("DELETE FROM users WHERE id = 3", txn = txn)
    println("  rows visible outside txn: " +
      run("SELECT count(*) AS n FROM users").rows.head.head)
    run("COMMIT", txn = txn)
    println("  rows after commit: " +
      run("SELECT count(*) AS n FROM users").rows.head.head)

    engine.createBranch("app", "main", "dev")
    val bytesIns = Wire.encodeInput(QueryInput("q", "INSERT INTO users VALUES (9, 'dev-only', 1.0)"))
    engine.execute("app", "dev", Wire.decodeInput(bytesIns))
    println("  main count: " + run("SELECT count(*) AS n FROM users").rows.head.head)
    println("  dev count:  " + engine.execute("app", "dev",
      QueryInput("q", "SELECT count(*) AS n FROM users")).rows.head.head)

    // RETURNING, backup/restore, compaction
    run("INSERT INTO users VALUES (4, 'edsger', 7.5) RETURNING id, upper(name) AS who")
    val backupId = engine.catalog.createBackup("app", "main")
    run("DELETE FROM users WHERE id = 4")
    engine.catalog.restoreBackup(backupId)
    println("  count after backup restore: " +
      run("SELECT count(*) AS n FROM users").rows.head.head)
    println(s"  compacted file-sets: ${engine.compact("app", "main", "users")}")

    // the HTTP surface end-to-end (JSON batch over a real socket)
    val api = new graft.api.HttpApi(engine)
    val port = api.start()
    val http = java.net.http.HttpClient.newHttpClient()
    val resp = http.send(java.net.http.HttpRequest.newBuilder(
        java.net.URI.create(s"http://127.0.0.1:$port/v1/databases/app/main/query"))
      .POST(java.net.http.HttpRequest.BodyPublishers.ofString(
        """{"queries":[{"id":"h1","statement":"SELECT count(*) AS n FROM users"}]}"""))
      .build(), java.net.http.HttpResponse.BodyHandlers.ofString())
    println(s"  HTTP ${resp.statusCode()}: ${resp.body().take(160)}")
    api.stop()

    val metrics = engine.metrics.flush()
    println(s"  metrics buckets: ${metrics.length}, record bytes: ${metrics.head.bytes.length}")

    // binary streaming protocol (B8): a full client conversation
    val conv = new java.io.ByteArrayOutputStream()
    QueryStream.writeMessage(conv, QueryStream.Open, Array.emptyByteArray)
    QueryStream.writeMessage(conv, QueryStream.Frame, QueryStream.encodeFrame(Seq(
      QueryInput("s1", "SELECT name FROM users WHERE balance > ? ORDER BY id",
        Seq(Param.float(5.0))),
      QueryInput("s2", "SELECT * FROM missing_table"))))
    QueryStream.writeMessage(conv, QueryStream.Close, Array.emptyByteArray)
    val reply = new java.io.ByteArrayOutputStream()
    QueryStream.serve(new java.io.ByteArrayInputStream(conv.toByteArray), reply,
      q => engine.execute("app", "main", q))
    val replyIn = new java.io.ByteArrayInputStream(reply.toByteArray)
    replyIn.readNBytes(5) // open ack
    val hdr = replyIn.readNBytes(5)
    val flen = java.nio.ByteBuffer.wrap(hdr, 1, 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt
    QueryStream.decodeResponseFrame(replyIn.readNBytes(flen)).foreach {
      case (isErr, bytes) =>
        if (isErr) println("  stream entry ERROR: " + new String(bytes).take(80))
        else println("  stream entry OK: " + Wire.responseJson(Wire.decodeResponse(bytes)).take(120))
    }
    println("ENGINE_DEMO_OK")
    spark.stop()
  }
}
