package graft.api

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import scala.jdk.CollectionConverters._
import graft.engine._

/** HTTP/JSON + binary-streaming query API over GraftSession — the
  * reference's route surface (litebase pkg/http/routes.go) re-expressed on
  * the JDK's built-in HttpServer, so the library carries no extra
  * dependencies:
  *
  *   POST /v1/databases                                  create database
  *   POST /v1/databases/{db}/branches                    create branch
  *   POST /v1/databases/{db}/{branch}/query              JSON query batch
  *   POST /v1/databases/{db}/{branch}/query/stream       binary frames (B8)
  *   POST /v1/databases/{db}/{branch}/transactions       begin txn (B5)
  *   POST /v1/databases/{db}/{branch}/transactions/{id}/commit
  *   POST /v1/databases/{db}/{branch}/transactions/{id}/rollback
  *   GET  /v1/databases/{db}/{branch}/logs/query[?step=N] metrics (B10)
  *
  * JSON request/response shapes follow pkg/http/query_controller.go and
  * pkg/database/query_response.go: requests carry
  * `{queries: [{id, statement, parameters: [{type, value}], transaction_id}]}`,
  * responses `{status: "success"|"error", data: [...]}`. Access keys are
  * passed via the X-Access-Key-Id header and resolved against `accessKeys`
  * (unknown id → 401, absent header → root, mirroring the engine default).
  */
class HttpApi(session: GraftSession,
    accessKeys: Map[String, AccessKey] = Map.empty) {

  private val mapper = new ObjectMapper()
  private var server: HttpServer = _
  private var pool: java.util.concurrent.ExecutorService = _

  /** Start on 127.0.0.1:`port` (0 = ephemeral); returns the bound port. */
  def start(port: Int = 0): Int = {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
    server.createContext("/v1/databases", (ex: HttpExchange) => handleSafe(ex))
    // daemon threads so an un-stopped server never pins the JVM
    pool = java.util.concurrent.Executors.newFixedThreadPool(8, r => {
      val t = new Thread(r); t.setDaemon(true); t
    })
    server.setExecutor(pool)
    server.start()
    server.getAddress.getPort
  }

  def stop(): Unit = {
    if (server != null) server.stop(0)
    if (pool != null) pool.shutdownNow()
  }

  private def handleSafe(ex: HttpExchange): Unit =
    try handle(ex)
    catch {
      case e: Throwable =>
        reply(ex, 500, errorJson(Option(e.getMessage).getOrElse("internal error")))
    } finally ex.close()

  private def handle(ex: HttpExchange): Unit = {
    val segs = ex.getRequestURI.getPath.stripPrefix("/v1/databases")
      .split("/").filter(_.nonEmpty).toList
    val method = ex.getRequestMethod
    keyFor(ex) match {
      case None => reply(ex, 401, errorJson("unknown access key"))
      case Some(key) => (method, segs) match {
        case ("POST", Nil) =>
          val name = mapper.readTree(ex.getRequestBody).path("name").asText("")
          if (name.isEmpty) reply(ex, 400, errorJson("name required"))
          else { session.createDatabase(name); reply(ex, 201, okJson("null")) }
        case ("GET", Nil) =>
          reply(ex, 200, okJson(session.catalog.listDatabases()
            .map(n => s"""{"name":${jstr(n)}}""").mkString("[", ",", "]")))
        case ("GET", db :: "branches" :: Nil) =>
          reply(ex, 200, okJson(session.catalog.listBranches(db)
            .map(b => s"""{"name":${jstr(b)}}""").mkString("[", ",", "]")))
        case ("DELETE", db :: "branches" :: name :: Nil) =>
          session.catalog.dropBranch(db, name); reply(ex, 200, okJson("null"))
        case ("POST", db :: "branches" :: Nil) =>
          val body = mapper.readTree(ex.getRequestBody)
          session.createBranch(db, body.path("parent").asText("main"),
            body.path("name").asText())
          reply(ex, 201, okJson("null"))
        case ("POST", db :: branch :: "query" :: Nil) =>
          queryBatch(ex, db, branch, key)
        case ("POST", db :: branch :: "query" :: "stream" :: Nil) =>
          // B8: binary frames; serve reads the request stream until Close.
          ex.sendResponseHeaders(200, 0)
          QueryStream.serve(ex.getRequestBody, ex.getResponseBody,
            q => session.execute(db, branch, q, key))
        case ("POST", db :: branch :: "transactions" :: Nil) =>
          val id = session.beginTransaction(db, branch)
          reply(ex, 201, okJson(s"""{"transaction_id":${jstr(id)}}"""))
        case ("POST", _ :: _ :: "transactions" :: id :: "commit" :: Nil) =>
          session.commitTransaction(id); reply(ex, 200, okJson("null"))
        case ("POST", _ :: _ :: "transactions" :: id :: "rollback" :: Nil) =>
          session.rollbackTransaction(id); reply(ex, 200, okJson("null"))
        case ("POST", db :: branch :: "backups" :: Nil) =>
          val id = session.catalog.createBackup(db, branch)
          reply(ex, 201, okJson(s"""{"backup_id":${jstr(id)}}"""))
        case ("GET", db :: branch :: "backups" :: Nil) =>
          val items = session.catalog.listBackups(db, branch).map(b =>
            s"""{"backup_id":${jstr(b.id)},"created_at":${b.createdAt}}""")
          reply(ex, 200, okJson(items.mkString("[", ",", "]")))
        case ("POST", _ :: _ :: "backups" :: id :: "restore" :: Nil) =>
          session.catalog.restoreBackup(id); reply(ex, 200, okJson("null"))
        case ("GET", _ :: _ :: "logs" :: "query" :: Nil) =>
          metricsJson(ex)
        case _ => reply(ex, 404, errorJson("not found"))
      }
    }
  }

  private def keyFor(ex: HttpExchange): Option[AccessKey] =
    Option(ex.getRequestHeaders.getFirst("X-Access-Key-Id")) match {
      case None | Some("") => Some(AccessKey.root)
      case Some(id) => accessKeys.get(id)
    }

  private def queryBatch(ex: HttpExchange, db: String, branch: String,
      key: AccessKey): Unit = {
    val root = mapper.readTree(ex.getRequestBody)
    val queries = root.path("queries")
    if (!queries.isArray)
      return reply(ex, 400, errorJson("queries array required"))
    val responses = queries.elements().asScala.map { qn =>
      session.execute(db, branch, parseInput(qn), key)
    }.toSeq
    val anyError = responses.exists(_.error.nonEmpty)
    val data = responses.map { r =>
      if (r.error.isEmpty) Wire.responseJson(r)
      else s"""{"id":${jstr(r.id)},"error":${jstr(r.error)}}"""
    }.mkString("[", ",", "]")
    val status = if (anyError) "error" else "success"
    reply(ex, if (anyError) 400 else 200,
      s"""{"status":${jstr(status)},"data":$data}""")
  }

  private def parseInput(qn: JsonNode): QueryInput = {
    val params = qn.path("parameters").elements().asScala.map { pn =>
      val v = pn.path("value")
      pn.path("type").asText("") match {
        case "INTEGER" => Param.integer(v.asLong())
        case "FLOAT"   => Param.float(v.asDouble())
        case "TEXT"    => Param.text(v.asText())
        case "BLOB"    => Param.blob(
          java.util.Base64.getDecoder.decode(v.asText("")))
        case _         => Param.nul
      }
    }.toSeq
    QueryInput(qn.path("id").asText(""), qn.path("statement").asText(""),
      params, qn.path("transaction_id").asText(""))
  }

  private def metricsJson(ex: HttpExchange): Unit = {
    val step = Option(ex.getRequestURI.getQuery).flatMap(
      _.split("&").collectFirst {
        case s if s.startsWith("step=") => s.stripPrefix("step=").toLong
      }).getOrElse(1L)
    val ms = session.metrics.combineByStep(session.metrics.flush(), step)
    val items = ms.map { m =>
      val stmt = session.metrics.statementFor(m.checksum).getOrElse("")
      s"""{"statement":${jstr(stmt)},"timestamp":${m.timestamp},""" +
        s""""count":${m.count},"avg":${m.avg},"min":${m.min},"max":${m.max},""" +
        s""""p50":${m.p50},"p90":${m.p90},"p99":${m.p99}}"""
    }.mkString("[", ",", "]")
    reply(ex, 200, okJson(items))
  }

  private def jstr(s: String): String = {
    val sb = new StringBuilder; Json.string(s, sb); sb.toString
  }
  private def okJson(data: String): String =
    s"""{"status":"success","data":$data}"""
  private def errorJson(msg: String): String =
    s"""{"status":"error","message":${jstr(msg)}}"""

  private def reply(ex: HttpExchange, code: Int, body: String): Unit = {
    val b = body.getBytes(UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(code, b.length)
    ex.getResponseBody.write(b)
  }
}
