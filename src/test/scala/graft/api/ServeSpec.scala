package graft.api

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.Files
import java.util.Base64
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** [[Serve.start]] is the exact wiring `graft serve` runs (minus the
  * blocking join); these tests boot it like an operator would and drive
  * it over real HTTP — including the reference's first-boot rule that an
  * empty user store must either seed a root user or refuse to start
  * (pkg/auth/user_manager.go:155-190). */
class ServeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val client = HttpClient.newHttpClient()

  private def get(port: Int, path: String,
      headers: Seq[(String, String)] = Nil): HttpResponse[String] = {
    val b = HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path"))
    headers.foreach { case (k, v) => b.header(k, v) }
    client.send(b.GET().build(), HttpResponse.BodyHandlers.ofString())
  }

  test("serve boots a dev server: health, create and query a database") {
    val (api, port) = Serve.start(spark,
      Files.createTempDirectory("graft-serve"), port = 0,
      anonymousRoot = true, allowUnsignedKeys = false)
    try {
      assert(get(port, "/v1/health").statusCode() == 200)
      val create = client.send(HttpRequest.newBuilder(
          URI.create(s"http://127.0.0.1:$port/v1/databases"))
        .POST(HttpRequest.BodyPublishers.ofString("""{"name":"sdb"}"""))
        .build(), HttpResponse.BodyHandlers.ofString())
      assert(create.statusCode() == 201, create.body())
      val q = client.send(HttpRequest.newBuilder(
          URI.create(s"http://127.0.0.1:$port/v1/databases/sdb/main/query"))
        .POST(HttpRequest.BodyPublishers.ofString(
          """{"queries":[{"id":"q","statement":"SELECT 1 AS one"}]}"""))
        .build(), HttpResponse.BodyHandlers.ofString())
      assert(q.statusCode() == 200 && q.body().contains("\"one\""), q.body())
    } finally api.stop()
  }

  test("first boot with no users and no root env refuses to serve") {
    val e = intercept[IllegalStateException] {
      Serve.start(spark, Files.createTempDirectory("graft-serve-refuse"),
        port = 0, anonymousRoot = false, allowUnsignedKeys = false)
    }
    assert(e.getMessage.contains("GRAFT_ROOT_USERNAME"))
  }

  test("first boot seeds the root user; basic auth gates the API") {
    val (api, port) = Serve.start(spark,
      Files.createTempDirectory("graft-serve-root"), port = 0,
      anonymousRoot = false, allowUnsignedKeys = false,
      rootUser = Some(("admin", "hunter2")))
    try {
      // no credentials → 401 (the dev-mode opt-ins are OFF)
      assert(get(port, "/v1/databases").statusCode() == 401)
      val basic = "Basic " + Base64.getEncoder
        .encodeToString("admin:hunter2".getBytes("UTF-8"))
      assert(get(port, "/v1/databases",
        Seq("Authorization" -> basic)).statusCode() == 200)
      // wrong password stays locked out
      val bad = "Basic " + Base64.getEncoder
        .encodeToString("admin:wrong".getBytes("UTF-8"))
      assert(get(port, "/v1/databases",
        Seq("Authorization" -> bad)).statusCode() == 401)
    } finally api.stop()
  }

  test("an already-populated store is not re-seeded") {
    val dir = Files.createTempDirectory("graft-serve-reseed")
    val (api1, _) = Serve.start(spark, dir, port = 0,
      anonymousRoot = false, allowUnsignedKeys = false,
      rootUser = Some(("admin", "pw1")))
    api1.stop()
    // second boot with a DIFFERENT env pair: the store already has users,
    // so nothing is added and the original credential still works
    val (api2, port2) = Serve.start(spark, dir, port = 0,
      anonymousRoot = false, allowUnsignedKeys = false,
      rootUser = Some(("other", "pw2")))
    try {
      val basic = "Basic " + Base64.getEncoder
        .encodeToString("admin:pw1".getBytes("UTF-8"))
      assert(get(port2, "/v1/databases",
        Seq("Authorization" -> basic)).statusCode() == 200)
      val other = "Basic " + Base64.getEncoder
        .encodeToString("other:pw2".getBytes("UTF-8"))
      assert(get(port2, "/v1/databases",
        Seq("Authorization" -> other)).statusCode() == 401)
    } finally api2.stop()
  }
}
