package graft.api

import java.nio.file.Path
import org.apache.spark.sql.SparkSession
import graft.engine.GraftSession

/** Server launcher — the analog of the reference's `serve` command
  * (pkg/cli/cmd/serve.go:16-46: build config, start the HTTP server,
  * run the app, block). Here the "app" is one SparkSession + one
  * [[graft.engine.GraftSession]] rooted at `--data-path`, fronted by
  * [[HttpApi]].
  *
  * Flags (the subset of serve.go:75-84 that is meaningful for a
  * single-node local engine — TLS, replica and election flags govern
  * machinery SURVEY §7.5 replaces):
  *   --port P               bind port (default 8080; serve.go:81)
  *   --data-path DIR        engine root (default ./.graft; serve.go:76)
  *   --anonymous-root       dev mode: requests with no credentials get
  *                          root (HttpApi's explicit opt-in)
  *   --allow-unsigned-keys  dev mode: bare X-Access-Key-Id resolves a
  *                          key without an HMAC signature
  *
  * [[start]] is the testable seam: it builds the engine and returns the
  * running [[HttpApi]] plus its bound port without blocking, so
  * ServeSpec can drive the exact wiring `main` runs and stop it. */
object Serve {
  def start(spark: SparkSession, dataPath: Path, port: Int,
      anonymousRoot: Boolean, allowUnsignedKeys: Boolean,
      rootUser: Option[(String, String)] = None): (HttpApi, Int) = {
    val session = new GraftSession(spark, dataPath)
    // first-boot credential bootstrap, the reference's UserManager.Init
    // (pkg/auth/user_manager.go:155-190): an EMPTY user store either
    // seeds an all-allow user from the root env pair or refuses to serve
    // an unreachable API — unless a dev-mode opt-in makes it reachable
    // without credentials. ("root" itself is reserved for the anonymous
    // root identity, so the seeded name must differ.)
    if (session.users.list().isEmpty) rootUser match {
      case Some((u, p)) => session.users.add(u, p,
        Seq(graft.engine.AccessKeyStatement("allow", "*", Seq("*"))))
      case None if !anonymousRoot && !allowUnsignedKeys =>
        throw new IllegalStateException("no users exist and " +
          "GRAFT_ROOT_USERNAME/GRAFT_ROOT_PASSWORD are not set; the API " +
          "would be unreachable (pass --anonymous-root for a dev server)")
      case None => ()
    }
    val api = new HttpApi(session,
      anonymousRoot = anonymousRoot, allowUnsignedKeys = allowUnsignedKeys)
    (api, api.start(port))
  }

  def main(args: Array[String]): Unit = {
    var port = 8080
    var dataPath = "./.graft"
    var anonymousRoot = false
    var allowUnsignedKeys = false
    @annotation.tailrec
    def parse(xs: List[String]): Boolean = xs match {
      case Nil => true
      case "--port" :: v :: t if v.toIntOption.isDefined =>
        port = v.toInt; parse(t)
      case "--data-path" :: v :: t => dataPath = v; parse(t)
      case "--anonymous-root" :: t => anonymousRoot = true; parse(t)
      case "--allow-unsigned-keys" :: t => allowUnsignedKeys = true; parse(t)
      case bad =>
        System.err.println(s"serve: bad argument(s): ${bad.mkString(" ")}")
        System.err.println("usage: serve [--port P] [--data-path DIR] " +
          "[--anonymous-root] [--allow-unsigned-keys]")
        false
    }
    if (!parse(args.toList)) sys.exit(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-serve")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val rootUser = for {
      u <- sys.env.get("GRAFT_ROOT_USERNAME")
      p <- sys.env.get("GRAFT_ROOT_PASSWORD")
    } yield (u, p)
    val (api, bound) = start(spark, Path.of(dataPath), port,
      anonymousRoot, allowUnsignedKeys, rootUser)
    println(s"graft serving on http://127.0.0.1:$bound (data: $dataPath)")
    sys.addShutdownHook { api.stop(); spark.stop() }
    // block until killed (serve.go blocks in Server.Start the same way)
    Thread.currentThread().join()
  }
}
