package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.engine.{GraftSession, QueryInput, SqlValue}

/** Z-order clustering (`CREATE INDEX ix ON t (zorder(a, b))`): layout is
  * Morton order, every indexed column gets blocky ranges, the layout tag
  * distinguishes z-order from lexicographic, and the directive round-trips
  * through the catalog. */
class ZOrderSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def q(sql: String): QueryInput = QueryInput("1", sql, Nil, "")

  private def morton(x: Long, y: Long): Long = {
    // mirror of the engine's key: 256 buckets between min 0 and max 31
    // (floor(v · 256/(max−min)) clamped), then bit interleave
    def bucket(v: Long) =
      math.min(255L, math.floor(v.toDouble * (256.0 / 31.0)).toLong)
    val (bx, by) = (bucket(x), bucket(y))
    (0 until 8).foldLeft(0L)((acc, i) =>
      acc | ((bx >> i) & 1L) << (i * 2) | ((by >> i) & 1L) << (i * 2 + 1))
  }

  test("zorder index lays the table out in Morton order with blocky ranges") {
    val dir = Files.createTempDirectory("graft-zorder")
    val s = new GraftSession(spark, dir)
    s.createDatabase("db1")
    s.execute("db1", "main", q("CREATE TABLE zt (x INTEGER, y INTEGER)"))
    // 32x32 grid inserted in a scrambled order across batches
    val pts = for (x <- 0 until 32; y <- 0 until 32) yield (x, y)
    val scrambled = new scala.util.Random(7).shuffle(pts)
    scrambled.grouped(256).foreach { batch =>
      val rows = batch.map { case (x, y) => s"($x, $y)" }.mkString(", ")
      assert(s.execute("db1", "main",
        q(s"INSERT INTO zt VALUES $rows")).error.isEmpty)
    }
    assert(s.execute("db1", "main",
      q("CREATE INDEX zix ON zt (zorder(x, y))")).error.isEmpty)
    s.compact("db1", "main", "zt")
    val cur = s.catalog.currentVersion("db1", "main", "zt").get
    assert(cur.clusteredBy == Seq("zorder", "x", "y"))
    // a second compact is a no-op: the layout tag already matches
    assert(s.compact("db1", "main", "zt") == 0)
    // read back in physical order: rows must follow the Morton curve
    val got = spark.read.parquet(cur.paths.head).select("x", "y")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length == 1024)
    val zs = got.map { case (x, y) => morton(x, y) }
    assert(zs.toSeq == zs.toSeq.sorted, "rows are not in Morton order")
    // blocky ranges: any physical quarter of the table (what a 4-way range
    // partitioning would put in one file) spans HALF of each dimension —
    // a lexicographic (x, y) sort would span the FULL y range in every one
    got.grouped(256).foreach { chunk =>
      val xs = chunk.map(_._1); val ys = chunk.map(_._2)
      assert(xs.max - xs.min <= 16, s"x not blocky: ${xs.min}..${xs.max}")
      assert(ys.max - ys.min <= 16, s"y not blocky: ${ys.min}..${ys.max}")
    }
    // results unchanged by the re-layout
    val cnt = s.execute("db1", "main",
      q("SELECT count(*) AS n FROM zt WHERE x < 8 AND y < 8"))
    assert(cnt.rows.head.head == SqlValue.IntVal(64))
    // switching index KIND on the same columns rewrites (tag differs)
    assert(s.execute("db1", "main", q("DROP INDEX zix")).error.isEmpty)
    assert(s.execute("db1", "main",
      q("CREATE INDEX lix ON zt (x, y)")).error.isEmpty)
    s.compact("db1", "main", "zt")
    val lex = s.catalog.currentVersion("db1", "main", "zt").get
    assert(lex.clusteredBy == Seq("x", "y"))
    val lexGot = spark.read.parquet(lex.paths.head).select("x", "y")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // lexicographic control: the first physical quarter spans full y
    val firstQuarterY = lexGot.take(256).map(_._2)
    assert(firstQuarterY.max - firstQuarterY.min == 31,
      "control: lexicographic layout should span the full y range")
  }

  test("zorder directive validates and persists across sessions") {
    val dir = Files.createTempDirectory("graft-zorder2")
    val s = new GraftSession(spark, dir)
    s.createDatabase("db1")
    s.execute("db1", "main",
      q("CREATE TABLE zs (a INTEGER, b INTEGER, c TEXT, d INTEGER, e INTEGER)"))
    // arity and column validation
    assert(s.execute("db1", "main",
      q("CREATE INDEX bad1 ON zs (zorder(a))")).error.nonEmpty)
    assert(s.execute("db1", "main",
      q("CREATE INDEX bad2 ON zs (zorder(a, nope))")).error.nonEmpty)
    assert(s.execute("db1", "main",
      q("CREATE INDEX bad3 ON zs (zorder(a, b, c, d, e))")).error.nonEmpty)
    assert(s.execute("db1", "main",
      q("CREATE UNIQUE INDEX bad4 ON zs (zorder(a, b))")).error.nonEmpty)
    // a mixed-type (string + numeric) layout compacts fine and keeps data
    assert(s.execute("db1", "main",
      q("CREATE INDEX zmix ON zs (zorder(c, a))")).error.isEmpty)
    (0 until 40).grouped(20).foreach { batch =>
      val rows = batch.map(i => s"($i, ${i % 5}, 'k${i % 7}', $i, $i)").mkString(", ")
      assert(s.execute("db1", "main",
        q(s"INSERT INTO zs VALUES $rows")).error.isEmpty)
    }
    s.compact("db1", "main", "zs")
    val r = s.execute("db1", "main",
      q("SELECT count(*) AS n FROM zs WHERE c = 'k3'"))
    assert(r.rows.head.head == SqlValue.IntVal(6))
    // the directive survives a restart
    val s2 = new GraftSession(spark, dir)
    val d = s2.catalog.clusterIndex("db1", "main", "zmix").get
    assert(d.zorder && d.cols == Seq("c", "a"))
    assert(s2.catalog.currentVersion("db1", "main", "zs").get.clusteredBy ==
      Seq("zorder", "c", "a"))
  }
}
