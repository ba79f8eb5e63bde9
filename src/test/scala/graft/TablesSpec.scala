package graft

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import org.scalatest.funsuite.AnyFunSuite

/** Testdata defensiveness (r6 lessons):
  *   - one broken table loader must not cascade into SQL queries that never
  *     touch it (the r6 `registerAll` coupling took down q20–q26);
  *   - a regenerated testdata schema must fail with ONE clear
  *     "testdata schema changed" message, not scattered analysis errors;
  *   - `events.ts` loads under either encoding the driver has shipped.
  */
class TablesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  /** A corpus dir where `events.parquet` is garbage but everything else is
    * the real sf0.001 data (symlinked to avoid copies). */
  private lazy val brokenEventsDir: String = {
    val dir = Files.createTempDirectory("graft-broken-events")
    Tables.all.filter(_ != "events").foreach { n =>
      Files.createSymbolicLink(dir.resolve(s"$n.parquet"),
        Paths.get(SparkTestSession.sfDir, s"$n.parquet"))
    }
    Files.writeString(dir.resolve("events.parquet"), "not a parquet file")
    dir.toString
  }

  test("a broken events loader does not take down SQL that ignores events") {
    // the r6 cascade: q20-style subqueries read only orders/customer
    val df = graft.queries.Q.sql(spark, brokenEventsDir,
      """SELECT o_orderstatus, count(*) AS n FROM orders o
        |WHERE EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
        |GROUP BY o_orderstatus""".stripMargin)
    assert(df.count() > 0)
  }

  test("SQL that actually reads the broken table still fails loudly") {
    val e = intercept[Exception] {
      graft.queries.Q.sql(spark, brokenEventsDir,
        "SELECT count(*) FROM events").collect()
    }
    assert(e != null)
  }

  test("registerAll registers healthy tables before reporting the broken one") {
    val e = intercept[IllegalStateException] {
      Tables.registerAll(spark, brokenEventsDir)
    }
    assert(e.getMessage.contains("events"))
    // the healthy tables made it in despite the failure
    assert(spark.sql("SELECT count(*) FROM orders").head().getLong(0) > 0)
  }

  test("events.ts loads as timestamp_ntz from the current timestamp[us] data") {
    val df = Tables.load(spark, SparkTestSession.sfDir, "events")
    assert(df.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampNTZType)
    assert(df.count() > 0)
  }

  test("events.ts loads from a raw nanosecond-long encoding too") {
    import org.apache.spark.sql.functions._
    // synthesize the legacy shape: same rows, ts as a bigint of nanos
    val dir = Files.createTempDirectory("graft-nanos-events")
    Tables.all.filter(_ != "events").foreach { n =>
      Files.createSymbolicLink(dir.resolve(s"$n.parquet"),
        Paths.get(SparkTestSession.sfDir, s"$n.parquet"))
    }
    val real = Tables.load(spark, SparkTestSession.sfDir, "events")
    real.withColumn("ts",
        (unix_micros(col("ts").cast("timestamp")) * 1000L).as("ts"))
      .coalesce(1).write.mode("overwrite")
      .parquet(dir.resolve("events.parquet").toString)
    val back = Tables.load(spark, dir.toString, "events")
    assert(back.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampNTZType)
    // normalization must reproduce the original instants exactly
    val a = real.select("event_id", "ts").collect().map(r => (r.getLong(0), r.get(1))).toMap
    val b = back.select("event_id", "ts").collect().map(r => (r.getLong(0), r.get(1))).toMap
    assert(a == b)
  }

  test("a schema drift fails with one clear message") {
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("graft-drift")
    // orders with o_orderkey retyped to string — the kind of silent regen
    // drift that broke r6
    spark.read.parquet(s"${SparkTestSession.sfDir}/orders.parquet")
      .withColumn("o_orderkey", col("o_orderkey").cast("string"))
      .write.mode("overwrite").parquet(dir.resolve("orders.parquet").toString)
    val e = intercept[IllegalStateException] {
      Tables.load(spark, dir.toString, "orders")
    }
    assert(e.getMessage.contains("testdata schema changed"))
    assert(e.getMessage.contains("o_orderkey"))
  }

  test("an unexpected events.ts type names itself in the error") {
    val dir = Files.createTempDirectory("graft-drift-ts")
    spark.read.parquet(s"${SparkTestSession.sfDir}/events.parquet")
      .withColumn("ts", org.apache.spark.sql.functions.col("ts").cast("string"))
      .write.mode("overwrite").parquet(dir.resolve("events.parquet").toString)
    val e = intercept[IllegalStateException] {
      Tables.load(spark, dir.toString, "events")
    }
    assert(e.getMessage.contains("testdata schema changed"))
  }

  test("scan-spread target is data-derived, floored for bench comparability") {
    // r19 (verdict ask #4): width grows with bytes, not with a core
    // fraction. The floor keeps every sf0.1 table on exactly the r18
    // width (8) so the driver's bench stays comparable; bigger inputs
    // on a 32-core session actually use more lanes, capped at cores.
    val m = 1L << 20
    // every sf0.1 table at its real size (kernel 1m/task, fact 4m/task)
    assert(Tables.spreadTarget(594 * 1024, m, 32) == 8)      // documents
    assert(Tables.spreadTarget(2045762, m, 32) == 8)         // events
    assert(Tables.spreadTarget(798695, m, 32) == 8)          // embeddings
    assert(Tables.spreadTarget(10818932, 4 * m, 32) == 8)    // lineitem
    assert(Tables.spreadTarget(2723766, 4 * m, 32) == 8)     // orders
    // and identically at 8 cores, so the driver's scaling run compares
    assert(Tables.spreadTarget(594 * 1024, m, 8) == 8)
    assert(Tables.spreadTarget(10818932, 4 * m, 8) == 8)
    // data-derived growth on a 32-core session
    assert(Tables.spreadTarget(20 * m, m, 32) == 20)
    assert(Tables.spreadTarget(64 * m, m, 32) == 32)  // capped at cores
    assert(Tables.spreadTarget(640 * m, m, 32) == 32)
    // a smaller session caps lower, never under the floor
    assert(Tables.spreadTarget(64 * m, m, 8) == 8)
    assert(Tables.spreadTarget(64 * m, m, 128) == 64)
    assert(Tables.spreadTarget(0L, m, 32) == 8)
  }

  test("Verify.dumpOne writes parquet on success and an _ERROR sentinel on failure") {
    import org.apache.spark.sql.functions.lit
    val out = Files.createTempDirectory("graft-verify").toString
    // success: result parquet lands, no sentinel
    val ok = Verify.dumpOne(spark, "good",
      (s, _) => s.range(3).toDF("n"), "unused", out)
    assert(ok)
    assert(Files.list(Paths.get(out, "good")).anyMatch(_.toString.endsWith(".parquet")))
    assert(!Files.exists(Paths.get(out, "good", "_ERROR")))
    // failure AFTER a previous good run: stale parquet is cleared, only the
    // sentinel remains, and the message lands inside it
    val stale = Verify.dumpOne(spark, "flaky",
      (s, _) => s.range(2).toDF("n"), "unused", out)
    assert(stale)
    val bad = Verify.dumpOne(spark, "flaky",
      (_, _) => throw new RuntimeException("boom-42"), "unused", out)
    assert(!bad)
    val entries = Files.list(Paths.get(out, "flaky")).toArray.map(_.toString)
    assert(entries.length == 1 && entries.head.endsWith("_ERROR"),
      s"expected only _ERROR, got ${entries.mkString(", ")}")
    assert(Files.readString(Paths.get(out, "flaky", "_ERROR")).contains("boom-42"))
  }
}
