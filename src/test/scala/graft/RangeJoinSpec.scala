package graft

import java.sql.Timestamp
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.RangeJoin

/** The binned range join must be RESULT-IDENTICAL to the naive
  * inequality join for every bucket width — width only moves the
  * replication/parallelism trade-off — and duplicate-free for the
  * interval-overlap variant (a pair shares every bucket its overlap
  * covers; emission is pinned to the greatest-start bucket). */
class RangeJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  // boundary adversaries: point exactly at start (half-open: match),
  // exactly at end (no match), empty interval, nested + overlapping
  // windows, a window nothing hits, a point nothing covers
  private lazy val points = Seq(
    (1L, ts("2024-01-01 00:00:00")),   // == w10 start -> match
    (2L, ts("2024-01-01 00:10:00")),   // == w10 end -> NO match on w10
    (3L, ts("2024-01-01 00:05:30.5")), // inside w10 and w11
    (4L, ts("2024-01-01 09:59:59.999")),
    (5L, ts("2024-03-15 12:00:00"))    // covered by nothing
  ).toDF("pid", "pt")

  private lazy val intervals = Seq(
    (10L, ts("2024-01-01 00:00:00"), ts("2024-01-01 00:10:00")),
    (11L, ts("2024-01-01 00:05:00"), ts("2024-01-01 00:06:00")), // nested in w10
    (12L, ts("2024-01-01 09:00:00"), ts("2024-01-01 10:00:00")),
    (13L, ts("2024-01-01 02:00:00"), ts("2024-01-01 02:00:00")), // empty
    (14L, ts("2024-02-01 00:00:00"), ts("2024-02-02 00:00:00"))  // hits nothing
  ).toDF("iid", "s", "e")

  private def naivePoints: Set[(Long, Long)] =
    points.crossJoin(intervals)
      .filter(col("s") <= col("pt") && col("pt") < col("e"))
      .select("pid", "iid").as[(Long, Long)].collect().toSet

  test("point-in-interval == naive inequality join across bucket widths") {
    val expect = naivePoints
    assert(expect === Set((1L, 10L), (3L, 10L), (3L, 11L), (4L, 12L)),
      "the hand-built adversary no longer covers the boundary cases")
    for (w <- Seq(1L, 60L, 86400L)) {
      val rows = RangeJoin.pointInInterval(points, intervals,
        "pt", "s", "e", bucket = w)
      val got = rows.select("pid", "iid").as[(Long, Long)].collect()
      assert(got.length === got.toSet.size, s"width $w emitted duplicates")
      assert(got.toSet === expect, s"width $w diverged from the naive join")
    }
  }

  test("interval overlap == naive join, duplicate-free, across widths") {
    val left = intervals.select(col("iid").as("aid"),
      col("s").as("as_"), col("e").as("ae"))
    // right side: one interval spanning MANY buckets (shares dozens of
    // buckets with everything in January), identical twins, and a
    // touching interval (e == other's s: half-open -> NO overlap)
    val right = Seq(
      (20L, ts("2024-01-01 00:00:00"), ts("2024-01-02 00:00:00")),
      (21L, ts("2024-01-01 00:05:00"), ts("2024-01-01 00:06:00")),
      (22L, ts("2024-01-01 00:10:00"), ts("2024-01-01 00:20:00")), // touches w10
      (23L, ts("2024-01-01 09:30:00"), ts("2024-01-01 09:30:00"))  // empty
    ).toDF("bid", "bs", "be")
    val expect = left.crossJoin(right)
      .filter(col("as_") < col("be") && col("bs") < col("ae"))
      .filter(col("ae") > col("as_") && col("be") > col("bs"))
      .select("aid", "bid").as[(Long, Long)].collect().toSet
    assert(expect.contains(10L -> 20L) && !expect.contains(10L -> 22L) &&
      !expect.contains(13L -> 20L), "adversary lost its touch/empty cases")
    for (w <- Seq(60L, 3600L, 86400L)) {
      val got = RangeJoin.intervalOverlap(left, right,
          "as_", "ae", "bs", "be", bucket = w)
        .select("aid", "bid").as[(Long, Long)].collect()
      assert(got.length === got.toSet.size,
        s"width $w emitted duplicate pairs (greatest-start ownership broke)")
      assert(got.toSet === expect, s"width $w diverged from the naive join")
    }
  }

  test("numeric range columns bucket by value units (genome-bin shape)") {
    val reads = Seq((1L, 150L), (2L, 999L), (3L, 1000L), (4L, 5020L))
      .toDF("rid", "pos")
    val bins = Seq((100L, 0L, 1000L), (101L, 900L, 1100L), (102L, 5000L, 5050L))
      .toDF("bin", "lo", "hi")
    val expect = reads.crossJoin(bins)
      .filter(col("lo") <= col("pos") && col("pos") < col("hi"))
      .select("rid", "bin").as[(Long, Long)].collect().toSet
    val got = RangeJoin.pointInInterval(reads, bins, "pos", "lo", "hi",
        bucket = 250L)
      .select("rid", "bin").as[(Long, Long)].collect().toSet
    assert(got === expect)
    assert(got === Set((1L, 100L), (2L, 100L), (2L, 101L), (3L, 101L),
      (4L, 102L)))
  }

  test("seeded random adversary == in-memory brute force (both variants)") {
    val rnd = new scala.util.Random(42)
    val base = 1704067200L // 2024-01-01 UTC, seconds
    val pts = (1 to 300).map(i =>
      (i.toLong, new Timestamp((base + rnd.nextInt(200000)) * 1000L +
        rnd.nextInt(1000))))
    val ivs = (1 to 100).map { i =>
      val s = base + rnd.nextInt(200000)
      (i.toLong, new Timestamp(s * 1000L), new Timestamp((s +
        1 + rnd.nextInt(20000)) * 1000L))
    }
    val pdf = pts.toDF("pid", "pt")
    val idf = ivs.toDF("iid", "s", "e")
    val brute = (for {
      (pid, p) <- pts; (iid, s, e) <- ivs
      if !s.after(p) && p.before(e)
    } yield (pid, iid)).toSet
    val got = RangeJoin.pointInInterval(pdf, idf, "pt", "s", "e",
        bucket = 3600L)
      .select("pid", "iid").as[(Long, Long)].collect()
    assert(got.length === got.toSet.size && got.toSet === brute)
    val ivs2 = (1 to 80).map { i =>
      val s = base + rnd.nextInt(200000)
      (i.toLong, new Timestamp(s * 1000L), new Timestamp((s +
        1 + rnd.nextInt(40000)) * 1000L))
    }
    val bruteOv = (for {
      (aid, as_, ae) <- ivs; (bid, bs, be) <- ivs2
      if as_.before(be) && bs.before(ae)
    } yield (aid, bid)).toSet
    val gotOv = RangeJoin.intervalOverlap(idf,
        ivs2.toDF("bid", "bs", "be"), "s", "e", "bs", "be", bucket = 3600L)
      .select("iid", "bid").as[(Long, Long)].collect()
    assert(gotOv.length === gotOv.toSet.size && gotOv.toSet === bruteOv)
  }

  test("a corpus-spanning interval fails loudly instead of replicating") {
    val wide = Seq((1L, ts("2024-01-01 00:00:00"), ts("2026-01-01 00:00:00")))
      .toDF("iid", "s", "e")
    val ex = intercept[Exception] {
      RangeJoin.pointInInterval(points, wide, "pt", "s", "e",
        bucket = 60L, maxBucketsPerInterval = 1000).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => e.getMessage +: messages(e.getCause))
    assert(messages(ex).exists(m =>
      m != null && m.contains("range-join interval spans")),
      s"wrong failure: $ex")
  }

  test("shared column names and reserved __bk are rejected") {
    val clash = intervals.withColumnRenamed("iid", "pid")
    intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(points, clash, "pt", "s", "e")
    }
    val reserved = points.withColumn("__bk", lit(1L))
    intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(reserved, intervals, "pt", "s", "e")
    }
  }

  test("s06's executed plan is an equi-join on the bucket id, never a " +
    "nested loop") {
    val df = SparkEntry.queries("s06_range_join")(spark, SparkTestSession.sfDir)
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"s06 lost its bucket equi-join:\n$plan")
    assert(df.count() > 0, "the range join found no storm-window purchases")
  }
}
