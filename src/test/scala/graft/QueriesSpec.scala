package graft

import org.scalatest.funsuite.AnyFunSuite

/** Smoke: every declared query runs on sf0.001 and yields rows, and every
  * oracle key points at a real query. (Exact value matching is covered by
  * the DuckDB gate — tools/check_oracles.py — which can't run from sbt.) */
class QueriesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("oracle keys are a subset of query keys") {
    // p40's oracle renders driver-learned model state (the BPE merge
    // list) into SQL, which needs an active session to train
    val _ = spark
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name yields rows on sf0.001") {
      val n = fn(spark, SparkTestSession.sfDir).count()
      assert(n > 0, s"$name returned no rows")
    }
  }

  test("m03 approx metrics track the exact m01 percentiles within tolerance") {
    import org.apache.spark.sql.functions.col
    val dir = SparkTestSession.sfDir
    val exact = graft.queries.Temporal.m01QueryMetrics(spark, dir)
      .select(col("event_type"), col("bucket"), col("n"), col("lat_p50"),
        col("lat_p90"), col("lat_p99"))
    val approx = graft.queries.Temporal.m03QueryMetricsApprox(spark, dir)
      .select(col("event_type"), col("bucket"),
        col("lat_p50").as("a50"), col("lat_p90").as("a90"), col("lat_p99").as("a99"))
    val joined = exact.join(approx, Seq("event_type", "bucket")).collect()
    assert(joined.nonEmpty)
    // percentile_approx with accuracy 10000 is exact for buckets smaller
    // than the sketch bound; on this data every bucket matches the exact
    // nearest-rank value to double precision except the p90 quirk (m01
    // reproduces the reference's p90@95; the sketch has no such quirk, so
    // compare it with a rank-tolerance instead of equality)
    joined.foreach { r =>
      val n = r.getAs[Long]("n")
      val (p50e, p50a) = (r.getAs[Double]("lat_p50"), r.getAs[Double]("a50"))
      val (p90e, p90a) = (r.getAs[Double]("lat_p90"), r.getAs[Double]("a90"))
      val (p99e, p99a) = (r.getAs[Double]("lat_p99"), r.getAs[Double]("a99"))
      assert(math.abs(p50e - p50a) <= math.max(0.01, 0.05 * math.abs(p50e)),
        s"p50 off: exact=$p50e approx=$p50a n=$n")
      // both columns target rank 0.95 (m01 reproduces the reference's
      // p90@95 quirk; m03 queries the sketch at 0.95), so the same
      // rank-tolerance bound applies (r8 verdict stretch ask)
      assert(math.abs(p90e - p90a) <= math.max(0.01, 0.10 * math.abs(p90e)),
        s"p90 off: exact=$p90e approx=$p90a n=$n")
      assert(math.abs(p99e - p99a) <= math.max(0.01, 0.10 * math.abs(p99e)),
        s"p99 off: exact=$p99e approx=$p99a n=$n")
    }
  }
}
