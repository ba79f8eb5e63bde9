package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, NumericType, TimestampNTZType, TimestampType}

/** Keyless range joins: points against containing intervals, and
  * intervals against overlapping intervals, with NO shared equi-key.
  *
  * Spark has no native operator for `ON s <= p AND p < e` — without an
  * equality conjunct Catalyst plans BroadcastNestedLoopJoin (driver-OOM
  * once the "small" side isn't) or a cartesian product (quadratic). The
  * reference's answer to range predicates is its R-tree virtual table
  * (litebase vendors SQLite's rtree module; surfaced here as q30's
  * bbox query) — an index for REPEATED point lookups, not a bulk join.
  * This operator is the bulk-join analog for the data-pipeline side:
  * tag events with incident windows, map reads to genome bins, attach
  * log lines to deploy intervals — at corpus scale, in one pass.
  *
  * The plan is the classic binned range join: pick a bucket width `W`;
  * each interval explodes into the ~(len/W + 1) buckets it covers, each
  * point maps to exactly ONE bucket; an ordinary shuffled EQUI-join on
  * the bucket id pairs candidates; the exact predicate filters. Work is
  * O(points + intervals·len/W + candidate pairs) — the candidate set is
  * the true result inflated only by same-bucket near-misses, never the
  * cross product. Both exchanges hash on the bucket id, so parallelism
  * is time-uniform regardless of how intervals cluster; W is the knob
  * trading interval replication against per-bucket candidate density
  * (the same dial [[Asof.joinBucketed]] exposes). A pathological
  * interval spanning the whole corpus would replicate into every bucket
  * — [[maxBucketsPerInterval]] fails that loudly inside the executors
  * rather than silently materializing it. A genuinely skewed bucket (a
  * burst concentrating ~10x+ a fair task share in one bucket) is AQE
  * skew-join territory, demonstrated — not assumed — by
  * [[graft.tools.SkewSplitProbe]]: the final adaptive plan rewrites to
  * `SortMergeJoin(skew=true)` and splits the straggler partition
  * (SCALE.md "r13 probe: AQE skew-split on s07" has the numbers).
  *
  * The interval-overlap variant needs one more idea: a pair of
  * intervals shares EVERY bucket their overlap covers, so a naive
  * bucket join emits duplicates. Each overlapping pair is instead
  * emitted only from the bucket owning `greatest(start_a, start_b)` —
  * both sides provably cover that bucket, and exactly one bucket owns
  * it, so the join is duplicate-free WITHOUT a distinct (no wide
  * dedup exchange over the result).
  *
  * Intervals are half-open `[start, end)`: an empty interval
  * (`end <= start`) matches nothing and is filtered before exploding
  * (which also keeps `sequence()` ascending). Timestamp columns bucket
  * by epoch seconds; numeric columns by their own units.
  */
object RangeJoin {

  /** Each `points` row joined to every `intervals` row containing it
    * (`start <= pt < end`). Column sets must be disjoint; the output
    * carries both sides' columns. `bucket` is the bucket width (seconds
    * for timestamp columns, value units for numeric columns). */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      ptCol: String, startCol: String, endCol: String,
      bucket: Long = 3600L,
      maxBucketsPerInterval: Int = 100000): DataFrame = {
    requireDisjoint(points, intervals)
    val pts = points.withColumn("__bk",
      bucketOf(points.schema(ptCol).dataType, col(ptCol), bucket))
    val ivs = exploded(intervals, startCol, endCol, bucket,
      maxBucketsPerInterval)
    pts.join(ivs, Seq("__bk"))
      .filter(col(startCol) <= col(ptCol) && col(ptCol) < col(endCol))
      .drop("__bk")
  }

  /** Each `left` interval joined to every `right` interval overlapping
    * it (`ls < re && rs < le`, half-open). Duplicate-free by
    * construction: a pair meets in every shared bucket but is emitted
    * only from the one owning `greatest(ls, rs)`. */
  def intervalOverlap(left: DataFrame, right: DataFrame,
      leftStart: String, leftEnd: String,
      rightStart: String, rightEnd: String,
      bucket: Long = 3600L,
      maxBucketsPerInterval: Int = 100000): DataFrame = {
    requireDisjoint(left, right)
    val dt = left.schema(leftStart).dataType
    val l = exploded(left, leftStart, leftEnd, bucket, maxBucketsPerInterval)
    val r = exploded(right, rightStart, rightEnd, bucket, maxBucketsPerInterval)
    l.join(r, Seq("__bk"))
      .filter(col(leftStart) < col(rightEnd) &&
        col(rightStart) < col(leftEnd))
      .filter(col("__bk") ===
        bucketOf(dt, greatest(col(leftStart), col(rightStart)), bucket))
      .drop("__bk")
  }

  /** Monotone bucket id. Timestamps truncate to epoch seconds first —
    * safe because truncation is monotone, so a covered point can never
    * land outside `[bucket(start), bucket(end)]`. Numerics go through
    * `floor(x / w)` in doubles (exact for |x| < 2^53; epoch seconds are
    * ~2^31). */
  private[graft] def bucketOf(dt: DataType, c: Column, w: Long): Column = dt match {
    case TimestampType | TimestampNTZType =>
      floor(unix_timestamp(c.cast(TimestampType)) / w).cast("long")
    case _: NumericType => floor(c.cast("double") / w).cast("long")
    case other => throw new IllegalArgumentException(
      s"range-join column must be timestamp or numeric, got $other")
  }

  /** One row per (interval, covered bucket). Empty intervals drop;
    * an interval covering more than `max` buckets raises in-executor
    * (assert_true) instead of silently replicating corpus-wide. */
  private[graft] def exploded(intervals: DataFrame, startCol: String,
      endCol: String, bucket: Long, max: Int): DataFrame = {
    val dt = intervals.schema(startCol).dataType
    val bs = bucketOf(dt, col(startCol), bucket)
    val be = bucketOf(dt, col(endCol), bucket)
    intervals
      .filter(col(endCol) > col(startCol))
      .withColumn("__guard", assert_true(be - bs < lit(max.toLong),
        concat(lit(s"range-join interval spans > $max buckets of width " +
          s"$bucket (raise the width or maxBucketsPerInterval): start="),
          col(startCol).cast("string"), lit(" end="),
          col(endCol).cast("string"))))
      .withColumn("__bk", explode(when(col("__guard").isNull,
        sequence(bs, be))))
      .drop("__guard")
  }

  private[graft] def requireDisjoint(a: DataFrame, b: DataFrame): Unit = {
    val shared = a.columns.toSet.intersect(b.columns.toSet)
    require(shared.isEmpty,
      s"range-join sides must have disjoint columns; shared: " +
        shared.toSeq.sorted.mkString(", "))
    require(!a.columns.contains("__bk") && !b.columns.contains("__bk"),
      "__bk is reserved by the range join")
  }
}
