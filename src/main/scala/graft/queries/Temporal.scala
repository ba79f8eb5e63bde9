package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries.Q._

/** Time-windowed aggregation over the `events` table: tumbling / sliding /
  * session windows (the batch twins of the Structured Streaming versions in
  * graft.streaming), plus the reference's query-metrics aggregation
  * (litebase pkg/logs/query_metric.go:17-160, B10-B12 in SURVEY §2B) with
  * `events` standing in as the latency log (event_type = statement hash,
  * value = latency).
  */
object Temporal {

  /** Tumbling 1-hour windows per event type. */
  def s01Tumbling(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("total"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("w_start"),
        col("event_type"), col("n"), col("total"))
      .orderBy(col("w_start"), col("event_type"))

  val s01Oracle: String =
    """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS w_start,
      |  event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM events GROUP BY 1, 2 ORDER BY w_start, event_type""".stripMargin

  /** Sliding windows (1 hour long, every 30 minutes): each event lands in
    * exactly two windows. */
  def s02Sliding(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("total"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("w_start"),
        col("n"), col("total"))
      .orderBy(col("w_start"))

  val s02Oracle: String =
    """SELECT strftime(make_timestamp(CAST((floor(epoch(ts)/1800) - k) * 1800 * 1000000 AS BIGINT)),
      |    '%Y-%m-%d %H:%M:%S') AS w_start,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM events, UNNEST([0, 1]) AS t(k)
      |GROUP BY 1 ORDER BY w_start""".stripMargin

  /** Session windows: 10-minute inactivity gap per user. The oracle is the
    * classic gaps-and-islands rewrite, which matches Spark's session_window
    * semantics (a session ends when the next event is >= gap away). */
  def s03Session(s: SparkSession, dir: String): DataFrame =
    eventsRaw(s, dir)
      .groupBy(col("user_id"), session_window(col("ts"), "10 minutes").as("w"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("total"))
      .select(col("user_id"),
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("sess_start"),
        date_format(col("w.end"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("sess_end"),
        col("n"), col("total"))
      .orderBy(col("user_id"), col("sess_start"))

  val s03Oracle: String =
    """WITH flagged AS (
      |  SELECT user_id, ts, value,
      |    CASE WHEN ts >= COALESCE(LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
      |                             TIMESTAMP '1970-01-01') + INTERVAL 10 MINUTE
      |         THEN 1 ELSE 0 END AS new_sess
      |  FROM events),
      |sessions AS (
      |  SELECT user_id, ts, value,
      |    SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
      |  FROM flagged)
      |SELECT user_id,
      |  strftime(MIN(ts), '%Y-%m-%d %H:%M:%S.%f') AS sess_start,
      |  strftime(MAX(ts) + INTERVAL 10 MINUTE, '%Y-%m-%d %H:%M:%S.%f') AS sess_end,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM sessions GROUP BY user_id, sess_id
      |ORDER BY user_id, sess_start""".stripMargin

  /** Query-metrics aggregation (B10): per (statement, second-bucket) count /
    * avg / min / max / p50 / p90 / p99, reproducing the reference's
    * nearest-rank percentile `sorted[int(n*p/100)]` — including its quirk
    * that "p90" is computed at percentile 95
    * (pkg/logs/query_metric.go:141-145).
    *
    * collect_list+sort is exact, as the reference is; at 100 TB the scale
    * path swaps in percentile_approx (same query shape, sketch-mergeable).
    */
  def m01QueryMetrics(s: SparkSession, dir: String): DataFrame = {
    def pRank(p: Double) =
      element_at(col("lat_sorted"), (floor(col("n") * p).cast("int") + 1))
    events(s, dir)
      .groupBy(col("event_type"),
        date_format(date_trunc("minute", col("ts")), "yyyy-MM-dd HH:mm:ss").as("bucket"))
      .agg(count(lit(1)).as("n"),
        dsum(col("value"), 6).as("lat_sum"),
        min(col("value")).as("lat_min"),
        max(col("value")).as("lat_max"),
        sort_array(collect_list(col("value"))).as("lat_sorted"))
      .select(col("event_type"), col("bucket"), col("n"),
        (col("lat_sum") / col("n")).as("lat_avg"),
        col("lat_min"), col("lat_max"),
        pRank(0.50).as("lat_p50"),
        pRank(0.95).as("lat_p90"),
        pRank(0.99).as("lat_p99"))
      .orderBy(col("event_type"), col("bucket"))
  }

  val m01Oracle: String =
    """SELECT event_type, bucket, n,
      |  lat_sum / n AS lat_avg, lat_min, lat_max,
      |  lat_sorted[CAST(floor(n * 0.50) AS INT) + 1] AS lat_p50,
      |  lat_sorted[CAST(floor(n * 0.95) AS INT) + 1] AS lat_p90,
      |  lat_sorted[CAST(floor(n * 0.99) AS INT) + 1] AS lat_p99
      |FROM (
      |  SELECT event_type,
      |    strftime(date_trunc('minute', ts), '%Y-%m-%d %H:%M:%S') AS bucket,
      |    COUNT(*) AS n,
      |    CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS lat_sum,
      |    MIN(value) AS lat_min, MAX(value) AS lat_max,
      |    list_sort(list(value)) AS lat_sorted
      |  FROM events GROUP BY 1, 2) x
      |ORDER BY event_type, bucket""".stripMargin

  /** Scale-path metrics aggregation — the 100 TB default (SURVEY §2B B10).
    * Same query shape as m01 but the per-bucket latency distribution is a
    * percentile_approx sketch (mergeable, bounded memory) instead of
    * collect_list (unbounded: a hot statement's bucket at production QPS
    * would hold millions of latencies in one aggregation buffer). The exact
    * m01 stays as the oracle-checked entry — the reference itself bounds
    * its buckets to a 128-latency ring (pkg/logs/query_metric.go:17-29), so
    * an approximation here matches its spirit. No SQL oracle: DuckDB's
    * approx_quantile is a different sketch; QueriesSpec asserts
    * approx-vs-exact agreement within tolerance instead. */
  def m03QueryMetricsApprox(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .groupBy(col("event_type"),
        date_format(date_trunc("minute", col("ts")), "yyyy-MM-dd HH:mm:ss").as("bucket"))
      .agg(count(lit(1)).as("n"),
        dsum(col("value"), 6).as("lat_sum"),
        min(col("value")).as("lat_min"),
        max(col("value")).as("lat_max"),
        percentile_approx(col("value"), lit(0.50), lit(10000)).as("lat_p50"),
        percentile_approx(col("value"), lit(0.95), lit(10000)).as("lat_p90"),
        percentile_approx(col("value"), lit(0.99), lit(10000)).as("lat_p99"))
      .select(col("event_type"), col("bucket"), col("n"),
        (col("lat_sum") / col("n")).as("lat_avg"),
        col("lat_min"), col("lat_max"),
        col("lat_p50"), col("lat_p90"), col("lat_p99"))
      .orderBy(col("event_type"), col("bucket"))

  /** Per-minute query counts (B12, pkg/database/counter.go:17-60). */
  def m02QueryCounts(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .groupBy(date_format(date_trunc("minute", col("ts")), "yyyy-MM-dd HH:mm").as("minute"))
      .agg(count(lit(1)).as("n_queries"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("minute"))

  val m02Oracle: String =
    """SELECT strftime(date_trunc('minute', ts), '%Y-%m-%d %H:%M') AS minute,
      |  COUNT(*) AS n_queries, COUNT(DISTINCT user_id) AS n_users
      |FROM events GROUP BY 1 ORDER BY minute""".stripMargin

  /** Interval join (click-attribution): purchases joined to the same
    * user's clicks within the preceding 6 hours — the batch twin of
    * [[graft.streaming.EventStreams.clickAttribution]] (same code path;
    * StreamingSpec proves stream==batch). */
  def s04IntervalJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = eventsRaw(s, dir)
    graft.streaming.EventStreams.clickAttribution(ev, ev)
      .select(col("purchase_id"), col("click_id"), col("user_id"),
        date_format(col("click_ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("click_ts"),
        date_format(col("purchase_ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("purchase_ts"))
      .orderBy(col("purchase_id"), col("click_id"))
  }

  val s04Oracle: String =
    """SELECT p.event_id AS purchase_id, c.event_id AS click_id, c.user_id,
      |  strftime(c.ts, '%Y-%m-%d %H:%M:%S.%f') AS click_ts,
      |  strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts
      |FROM (SELECT * FROM events WHERE event_type = 'click') c
      |JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      |  ON c.user_id = p.user_id
      | AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 6 HOUR
      |ORDER BY purchase_id, click_id""".stripMargin

  /** As-of join (last-touch attribution): each purchase joined to the
    * single NEWEST click at-or-before it for the same user — the
    * time-series alignment primitive Spark lacks natively
    * ([[graft.operators.Asof]]; s04 is the windowed MANY-match
    * attribution, this is the 1-match as-of). Runs the skew-robust
    * bucketed plan so the 100 TB shape is what the oracle checks;
    * OperatorsSpec separately pins bucketed == plain on an adversarial
    * hot-key corpus. */
  def s05AsofJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = eventsRaw(s, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id").as("purchase_id"))
    graft.operators.Asof.joinBucketed(purchases, clicks, "user_id", "ts",
        "event_id", carry = Seq("event_id", "ts"), bucket = 3600L)
      .select(col("purchase_id"), col("user_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("purchase_ts"),
        col("asof_event_id").as("click_id"),
        date_format(col("asof_ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("click_ts"))
      .orderBy(col("purchase_id"))
  }

  /** Independent formulation: all-pairs join + rank-1 (fine at oracle
    * scale, quadratic at real scale — exactly why the operator exists).
    * Ties on click ts break to the larger event_id on both sides. */
  val s05Oracle: String =
    """WITH c AS (SELECT user_id, ts, event_id FROM events
      |           WHERE event_type = 'click'),
      |p AS (SELECT user_id, ts, event_id AS purchase_id FROM events
      |      WHERE event_type = 'purchase'),
      |ranked AS (
      |  SELECT p.purchase_id, p.user_id, p.ts AS pts,
      |    c.event_id AS click_id, c.ts AS cts,
      |    ROW_NUMBER() OVER (PARTITION BY p.purchase_id
      |      ORDER BY c.ts DESC, c.event_id DESC) AS rn
      |  FROM p LEFT JOIN c ON c.user_id = p.user_id AND c.ts <= p.ts)
      |SELECT purchase_id, user_id,
      |  strftime(pts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts,
      |  click_id,
      |  strftime(cts, '%Y-%m-%d %H:%M:%S.%f') AS click_ts
      |FROM ranked WHERE rn = 1
      |ORDER BY purchase_id""".stripMargin

  /** Keyless range join ([[graft.operators.RangeJoin]]): every purchase
    * tagged with the error-storm windows `[error.ts, error.ts + 10 min)`
    * it falls into — NO shared key between the sides, the join Catalyst
    * would otherwise plan as a nested-loop/cartesian. Runs the binned
    * equi-join plan (10-minute buckets) so the 100 TB shape is what the
    * oracle checks; PlanShapeSpec pins the plan nested-loop-free and
    * OperatorsSpec pins bucketed == naive across widths. */
  def s06RangeJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
    val windows = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("error_id"), col("ts").as("w_start"),
        (col("ts") + expr("INTERVAL 10 MINUTES")).as("w_end"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("ts").as("p_ts"))
    graft.operators.RangeJoin.pointInInterval(purchases, windows,
        "p_ts", "w_start", "w_end", bucket = 600L)
      .select(col("purchase_id"), col("error_id"),
        date_format(col("p_ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("purchase_ts"),
        date_format(col("w_start"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("w_start"))
      .orderBy(col("purchase_id"), col("error_id"))
  }

  /** Independent formulation: the plain inequality join (fine at oracle
    * scale; the quadratic shape the operator exists to avoid). */
  val s06Oracle: String =
    """SELECT p.event_id AS purchase_id, e.event_id AS error_id,
      |  strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts,
      |  strftime(e.ts, '%Y-%m-%d %H:%M:%S.%f') AS w_start
      |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |JOIN (SELECT * FROM events WHERE event_type = 'error') e
      |  ON e.ts <= p.ts AND p.ts < e.ts + INTERVAL 10 MINUTE
      |ORDER BY purchase_id, error_id""".stripMargin

  /** Interval-overlap variant of [[graft.operators.RangeJoin]]: every
    * error-storm window `[error.ts, +10 min)` paired with every signup
    * window `[signup.ts, +15 min)` it overlaps — still keyless, and the
    * variant with the duplicate hazard (a pair shares every bucket its
    * overlap covers); the operator emits each pair only from the bucket
    * owning `greatest(start_a, start_b)`, so a hash mismatch here would
    * catch BOTH a missed pair and a double-emitted one. */
  def s07IntervalOverlap(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
    val errors = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("error_id"), col("ts").as("e_start"),
        (col("ts") + expr("INTERVAL 10 MINUTES")).as("e_end"))
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("event_id").as("signup_id"), col("ts").as("s_start"),
        (col("ts") + expr("INTERVAL 15 MINUTES")).as("s_end"))
    graft.operators.RangeJoin.intervalOverlap(errors, signups,
        "e_start", "e_end", "s_start", "s_end", bucket = 600L)
      .select(col("error_id"), col("signup_id"),
        date_format(col("e_start"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("error_ts"),
        date_format(col("s_start"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("signup_ts"))
      .orderBy(col("error_id"), col("signup_id"))
  }

  /** Independent formulation: plain inequality join on the half-open
    * overlap predicate, no binning, no owner-bucket dedup. */
  val s07Oracle: String =
    """SELECT e.event_id AS error_id, s.event_id AS signup_id,
      |  strftime(e.ts, '%Y-%m-%d %H:%M:%S.%f') AS error_ts,
      |  strftime(s.ts, '%Y-%m-%d %H:%M:%S.%f') AS signup_ts
      |FROM (SELECT * FROM events WHERE event_type = 'error') e
      |JOIN (SELECT * FROM events WHERE event_type = 'signup') s
      |  ON e.ts < s.ts + INTERVAL 15 MINUTE
      | AND s.ts < e.ts + INTERVAL 10 MINUTE
      |ORDER BY error_id, signup_id""".stripMargin

  val queries: Map[String, QueryFn] = Map(
    "s01_tumbling_window" -> (s01Tumbling _),
    "s02_sliding_window" -> (s02Sliding _),
    "s03_session_window" -> (s03Session _),
    "s04_interval_join" -> (s04IntervalJoin _),
    "s05_asof_join" -> (s05AsofJoin _),
    "s06_range_join" -> (s06RangeJoin _),
    "s07_interval_overlap" -> (s07IntervalOverlap _),
    "m01_query_metrics" -> (m01QueryMetrics _),
    "m02_query_counts" -> (m02QueryCounts _),
    "m03_query_metrics_approx" -> (m03QueryMetricsApprox _))

  val oracles: Map[String, String] = Map(
    "s01_tumbling_window" -> s01Oracle,
    "s02_sliding_window" -> s02Oracle,
    "s03_session_window" -> s03Oracle,
    "s04_interval_join" -> s04Oracle,
    "s05_asof_join" -> s05Oracle,
    "s06_range_join" -> s06Oracle,
    "s07_interval_overlap" -> s07Oracle,
    "m01_query_metrics" -> m01Oracle,
    "m02_query_counts" -> m02Oracle)
}
