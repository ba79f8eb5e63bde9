package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming over the `events` table (SURVEY §7.2 step 8: the
  * driver-mandated streaming extension; the reference itself has no
  * dataflow streaming — its /query/stream endpoint is transport-level,
  * pkg/http/query_stream_controller.go).
  *
  * Each transform is the streaming twin of a batch query in
  * graft.queries.Temporal, so results can be checked batch-vs-stream.
  * Watermarks bound state; all aggregations are incremental (partial
  * aggregation + state store), which is the 100 TB-friendly shape.
  */
object EventStreams {

  /** The on-disk events schema, parameterized by the `ts` encoding (legacy
    * testdata wrote parquet TIMESTAMP(NANOS) → read as long; current
    * testdata writes timestamp[us]). */
  private def rawSchema(tsType: org.apache.spark.sql.types.DataType): StructType =
    StructType(Seq(
      StructField("event_id", LongType), StructField("ts", tsType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))

  /** Streaming source over a directory of event parquet files. Probes the
    * batch reader's schema once (footer-only) and adapts, normalizing `ts`
    * to a microsecond TimestampType either way — identical to the batch
    * loader's normalization so stream-vs-batch equivalence holds. */
  def source(spark: SparkSession, dir: String): DataFrame =
    graft.Tables.eventsTsEncoding(spark, dir) match {
      case graft.Tables.TsNative(t @ (TimestampType | TimestampNTZType)) =>
        spark.readStream.schema(rawSchema(t))
          .option("maxFilesPerTrigger", "4")
          .parquet(dir)
          .withColumn("ts", col("ts").cast("timestamp"))
      case graft.Tables.TsNative(LongType) =>
        spark.readStream.schema(rawSchema(LongType))
          .option("maxFilesPerTrigger", "4")
          .parquet(dir)
          .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case graft.Tables.TsNative(other) =>
        throw new IllegalStateException(
          s"testdata schema changed: events.ts is $other, expected a " +
            "timestamp or a nanosecond long")
      case graft.Tables.TsLegacyNanos =>
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.readStream.schema(rawSchema(LongType))
          .option("maxFilesPerTrigger", "4")
          .parquet(dir)
          .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    }

  /** Tumbling 1-hour counts per event type with a 2-hour watermark. */
  def tumblingCounts(events: DataFrame): DataFrame =
    events.withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))
      .select(col("window.start").as("w_start"), col("event_type"),
        col("n"), col("total"))

  /** Session windows (10-minute gap) per user. */
  def sessionCounts(events: DataFrame): DataFrame =
    events.withWatermark("ts", "2 hours")
      .groupBy(col("user_id"), session_window(col("ts"), "10 minutes"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), col("session_window.start").as("sess_start"),
        col("session_window.end").as("sess_end"), col("n"))

  /** Streaming exact dedup — the ingestion shape of Dedup.exact for an
    * at-least-once pipeline: keep the first occurrence of each content
    * key. State is bounded by the watermark (a duplicate arriving more
    * than the watermark delay after its first occurrence can re-emit —
    * the standard contract that keeps state finite at 100 TB/day). */
  def dedupByContent(events: DataFrame, keyCols: Seq[String],
      watermark: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Streaming query-metrics aggregation — the live twin of
    * Temporal.m03 (B10's 100 TB shape): per (statement, minute bucket)
    * count/avg/min/max + percentile_approx sketches, incremental with
    * watermark-bounded state. The reference computes these metrics from an
    * in-memory log on a timer (pkg/logs/query_log.go); over a query-log
    * STREAM this is the same dataflow with mergeable sketch state. */
  def queryMetrics(events: DataFrame): DataFrame =
    events.withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 minute"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value")).as("lat_sum"),
        min(col("value")).as("lat_min"),
        max(col("value")).as("lat_max"),
        percentile_approx(col("value"), lit(0.50), lit(10000)).as("lat_p50"),
        percentile_approx(col("value"), lit(0.95), lit(10000)).as("lat_p90"),
        percentile_approx(col("value"), lit(0.99), lit(10000)).as("lat_p99"))
      .select(col("window.start").as("bucket"), col("event_type"), col("n"),
        (col("lat_sum") / col("n")).as("lat_avg"),
        col("lat_min"), col("lat_max"),
        col("lat_p50"), col("lat_p90"), col("lat_p99"))

  /** Stream-stream interval join (click-attribution shape): each purchase
    * joins the SAME user's clicks from the preceding `window`. Both sides
    * carry watermarks and the join condition bounds event time on both
    * ends, so Spark can expire state — the state store holds only the
    * watermark-deep tail of each side, which is what keeps a
    * 100 TB/day × 30 min join finite. The same code runs on batch
    * DataFrames (Catalyst plans it as a plain range join), which is how
    * the batch twin s04 and StreamingSpec prove equivalence. */
  def clickAttribution(clicks: DataFrame, purchases: DataFrame,
      window: String = "6 hours", watermark: String = "12 hours"): DataFrame = {
    val c = (if (clicks.isStreaming) clicks.withWatermark("ts", watermark) else clicks)
      .where(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("click_ts"))
    val p = (if (purchases.isStreaming) purchases.withWatermark("ts", watermark) else purchases)
      .where(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("purchase_ts"))
    c.join(p,
        col("user_id") === col("p_user") &&
          col("click_ts") <= col("purchase_ts") &&
          col("click_ts") >= col("purchase_ts") - expr(s"INTERVAL $window"))
      .select(col("purchase_id"), col("click_id"), col("user_id"),
        col("click_ts"), col("purchase_ts"))
  }

  /** Streaming twin of the batch keyless range join
    * ([[graft.operators.RangeJoin.pointInInterval]], s06): tag each
    * point event at INGEST with every active interval containing it —
    * "which incident windows was this purchase inside?" answered as the
    * events arrive instead of in a nightly batch.
    *
    * Same plan as the batch operator, streamified: intervals explode
    * STATELESSLY into the buckets they cover (identical binning code —
    * [[graft.operators.RangeJoin.exploded]], including the loud
    * in-executor guard on corpus-spanning intervals), points hash to one
    * bucket, and the stream-stream join is an ordinary EQUI-join on the
    * bucket id plus the exact containment predicate — so the symmetric
    * hash join's state is partitioned by the same time-uniform bucket
    * ids that spread the batch shuffle.
    *
    * State is bounded on BOTH sides by construction: the containment
    * predicate lower-bounds the point against the interval's
    * watermarked start (`start <= pt`), and the exploded() guard upper-
    * bounds interval length at (maxBucketsPerInterval + 1) * bucket
    * seconds, which the join condition states explicitly
    * (`pt < start + that`) — implied by `pt < end`, so it drops no
    * real match, but it gives the engine the two-sided event-time
    * range it needs to expire interval state at the watermark and
    * point state symmetrically. Each side's store holds only its
    * watermark-deep tail; an interval's footprint is its ≤ max+1
    * bucket copies, exactly the batch replication factor.
    *
    * Batch DataFrames run the same code unwatermarked (Catalyst plans
    * the plain equi-join); StreamingSpec proves stream == batch ==
    * RangeJoin.pointInInterval on wave-boundary adversaries. Timestamp
    * columns only — a stream needs event time. */
  def rangeTagging(points: DataFrame, intervals: DataFrame,
      ptCol: String, startCol: String, endCol: String,
      bucket: Long = 600L, maxBucketsPerInterval: Int = 64,
      watermark: String = "12 hours"): DataFrame = {
    import graft.operators.RangeJoin
    RangeJoin.requireDisjoint(points, intervals)
    // timestamps only (unlike the batch operator's numeric mode): a
    // stream needs event time, and the INTERVAL eviction bound below
    // only type-checks against timestamps — fail with a clear message
    // instead of an analysis error about interval arithmetic
    // ALL event-time columns used in the join condition, not just the
    // watermarked starts: a numeric/date END column passes a start-only
    // guard and then dies in opaque interval arithmetic (r13 advice)
    for ((df, c) <- Seq(points -> ptCol, intervals -> startCol,
        intervals -> endCol))
      require(df.schema(c).dataType.typeName.startsWith("timestamp"),
        s"rangeTagging needs timestamp columns, got " +
          s"${df.schema(c).dataType.simpleString} for $c")
    val p0 = if (points.isStreaming) points.withWatermark(ptCol, watermark)
      else points
    val iv0 = if (intervals.isStreaming)
      intervals.withWatermark(startCol, watermark) else intervals
    val pts = p0.withColumn("__bk",
      RangeJoin.bucketOf(p0.schema(ptCol).dataType, col(ptCol), bucket))
    val ivs = RangeJoin.exploded(iv0, startCol, endCol, bucket,
      maxBucketsPerInterval)
    val lenBound = (maxBucketsPerInterval.toLong + 1L) * bucket
    pts.join(ivs,
        pts("__bk") === ivs("__bk") &&
          col(startCol) <= col(ptCol) && col(ptCol) < col(endCol) &&
          col(ptCol) < col(startCol) + expr(s"INTERVAL $lenBound SECONDS"))
      .drop("__bk")
  }

  /** Streaming twin of the batch interval-overlap join
    * ([[graft.operators.RangeJoin.intervalOverlap]], s07): emit each
    * (left, right) interval pair that overlaps, duplicate-free, as the
    * intervals arrive — "which signup windows overlapped this incident?"
    * at ingest. Both sides explode statelessly into their covered
    * buckets; the stream-stream equi-join on bucket ids plus the exact
    * overlap predicate pairs candidates; the owner-bucket filter
    * (`__bk == bucket(greatest(ls, rs))` — both sides provably cover
    * that bucket, exactly one bucket owns it) keeps the output exact
    * WITHOUT a dedup exchange, in a stream where a `dropDuplicates`
    * would itself be more state. State eviction needs the two-sided
    * event-time range stated explicitly: the exploded() guard bounds
    * every interval at (max+1)*bucket seconds, so `rs < ls + bound` and
    * `ls < rs + bound` are implied by the overlap predicate and drop no
    * real pair, while giving the symmetric hash join the watermark
    * bounds to expire both stores. */
  def overlapTagging(left: DataFrame, right: DataFrame,
      leftStart: String, leftEnd: String,
      rightStart: String, rightEnd: String,
      bucket: Long = 600L, maxBucketsPerInterval: Int = 64,
      watermark: String = "12 hours"): DataFrame = {
    import graft.operators.RangeJoin
    RangeJoin.requireDisjoint(left, right)
    // timestamps only — same argument as [[rangeTagging]], and the
    // guard covers every event-time column in the join condition
    for ((df, c) <- Seq(left -> leftStart, left -> leftEnd,
        right -> rightStart, right -> rightEnd))
      require(df.schema(c).dataType.typeName.startsWith("timestamp"),
        s"overlapTagging needs timestamp columns, got " +
          s"${df.schema(c).dataType.simpleString} for $c")
    val dt = left.schema(leftStart).dataType
    val l0 = if (left.isStreaming) left.withWatermark(leftStart, watermark)
      else left
    val r0 = if (right.isStreaming) right.withWatermark(rightStart, watermark)
      else right
    val l = RangeJoin.exploded(l0, leftStart, leftEnd, bucket,
      maxBucketsPerInterval)
    val r = RangeJoin.exploded(r0, rightStart, rightEnd, bucket,
      maxBucketsPerInterval)
    val lenBound = (maxBucketsPerInterval.toLong + 1L) * bucket
    val bound = expr(s"INTERVAL $lenBound SECONDS")
    l.join(r,
        l("__bk") === r("__bk") &&
          col(leftStart) < col(rightEnd) && col(rightStart) < col(leftEnd) &&
          col(rightStart) < col(leftStart) + bound &&
          col(leftStart) < col(rightStart) + bound)
      .filter(l("__bk") ===
        RangeJoin.bucketOf(dt, greatest(col(leftStart), col(rightStart)), bucket))
      .drop("__bk")
  }

  case class UserAgg(user_id: Long, events: Long, total: Double)
  case class EventRow(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
    event_type: String, value: Double, props: String)

  // event times carried as epoch MICROSECONDS: events.ts is
  // timestamp_ntz(µs) and the batch Asof operator compares at full
  // precision — truncating to ms here would admit a click up to 999 µs
  // AFTER its purchase and break the stream==batch claim on µs data
  case class AsofClick(ts_us: Long, id: Long)
  case class AsofPending(purchase_id: Long, ts_us: Long)
  case class AsofState(clicks: Seq[AsofClick], pending: Seq[AsofPending])
  case class AsofMatch(purchase_id: Long, user_id: Long,
    purchase_ts: java.sql.Timestamp, click_id: Option[Long],
    click_ts: Option[java.sql.Timestamp])

  private def microsOf(t: java.sql.Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
  private def tsOfMicros(us: Long): java.sql.Timestamp = {
    val t = new java.sql.Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  /** Streaming as-of enrichment: each purchase emitted ONCE with the
    * newest same-user click at-or-before it (ties to the larger click
    * id) — the 1-match last-touch twin of [[clickAttribution]]'s
    * every-match interval join, and the streaming twin of the batch
    * [[graft.operators.Asof]] operator (StreamingSpec proves
    * stream == `Asof.join` on the same events).
    *
    * Correctness under out-of-order arrival: a purchase is HELD until
    * the watermark passes its event time — only then can no admissible
    * click (click_ts <= purchase_ts) still arrive (later ones are
    * watermark-late and dropped) — then finalized and emitted
    * (append-mode, exactly once per purchase).
    *
    * State is bounded the way the batch bucketed plan bounds its carry:
    * per user, every click at-or-before the watermark collapses to the
    * single newest one (the only one any FUTURE purchase can match —
    * future purchases have ts > watermark), so state holds one carry
    * click + the watermark-deep in-flight tail + unfinalized purchases.
    * A user idle past `idleTtlMs` is dropped entirely (the
    * [[runningUserTotals]] TTL argument: lifetime user cardinality must
    * not accumulate). Batch runs see everything in one group pass —
    * same matches, no state. */
  def asofAttribution(spark: SparkSession, events: DataFrame,
      watermark: String = "12 hours",
      idleTtlMs: Long = 24 * 3600 * 1000L): Dataset[AsofMatch] = {
    import spark.implicits._
    val streaming = events.isStreaming
    val src = if (streaming) events.withWatermark("ts", watermark) else events
    val timeoutConf =
      if (streaming) GroupStateTimeout.EventTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    src.where(col("event_type").isin("click", "purchase")).as[EventRow]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, timeoutConf)(
        (user: Long, rows: Iterator[EventRow], state: GroupState[AsofState]) => {
          val prev = state.getOption.getOrElse(AsofState(Nil, Nil))
          var clicks = prev.clicks
          var pending = prev.pending
          rows.foreach { r =>
            if (r.event_type == "click")
              clicks = clicks :+ AsofClick(microsOf(r.ts), r.event_id)
            else pending = pending :+ AsofPending(r.event_id, microsOf(r.ts))
          }
          // batch has no watermark: everything finalizes in the one pass.
          // The engine watermark is MILLIS; scale it to the µs domain the
          // state lives in (a purchase at wm·1000 + 500 µs stays held —
          // conservative and correct).
          val wmUs =
            if (streaming) state.getCurrentWatermarkMs() * 1000L
            else Long.MaxValue
          val (fin, still) = pending.partition(_.ts_us <= wmUs)
          val out = fin.sortBy(p => (p.ts_us, p.purchase_id)).map { p =>
            val best = clicks.filter(_.ts_us <= p.ts_us) match {
              case Seq() => None
              case cs => Some(cs.maxBy(c => (c.ts_us, c.id)))
            }
            AsofMatch(p.purchase_id, user, tsOfMicros(p.ts_us),
              best.map(_.id), best.map(c => tsOfMicros(c.ts_us)))
          }
          // carry-collapse: of the clicks at-or-before the watermark only
          // the newest can ever match again
          val (sealed_, inflight) = clicks.partition(_.ts_us <= wmUs)
          val kept =
            (if (sealed_.isEmpty) Nil
             else Seq(sealed_.maxBy(c => (c.ts_us, c.id)))) ++ inflight
          // setTimeoutTimestamp is millis and must be STRICTLY past the
          // watermark: ceil-divide a µs instant that is > wmUs
          def ceilMs(us: Long): Long = Math.floorDiv(us + 999L, 1000L)
          if (!streaming) out.iterator // batch: one stateless group pass
          else if (still.nonEmpty) {
            state.update(AsofState(kept, still))
            // wake exactly when the earliest held purchase finalizes
            // (strictly > wm by the partition above + ceil)
            state.setTimeoutTimestamp(ceilMs(still.map(_.ts_us).min))
            out.iterator
          } else if (kept.nonEmpty &&
              !(state.hasTimedOut && fin.isEmpty)) {
            // every purchase finalized (some possibly via this very
            // finalize-wakeup — hasTimedOut with fin nonEmpty): the carry
            // click MUST survive for purchases that haven't arrived yet,
            // GC'd only by the idle TTL. (Dropping it on any timeout was
            // the wave-boundary bug: the finalize-wakeup between two
            // waves discarded the carry, and the next wave's first
            // purchase saw no clicks at all.)
            state.update(AsofState(kept, Nil))
            state.setTimeoutTimestamp(
              math.max(ceilMs(kept.map(_.ts_us).max),
                state.getCurrentWatermarkMs() + 1) + idleTtlMs)
            out.iterator
          } else {
            // idle TTL fired (a timeout that finalized nothing), or
            // nothing worth carrying
            state.remove()
            out.iterator
          }
        })
  }

  /** Custom stateful aggregation: running per-user totals via
    * flatMapGroupsWithState (the KeyValueGroupedDataset state API).
    *
    * State is BOUNDED by an event-time TTL (r5 VERDICT): a user idle for
    * `ttl` past the watermark has its state dropped — without this,
    * per-user state grows with lifetime user cardinality and a
    * 100 TB/day stream with unbounded users eventually OOMs the state
    * store. An expired user that reappears simply starts a fresh running
    * total. Batch runs (the equivalence twin) process everything in one
    * group pass — no watermark, no timeout, same totals. */
  def runningUserTotals(spark: SparkSession, events: DataFrame,
      watermark: String = "1 hour",
      ttlMs: Long = 24 * 3600 * 1000L): Dataset[UserAgg] = {
    import spark.implicits._
    val streaming = events.isStreaming
    val src = if (streaming) events.withWatermark("ts", watermark) else events
    val timeoutConf =
      if (streaming) GroupStateTimeout.EventTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    src.as[EventRow]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, timeoutConf)(
        (user: Long, rows: Iterator[EventRow], state: GroupState[UserAgg]) => {
          if (state.hasTimedOut) {
            state.remove() // idle past TTL: drop the state, emit nothing
            Iterator.empty
          } else {
            val prev = state.getOption.getOrElse(UserAgg(user, 0L, 0.0))
            var n = prev.events
            var tot = prev.total
            var maxTs = Long.MinValue
            rows.foreach { r =>
              n += 1; tot += r.value
              if (r.ts != null && r.ts.getTime > maxTs) maxTs = r.ts.getTime
            }
            val next = UserAgg(user, n, tot)
            state.update(next)
            // expire when the watermark passes the user's last event + ttl
            if (streaming && maxTs != Long.MinValue)
              state.setTimeoutTimestamp(maxTs + ttlMs)
            Iterator(next)
          }
        })
  }
}
