package graft.engine

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Path, StandardOpenOption}
import scala.collection.mutable
import scala.collection.immutable.ArraySeq

/** Query-latency metrics (B10-B12), ported from reference
  * pkg/logs/query_metric.go:17-160 / query_log.go / counter.go.
  *
  * Semantics preserved exactly:
  *   - buckets keyed (statement checksum, unix second)
  *   - nearest-rank percentiles: sorted[int(n * p/100)]
  *   - the reference's quirk that LatencyP90 is computed at percentile 95
  *     (query_metric.go:141-145)
  *   - 64-byte binary record: checksum u64 | count u32 | avg,min,max,
  *     p50,p90,p99 f64 | timestamp u32 (little-endian)
  *   - step merging: fold subsequent buckets within `step` seconds into the
  *     first (query_log_controller.go:84-116)
  *   - per-bucket latency storage bounded at 128 slots
  *     (query_metric.go:30 LatencyBufferSize) — we keep count/avg/min/max
  *     exact and reservoir-sample the latencies, so percentiles are exact
  *     for buckets of <=128 samples and statistically representative above
  *   - finished buckets flushed every 5 s (query_log.go:24
  *     QueryLogFlushInterval) to a bounded in-memory metrics table the read
  *     API queries, mirrored as appended 64-byte records on disk
  */
case class QueryMetric(checksum: Long, timestamp: Long, count: Int,
    avg: Double, min: Double, max: Double, p50: Double, p90: Double, p99: Double) {

  def bytes: Array[Byte] = {
    val b = ByteBuffer.allocate(64).order(ByteOrder.LITTLE_ENDIAN)
    b.putLong(checksum); b.putInt(count)
    b.putDouble(avg); b.putDouble(min); b.putDouble(max)
    b.putDouble(p50); b.putDouble(p90); b.putDouble(p99)
    b.putInt(timestamp.toInt)
    b.array()
  }

  /** Combine two buckets (weighted avg, min/max merge, max-of percentiles —
    * mirroring QueryMetric.Combine). */
  def combine(o: QueryMetric): QueryMetric = QueryMetric(
    checksum, timestamp, count + o.count,
    (avg * count + o.avg * o.count) / (count + o.count),
    math.min(min, o.min), math.max(max, o.max),
    math.max(p50, o.p50), math.max(p90, o.p90), math.max(p99, o.p99))
}

object QueryMetric {
  def fromBytes(a: Array[Byte]): QueryMetric = {
    val b = ByteBuffer.wrap(a).order(ByteOrder.LITTLE_ENDIAN)
    val checksum = b.getLong; val count = b.getInt
    val avg = b.getDouble; val min = b.getDouble; val max = b.getDouble
    val p50 = b.getDouble; val p90 = b.getDouble; val p99 = b.getDouble
    val ts = b.getInt.toLong & 0xFFFFFFFFL
    QueryMetric(checksum, ts, count, avg, min, max, p50, p90, p99)
  }

  /** Nearest-rank percentile, reference semantics (sorted[int(n*p/100)],
    * clamped to the last element). */
  def percentile(sorted: IndexedSeq[Double], p: Double): Double = {
    if (sorted.isEmpty) return 0.0
    val idx = (sorted.length * (p / 100.0)).toInt
    sorted(math.min(idx, sorted.length - 1))
  }

  def of(checksum: Long, ts: Long, latencies: Seq[Double]): QueryMetric = {
    val s = latencies.sorted.toIndexedSeq
    QueryMetric(checksum, ts, s.length,
      if (s.isEmpty) 0.0 else s.sum / s.length,
      if (s.isEmpty) 0.0 else s.head,
      if (s.isEmpty) 0.0 else s.last,
      percentile(s, 50), percentile(s, 95), percentile(s, 99))
  }
}

object MetricsStore {
  /** query_metric.go:30 — per-bucket latency slots. */
  val LatencyBufferSize = 128
  /** query_log.go:24 — background flush cadence. */
  val FlushIntervalMillis = 5000L
  /** Bounded statement index (B11); the reference backs its index with an
    * LFU cache over a disk file (query_statement_index.go:22-60). */
  val StatementIndexCapacity = 8192
  /** In-memory finished-metrics table retention (64 B/record → ~6 MB). */
  val FinishedRetention = 100000
  /** Disk-log rotation threshold per (db, branch): when the append log
    * passes this, it rolls to a single `.1` generation (bounding disk at
    * 2x per branch — the reference's log files are time-partitioned and
    * similarly finite). */
  val LogRotateBytes: Long = 16L * 1024 * 1024
  /** Per-minute query counters retained for 24 h. */
  val CounterRetentionMinutes = 1440L
}

/** Bounded metric accumulator + statement index + per-minute counters.
  *
  * Memory is bounded regardless of QPS and polling: live buckets hold at
  * most 128 latency slots each and are drained to `finished` by
  * [[flushFinished]] (driven by the session's 5 s daemon); `finished` is a
  * capped ring; the statement index is an LRU; minute counters expire after
  * 24 h. If `persistDir` is set, finished buckets are also appended as the
  * reference's 64-byte records to `query_metrics_<db>_<branch>.log`.
  */
class MetricsStore(persistDir: Option[Path] = None) {
  import MetricsStore._

  /** Exact count/sum/min/max + Algorithm-R reservoir over the latencies.
    * Deterministic xorshift so tests are reproducible. */
  private final class Bucket(seed: Long) {
    var count = 0L; var sum = 0.0
    var min = Double.PositiveInfinity; var max = Double.NegativeInfinity
    val reservoir = new Array[Double](LatencyBufferSize)
    private var rng = seed | 1L

    def add(lat: Double): Unit = {
      count += 1; sum += lat
      if (lat < min) min = lat
      if (lat > max) max = lat
      if (count <= LatencyBufferSize) reservoir((count - 1).toInt) = lat
      else {
        rng ^= rng << 13; rng ^= rng >>> 7; rng ^= rng << 17
        val j = java.lang.Math.floorMod(rng, count)
        if (j < LatencyBufferSize) reservoir(j.toInt) = lat
      }
    }

    def filled: Int = math.min(count, LatencyBufferSize.toLong).toInt

    def metric(crc: Long, sec: Long): QueryMetric = {
      val s = java.util.Arrays.copyOf(reservoir, filled)
      java.util.Arrays.sort(s)
      val sorted = ArraySeq.unsafeWrapArray(s)
      QueryMetric(crc, sec, count.toInt, sum / count, min, max,
        QueryMetric.percentile(sorted, 50),
        QueryMetric.percentile(sorted, 95),
        QueryMetric.percentile(sorted, 99))
    }
  }

  // live buckets keyed (db, branch, checksum, second)
  private val buckets = mutable.Map[(String, String, Long, Long), Bucket]()
  // finished-metrics table the read API queries; capped ring
  private val finished = mutable.ArrayDeque[(String, String, QueryMetric)]()
  // branches whose persisted log has been recovered into `finished`
  private val recovered = mutable.Set[(String, String)]()
  private val statementIndex = // B11: hash -> SQL, LRU-capped
    new java.util.LinkedHashMap[Long, String](256, 0.75f, true) {
      override def removeEldestEntry(e: java.util.Map.Entry[Long, String]) =
        size() > StatementIndexCapacity
    }
  private val minuteCounts = mutable.Map[(String, String, Long), Long]() // B12

  def record(db: String, branch: String, statement: String,
      latencySec: Double, nowMillis: Long = System.currentTimeMillis()): Unit =
    synchronized {
      val crc = Classifier.checksum(statement)
      val sec = nowMillis / 1000
      buckets.getOrElseUpdate((db, branch, crc, sec),
        new Bucket(crc ^ sec)).add(latencySec)
      if (!statementIndex.containsKey(crc)) statementIndex.put(crc, statement)
      val minute = nowMillis / 60000
      minuteCounts((db, branch, minute)) =
        minuteCounts.getOrElse((db, branch, minute), 0L) + 1
    }

  def statementFor(checksum: Long): Option[String] =
    synchronized(Option(statementIndex.get(checksum)))

  def queryCount(db: String, branch: String, minute: Long): Long =
    synchronized(minuteCounts.getOrElse((db, branch, minute), 0L))

  /** Number of retained latency slots per live bucket — each is <=128 by
    * construction; exposed so specs can assert the bound. */
  def liveBucketSizes: Seq[Int] = synchronized(buckets.values.map(_.filled).toSeq)

  /** Drain buckets for completed seconds (< now) into the finished table +
    * disk log; the 5 s daemon calls this. Returns buckets flushed. */
  def flushFinished(nowMillis: Long = System.currentTimeMillis()): Int =
    synchronized {
      val nowSec = nowMillis / 1000
      val done = buckets.keys.filter(_._4 < nowSec).toSeq
        .sortBy { case (d, b, crc, sec) => (d, b, sec, crc) }
      done.foreach { case k @ (db, br, crc, sec) =>
        val m = buckets.remove(k).get.metric(crc, sec)
        finished += ((db, br, m))
        persist(db, br, m)
      }
      while (finished.length > FinishedRetention) finished.removeHead()
      val minMinute = nowMillis / 60000 - CounterRetentionMinutes
      minuteCounts.keys.filter(_._3 < minMinute).toSeq
        .foreach(minuteCounts.remove)
      done.size
    }

  /** Non-destructive read of one branch's metrics table: finished buckets
    * plus a snapshot of still-open live buckets, ordered (ts, checksum) —
    * what the metrics/query endpoint serves. Pre-restart history is
    * recovered from the branch's persisted log on first access, the way
    * the reference's metrics API reads its persisted log files
    * (pkg/logs/query_log.go:25-48, query_log_controller.go:64-83). */
  def read(db: String, branch: String): Seq[QueryMetric] = {
    ensureRecovered(db, branch)
    // snapshot under the lock, sort outside it: a hot metrics endpoint
    // polling a high-cardinality branch must not stall record() while it
    // sorts thousands of buckets
    val snap = synchronized {
      val fin = finished.collect { case (d, b, m) if d == db && b == branch => m }
      val live = buckets.collect {
        case ((d, b, crc, sec), bk) if d == db && b == branch => bk.metric(crc, sec)
      }
      (fin ++ live).toSeq
    }
    snap.sortBy(m => (m.timestamp, m.checksum))
  }

  /** Load the branch's persisted 64-byte records into `finished` once per
    * store lifetime — restart recovery. Prepended so the capped ring
    * evicts the oldest history first; new appends to the same log only
    * happen after this mark, so recovered and freshly-flushed records
    * never duplicate. File IO runs outside the store lock (except when
    * reached re-entrantly from a flush, which happens at most once per
    * branch). */
  private def ensureRecovered(db: String, branch: String): Unit = {
    if (persistDir.isEmpty) return
    val need = synchronized { !recovered.contains((db, branch)) }
    if (!need) return
    val recs = readPersisted(db, branch)
    synchronized {
      if (recovered.add((db, branch)) && recs.nonEmpty) {
        finished.prependAll(recs.map(m => (db, branch, m)))
        while (finished.length > FinishedRetention) finished.removeHead()
      }
    }
  }

  /** Parse a branch's rotated + current log generations (oldest first). */
  private def readPersisted(db: String, branch: String): Seq[QueryMetric] =
    persistDir.toSeq.flatMap { dir =>
      val f = logFile(dir, db, branch)
      Seq(f.resolveSibling(f.getFileName.toString + ".1"), f)
        .filter(Files.exists(_))
        .flatMap { p =>
          try {
            val bytes = Files.readAllBytes(p)
            (0 until bytes.length / 64).map(i => QueryMetric.fromBytes(
              java.util.Arrays.copyOfRange(bytes, i * 64, i * 64 + 64)))
          } catch { case _: java.io.IOException => Nil }
        }
    }

  private def logFile(dir: Path, db: String, branch: String): Path = {
    val enc = (s: String) =>
      java.net.URLEncoder.encode(s, "UTF-8").replace("*", "%2A")
    dir.resolve(s"query_metrics_${enc(db)}_${enc(branch)}.log")
  }

  /** Drain everything (live + finished) ordered by (ts, checksum) — used by
    * tests/tools that want a full deterministic dump. */
  def flush(): Seq[QueryMetric] = synchronized {
    val live = buckets.toSeq.map { case ((_, _, crc, sec), bk) => bk.metric(crc, sec) }
    val fin = finished.toSeq.map(_._3)
    buckets.clear(); finished.clear()
    (fin ++ live).sortBy(m => (m.timestamp, m.checksum))
  }

  private def persist(db: String, branch: String, m: QueryMetric): Unit =
    persistDir.foreach { dir =>
      // recover BEFORE the first append: pre-restart records must land in
      // `finished` exactly once, never re-read after we extend the log
      ensureRecovered(db, branch)
      try {
        Files.createDirectories(dir)
        val f = logFile(dir, db, branch)
        if (Files.exists(f) && Files.size(f) >= LogRotateBytes)
          Files.move(f, f.resolveSibling(f.getFileName.toString + ".1"),
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        Files.write(f, m.bytes, StandardOpenOption.CREATE, StandardOpenOption.APPEND)
      } catch { case _: java.io.IOException => () }
    }

  /** Merge per-second metrics into `step`-second buckets (the read API's
    * combineQueryMeticsByStep, including step=1 passthrough). */
  def combineByStep(metrics: Seq[QueryMetric], step: Long): Seq[QueryMetric] = {
    if (step == 1 || metrics.isEmpty) return metrics
    val out = mutable.ArrayBuffer[QueryMetric]()
    var cur = metrics.head
    metrics.tail.foreach { m =>
      if (m.timestamp >= cur.timestamp + step) { out += cur; cur = m }
      else cur = cur.combine(m)
    }
    out += cur
    out.toSeq
  }
}
