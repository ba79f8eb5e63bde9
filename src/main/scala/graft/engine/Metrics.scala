package graft.engine

import java.nio.{ByteBuffer, ByteOrder}
import scala.collection.mutable

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

/** In-memory metric accumulator + statement index + per-minute counters. */
class MetricsStore {
  private val buckets = mutable.Map[(Long, Long), mutable.ArrayBuffer[Double]]()
  private val statementIndex = mutable.Map[Long, String]() // B11: hash -> SQL
  private val minuteCounts = mutable.Map[(String, String, Long), Long]() // B12

  def record(db: String, branch: String, statement: String,
      latencySec: Double, nowMillis: Long = System.currentTimeMillis()): Unit =
    synchronized {
      val crc = Classifier.checksum(statement)
      val sec = nowMillis / 1000
      buckets.getOrElseUpdate((crc, sec), mutable.ArrayBuffer()) += latencySec
      statementIndex.getOrElseUpdate(crc, statement)
      val minute = nowMillis / 60000
      minuteCounts((db, branch, minute)) =
        minuteCounts.getOrElse((db, branch, minute), 0L) + 1
    }

  def statementFor(checksum: Long): Option[String] =
    synchronized(statementIndex.get(checksum))

  def queryCount(db: String, branch: String, minute: Long): Long =
    synchronized(minuteCounts.getOrElse((db, branch, minute), 0L))

  /** Flush all buckets to finished metrics, ordered by (ts, checksum). */
  def flush(): Seq[QueryMetric] = synchronized {
    val out = buckets.toSeq.sortBy { case ((crc, sec), _) => (sec, crc) }
      .map { case ((crc, sec), lats) => QueryMetric.of(crc, sec, lats.toSeq) }
    buckets.clear()
    out
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
