package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.{MetricsStore, QueryMetric}

/** Query-metric semantics ported from pkg/logs/query_metric.go. */
class MetricsSpec extends AnyFunSuite {

  test("nearest-rank percentile: sorted[int(n*p/100)], p90 quirk at 95") {
    val lats = Seq(5.0, 1.0, 3.0, 2.0, 4.0)
    val m = QueryMetric.of(42L, 1000L, lats)
    // sorted: 1 2 3 4 5; idx p50 = int(5*0.5)=2 -> 3.0
    assert(m.p50 == 3.0)
    // reference computes "p90" at percentile 95: idx int(5*0.95)=4 -> 5.0
    assert(m.p90 == 5.0)
    assert(m.p99 == 5.0)
    assert(m.min == 1.0 && m.max == 5.0 && m.count == 5)
    assert(math.abs(m.avg - 3.0) < 1e-12)
  }

  test("64-byte binary record round trip") {
    val m = QueryMetric(0xDEADBEEFL, 1700000000L, 7, 1.5, 0.25, 9.75, 1.0, 8.0, 9.5)
    val b = m.bytes
    assert(b.length == 64)
    assert(QueryMetric.fromBytes(b) == m)
  }

  test("combineByStep folds buckets within the step window") {
    val ms = Seq(
      QueryMetric(1, 100, 1, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0),
      QueryMetric(1, 101, 1, 3.0, 3.0, 3.0, 3.0, 3.0, 3.0),
      QueryMetric(1, 110, 1, 5.0, 5.0, 5.0, 5.0, 5.0, 5.0))
    val store = new MetricsStore
    val combined = store.combineByStep(ms, 10)
    assert(combined.length == 2)
    assert(combined.head.count == 2 && combined.head.avg == 2.0)
    assert(combined.head.min == 1.0 && combined.head.max == 3.0)
    assert(combined(1).timestamp == 110)
    // step=1 passthrough
    assert(store.combineByStep(ms, 1) == ms)
  }

  test("store buckets by (statement, second) and indexes statements") {
    val store = new MetricsStore
    store.record("db", "main", "SELECT 1", 0.010, 5_000L)
    store.record("db", "main", "SELECT 1", 0.020, 5_500L)
    store.record("db", "main", "SELECT 2", 0.030, 5_600L)
    val out = store.flush()
    assert(out.length == 2)
    val m1 = out.find(_.count == 2).get
    assert(m1.timestamp == 5L)
    assert(math.abs(m1.avg - 0.015) < 1e-12)
    assert(store.queryCount("db", "main", 0L) == 3)
    assert(store.flush().isEmpty)
  }

  test("memory bounded under 100k records of one hot statement") {
    val store = new MetricsStore
    val n = 100000
    var i = 0
    while (i < n) {
      // all in one (statement, second) bucket — the hot-statement worst case
      store.record("db", "main", "SELECT hot FROM t", (i % 997) / 1000.0, 42_000L)
      i += 1
    }
    // live latency storage is capped at the reference's 128 slots
    // (query_metric.go:30), regardless of how many records arrived
    assert(store.liveBucketSizes == Seq(128))
    val m = store.read("db", "main")
    assert(m.length == 1)
    assert(m.head.count == n)              // count/avg/min/max stay exact
    assert(m.head.min == 0.0 && m.head.max == 0.996)
    assert(math.abs(m.head.avg - (0 until n).map(j => (j % 997) / 1000.0).sum / n) < 1e-9)
    assert(m.head.p50 > 0.0 && m.head.p50 <= m.head.p99) // sampled, plausible
  }

  test("percentiles unchanged for buckets of <=128 samples") {
    val store = new MetricsStore
    val lats = (1 to 100).map(i => (i * 37 % 100 + 1) / 100.0)
    lats.foreach(l => store.record("db", "main", "SELECT x", l, 9_000L))
    val got = store.read("db", "main").head
    val want = QueryMetric.of(graft.engine.Classifier.checksum("SELECT x"), 9L, lats)
    // avg differs only by float summation order (sorted vs arrival)
    assert(math.abs(got.avg - want.avg) < 1e-12)
    assert(got.copy(avg = 0) == want.copy(avg = 0))
  }

  test("flushFinished drains completed seconds to the finished table") {
    val store = new MetricsStore
    store.record("db", "main", "SELECT a", 0.010, 1_000L)
    store.record("db", "main", "SELECT a", 0.020, 2_000L)
    // second 1 is finished at now=2s; second 2 is still open
    assert(store.flushFinished(2_000L) == 1)
    assert(store.liveBucketSizes.length == 1)
    // read() merges finished + live, and is non-destructive
    assert(store.read("db", "main").length == 2)
    assert(store.read("db", "main").length == 2)
    assert(store.read("db", "other").isEmpty)
    // expired minute counters are swept after the 24h retention window
    assert(store.flushFinished(1_000L * 60 * 60 * 48) == 1)
    assert(store.queryCount("db", "main", 0L) == 0)
  }

  test("finished metrics persist as 64-byte records on disk") {
    val dir = java.nio.file.Files.createTempDirectory("graft-metrics")
    val store = new MetricsStore(Some(dir))
    store.record("db", "main", "SELECT a", 0.010, 1_000L)
    store.record("db", "main", "SELECT b", 0.020, 1_500L)
    store.flushFinished(2_000L)
    val f = dir.resolve("query_metrics_db_main.log")
    val bytes = java.nio.file.Files.readAllBytes(f)
    assert(bytes.length == 128) // two 64-byte records
    val m0 = QueryMetric.fromBytes(bytes.slice(0, 64))
    val m1 = QueryMetric.fromBytes(bytes.slice(64, 128))
    assert(Seq(m0, m1).map(_.timestamp).toSet == Set(1L))
    assert(Seq(m0, m1).map(_.count).sum == 2)
  }

  test("persisted metrics survive restart: a new store reads the log back") {
    val dir = java.nio.file.Files.createTempDirectory("graft-metrics")
    val store = new MetricsStore(Some(dir))
    store.record("db", "main", "SELECT a", 0.010, 1_000L)
    store.record("db", "main", "SELECT b", 0.020, 1_500L)
    store.record("db", "other", "SELECT c", 0.030, 1_000L)
    store.flushFinished(2_000L)

    // "restart": a fresh store over the same persist dir serves the
    // pre-restart history (reference reads its persisted query logs,
    // pkg/logs/query_log.go:25-48)
    val reborn = new MetricsStore(Some(dir))
    val hist = reborn.read("db", "main")
    assert(hist.length == 2, s"expected 2 recovered records, got $hist")
    assert(hist.map(_.count).sum == 2)
    assert(reborn.read("db", "other").length == 1)
    // recovery is once-only: repeated reads don't re-ingest the log
    assert(reborn.read("db", "main").length == 2)

    // new records after recovery append cleanly and never duplicate the
    // recovered history (persist marks the branch recovered before its
    // first append)
    reborn.record("db", "main", "SELECT a", 0.040, 5_000L)
    reborn.flushFinished(6_000L)
    val merged = reborn.read("db", "main")
    assert(merged.length == 3)
    assert(merged.map(_.timestamp).sorted == Seq(1L, 1L, 5L))

    // and a third incarnation sees everything the second one persisted
    val third = new MetricsStore(Some(dir))
    assert(third.read("db", "main").length == 3)
  }

  test("record() stays correct under a concurrent polling reader") {
    val store = new MetricsStore
    val total = 20000
    val writer = new Thread(() => {
      var i = 0
      while (i < total) {
        // spread across seconds so read() has many buckets to snapshot+sort
        store.record("db", "main", s"SELECT ${i % 50}", 0.001 * (i % 7),
          1_000L + (i % 200) * 1000L)
        i += 1
      }
    })
    writer.start()
    // hammer the read path while the writer runs; read snapshots under the
    // lock and sorts outside it, so neither side can corrupt the other
    var polls = 0
    while (writer.isAlive) { store.read("db", "main"); polls += 1 }
    writer.join()
    assert(polls > 0)
    val all = store.read("db", "main")
    assert(all.map(_.count.toLong).sum == total.toLong)
  }
}
