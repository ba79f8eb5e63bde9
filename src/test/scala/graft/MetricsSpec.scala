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
}
