package graft

import org.scalatest.funsuite.AnyFunSuite

/** Smoke: every declared query runs on sf0.001 and yields rows, and every
  * oracle key points at a real query. (Exact value matching is covered by
  * the DuckDB gate — tools/check_oracles.py — which can't run from sbt.) */
class QueriesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("oracle keys are a subset of query keys") {
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
}
