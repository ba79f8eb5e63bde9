package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.DomainRank

/** PageRank exactness against analytic fixed points and an independent
  * driver-side reference of the same recurrence. */
class DomainRankSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Reference power iteration (plain Scala, same recurrence). */
  private def ref(edges: Seq[(String, String)], iters: Int,
      d: Double = 0.85): Map[String, Double] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val n = nodes.length
    val deg = edges.groupBy(_._1).view.mapValues(_.size.toDouble).toMap
    var r = nodes.map(_ -> 1.0 / n).toMap
    (1 to iters).foreach { _ =>
      val dangling = nodes.filterNot(deg.contains).map(r).sum
      val in = edges.groupBy(_._2).view.mapValues(
        _.map { case (u, _) => r(u) / deg(u) }.sum).toMap
      r = nodes.map(v => v -> ((1.0 - d) / n + d * dangling / n +
        d * in.getOrElse(v, 0.0))).toMap
    }
    r
  }

  private def run(edges: Seq[(String, String)], iters: Int): Map[String, Double] =
    DomainRank.pageRank(edges.toDF("src", "dst"), iters)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap

  test("a cycle stays exactly uniform at any damping horizon") {
    val got = run(Seq("a" -> "b", "b" -> "c", "c" -> "a"), iters = 7)
    got.values.foreach(v => assert(math.abs(v - 1.0 / 3) < 1e-12))
  }

  test("dangling mass redistributes and total mass stays 1") {
    val edges = Seq("a" -> "b") // b is dangling
    (1 to 5).foreach { it =>
      val got = run(edges, it)
      assert(math.abs(got.values.sum - 1.0) < 1e-12)
      val want = ref(edges, it)
      got.foreach { case (k, v) => assert(math.abs(v - want(k)) < 1e-12) }
    }
  }

  test("hub-and-spokes matches the reference recurrence") {
    val edges = Seq("s1" -> "h", "s2" -> "h", "s3" -> "h", "s4" -> "h",
      "h" -> "s1", "h" -> "s2", "h" -> "s3", "h" -> "s4")
    val got = run(edges, 10)
    val want = ref(edges, 10)
    got.foreach { case (k, v) => assert(math.abs(v - want(k)) < 1e-12) }
    assert(got("h") > got("s1")) // the hub accumulates authority
  }

  test("parallel edges weight contributions") {
    val edges = Seq("a" -> "b", "a" -> "b", "a" -> "c")
    val got = run(edges, 3)
    val want = ref(edges, 3)
    got.foreach { case (k, v) => assert(math.abs(v - want(k)) < 1e-12) }
    assert(got("b") > got("c"))
  }
}
