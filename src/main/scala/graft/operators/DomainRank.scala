package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PageRank-style domain authority (Page et al. 1999) — the host-graph
  * ranking web-curation pipelines use as a quality prior (Common Crawl
  * publishes exactly this as its host-level ranks). Fixed-iteration power
  * method with the standard damping + dangling-mass redistribution.
  *
  * Scale shape: each iteration is one edges⋈ranks join (keyed by src —
  * edges and out-degrees are checkpointed once and reused) plus one
  * dst-keyed aggregation; the rank vector is one row per NODE, never per
  * edge. Driver materializations are two scalars per iteration (node
  * count once, dangling mass each round) — bounded like the recursive-CTE
  * fixpoint. Every iteration `localCheckpoint()`s the new rank vector so
  * iteration N's plan does not embed N−1 predecessors (same lineage
  * discipline as [[RecursiveCte]]); at 100 TB the host graph is ~10⁸
  * nodes / ~10¹⁰ edges and each round stays one shuffle-bounded join +
  * agg.
  */
object DomainRank {

  /** Rank `edges` (`src`, `dst` string columns; duplicates allowed — they
    * are weighted as parallel links). Returns (node, rank); ranks sum to
    * 1 across nodes (up to float addition). */
  def pageRank(edges: DataFrame, iterations: Int,
      damping: Double = 0.85): DataFrame = {
    require(iterations >= 0, s"iterations: $iterations")
    val e = edges.select(col("src"), col("dst")).localCheckpoint()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct().localCheckpoint()
    val n = nodes.count()
    require(n > 0, "empty graph")
    val outDeg = e.groupBy(col("src"))
      .agg(count(lit(1)).cast("double").as("deg")).localCheckpoint()
    var ranks = nodes.withColumn("rank", lit(1.0 / n))
    for (_ <- 1 to iterations) {
      // mass parked on dangling nodes (no outlinks) spreads uniformly
      val dangling = ranks.join(outDeg,
          ranks("node") === outDeg("src"), "left_anti")
        .agg(coalesce(sum(col("rank")), lit(0.0))).first().getDouble(0)
      val contribs = e
        .join(ranks, e("src") === ranks("node"))
        .join(outDeg, "src")
        .select(col("dst").as("node"), (col("rank") / col("deg")).as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("in_mass"))
      ranks = nodes.join(contribs, Seq("node"), "left")
        .select(col("node"),
          (lit((1.0 - damping) / n + damping * dangling / n) +
            lit(damping) * coalesce(col("in_mass"), lit(0.0))).as("rank"))
        .localCheckpoint()
    }
    ranks
  }
}
