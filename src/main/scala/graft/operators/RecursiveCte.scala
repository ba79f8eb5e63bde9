package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Recursive-query support (SURVEY §2A row 25, §7.3).
  *
  * Spark 4.x parses WITH RECURSIVE natively; this driver-coordinated
  * fixpoint loop is the portable implementation (and the shape used for
  * iterative graph workloads at scale, where each frontier is a distributed
  * join). Frontiers are localCheckpoint()ed so plan lineage stays bounded
  * across iterations — without it, iteration N's plan embeds all N-1
  * predecessors and the optimizer chokes long before the data does.
  */
object RecursiveCte {

  /** Breadth-first fixpoint: start from `seed`, expand each frontier with
    * `step`, keep first-seen rows only (set semantics on `keyCols`), stop
    * when a frontier is empty or after `maxIter`. Returns all reached rows.
    */
  def fixpoint(seed: DataFrame, step: DataFrame => DataFrame,
      keyCols: Seq[String], maxIter: Int = 50): DataFrame = {
    var seen = seed.localCheckpoint()
    var frontier = seen
    var i = 0
    while (i < maxIter && !frontier.isEmpty) {
      val next = step(frontier)
        .join(seen.select(keyCols.map(col): _*), keyCols, "left_anti")
        .dropDuplicates(keyCols)
        .localCheckpoint()
      seen = seen.unionByName(next).localCheckpoint()
      frontier = next
      i += 1
    }
    seen
  }
}
