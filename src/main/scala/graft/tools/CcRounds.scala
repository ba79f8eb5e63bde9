package graft.tools

import org.apache.spark.sql.functions._

/** Dev utility: p108's two stages at validation scale with the ROUND
  * COUNT surfaced — the r11 judge ask ("push the heaviest dedup entries
  * to 100×: record rounds-to-converge + worst inflation"). Runs the
  * exact p108 lineage (minHashDedup pairs at 0.5 → star-contraction
  * connected components) via [[graft.operators.Dedup.dupClustersWithRounds]]
  * under the shared [[SkewProbe.Probe]] listener, and prints the CC
  * round count plus cluster-shape stats, so the O(log n) convergence
  * claim is a measured number at 10× and 100×, not an asymptotic
  * argument.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/tmp/sf10_synth SPARK_GRAFT_SKEW_AQE=0 \
  *   runMain graft.tools.CcRounds
  */
object CcRounds {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf1_synth")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SkewProbe.session(cpus)
    val probe = new SkewProbe.Probe(spark, cpus.toInt)

    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val t0 = System.nanoTime()
    val pairs = graft.operators.Dedup
      .minHashDedup(docs, "text", "doc_id", threshold = 0.5)
      .select(col("id_a"), col("id_b"))
    // the CC loop materializes per round inside the call (localCheckpoint
    // lineage cuts), so the probe listener sees every round's stages; the
    // noop save afterwards only re-reads the final checkpointed labels
    var rounds = -1
    var labels: org.apache.spark.sql.DataFrame = null
    probe.run("p108_cc", {
      val (l, r) = graft.operators.Dedup.dupClustersWithRounds(pairs)
      rounds = r; labels = l
      l
    })
    val secs = (System.nanoTime() - t0) / 1e9
    // stats re-read the checkpointed labels — no second CC run
    val stats = labels.groupBy(col("cluster")).count()
      .agg(count(lit(1)), max(col("count")), sum(col("count"))).head()
    println(f"CC dir=$dir rounds=$rounds wall_total=$secs%.1fs " +
      s"clusters=${stats.getLong(0)} largest=${stats.getLong(1)} " +
      s"clustered_docs=${stats.getLong(2)}")
    spark.stop()
  }
}
