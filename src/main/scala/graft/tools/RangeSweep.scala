package graft.tools

import org.apache.spark.sql.functions._

/** Dev utility: bucket-width sensitivity sweep for the binned range
  * join ([[graft.operators.RangeJoin]]) on the Synth10x interleaved
  * events corpus — the s05 sweep's methodology applied to s06/s07
  * (width is the one knob the operator exposes; the sweep either finds
  * a better default or pins the current one).
  *
  * For each width it reports, per variant, the SKEW line (wall +
  * worst-task makespan inflation via the shared [[SkewProbe.Probe]])
  * plus the two quantities the width trades off: interval REPLICATION
  * (exploded rows vs raw intervals) and per-bucket candidate DENSITY
  * (the hottest bucket's candidate count — the bound on what one join
  * task must cross-pair).
  *
  * Usage: SPARK_GRAFT_SF_DIR=/tmp/sf1_synth SPARK_GRAFT_SKEW_AQE=0 \
  *   runMain graft.tools.RangeSweep [width...]  (defaults 150 600 3600 14400)
  */
object RangeSweep {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf1_synth")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val widths = if (args.nonEmpty) args.toSeq.map(_.toLong)
      else Seq(150L, 600L, 3600L, 14400L)
    val spark = SkewProbe.session(cpus)
    // At probe scale the static planner BROADCASTS the exploded interval
    // side and the join never shuffles (first sweep run: heavy_stages=0
    // across every width). That plan is fine but probes nothing; at
    // 100 TB both sides exceed any broadcast threshold and the shuffled
    // bucket equi-join is what executes — so the sweep measures THAT
    // shape, the same static-plan argument as the 10x SkewProbe table.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val probe = new SkewProbe.Probe(spark, cpus.toInt)

    val ev = graft.Tables.load(spark, dir, "events")
    val errWins = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("error_id"), col("ts").as("w_start"),
        (col("ts") + expr("INTERVAL 10 MINUTES")).as("w_end"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("ts").as("p_ts"))
    val signupWins = ev.filter(col("event_type") === "signup")
      .select(col("event_id").as("signup_id"), col("ts").as("s_start"),
        (col("ts") + expr("INTERVAL 15 MINUTES")).as("s_end"))

    widths.foreach { w =>
      // shape stats outside the timing: replication factor and hottest
      // bucket's candidate count (interval copies + points landing there)
      def bk(c: org.apache.spark.sql.Column) =
        floor(unix_timestamp(c) / w).cast("long")
      val ivb = errWins.select(explode(sequence(bk(col("w_start")),
        bk(col("w_end")))).as("bk"))
      val ptb = purchases.select(bk(col("p_ts")).as("bk"))
      val buckets = ivb.unionByName(ptb).groupBy(col("bk")).count()
      val Array(nExploded, maxBucket) = Array(
        ivb.count(), buckets.agg(max(col("count"))).head().getLong(0))
      println(s"RANGE width=${w}s exploded_interval_rows=$nExploded " +
        s"hottest_bucket_candidates=$maxBucket")
      def p = graft.operators.RangeJoin.pointInInterval(
        purchases, errWins, "p_ts", "w_start", "w_end", bucket = w)
      p.write.format("noop").mode("overwrite").save() // warmup, untimed
      probe.run(s"s06_w$w", p)
      def o = graft.operators.RangeJoin.intervalOverlap(errWins, signupWins,
        "w_start", "w_end", "s_start", "s_end", bucket = w)
      o.write.format("noop").mode("overwrite").save()
      probe.run(s"s07_w$w", o)
    }
    spark.stop()
  }
}
