package graft.tools

import org.apache.spark.sql.functions._

/** Dev utility: bucket-width sensitivity sweep for the skew-bucketed
  * as-of join ([[graft.operators.Asof.joinBucketed]]) on the Synth10x
  * hot-timeline corpus — the r11 judge ask (SCALE.md's 1.30 was the 10x
  * table's worst row; width is the knob the operator exposes, so the
  * sweep either finds a better default or pins 1.30 as the knee).
  *
  * For each width it reports the SKEW line (wall + worst-task makespan
  * inflation via the shared [[SkewProbe.Probe]] methodology) plus the
  * carry-table size |distinct (key, bucket)| and the hottest
  * (key, bucket) cell's row count — the two quantities the width
  * trades off (parallelism bound vs second-pass size).
  *
  * Usage: SPARK_GRAFT_SF_DIR=/tmp/sf1_synth SPARK_GRAFT_SKEW_AQE=0 \
  *   runMain graft.tools.AsofSweep [width...]   (defaults 900 3600 14400 86400)
  */
object AsofSweep {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf1_synth")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val widths = if (args.nonEmpty) args.toSeq.map(_.toLong)
      else Seq(900L, 3600L, 14400L, 86400L)
    val spark = SkewProbe.session(cpus)
    val probe = new SkewProbe.Probe(spark, cpus.toInt)

    val ev = graft.Tables.load(spark, dir, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id").as("purchase_id"))

    widths.foreach { w =>
      // cell-shape stats first (cheap aggregations, outside the timing):
      // carry-table rows = |distinct (key, bucket)| over BOTH sides;
      // hottest cell = the one task's row bound in pass 1
      val cells = clicks.select(col("user_id"), col("ts"))
        .unionByName(purchases.select(col("user_id"), col("ts")))
        .groupBy(col("user_id"), floor(unix_timestamp(col("ts")) / w).as("bk"))
        .count()
      val Array(nCells, maxCell) = cells
        .agg(count(lit(1)), max(col("count"))).head()
        .toSeq.map(_.toString.toLong).toArray
      println(s"ASOF width=${w}s carry_rows=$nCells hottest_cell=$maxCell")
      // one untimed warmup per width (page cache + codegen for this exact
      // plan), then the probed run — matching the bench's warmup rule
      def df = graft.operators.Asof.joinBucketed(purchases, clicks,
        "user_id", "ts", "event_id", carry = Seq("event_id", "ts"), bucket = w)
      df.write.format("noop").mode("overwrite").save()
      probe.run(s"s05_w$w", df)
    }
    spark.stop()
  }
}
