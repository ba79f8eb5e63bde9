package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev utility: the f09 multi-distinct A/B the r18 verdict asked for
  * (ask #8) — Spark's canonical Expand plan (what f09 declares: one
  * pass, rows multiplied 4× through an Expand, grouped twice) versus
  * the agg-per-distinct rewrite (one plain agg + three pre-distinct
  * aggs joined back). Asserts the two produce identical rows, then
  * times both (warmup + min-of-5, noop sink) at SPARK_GRAFT_SF_DIR and
  * at an in-memory 10× blow-up of lineitem (same distinct
  * cardinalities, 10× row volume — the regime where the Expand's 4×
  * row multiplication should hurt most if it ever does).
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  *   runMain graft.tools.DistinctAggProbe
  */
object DistinctAggProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def expand(li: DataFrame): DataFrame = li
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_suppkey")).as("n_supp"),
        countDistinct(col("l_partkey"), col("l_suppkey")).as("n_part_supp"),
        sum_distinct(col("l_quantity").cast("decimal(18,2)")).cast("double")
          .as("sum_dist_qty"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"))

    def perDistinct(li: DataFrame): DataFrame = {
      val rf = col("l_returnflag")
      val plain = li.groupBy(rf).agg(count(lit(1)).as("n"))
      val supp = li.select(rf, col("l_suppkey")).distinct()
        .groupBy(rf).agg(count(lit(1)).as("n_supp"))
      val partSupp = li.select(rf, col("l_partkey"), col("l_suppkey"))
        .distinct().groupBy(rf).agg(count(lit(1)).as("n_part_supp"))
      val qty = li.select(rf, col("l_quantity").cast("decimal(18,2)")
          .as("q")).distinct()
        .groupBy(rf).agg(sum(col("q")).cast("double").as("sum_dist_qty"))
      plain.join(supp, Seq("l_returnflag")).join(partSupp, Seq("l_returnflag"))
        .join(qty, Seq("l_returnflag"))
        .select(col("l_returnflag"), col("n_supp"), col("n_part_supp"),
          col("sum_dist_qty"), col("n"))
        .orderBy(col("l_returnflag"))
    }

    def time(label: String, df: => DataFrame): Double = {
      def once(): Double = {
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      once() // warmup
      val best = (1 to 5).map(_ => once()).min
      println(f"F09AB $label%-28s min=$best%.3f s")
      best
    }

    val li01 = graft.Tables.load(spark, dir, "lineitem")
    // result identity first — the rewrite is only interesting if exact
    val a = expand(li01).collect().map(_.toSeq)
    val b = perDistinct(li01).collect().map(_.toSeq)
    require(a.toSeq == b.toSeq, "rewrite diverged from the Expand plan")
    println("F09AB results identical")

    time("expand@sf", expand(li01))
    time("per-distinct@sf", perDistinct(li01))

    // 10× volume, same distinct sets: cross with a 10-copy range and
    // keep the original columns (duplicated rows collapse in every
    // distinct; the plain count scales 10×)
    val li10 = li01.crossJoin(spark.range(10).toDF("__c"))
      .drop("__c").localCheckpoint()
    time("expand@10x", expand(li10))
    time("per-distinct@10x", perDistinct(li10))
    spark.stop()
  }
}
