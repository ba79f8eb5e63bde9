package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev utility: dump formatted plans for headline queries and flag
  * scan-efficiency problems (missing pushdown, over-wide ReadSchema,
  * unexpected shuffle/broadcast choices). */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    // -x: execute each query and dump the FINAL adaptive plan too — the
    // only way to see whether AQE actually reused an exchange (the static
    // plan always shows duplicated subtrees; reuse happens at runtime).
    val execute = args.contains("-x")
    val named = args.filterNot(_ == "-x")
    val names = if (named.nonEmpty) named.toSeq else graft.Bench.headline
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      val df = graft.SparkEntry.queries(n)(spark, dir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      // print scan lines + operator tree head
      plan.linesIterator.foreach { l =>
        val t = l.trim
        if (t.matches("^\\(\\d+\\).*") || t.startsWith("PushedFilters") ||
          t.startsWith("ReadSchema") || t.startsWith("Location") ||
          t.contains("Exchange") || t.contains("Broadcast"))
          println(l.take(200))
      }
      if (execute) {
        // execute THIS QueryExecution (a .write would plan a separate one,
        // leaving df's adaptive plan un-finalized)
        df.queryExecution.toRdd.foreach(_ => ())
        println("---- final adaptive plan (executed) ----")
        df.queryExecution.executedPlan.toString.linesIterator.foreach { l =>
          val t = l.trim
          if (t.contains("Reused") || t.contains("Exchange") ||
            t.contains("QueryStage") || t.contains("Scan parquet"))
            println(l.take(200))
        }
      }
    }
    spark.stop()
  }
}
