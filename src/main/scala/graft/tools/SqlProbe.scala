package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev utility: run ad-hoc SQL against the registered testdata views.
  * Usage: runMain graft.tools.SqlProbe "<sql>" [sfDir] */
object SqlProbe {
  def main(args: Array[String]): Unit = {
    val sql = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", "4").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Tables.registerAll(spark, dir)
    try {
      val df = spark.sql(sql)
      df.show(50, 100)
      println("PROBE_OK")
    } catch { case e: Throwable => println(s"PROBE_FAIL: ${e.toString.take(500)}") }
    spark.stop()
  }
}
