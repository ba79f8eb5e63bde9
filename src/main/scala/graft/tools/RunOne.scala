package graft.tools
import org.apache.spark.sql.SparkSession
/** Ad-hoc: dump selected SparkEntry queries for a local oracle check. */
object RunOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0); val outDir = args(1); val names = args.drop(2)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      graft.Verify.dumpOne(spark, n, graft.SparkEntry.queries(n), sfDir, outDir)
    }
    spark.stop()
  }
}
