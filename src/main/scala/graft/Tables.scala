package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated TPC-H-ish corpus (TESTDATA.md).
  *
  * All queries read straight from parquet so Catalyst can push filters and
  * prune columns at the scan (verified via `.explain("formatted")`); nothing
  * is cached driver-side, so the same code paths hold at 100 TB.
  */
object Tables {
  val all: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") loadEvents(spark, dir) else
      spark.read.parquet(s"$dir/$name.parquet")

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's reader rejects
    * ([PARQUET_TYPE_ILLEGAL]). Read it as a nanosecond long
    * (spark.sql.legacy.parquet.nanosAsLong) and truncate to a microsecond
    * TimestampType — the same ns→µs truncation DuckDB applies when casting
    * TIMESTAMP_NS to TIMESTAMP, so oracle comparisons line up.
    */
  private def loadEvents(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val prev = spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    try {
      spark.read.parquet(s"$dir/events.parquet")
        .withColumn("ts",
          // integer div: double division would lose precision at 1e18 ns
          timestamp_micros(expr("ts div 1000")).cast("timestamp_ntz"))
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", v)
      case None => spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    }
  }

  /** Register every table as a temp view (idempotent). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
