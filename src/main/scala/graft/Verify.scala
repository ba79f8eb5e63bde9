package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {

  /** Dump one query's result to `outDir/name` as parquet. On failure the
    * entry becomes a loud sentinel dir holding only `_ERROR` (any stale
    * parquet from a previous run is cleared first), so a broken entry
    * shows up as an artifact the driver/judge can count — never as a
    * silently-missing key (the r6 failure mode: 17 broken entries simply
    * vanished from the correctness JSON). Returns true on success. */
  def dumpOne(spark: SparkSession, name: String,
      fn: (SparkSession, String) => DataFrame,
      sfDir: String, outDir: String): Boolean =
    try {
      fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      true
    } catch { case e: Throwable =>
      System.err.println(s"[verify] $name failed: ${e.getMessage}")
      val d = Paths.get(outDir, name)
      try {
        def rm(p: java.nio.file.Path): Unit = {
          if (Files.isDirectory(p))
            Files.list(p).forEach(c => rm(c))
          Files.deleteIfExists(p)
        }
        rm(d)
        Files.createDirectories(d)
        Files.writeString(d.resolve("_ERROR"), s"$name failed: ${e}\n")
      } catch { case w: Throwable =>
        System.err.println(s"[verify] $name: could not write _ERROR: $w")
      }
      false
    }

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    // model-state oracles (p40's merge list) must train on the SAME
    // corpus the entries run against at check time
    graft.queries.Pipeline.oracleDir = sfDir
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val failed = SparkEntry.queries.count { case (name, fn) =>
      !dumpOne(spark, name, fn, sfDir, outDir)
    }
    if (failed > 0)
      System.err.println(s"[verify] $failed of ${SparkEntry.queries.size} " +
        "queries FAILED (see _ERROR sentinels)")
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
