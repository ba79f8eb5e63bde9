package graft.tools
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
/** Ad-hoc: dump selected SparkEntry queries for a local oracle check.
  * Also writes `oracle_sql.json` holding exactly the selected entries'
  * COMPILED oracle strings, so the fast single-entry loop runs
  * check_oracles.py against the real SQL — hand-copying oracle text into
  * a scratch JSON is a drift channel (the local gate would silently test
  * something other than what ships). */
object RunOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0); val outDir = args(1); val names = args.drop(2)
    // model-state oracles (p40) train on the dir under check
    graft.queries.Pipeline.oracleDir = sfDir
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      graft.Verify.dumpOne(spark, n, graft.SparkEntry.queries(n), sfDir, outDir)
    }
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // LOUDLY name any requested entry with no oracle: a typo'd oracles-map
    // key would otherwise make check_oracles pass vacuously (it only
    // value-checks names present in this JSON). The one genuine rows-only
    // entry (m03, the approx sketch) also lands here — the warning says
    // which case.
    names.filterNot(graft.SparkEntry.oracleSql.contains).foreach { n =>
      System.err.println(s"[runone] WARNING: '$n' has no oracleSql entry — " +
        "check_oracles will report it ROWS-ONLY, not value-check it. " +
        "If this entry is supposed to be hash-matched, the oracles-map key " +
        "is missing or typo'd.")
    }
    val json = graft.SparkEntry.oracleSql.view
      .filterKeys(names.contains).toMap
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
