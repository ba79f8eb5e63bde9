package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: headline queries on SPARK_GRAFT_SF_DIR, one JSON line.
  *
  * Uses the noop sink so every operator in the plan actually executes
  * (a bare count() lets Spark skip projections). One JIT warmup pass runs
  * at sf0.001 first so the measured pass isn't dominated by classloading.
  */
object Bench {
  // Headline set: one representative per operator family.
  val headline: Seq[String] = Seq(
    "q01_pricing_summary", // scan + hash agg
    "q02_filter_agg",      // pushed filters
    "q03_join_topk",       // 3-way join + top-k
    "q05_multi_join",      // 6-way join
    "q15_window_rank",     // window ranking
    "q17_window_frames",   // window frames
    "f04_json_funcs",      // JSON extraction
    "s03_session_window",  // session windows
    "m01_query_metrics",   // metrics aggregation
    "p03_dedup_minhash",   // MinHash LSH dedup
    "p06_cosine_topk",     // ANN brute-force baseline
    "p10_quality_score")   // text analysis scan

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def run(name: String, dir: String): Double = {
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        return -1.0
      }
      (System.nanoTime() - t0) / 1e9
    }

    val names = headline.filter(SparkEntry.queries.contains)
    names.foreach(run(_, "/root/testdata/sf0.001")) // JIT/classloader warmup
    // min-of-3 per query: environment noise (GC, page cache, host wobble)
    // inflates individual runs but never deflates them, so the minimum is
    // the stable estimate; the spread (max-min) is emitted per query so a
    // regression outside the noise band is distinguishable from variance
    val runsPerQuery = sys.env.get("SPARK_GRAFT_BENCH_RUNS")
      .flatMap(_.toIntOption).filter(_ >= 1).getOrElse(3)
    val results = names.map { n =>
      val times = (1 to runsPerQuery).map(_ => run(n, sfDir)).filter(_ >= 0)
      if (times.isEmpty) n -> (-1.0, 0.0)
      else n -> (times.min, times.max - times.min)
    }
    val qs = results.map { case (k, (v, _)) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val spreads = results.map { case (k, (_, s)) => "\"" + k + "\":" + f"$s%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2._1).filter(_ >= 0).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"spread":$spreads,"runs":$runsPerQuery,"sf":"$sfDir"}""")
    spark.stop()
  }
}
