package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev utility: synthesize the 10x-scale documents table the at-scale
  * SkewProbe runs validate against (SCALE.md "Heavy-dedup validation at
  * 10x"), since the driver generates testdata only up to sf0.1. r9 built
  * this ad hoc in /tmp and the recipe was lost with the box — this main
  * IS the recipe now, committed, so the SCALE.md table is reproducible.
  *
  * Shape (unchanged from the r9 description): every sf0.1 doc is
  * replicated 10x with shifted ids; every 7th ORIGINAL doc is kept
  * VERBATIM across all 10 copies (10-member exact/near-dup groups — the
  * boilerplate-heavy shape that stresses dedup joins); every other copy
  * is perturbed with a unique tail token so it is near- but not
  * exact-duplicate.
  *
  * Usage: runMain graft.tools.Synth10x [srcSfDir [outDir [copies [tables]]]]
  *   (defaults /root/testdata/sf0.1 -> /tmp/sf1_synth, 10 copies, all
  *   three tables)
  * Then: SPARK_GRAFT_SF_DIR=<outDir> runMain graft.tools.SkewProbe ...
  *
  * `copies` scales the replication (r12: copies=100 builds the ~500k-doc
  * corpus the 100x p03/p108 probes run on — same dup-group shape, every
  * 7th seed doc now a 100-member exact-dup group). CAVEAT when
  * copies * shift > 100000 (shift ≈ 5k at sf0.1, so roughly copies>20):
  * the id space grows past 100000, which collides with p92's synthesized
  * quote-doc ids (doc_id + 100000, behind its loud collision guard) — a
  * 100x corpus is for the dedup/CC probes, not for p92. `tables` is a
  * comma list (default all) so a documents-only 100x build doesn't pay
  * for 10M events.
  */
object Synth10x {
  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("/tmp/sf1_synth")
    val nCopies = args.lift(2).map(_.toInt).getOrElse(10)
    val tables = args.lift(3).getOrElse("documents,embeddings,events")
      .split(",").map(_.trim).toSet
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val copies = spark.range(nCopies).toDF("copy")
    if (tables("documents")) {
      val docs = spark.read.parquet(s"$src/documents.parquet")
      // COMPACT id shift per copy — (max id + 1), not a huge constant:
      // some entries synthesize companion rows at doc_id + 100000 behind
      // a loud collision guard (p92's quote docs), so the DEFAULT 10x id
      // space stays inside [0, 10 * (maxId + 1)) ≈ 50k, clear of that
      // range (see the scaladoc caveat for copies > 20); copy 0 keeps
      // the original ids
      val shift = docs.agg(max("doc_id")).head().getLong(0) + 1L
      val tenx = docs.crossJoin(copies)
        .withColumn("new_id", col("doc_id") + col("copy") * shift)
        .withColumn("text",
          when(col("doc_id") % 7 === 0 || col("copy") === 0, col("text"))
            .otherwise(concat(col("text"), lit(" uniqtail"), col("new_id"))))
        .withColumn("doc_id", col("new_id"))
        .withColumn("n_chars", length(col("text")))
        .select("doc_id", "text", "lang", "source", "n_chars")
      tenx.write.mode("overwrite").parquet(s"$out/documents.parquet")
      println(s"SYNTH10X wrote ${spark.read.parquet(s"$out/documents.parquet").count()} docs to $out")
    }

    // embeddings too (p107's input): plain replication with the same
    // compact id shift — vector VALUES can repeat verbatim, the probe
    // measures key distribution, and duplicate vectors are exactly the
    // near-dup-heavy shape the dedup/ANN entries should survive
    if (tables("embeddings")) {
      val emb = spark.read.parquet(s"$src/embeddings.parquet")
      val embShift = emb.agg(max("vec_id")).head().getLong(0) + 1L
      emb.crossJoin(copies)
        .withColumn("vec_id", col("vec_id") + col("copy") * embShift)
        .select("vec_id", "embedding", "label")
        .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
      println(s"SYNTH10X wrote ${spark.read.parquet(s"$out/embeddings.parquet").count()} vecs to $out")
    }

    // events too (r11, for the s05 as-of probe): replication keeping
    // USER IDS UNCHANGED — nx events per user, the hot-timeline shape an
    // as-of/sessionization operator must survive — with ids shifted
    // compactly and each copy's timestamps offset by its copy index
    // seconds so sort order interleaves rather than duplicating instants
    if (tables("events")) {
      val evs = graft.Tables.load(spark, src, "events")
      val evShift = evs.agg(max("event_id")).head().getLong(0) + 1L
      evs.crossJoin(copies)
        .withColumn("event_id", col("event_id") + col("copy") * evShift)
        .withColumn("ts", col("ts") + expr("make_interval(0, 0, 0, 0, 0, 0, copy)"))
        .select("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.mode("overwrite").parquet(s"$out/events.parquet")
      println(s"SYNTH10X wrote ${spark.read.parquet(s"$out/events.parquet").count()} events to $out")
    }
    spark.stop()
  }
}
