package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling and mixture construction for training-data
  * pipelines.
  *
  * Everything here is hash-based, NOT random: a row's fate is a pure
  * function of its key, so samples are reproducible across runs and
  * clusters, stable under joins (the same document is in or out
  * everywhere), and resumable after partial failures — the properties a
  * 100 TB data-mixing job actually needs. Execution is a codegen'd filter:
  * zero shuffle, zero state, fully pushdown-composable; the only exchange
  * in the mixture report is the final tiny aggregation.
  */
object Sampling {

  /** Deterministic sample key in [0x0000, 0xffff]: the first 4 hex digits
    * of md5(key). Hex-string comparison equals numeric comparison at fixed
    * width, and md5 is identical everywhere (engine, oracle, any future
    * system), so thresholds mean the same fraction in every engine. */
  def sampleKey(key: Column): Column = substring(md5(key.cast("string")), 1, 4)

  /** Threshold for `rate` as a 4-hex-digit lower bound: rows with
    * sampleKey < threshold are kept. Granularity 1/65536. Rates >= 1 keep
    * everything (callers skip the filter — "10000" would compare wrong as
    * a string), and the rounded value is clamped to 0xffff so a rate just
    * under 1 can't produce the same 5-digit string. */
  def thresholdHex(rate: Double): String = {
    require(rate >= 0 && rate < 1, s"rate must be in [0, 1): $rate")
    f"${math.min(math.round(rate * 65536), 0xFFFFL)}%04x"
  }

  /** Bernoulli-style deterministic sample: keep ~rate of rows, chosen by
    * key hash. One codegen'd filter, no shuffle, no RNG state. */
  def hashSample(df: DataFrame, keyCol: String, rate: Double): DataFrame =
    if (rate >= 1.0) df
    else df.filter(sampleKey(col(keyCol)) < lit(thresholdHex(rate)))

  /** Leakage-safe train/val/test SPLIT assignment: every member of a
    * dup/near-dup cluster lands in the SAME split — the standard guard
    * against eval leakage through near-duplicates, which survives
    * doc-level dedup (keep-one-per-cluster dedups the corpus, but a
    * random per-DOC split would still put a kept doc in test while its
    * near-twin from another feed lands in train).
    *
    * Composition of two already-proven pieces: [[Dedup.dupClusters]]
    * labels every id mentioned in the near-dup `pairs` table with its
    * connected component's minimum id (the p108 machinery — large-star/
    * small-star + pointer jump, salted, O(log n) rounds), and the split
    * is the deterministic md5 assignment of [[hashSample]] hashed on the
    * CLUSTER REPRESENTATIVE (singletons — docs in no pair — on their own
    * id). Cluster-atomicity is then structural: members share a split
    * key, so they share a split; and the assignment is a pure function
    * of the key, so it is reproducible across runs, engines, and corpus
    * orderings (the md5/4-hex-digit scheme of [[sampleKey]]).
    *
    * `skey < hex(testFrac)` → test, `< hex(testFrac + valFrac)` → val,
    * else train — fractions apply at KEY granularity, so realized doc
    * fractions drift with cluster sizes (a 50-doc cluster moves as one
    * unit; that is the point).
    *
    * Scale shape: the CC runs over the PAIR table (≪ corpus — p108's
    * 10×/100× probes), the label join back to the corpus is keyed by
    * doc id (uniform, AQE-broadcastable when the clustered set is
    * small), and the assignment itself is one codegen'd md5 projection —
    * no shuffle beyond the one id-keyed join. Returns
    * (idCol, split_key, split). */
  def leakageSafeSplits(docs: DataFrame, pairs: DataFrame, idCol: String,
      valFrac: Double, testFrac: Double): DataFrame = {
    // validate BEFORE the CC pass: dupClusters is eager (localCheckpoint
    // + O(log n) rounds), so a bad fraction must not cost the full
    // cluster computation before its IllegalArgumentException fires.
    // dupClusters emits ONE row per id structurally, so this trusted
    // path skips FromLabels' duplicate guard and keeps the documented
    // shuffle budget (one id-keyed join, nothing else)
    validateSplitArgs(docs, valFrac, testFrac)
    splitAssign(docs,
      Dedup.dupClusters(pairs).select(col("id"), col("cluster")),
      idCol, valFrac, testFrac)
  }

  /** [[leakageSafeSplits]] from PREBUILT cluster labels. `labels` is
    * (id, cluster) — the shape [[Dedup.dupClusters]] emits and
    * [[graft.engine.GramArtifactStore.dupClusterLabels]] returns.
    *
    * This public entry takes ARBITRARY caller-built frames (unioned
    * artifact generations, unreduced pair tables), so on top of the
    * id-keyed join + md5 projection it pays ONE WINDOW EXCHANGE over the
    * (small) labels side for the duplicate-label guard below — callers
    * measuring the per-pass split cost should count that exchange in
    * (r14 advice: the earlier scaladoc claimed the one-join budget and
    * understated it). Labels whose provenance the engine itself
    * validated — a store-consumed `dup_clusters` artifact — take
    * [[leakageSafeSplitsFromVettedLabels]] instead, which skips the
    * guard and keeps the true one-join budget. */
  def leakageSafeSplitsFromLabels(docs: DataFrame, labels: DataFrame,
      idCol: String, valFrac: Double, testFrac: Double): DataFrame = {
    validateSplitArgs(docs, valFrac, testFrac)
    // loud in-executor guard (the RangeJoin pattern): a labels frame
    // with two rows for one id would fan the left join out — the doc
    // appears in TWO splits and every realized fraction double-counts,
    // silently. The trusted paths ([[leakageSafeSplits]] over
    // dupClusters output — structurally one row per id — and
    // [[leakageSafeSplitsFromVettedLabels]] for store-validated
    // artifacts) skip it and keep the documented one-join budget.
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("id"))
    val guarded = labels
      .withColumn("__n", count(lit(1)).over(w))
      .select(col("id"),
        when(col("__n") === 1, col("cluster")).otherwise(raise_error(
          concat(lit("leakageSafeSplitsFromLabels: duplicate label rows " +
            "for id "), col("id").cast("string")))).as("cluster"))
    splitAssign(docs, guarded, idCol, valFrac, testFrac)
  }

  /** [[leakageSafeSplitsFromLabels]] WITHOUT the duplicate-label window
    * guard — the deployment split path for labels whose one-row-per-id
    * provenance the ENGINE already vouches for (r15 decision on the r14
    * "p116 guard question": store-sourced labels get the trusted
    * one-join path, because the store's build side writes
    * [[Dedup.dupClusters]] output — structurally one row per id — and
    * its consume side validates name/version/params before returning the
    * frame; the store is the provenance authority the window guard
    * substitutes for). The CC pass runs once per corpus snapshot
    * (persisted as a `dup_clusters` artifact in
    * [[graft.engine.GramArtifactStore]]) and every split pass pays only
    * the one id-keyed label join + the codegen'd md5 projection — no
    * window exchange (plan pinned in PlanShapeSpec).
    *
    * TRUST CONTRACT: pass ONLY frames read back from an engine-built
    * artifact ([[graft.engine.GramArtifactStore.dupClusterLabels]]) or
    * [[Dedup.dupClusters]] output. A hand-edited parquet that smuggles a
    * duplicate id in fans the left join out silently — exactly the
    * failure the guarded entry refuses loudly; when provenance is in any
    * doubt, use [[leakageSafeSplitsFromLabels]]. */
  def leakageSafeSplitsFromVettedLabels(docs: DataFrame, labels: DataFrame,
      idCol: String, valFrac: Double, testFrac: Double): DataFrame = {
    validateSplitArgs(docs, valFrac, testFrac)
    // splitAssign's own first projection selects (id, cluster) — no
    // pre-select needed here
    splitAssign(docs, labels, idCol, valFrac, testFrac)
  }

  /** The split CASE over a 4-hex-digit sample key — ONE definition
    * shared by the batch assignment and the streaming split gate
    * ([[graft.streaming.DocStreams.splitGate]]), so stream and batch
    * cannot drift on what "test"/"val"/"train" mean. */
  private[graft] def splitOf(skey: Column, valFrac: Double,
      testFrac: Double): Column =
    when(skey < lit(thresholdHex(testFrac)), lit("test"))
      .when(skey < lit(thresholdHex(testFrac + valFrac)), lit("val"))
      .otherwise(lit("train"))

  /** The shared join + md5 assignment over VETTED (id, cluster) labels. */
  private def splitAssign(docs: DataFrame, labels: DataFrame,
      idCol: String, valFrac: Double, testFrac: Double): DataFrame = {
    val lbl = labels.select(col("id").as(idCol), col("cluster"))
    val key = coalesce(col("cluster"), col(idCol))
    docs.join(lbl, Seq(idCol), "left")
      .select(col(idCol), key.as("split_key"),
        splitOf(sampleKey(key), valFrac, testFrac).as("split"))
  }

  private[graft] def validateSplitArgs(docs: DataFrame, valFrac: Double,
      testFrac: Double): Unit = {
    require(valFrac >= 0 && testFrac >= 0 && valFrac + testFrac < 1,
      s"need 0 <= valFrac, testFrac and valFrac + testFrac < 1: " +
        s"val=$valFrac test=$testFrac")
    require(!docs.columns.contains("cluster"),
      "docs already carries a 'cluster' column — rename it; " +
        "leakageSafeSplits joins the dup-cluster labels under that name")
  }

  /** Mixture construction: per-source sampling rates (training-data
    * recipes like "20% of crawl, all of books"). One scan, one map-side
    * CASE over the rate table — the rate map is tiny and lives in the
    * plan, not in a join. */
  def sourceMix(df: DataFrame, keyCol: String, sourceCol: String,
      rates: Seq[(String, Double)], defaultRate: Double): DataFrame = {
    val key = sampleKey(col(keyCol))
    val keep = rates.foldLeft(
      when(lit(false), lit(true))) { case (acc, (src, r)) =>
        acc.when(col(sourceCol) === src,
          if (r >= 1.0) lit(true) else key < lit(thresholdHex(r)))
      }.otherwise(
        if (defaultRate >= 1.0) lit(true)
        else key < lit(thresholdHex(defaultRate)))
    df.filter(keep)
  }

  /** Temperature-balanced keep-rates: sampled mass ∝ count^alpha (the
    * multilingual mixture-balancing rule of mT5/XLM-R — alpha < 1 tames
    * head sources so tail languages/domains aren't drowned), anchored so
    * the SMALLEST source keeps everything: rate_s = (c_min/c_s)^(1-alpha).
    * One tiny aggregation + a #sources-row collect (the mixture recipe
    * itself — bounded like the BPE dict). alpha = 0.5 goes through
    * `sqrt`, which is IEEE-correctly-rounded in every engine, so rates
    * and thresholds are bit-reproducible cross-engine; other alphas go
    * through libm `pow` (last-ulp engine-dependent — fine for sampling,
    * not for hash-compared oracles). */
  def temperatureRates(df: DataFrame, sourceCol: String,
      alpha: Double = 0.5): Seq[(String, Double)] = {
    require(alpha >= 0 && alpha <= 1, s"alpha in [0,1]: $alpha")
    val counts = df.groupBy(col(sourceCol)).agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    require(counts.nonEmpty, "empty input")
    val cMin = counts.map(_._2).min.toDouble
    def apow(x: Double): Double =
      if (alpha == 0.5) math.sqrt(x) else math.pow(x, 1.0 - alpha)
    counts.map { case (s, c) => (s, apow(cMin / c)) }.toSeq
  }

  /** Temperature-balanced mixture: [[temperatureRates]] applied through
    * the same deterministic hash filter as [[sourceMix]] — reproducible,
    * join-stable, zero shuffle beyond the one counting aggregation. */
  def temperatureMix(df: DataFrame, keyCol: String, sourceCol: String,
      alpha: Double = 0.5): DataFrame =
    sourceMix(df, keyCol, sourceCol, temperatureRates(df, sourceCol, alpha),
      defaultRate = 1.0)

  /** Token-budget data recipe (the Llama/DoReMi-style mixing step): given
    * target mixture `weights` per source and a total training-token
    * `budgetTokens`, report for each source its corpus token supply, the
    * tokens the recipe wants from it (`target_tokens = weight · budget`),
    * and `epochs = target / supply` — >1 means the source repeats
    * (upsampling), <1 means it is subsampled, for which `sample_rate`
    * gives the [[hashSample]]-ready keep rate (min(1, epochs)).
    *
    * Scale shape: ONE source-keyed aggregation over the corpus (map-side
    * partial sums collapse per-source token counts before the exchange);
    * the weight table is a literal CASE in the plan, not a join; the
    * result is one row per SOURCE. All arithmetic is single IEEE ops on
    * integer-valued inputs, so the report is bit-reproducible in any
    * engine. Sources absent from `weights` get weight 0.0 (excluded by
    * the recipe) but still report their supply; a RECIPE source with no
    * corpus supply (typo, or a feed that went dark) surfaces as a row
    * with n_docs = 0 and epochs = Infinity — loud, never silently
    * dropped (r8 advice). */
  def mixPlan(df: DataFrame, textCol: String, sourceCol: String,
      weights: Map[String, Double], budgetTokens: Long): DataFrame = {
    require(budgetTokens > 0, s"budgetTokens: $budgetTokens")
    val tokens = TextAnalysis.wsTokens(col(textCol))
    // the CASE runs on the post-agg "source" column (one row per source)
    val weight = weights.toSeq.sortBy(_._1).foldLeft(
      when(lit(false), lit(0.0))) { case (acc, (s, w)) =>
        acc.when(col("source") === s, lit(w))
      }.otherwise(lit(0.0))
    // a weighted source with ZERO corpus supply must surface as a report
    // row (epochs = Infinity is the loud signal a recipe author needs),
    // never silently vanish — groupBy alone only yields rows for sources
    // present in df (r8 advice). Sentinel zero-rows for every RECIPE
    // source are unioned BEFORE the one aggregation (n_docs counts only
    // real rows, via the flag), so the plan keeps exactly ONE map-side-
    // combined hash exchange — no second corpus pass, no join (the
    // PlanShapeSpec p89 pin). The recipe is human-written, so the
    // sentinel side is a bounded literal relation.
    val base = df.select(col(sourceCol).as("source"),
      tokens.cast("long").as("__tok"), lit(1L).as("__doc"))
    val withRecipe =
      if (weights.isEmpty) base
      else {
        import df.sparkSession.implicits._
        base.unionByName(weights.keys.toSeq.sorted.toDF("source")
          .select(col("source"), lit(0L).as("__tok"), lit(0L).as("__doc")))
      }
    withRecipe
      .groupBy(col("source"))
      .agg(sum(col("__doc")).as("n_docs"), sum(col("__tok")).as("src_tokens"))
      .withColumn("weight", weight.as("weight"))
      .withColumn("target_tokens",
        col("weight") * lit(budgetTokens).cast("double"))
      // explicit zero-supply branches: ANSI division throws on a zero
      // divisor even for doubles, and Infinity IS the signal we want for
      // a weighted source with no corpus supply
      .withColumn("epochs",
        when(col("src_tokens") > 0,
            col("target_tokens") / col("src_tokens").cast("double"))
          .when(col("target_tokens") > 0, lit(Double.PositiveInfinity))
          .otherwise(lit(0.0)))
      .withColumn("sample_rate", least(lit(1.0), col("epochs")))
  }

  /** Deterministic Gumbel sampling key for importance RESAMPLING — the
    * deployment step of DSIR (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling": sample the corpus
    * ∝ exp(log-weight) by perturbing each log-weight with an independent
    * Gumbel and keeping the largest — the Gumbel-max trick; equivalently
    * the weighted-reservoir keys of Efraimidis & Spirakis 2006). The
    * perturbation is NOT random: u = (h + 0.5) / 2^48 from the first 12
    * hex digits of md5(id) — [[sampleKey]]'s assignment at 48-bit
    * resolution — so key = logWeight - ln(-ln(u)) is a pure function of
    * (id, weight): a doc draws the SAME Gumbel across runs, engines,
    * partitionings and resumed jobs, which is what makes the resample
    * reproducible and oracle-replayable, exactly like [[hashSample]]'s
    * thresholds. The +0.5 keeps u strictly interior to (0,1): an all-f
    * hash would otherwise hit u = 1 and ln(0), which Spark NULLs and
    * other engines take to -inf — an engine-divergent edge this
    * arithmetic never reaches. h + 0.5 and the power-of-two division
    * are exact IEEE, so u is bit-identical in any engine; the only libm
    * ops are the two lns, applied to identical inputs everywhere — their
    * RESULTS may differ in the last ulp across libms (even across JVM
    * call sites: HotSpot's log intrinsic vs the StrictMath fallback),
    * which is why consumers compare keys at round(6) and select against
    * generic thresholds a 1-ulp nudge cannot cross. */
  def gumbelKey(id: Column, logWeight: Column): Column = {
    val h = conv(substring(md5(id.cast("string")), 1, 12), 16, 10)
      .cast("long")
    val u = (h.cast("double") + lit(0.5)) / lit(281474976710656.0) // 2^48
    logWeight - log(-log(u))
  }

  /** Importance resampling by computed per-source THRESHOLD: keep row i
    * iff [[gumbelKey]](id_i, lw_i) > ln(n_s / k), n_s the source's pool
    * size — the threshold form of Gumbel sampling (the top-k form needs
    * per-source selection state; the threshold form is one codegen'd
    * predicate). Inclusion is independent per doc and monotone in the
    * weight: P(keep) = 1 - exp(-exp(lw_i) · k/n_s) ≈ exp(lw_i) · k/n_s
    * in the sparse regime — a deterministic Poisson resample expecting
    * ~k · mean(exp(lw)) survivors per source, so k is the per-source
    * volume knob the way `rate` is [[hashSample]]'s.
    *
    * Scale shape: ONE tiny per-source count aggregation (map-side
    * partials, #sources rows) broadcast-joined back, then a scan-speed
    * filter — no corpus-wide window, no top-k selection state, no
    * shuffle of the corpus itself; the kept set is stable under
    * re-partitioning and incremental re-runs because every term of the
    * key is a pure function of the row.
    *
    * Determinism caveat the caller owns: the key inherits `lwCol`'s
    * reproducibility. A log-weight built from single IEEE ops on
    * integer-valued inputs (counts, hit fractions) replays bitwise in
    * any engine; the full avg_nll-based DSIR log-weight sums libm logs
    * in reduction order and is NOT cross-engine replayable — fine for
    * deployment, not for a hash-compared oracle (the
    * [[graft.operators.TextAnalysis.lmScore]] avg_nll rule). Adds
    * `gumbel_key`; keeps every input column. */
  def importanceResample(df: DataFrame, idCol: String, lwCol: String,
      sourceCol: String, targetPerSource: Int): DataFrame = {
    require(targetPerSource >= 1, s"targetPerSource: $targetPerSource")
    val ns = df.groupBy(col(sourceCol)).agg(count(lit(1)).as("__ns"))
    df.withColumn("gumbel_key", gumbelKey(col(idCol), col(lwCol)))
      .join(broadcast(ns), Seq(sourceCol))
      .filter(col("gumbel_key") >
        log(col("__ns").cast("double") / lit(targetPerSource.toDouble)))
      .drop("__ns")
  }

  /** Train/eval contamination check (the standard pre-training hygiene
    * pass): a training document is contaminated by an eval document when
    * they share at least one word n-gram — the 13-gram-overlap criterion
    * benchmark decontamination commonly uses. The eval side is small by
    * construction, so its (distinct) grams broadcast — the 100 TB
    * training side is a single scan + explode with a map-side hash probe;
    * the only shuffle is the final aggregation, keyed by hit pairs, not by
    * corpus size. Returns (train_id, eval_id, shared_grams). */
  def contamination(train: DataFrame, eval: DataFrame,
      textCol: String, idCol: String, n: Int = 13): DataFrame = {
    val tg = Dedup.wordShingles(train, textCol, idCol, n)
      .withColumnRenamed("id", "train_id")
    val eg = Dedup.wordShingles(eval, textCol, idCol, n)
      .withColumnRenamed("id", "eval_id")
    tg.join(broadcast(eg), "gram")
      .groupBy(col("train_id"), col("eval_id"))
      .agg(count(lit(1)).as("shared_grams"))
  }

  /** [[contamination]] for when the eval gram set is too big to broadcast
    * as a hash relation but fits as a BLOOM FILTER (the mid-size regime:
    * ~10M+ distinct eval grams ≈ GBs as strings, but ~1.2 MB per million
    * items at 1% fpp as a bloom). Plan: build the bloom over eval grams
    * (two bounded jobs on the SMALL side only), probe it map-side over the
    * 100 TB training scan — ~99% of training grams die before any
    * shuffle — then confirm survivors with an exact shuffle join, which
    * also removes every bloom false positive. Result is therefore
    * IDENTICAL to [[contamination]] (same oracle); only the physical plan
    * differs. The probe is a Scala UDF by necessity (the sketch lives in
    * spark-sketch, not in any codegen'd expression) — acceptable off the
    * exactness path since FPs only cost a little extra join input. */
  def contaminationBloom(train: DataFrame, eval: DataFrame,
      textCol: String, idCol: String, n: Int = 13,
      fpp: Double = 0.01): DataFrame = {
    val spark = train.sparkSession
    val tg = Dedup.wordShingles(train, textCol, idCol, n)
      .withColumnRenamed("id", "train_id")
    val eg = Dedup.wordShingles(eval, textCol, idCol, n)
      .withColumnRenamed("id", "eval_id")
    val egrams = eg.select(col("gram")).distinct()
    // expectedNumItems from an exact count of the small side; a cluster
    // job would use catalog stats instead of a count job
    val nGrams = math.max(1L, egrams.count())
    val bf = egrams.stat.bloomFilter("gram", nGrams, fpp)
    val bytes = {
      val b = new java.io.ByteArrayOutputStream()
      bf.writeTo(b); b.toByteArray
    }
    // ship the serialized sketch once per executor, not per task closure
    val bc = spark.sparkContext.broadcast(bytes)
    val might = udf(new BloomProbe(bc))
    tg.filter(might(col("gram")))
      .join(eg, "gram") // exact confirm: kills bloom false positives
      .groupBy(col("train_id"), col("eval_id"))
      .agg(count(lit(1)).as("shared_grams"))
  }
}

/** Deserialize the broadcast sketch once per executor (transient lazy),
  * not per row. */
private final class BloomProbe(
    bc: org.apache.spark.broadcast.Broadcast[Array[Byte]])
  extends (String => Boolean) with Serializable {
  @transient private lazy val bf =
    org.apache.spark.util.sketch.BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(bc.value))
  def apply(g: String): Boolean = g != null && bf.mightContainString(g)
}
