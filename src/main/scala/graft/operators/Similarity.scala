package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (Array[Float]).
  *
  * Baseline: brute-force cosine top-k — the query set is broadcast, the
  * corpus streams partition-parallel, a per-query window takes top-k. Scale
  * path: sign-random-projection LSH buckets (probe only matching buckets)
  * and an IVF variant (route each corpus vector to its nearest centroid,
  * probe the query's top centroids).
  *
  * All dot products run in double via zip_with + aggregate (sequential
  * left-to-right fold: deterministic), kept in codegen — no UDFs.
  */
object Similarity {

  /** dot(a, b) in double over two array<double> columns. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** cosine(a, b) = dot / (|a| * |b|) — native kernel (r18): one compiled
    * loop replacing three interpreted per-element folds per pair, same
    * IEEE op order and the same zip_with/aggregate null-poisoning
    * semantics ([[graft.functions.VecOps.cosine]]); [[cosineHof]] is the
    * spec's independent equivalence twin. */
  def cosine(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      graft.functions.VecExpressions.CosineSim(
        org.apache.spark.sql.GraftSqlBridge.expression(a),
        org.apache.spark.sql.GraftSqlBridge.expression(b)))

  /** The HOF formulation of [[cosine]] — kept as the bitwise twin the
    * spec pins the kernel against (and the shape oracle SQL replays). */
  private[graft] def cosineHof(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  private def asDouble(c: Column): Column = transform(c, _.cast("double"))

  /** Brute-force cosine top-k: broadcast the (small) query set against the
    * corpus; rank per query on (rounded sim desc, id) so ties and float
    * noise can't reorder results. O(|corpus| x |queries|) map work, no
    * corpus shuffle until the final per-query top-k (k rows per query). */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame,
      vecCol: String, idCol: String, k: Int): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"),
      asDouble(col(vecCol)).as("qv")))
    val c = corpus.select(col(idCol).as("neighbor_id"), asDouble(col(vecCol)).as("cv"))
    val scored = c.crossJoin(q)
      .select(col("query_id"), col("neighbor_id"),
        round(cosine(col("qv"), col("cv")), 6).as("sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
  }

  /** Symmetric per-vector int8 quantization — the memory move that makes
    * billion-vector ANN fit: codes are round(x·127/max|x|) in [-127, 127]
    * (4× smaller than float32, 8× than the double working form), plus one
    * double `scale = max|x|/127` to dequantize. All arithmetic is
    * single IEEE ops on the same doubles in any engine (the p91 oracle
    * replays it in DuckDB bitwise, including the sequential left-fold
    * `err_sq`); the all-zero vector quantizes to all-zero codes with
    * scale 0. Per-row transform, zero shuffle — at 100 TB this runs in
    * the same scan that writes the ANN index, and downstream IVF/LSH
    * probes read 1/4 the bytes. */
  def quantizeInt8(df: DataFrame, vecCol: String, idCol: String): DataFrame = {
    // staged projections: max_abs (an O(dims) array reduction) and codes
    // must be MATERIALIZED columns, not inlined expression trees — a
    // single fused projection re-evaluates the non-cheap subtree per
    // array ELEMENT inside the lambdas (O(dims²) per row; the r8 bench
    // caught it at 6.4 s for 2k×256 vectors, ~60× the scan cost).
    // CollapseProject keeps multi-referenced non-cheap aliases staged.
    val errTerm = transform(col("__d"), e => e * e)
    df.select(col(idCol), asDouble(col(vecCol)).as("__v"))
      .withColumn("__maxabs", array_max(transform(col("__v"), x => abs(x))))
      .withColumn("scale", col("__maxabs") / 127.0)
      .withColumn("codes", when(col("__maxabs") === 0.0,
          transform(col("__v"), _ => lit(0)))
        .otherwise(transform(col("__v"),
          x => round(x * 127.0 / col("__maxabs")).cast("int"))))
      .withColumn("__d", zip_with(col("__v"), col("codes"),
        (x, q) => x - q.cast("double") * col("scale")))
      .withColumn("err_sq", aggregate(errTerm, lit(0.0), (acc, e) => acc + e))
      .select(col(idCol), col("codes"), col("scale"), col("err_sq"))
  }

  /** Deterministic pseudo-random hyperplane component for (plane, dim):
    * a fixed integer hash mapped to [-1, 1). No RNG at execution time. */
  private def planeComponent(plane: Int, dim: Int): Double = {
    var x = plane * 1000003L + dim * 7919L + 12345L
    x ^= x << 13; x ^= x >>> 7; x ^= x << 17
    (x & ((1L << 52) - 1)).toDouble / (1L << 51).toDouble - 1.0
  }

  /** The SRP hyperplane matrix as plain values — lets an oracle engine
    * reproduce signatures exactly (Double.toString round-trips, so the
    * rendered literals parse back to identical bits). */
  def srpPlanes(dims: Int, nPlanes: Int): Seq[Seq[Double]] =
    (0 until nPlanes).map(p => (0 until dims).map(d => planeComponent(p, d)))

  /** Sign-random-projection LSH signature: `nPlanes` sign bits packed into a
    * long. Hyperplanes are compile-time deterministic literals, broadcast as
    * an array-of-arrays literal column. */
  def srpSignature(vec: Column, dims: Int, nPlanes: Int = 16): Column = {
    val planes = (0 until nPlanes).map { p =>
      array((0 until dims).map(d => lit(planeComponent(p, d))): _*)
    }
    (0 until nPlanes).map { p =>
      when(dot(vec, planes(p)) > 0, lit(1L << p)).otherwise(0L)
    }.reduce(_ bitwiseOR _)
  }

  /** LSH-bucketed ANN: corpus vectors grouped by SRP signature; queries
    * probe only their own bucket (plus Hamming-1 neighbors for recall).
    * Bucket join replaces the cross join — at 100 TB this is the difference
    * between |Q|x|C| and |Q|x|bucket|. */
  def lshTopK(queries: DataFrame, corpus: DataFrame, vecCol: String,
      idCol: String, dims: Int, k: Int, nPlanes: Int = 12): DataFrame = {
    val sig = srpSignature(asDouble(col(vecCol)), dims, nPlanes)
    val c = corpus.select(col(idCol).as("neighbor_id"),
      asDouble(col(vecCol)).as("cv"), sig.as("bucket"))
    // probe buckets: exact + each 1-bit flip of the query signature
    val probes = array((lit(-1) +: (0 until nPlanes).map(lit(_))): _*)
    val q = queries.select(col(idCol).as("query_id"),
        asDouble(col(vecCol)).as("qv"), sig.as("qsig"))
      .select(col("query_id"), col("qv"), explode(probes).as("flip"), col("qsig"))
      .select(col("query_id"), col("qv"),
        when(col("flip") === -1, col("qsig"))
          .otherwise(col("qsig").bitwiseXOR(expr("shiftleft(1L, flip)")))
          .as("bucket"))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .select(col("query_id"), col("neighbor_id"),
        round(cosine(col("qv"), col("cv")), 6).as("sim"))
      .groupBy("query_id", "neighbor_id").agg(max("sim").as("sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
  }

  /** Mutual-nearest-neighbor pairs across two embedding sets — simplified
    * bitext mining (Artetxe & Schwenk 2019 mine with a margin score over
    * k-NN neighborhoods; the mutual-top-1 criterion is its k=1 core): a
    * pair (a, b) survives iff b is a's nearest neighbor in B AND a is b's
    * nearest in A. Sims are rounded like [[bruteForceTopK]] so ranking is
    * engine-stable; ties break on id. This brute-force form broadcasts
    * each side as the query set of one direction — right at calibration
    * scale; the 100 TB path swaps [[lshTopK]]/[[ivfTopK]] in per
    * direction (the mutual join is unchanged). */
  def mutualNearestPairs(a: DataFrame, b: DataFrame, vecCol: String,
      idCol: String): DataFrame = {
    val ab = bruteForceTopK(a, b, vecCol, idCol, 1)
      .select(col("query_id").as("id_a"), col("neighbor_id").as("id_b"),
        col("sim"))
    val ba = bruteForceTopK(b, a, vecCol, idCol, 1)
      .select(col("query_id").as("id_b"), col("neighbor_id").as("id_a"))
    ab.join(ba, Seq("id_a", "id_b"))
      .select(col("id_a"), col("id_b"), col("sim"))
  }

  /** Attach the per-row nearest-centroid argmax over a literal centroid
    * matrix as `outCol` — zero shuffle, no per-row window; ties keep the
    * first (lowest) centroid id, matching the (csim desc, centroid_id
    * asc) ordering it replaces. Shared by the inline route, the index
    * build, and [[semDeDup]]'s Lloyd assignment so persisted and ad-hoc
    * routings can never drift.
    *
    * Kernel shape (r18, guide §1.2 step 2 "per-task work"): the old
    * per-(row, centroid) `cosine(v, element_at(m, i))` re-reduced BOTH
    * norms inside the lambda — the row norm k times per row, and the
    * centroid norm (pure literal data, but hidden from constant folding
    * behind the lambda-indexed element_at) k x dims times per row. Here
    * the row norm is hoisted to one per-row projection and each centroid
    * norm is folded on the DRIVER with the identical left-to-right IEEE
    * fold, so per row only the k dot products remain: 3 x fewer array
    * reductions, identical doubles by construction. `roundDigits >= 0`
    * rounds each similarity before the comparison (semDeDup's round-9
    * damper); negative means raw. */
  private def withNearestCentroid(df: DataFrame, vecCol: String,
      outCol: String, centMat: Seq[Seq[Double]],
      roundDigits: Int = -1): DataFrame = {
    if (centMat.isEmpty) return df.withColumn(outCol, lit(0).cast("int"))
    // the row vector's norm, hoisted to ONE per-row computation in its
    // own projection (CollapseProject never inlines a non-cheap alias
    // referenced k times) — the old per-centroid cosine re-folded it k
    // times per row
    val staged = df.withColumn("__cna", norm(col(vecCol)))
    // each centroid's norm is DRIVER data: the same left-to-right IEEE
    // fold the executor ran per (row, centroid) — the lambda-indexed
    // element_at(m, i) form defeated constant folding, so the old plan
    // re-reduced a literal vector k x dims times per row
    val sims: Seq[Column] = centMat.map { c =>
      val nb = math.sqrt(c.foldLeft(0.0)((a, x) => a + x * x))
      val raw = dot(col(vecCol), typedLit(c)) / (col("__cna") * lit(nb))
      if (roundDigits >= 0) round(raw, roundDigits) else raw
    }
    // argmax over the sims ARRAY as the aggregate's input, so the array
    // is evaluated once per row no matter how projections collapse; the
    // lambda binds (state, sim) as variables — identical comparison
    // semantics to the per-centroid fold this replaces (s > csim only:
    // ties keep the FIRST = lowest centroid id, NaN/null never win,
    // all-null keeps the seed cid 0)
    val best = aggregate(
      array(sims: _*),
      struct(lit(-2.0).as("csim"), lit(0).as("cid"), lit(0).as("i")),
      (b, s) => {
        val i = b.getField("i") + lit(1)
        when(s > b.getField("csim"),
          struct(s.as("csim"), i.cast("int").as("cid"), i.as("i")))
          .otherwise(struct(b.getField("csim").as("csim"),
            b.getField("cid").as("cid"), i.as("i")))
      },
      b => b.getField("cid"))
    staged.withColumn(outCol, best).drop("__cna")
  }

  /** Build the IVF index over a corpus: the bounded centroid matrix
    * (nCentroids lowest-id vectors — the same deterministic init
    * [[ivfTopK]] uses) plus every corpus row's nearest-centroid routing
    * label (id, centroid_id). This is the EXPENSIVE half at scale — the
    * routing is a full-corpus argmax scan — and exactly what a
    * deployment persists once per corpus snapshot (the `ivf_index`
    * artifact kind in [[graft.engine.GramArtifactStore]]) while every
    * query batch pays only [[ivfTopKWithIndex]]'s probe joins. */
  def ivfBuild(corpus: DataFrame, vecCol: String, idCol: String,
      nCentroids: Int = 16): (Seq[Seq[Double]], DataFrame) = {
    val c = corpus.select(col(idCol).as("id"), asDouble(col(vecCol)).as("cv"))
    val centMat: Seq[Seq[Double]] = c.orderBy(col("id"))
      .limit(nCentroids).collect().map(_.getSeq[Double](1).toSeq).toSeq
    (centMat,
      withNearestCentroid(c, "cv", "centroid_id", centMat)
        .select(col("id"), col("centroid_id")))
  }

  /** The probe+score half of [[ivfTopK]] over an ALREADY-ROUTED corpus
    * (`routedC`: neighbor_id, cv, centroid_id). */
  private def ivfProbe(queries: DataFrame, routedC: DataFrame,
      centMat: Seq[Seq[Double]], vecCol: String, idCol: String, k: Int,
      nprobe: Int): DataFrame = {
    val m = typedLit(centMat)
    // queries probe their nprobe nearest cells: the query set is small,
    // so the top-nprobe cut stays a per-query window over an exploded
    // (query × centroid) frame — |Q|×k rows, never corpus-sized
    val centExploded = explode(transform(sequence(lit(1), lit(centMat.length)),
      i => struct(i.cast("int").as("centroid_id"),
        element_at(m, i).as("centv"))))
    val wq = Window.partitionBy(col("query_id"))
      .orderBy(col("csim").desc, col("centroid_id"))
    val routedQ = queries
      .select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv"))
      .withColumn("ce", centExploded)
      .withColumn("centroid_id", col("ce.centroid_id"))
      .withColumn("csim", cosine(col("qv"), col("ce.centv")))
      .withColumn("crk", row_number().over(wq))
      .filter(col("crk") <= nprobe)
      .drop("ce", "csim", "crk")
    val scored = routedC.join(broadcast(routedQ.drop("rid")), Seq("centroid_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(cosine(col("qv"), col("cv")), 6).as("sim"))
      .groupBy("query_id", "neighbor_id").agg(max("sim").as("sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
  }

  /** IVF-style ANN: centroids = a deterministic sample of the corpus
    * (ids ≡ 0 mod stride). Corpus rows route to their nearest centroid
    * (one broadcast pass); queries probe their `nprobe` nearest centroid
    * cells. Replaces global search with per-cell search. */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, vecCol: String,
      idCol: String, k: Int, nCentroids: Int = 16, nprobe: Int = 4): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), asDouble(col(vecCol)).as("cv"))
    // the centroid table is the bounded IVF model (nCentroids×dims):
    // lowest-id rows via orderBy+limit = TakeOrderedAndProject, collected
    // once and shipped into the plan as ONE literal matrix
    val centMat: Seq[Seq[Double]] = c.orderBy(col("neighbor_id"))
      .limit(nCentroids).collect().map(_.getSeq[Double](1).toSeq).toSeq
    // inline route: the argmax column directly on the scan — no join,
    // the ad-hoc one-shot plan
    val routedC = withNearestCentroid(c, "cv", "centroid_id", centMat)
    ivfProbe(queries, routedC, centMat, vecCol, idCol, k, nprobe)
  }

  /** [[ivfTopK]] against a PERSISTED index — `centroids`/`routed` in
    * [[ivfBuild]]'s shapes, typically read back from an `ivf_index`
    * artifact ([[graft.engine.GramArtifactStore.ivfIndex]]): the corpus
    * joins its routing labels by id (one equi-join, AQE-broadcastable —
    * the labels are two longs per row) instead of re-running the
    * full-corpus argmax scan, then the probe is identical. Build the
    * index once per corpus snapshot; every query batch pays only this. */
  def ivfTopKWithIndex(queries: DataFrame, corpus: DataFrame,
      vecCol: String, idCol: String, k: Int, nprobe: Int,
      centroids: Seq[Seq[Double]], routed: DataFrame): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), asDouble(col(vecCol)).as("cv"))
    // LEFT join + loud failure on uncovered ids (r16 advice): an inner
    // join would silently DROP corpus rows the index doesn't know (corpus
    // drifted past the snapshot the index was built on) — unanswerable
    // vectors vanishing from the candidate set is exactly the fail-open
    // shape the store's corpusVersion validation exists to prevent, and
    // this operator is public API callable WITHOUT the store. The
    // raise_error rides the routing column itself, so it can never be
    // pruned out of the plan; coverage costs nothing extra — the join was
    // already id-keyed.
    val routedC = c.join(routed.select(col("id").as("neighbor_id"),
        col("centroid_id")), Seq("neighbor_id"), "left")
      .withColumn("centroid_id", coalesce(col("centroid_id"),
        raise_error(concat(
          lit("ivf_index routing labels do not cover corpus id "),
          col("neighbor_id").cast("string"),
          lit(" — the corpus has rows the index was not built on; " +
            "rebuild the ivf_index artifact for this snapshot")))
          .cast("int")))
    ivfProbe(queries, routedC, centroids, vecCol, idCol, k, nprobe)
  }

  /** Exact embedding-cosine near-duplicate pairs: all (id_a < id_b) pairs
    * with cosine >= threshold. O(n²) — this is the small-set verification
    * baseline for cosineNearDup below; at 100 TB the SRP-bucketed variant
    * is the only viable path (the bucket equi-join keeps the pair space to
    * same-bucket candidates instead of the full cross product). */
  def exactNearDup(df: DataFrame, vecCol: String, idCol: String,
      threshold: Double): DataFrame = {
    val t = df.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
    t.as("a").join(t.as("b"), col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        round(cosine(col("a.v"), col("b.v")), 6).as("sim"))
      .filter(col("sim") >= threshold)
  }

  /** SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
    * web-scale through semantic deduplication"): spherical k-means over
    * the embedding space, then near-duplicate removal WITHIN each cluster
    * — the cluster partition shrinks the pair space from |corpus|² to
    * Σ|cluster|², which is the paper's entire scaling argument (they run
    * 50k clusters over LAION; `nClusters` plays that role here).
    *
    * Determinism: centroids init from the `nClusters` lowest-id vectors
    * (no RNG; on a corpus whose ids follow ingest order this is as good
    * as a uniform sample — ids CORRELATED with content degrade the
    * seeding like any non-++ init, so shuffle ids or raise `iters` if
    * that's your corpus), Lloyd iterations are fixed-count, assignment
    * ties break on
    * centroid id, and similarities are rounded before thresholding (the
    * repo-wide float-noise damper). The keep policy is set-based: a doc
    * is dropped iff some SMALLER-id doc in its cluster is within the
    * threshold — one self-join + one distinct, no sequential sweep.
    *
    * Scale shape: the centroid matrix is nClusters×dims doubles on the
    * driver (the k-means model itself — bounded like BPE's merge table),
    * shipped into the plan as one literal, so ASSIGNMENT IS A PER-ROW
    * ARGMAX FOLD: zero shuffle, and each Lloyd iteration costs exactly
    * one keyed (cluster, dim) aggregation plus a k×dims collect. The
    * in-cluster pair join shuffles on cluster; a skewed (huge) cluster is
    * AQE skew-join territory, and [[cosineNearDup]]'s SRP bucketing
    * composes inside a cluster if one ever dominates. */
  def semDeDup(df: DataFrame, vecCol: String, idCol: String,
      nClusters: Int = 16, threshold: Double = 0.97,
      iters: Int = 3): DataFrame = {
    require(nClusters >= 1 && iters >= 0,
      s"need nClusters >= 1, iters >= 0: $nClusters, $iters")
    val t = df.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
    // Centroids live on the DRIVER as a k×dims literal matrix (bounded —
    // the k-means model, exactly what any k-means keeps), which makes
    // assignment a PER-ROW argmax fold over the matrix: zero shuffle, no
    // per-id window, and the self-join below can re-derive assignments as
    // a map over the scan instead of re-executing a shuffled subtree
    // (lambda-bearing plans don't canonicalize equal, so exchange reuse
    // can't save a window-based formulation).
    var cent: Seq[Seq[Double]] = t.orderBy(col("id")).limit(nClusters)
      .collect().map(_.getSeq[Double](1).toSeq).toSeq
    // fold keeps the FIRST best on ties -> lowest centroid id, like the
    // (csim desc, centroid_id asc) ordering it replaces; the shared
    // hoisted-norm argmax (see withNearestCentroid) with semDeDup's
    // round-9 float-noise damper applied before each comparison
    def assign(c: Seq[Seq[Double]]): DataFrame =
      withNearestCentroid(t, "v", "cluster", c, roundDigits = 9)
    for (_ <- 0 until iters) {
      cent = assign(cent)
        .select(col("cluster").as("centroid_id"),
          posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy(col("centroid_id"), col("pos")).agg(avg(col("x")).as("m"))
        .groupBy(col("centroid_id")).agg(
          transform(array_sort(collect_list(struct(col("pos"), col("m")))),
            s => s.getField("m")).as("centv"))
        .orderBy(col("centroid_id"))
        .collect().map(_.getSeq[Double](1).toSeq).toSeq
    }
    val assigned = assign(cent)
    val dropped = assigned.as("a").join(assigned.as("b"),
        col("a.cluster") === col("b.cluster") && col("a.id") < col("b.id"))
      .filter(round(cosine(col("a.v"), col("b.v")), 6) >= threshold)
      .select(col("b.id").as("id")).distinct()
    assigned.join(dropped.withColumn("__drop", lit(1L)), Seq("id"), "left")
      .select(col("id").as(idCol), col("cluster"),
        col("__drop").isNull.as("keep"))
  }

  /** Embedding-cosine near-duplicate pairs above a similarity threshold,
    * using SRP buckets to avoid the all-pairs join. */
  def cosineNearDup(df: DataFrame, vecCol: String, idCol: String, dims: Int,
      threshold: Double, nPlanes: Int = 8): DataFrame = {
    val sig = srpSignature(asDouble(col(vecCol)), dims, nPlanes)
    val t = df.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"), sig.as("bucket"))
    t.as("a").join(t.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        round(cosine(col("a.v"), col("b.v")), 6).as("sim"))
      .filter(col("sim") >= threshold)
  }
}
