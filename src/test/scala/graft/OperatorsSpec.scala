package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Dedup, Similarity, TextAnalysis}

/** Correctness of the pipeline operators that have no SQL oracle:
  * MinHash estimates vs exact Jaccard, SimHash distance properties,
  * ANN (LSH/IVF) results checked against the brute-force baseline. */
class OperatorsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val docs = {
    val base = "the quick brown fox jumps over the lazy dog and runs far away"
    Seq(
      (0L, base),
      (1L, base),                                   // exact dup of 0
      (2L, base.replace("quick", "QUICK") + " "),   // case/ws variant of 0
      (3L, base.replace("lazy", "sleepy")),         // near dup of 0
      (4L, "completely different text about spark catalyst optimizer rules and codegen stages here"),
      (5L, "another unrelated document mentioning parquet row groups and column chunks only")
    ).toDF("doc_id", "text")
  }

  private def exactJaccard(a: String, b: String, n: Int = 3): Double = {
    def grams(s: String) = s.toLowerCase.trim.split("\\s+").sliding(n)
      .map(_.mkString(" ")).toSet
    val (ga, gb) = (grams(a), grams(b))
    ga.intersect(gb).size.toDouble / ga.union(gb).size
  }

  test("minhash est_jaccard tracks exact jaccard for dups and near-dups") {
    val pairs = Dedup.minHashDedup(docs, "text", "doc_id", threshold = 0.3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    // exact duplicate pair found with estimate 1.0
    assert(pairs.get((0L, 1L)).contains(1.0))
    // near-dup found with a high estimate
    val texts = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    pairs.foreach { case ((a, b), est) =>
      val exact = exactJaccard(texts(a), texts(b))
      assert(math.abs(est - exact) < 0.35,
        s"pair ($a,$b): est=$est exact=$exact drifted too far")
    }
    // unrelated docs don't pair up
    assert(!pairs.contains((4L, 5L)))
  }

  test("simhash: identical texts collide, near-dups within small hamming") {
    val sigs = Dedup.simHashSignatures(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs(0L) == sigs(1L))
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(sigs(0L), sigs(3L)) <= 16)
    assert(hamming(sigs(0L), sigs(4L)) > 16)
  }

  test("ngram jaccard matches the exact set computation") {
    val withBlock = docs.withColumn("lang", lit("en")).withColumn("source", lit("s"))
    val got = Dedup.ngramJaccard(withBlock, "text", "doc_id",
      Seq("lang", "source"), n = 3, threshold = 0.01)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(5))).toMap
    val texts = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    got.foreach { case ((a, b), j) =>
      assert(math.abs(j - exactJaccard(texts(a), texts(b))) < 1e-12)
    }
    assert(got.contains((0L, 1L)) && got((0L, 1L)) == 1.0)
  }

  test("brute-force cosine topk matches a naive driver-side computation") {
    val emb = Tables.load(spark, SparkTestSession.sfDir, "embeddings")
    val queries = emb.filter(col("vec_id") < 2)
    val corpus = emb.filter(col("vec_id") >= 2 && col("vec_id") < 100)
    val got = Similarity.bruteForceTopK(queries, corpus, "embedding", "vec_id", 5)
      .collect().map(r => (r.getLong(0), r.getInt(3), r.getLong(1))).sorted

    val all = emb.filter(col("vec_id") < 100).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val expected = (for {
      q <- Seq(0L, 1L)
      ranked = all.filter(_._1 >= 2).toSeq
        .map { case (id, v) =>
          (id, BigDecimal(cos(all(q), v)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) }
        .sortBy { case (id, s) => (-s, id) }.take(5)
      ((id, _), rk) <- ranked.zipWithIndex
    } yield (q, rk + 1, id)).sorted
    assert(got.toSeq == expected)
  }

  test("LSH topk results are true cosine values (subset of brute force)") {
    val emb = Tables.load(spark, SparkTestSession.sfDir, "embeddings")
    val queries = emb.filter(col("vec_id") < 3)
    val corpus = emb.filter(col("vec_id") >= 3)
    val brute = Similarity.bruteForceTopK(queries, corpus, "embedding", "vec_id", 1000)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val lsh = Similarity.lshTopK(queries, corpus, "embedding", "vec_id", 64, 10)
      .collect()
    assert(lsh.nonEmpty)
    lsh.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      assert(brute.contains(key) && math.abs(brute(key) - r.getDouble(2)) < 1e-9,
        s"LSH produced a sim not matching brute force at $key")
    }
  }

  test("IVF topk: every reported neighbor has its true similarity") {
    val emb = Tables.load(spark, SparkTestSession.sfDir, "embeddings")
    val queries = emb.filter(col("vec_id") < 3)
    val corpus = emb.filter(col("vec_id") >= 3)
    val brute = Similarity.bruteForceTopK(queries, corpus, "embedding", "vec_id", 1000)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val ivf = Similarity.ivfTopK(queries, corpus, "embedding", "vec_id", 10)
      .collect()
    assert(ivf.length == 30) // 3 queries x top-10
    ivf.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      assert(brute.contains(key) && math.abs(brute(key) - r.getDouble(2)) < 1e-9)
    }
  }

  test("fingerprints: whitespace/case variants collide, reorderings do not") {
    val fp = TextAnalysis.fingerprints(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(fp(0L)._1 == fp(2L)._1) // norm_md5 collides for the ws/case variant
    assert(fp(0L)._1 != fp(3L)._1)
    assert(fp(0L)._2 == fp(1L)._2) // rolling hash equal for identical
    assert(fp(0L)._2 != fp(4L)._2)
  }

  test("glob translation: SQLite patterns behave") {
    import graft.functions.SqliteFunctions.globToRegex
    assert("Brand#13".matches(globToRegex("Brand#1*")))
    assert(!"Brand#23".matches(globToRegex("Brand#1*")))
    assert("cat".matches(globToRegex("c?t")))
    assert("c.t".matches(globToRegex("c?t")))
    assert(!"cart".matches(globToRegex("c?t")))
    assert("a5z".matches(globToRegex("a[0-9]z")))
    assert(!"abz".matches(globToRegex("a[0-9]z")))
    assert("x.y".matches(globToRegex("x.y")))
    assert(!"xAy".matches(globToRegex("x.y"))) // dot is literal in glob
  }

  test("strftime token translation") {
    import graft.functions.SqliteFunctions.strftimeToJava
    assert(strftimeToJava("%Y-%m-%d") == "yyyy-MM-dd")
    assert(strftimeToJava("%H:%M:%S") == "HH:mm:ss")
    assert(strftimeToJava("%Y%%") == "yyyy'%'")
  }
}
