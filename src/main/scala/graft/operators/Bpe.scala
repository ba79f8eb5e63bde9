package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding subword tokenization (Sennrich, Haddow & Birch 2016,
  * "Neural Machine Translation of Rare Words with Subword Units" — the
  * standard public algorithm behind GPT-2/RoBERTa-style vocabularies).
  *
  * Scale shape, 100 TB honest:
  *  - TRAINING scans the corpus ONCE: a word-frequency aggregation
  *    (map-side partial combine; the shuffle carries one row per distinct
  *    word), capped at the `maxVocabWords` most frequent words. Merge
  *    learning then runs driver-side over that bounded dictionary — the
  *    classic formulation trains on the word-count dict, never the corpus,
  *    so a 100 TB corpus and a 100 MB one pay the same driver cost.
  *  - ENCODING is per-row with the merge table BROADCAST (vocabulary is
  *    data, not code: a broadcast keeps it out of the plan tree and ships
  *    it to each executor once). Zero shuffle; iterator-in/iterator-out
  *    mapPartitions like the multimodal decoders.
  *
  * Determinism: the dictionary cap orders by (count desc, word asc); merge
  * selection breaks count ties lexicographically; greedy encoding always
  * merges the lowest-rank pair. Same corpus -> same vocab -> same tokens,
  * on any partitioning, which is what makes token counts reproducible
  * across engine versions and cluster sizes.
  *
  * Word boundaries come from TextAnalysis.words (lower + whitespace), so
  * subword counts stay consistent with the n-gram/TF-IDF operators. Merges
  * never cross word boundaries; a word's tokens concatenate back to the
  * word exactly (round-trip law, asserted in OperatorsSpec).
  */
object Bpe {

  /** Learn `numMerges` merges from a word-frequency dictionary — the
    * driver-side half of training. Pure, deterministic; exposed for specs
    * and for callers that already hold a dictionary. */
  def trainFromDict(dict: Seq[(String, Long)],
      numMerges: Int): Seq[(String, String)] = {
    require(numMerges >= 0, s"need numMerges >= 0: $numMerges")
    var words: Vector[(Vector[String], Long)] = dict.iterator
      .filter(_._1.nonEmpty)
      .map { case (w, c) => (w.map(_.toString).toVector, c) }.toVector
    val merges = Vector.newBuilder[(String, String)]
    var m = 0
    var exhausted = false
    while (m < numMerges && !exhausted) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      words.foreach { case (sym, c) =>
        var i = 0
        while (i + 1 < sym.length) {
          val p = (sym(i), sym(i + 1))
          counts(p) = counts.getOrElse(p, 0L) + c
          i += 1
        }
      }
      if (counts.isEmpty) exhausted = true
      else {
        // max count, ties broken lexicographically — deterministic
        val best = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        words = words.map { case (sym, c) => (mergePair(sym, best._1, best._2), c) }
        m += 1
      }
    }
    merges.result()
  }

  /** One corpus scan -> word-frequency dict (top `maxVocabWords`, count
    * desc / word asc) -> driver-side merge learning. */
  def train(df: DataFrame, textCol: String, numMerges: Int,
      maxVocabWords: Int = 50000): Seq[(String, String)] = {
    require(maxVocabWords >= 1, s"need maxVocabWords >= 1: $maxVocabWords")
    val dict = df
      .select(explode(TextAnalysis.words(col(textCol))).as("w"))
      .where(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w").asc)
      .limit(maxVocabWords)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    trainFromDict(dict, numMerges)
  }

  /** Greedy BPE application to one word: repeatedly merge the present
    * pair with the LOWEST merge rank until none applies. */
  def encodeWord(word: String,
      ranks: Map[(String, String), Int]): Vector[String] = {
    var sym = word.map(_.toString).toVector
    var done = sym.length < 2
    while (!done) {
      var bestRank = Int.MaxValue
      var bp: (String, String) = null
      var i = 0
      while (i + 1 < sym.length) {
        val p = (sym(i), sym(i + 1))
        ranks.get(p) match {
          case Some(rk) if rk < bestRank => bestRank = rk; bp = p
          case _ => ()
        }
        i += 1
      }
      if (bp == null) done = true
      else {
        sym = mergePair(sym, bp._1, bp._2)
        done = sym.length < 2
      }
    }
    sym
  }

  private def mergePair(sym: Vector[String], a: String,
      b: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < sym.length) {
      if (i + 1 < sym.length && sym(i) == a && sym(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += sym(i); i += 1 }
    }
    out.result()
  }

  /** Tokenize every row: (id, tokens) with the merge table broadcast.
    * Per-row, zero shuffle; the output row count equals the input's. */
  def encode(df: DataFrame, textCol: String, idCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val ranks = merges.zipWithIndex.toMap
    val bc = spark.sparkContext.broadcast(ranks)
    val src: Dataset[(Long, String)] = df
      .select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
    src.mapPartitions { it =>
      val r = bc.value
      it.map { case (id, text) =>
        val ws = Option(text).getOrElse("").trim.toLowerCase
          .split("\\s+").filter(_.nonEmpty)
        (id, ws.flatMap(w => encodeWord(w, r)).toSeq)
      }
    }.toDF(idCol, "tokens")
  }
}
