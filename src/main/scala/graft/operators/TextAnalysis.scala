package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: language ID,
  * quality scoring, token counting, document fingerprinting.
  *
  * Everything is a narrow per-row transform (no shuffle at all) built from
  * codegen'd string/regex/higher-order functions, so it runs at scan speed
  * on any corpus size.
  */
object TextAnalysis {

  private def words(c: Column): Column =
    split(regexp_replace(lower(trim(c)), "\\s+", " "), " ")

  /** Tiny per-language stopword lists for the n-gram/stopword language-ID
    * heuristic. Deliberately small: the point is the operator shape
    * (vectorized set-intersection scoring), not lexicon quality. */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "and", "of", "to", "is", "in"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "los"),
    "fr" -> Seq("le", "la", "et", "les", "des", "un", "du"),
    "de" -> Seq("der", "die", "und", "das", "ist", "ein", "mit"),
    "zh" -> Seq("de5", "shi4", "le5", "zai4", "he2", "you3", "wo3"))

  /** Per-language score = |distinct words ∩ stopwords(lang)|. */
  def langScore(textCol: Column, lang: String): Column =
    size(array_intersect(array_distinct(words(textCol)),
      array(stopwords(lang).map(lit): _*))).cast("long")

  /** Predicted language: argmax over langScore with a fixed precedence
    * (en > es > fr > de > zh) so ties are deterministic. */
  def langId(textCol: Column): Column = {
    val order = Seq("en", "es", "fr", "de", "zh")
    val scores = order.map(l => langScore(textCol, l))
    order.zipWithIndex.foldRight(lit("und")) { case ((l, i), els) =>
      val isMax = order.indices.filter(_ != i)
        .map(j => if (j < i) scores(i) > scores(j) else scores(i) >= scores(j))
        .reduce(_ && _)
      when(scores(i) > 0 && isMax, lit(l)).otherwise(els)
    }
  }

  /** Email/IPv4 patterns kept RE2-compatible (no backrefs/lookaround) so
    * the exact same regex runs in Spark, DuckDB and any other engine. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b"

  /** PII redaction (pre-training hygiene): emails and IPv4 literals are
    * replaced with typed placeholder tokens. Pure codegen'd
    * regexp_replace — per-row, zero shuffle. */
  def redactPii(c: Column): Column =
    regexp_replace(regexp_replace(c, EmailRe, "<EMAIL>"), Ipv4Re, "<IP>")

  /** Context-window chunking (training-sample prep): each document's
    * normalized word sequence is split into windows of `chunkSize` words
    * with `overlap` words shared between neighbors (stride = size -
    * overlap); the final window may be partial. One explode, output rows
    * ∝ chunks — no shuffle, no driver involvement. */
  def chunkWords(df: DataFrame, textCol: String, idCol: String,
      chunkSize: Int, overlap: Int): DataFrame = {
    require(chunkSize > overlap && overlap >= 0,
      s"need chunkSize > overlap >= 0: $chunkSize, $overlap")
    val stride = chunkSize - overlap
    val ws = split(regexp_replace(lower(trim(col(textCol))), "\\s+", " "), " ")
    df.select(col(idCol), ws.as("ws"))
      .withColumn("start",
        explode(sequence(lit(0), size(col("ws")) - 1, lit(stride))))
      .select(col(idCol),
        expr(s"start div $stride").as("chunk_idx"),
        least(lit(chunkSize), size(col("ws")) - col("start")).cast("long")
          .as("n_words"),
        md5(concat_ws(" ", slice(col("ws"), col("start") + 1, lit(chunkSize))))
          .as("chunk_md5"))
  }

  /** Unicode canonicalization (dedup/fingerprint hygiene): "nfc", "nfkc",
    * "strip" (accent folding) or "casefold" — a codegen'd native
    * expression ([[graft.functions.StringExpressions.NormalizeText]]),
    * zero shuffle, zero UDF. */
  def normalizeText(c: Column, form: String): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      graft.functions.StringExpressions.NormalizeText(
        org.apache.spark.sql.GraftSqlBridge.expression(c), form))

  /** Quality metrics: char/word counts, alpha & punctuation & stopword
    * ratios, and a linear composite score. Integer counts divided in double
    * — deterministic on any engine. */
  def qualityMetrics(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val nChars = length(t).cast("long")
    val ws = words(t)
    val nWords = size(ws).cast("long")
    val nAlpha = length(regexp_replace(t, "[^A-Za-z]", "")).cast("long")
    val nPunct = length(regexp_replace(t, "[A-Za-z0-9\\s]", "")).cast("long")
    val nStop = size(expr(
      s"filter(split(regexp_replace(lower(trim($textCol)), '\\\\s+', ' '), ' '), " +
        "x -> x IN ('the','a','and','of','to','is','in'))")).cast("long")
    df.withColumn("n_chars_m", nChars)
      .withColumn("n_words", nWords)
      .withColumn("alpha_ratio",
        when(nChars === 0, 0.0).otherwise(nAlpha.cast("double") / nChars))
      .withColumn("punct_ratio", when(nChars === 0, 0.0).otherwise(nPunct.cast("double") / nChars))
      .withColumn("stop_ratio", when(nWords === 0, 0.0).otherwise(nStop.cast("double") / nWords))
      .withColumn("avg_word_len",
        when(nWords === 0, 0.0).otherwise(nAlpha.cast("double") / nWords))
      .withColumn("quality_score",
        col("alpha_ratio") * 0.5 + col("stop_ratio") * 0.3 +
          (lit(1.0) - col("punct_ratio")) * 0.2)
  }

  /** Token counts: whitespace tokens and a BPE-ish regex tokenization
    * (letter runs / digit runs / single other chars). */
  def tokenCounts(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    df.withColumn("ws_tokens", size(split(trim(t), "\\s+")).cast("long"))
      .withColumn("bpe_ish_tokens",
        size(regexp_extract_all(t, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))).cast("long"))
      .withColumn("chars_per_token",
        when(col("bpe_ish_tokens") === 0, 0.0)
          .otherwise(length(t).cast("double") / col("bpe_ish_tokens")))
  }

  /** Content fingerprints: md5 of the normalized text plus a 31-bit
    * polynomial rolling hash over the word sequence (order-sensitive, so
    * reordered copies get different prints while whitespace/case variants
    * collide). Pure integer arithmetic via a sequential fold; the modulus
    * is 2^31-1 so acc*31 + word stays far below long overflow (ANSI-safe). */
  def fingerprints(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val norm = regexp_replace(lower(trim(col(textCol))), "\\s+", " ")
    df.select(col(idCol), md5(norm).as("norm_md5"),
      aggregate(
        words(col(textCol)),
        lit(1125899907L),
        (acc, w) => pmod(acc * 31L + xxhash64(w).bitwiseAND(lit(0x7FFFFFFFL)),
          lit(2147483647L)))
        .as("rolling_hash"))
  }
}
