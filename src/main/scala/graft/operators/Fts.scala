package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** FTS5-style full-text search (SURVEY §2A row 5: the reference enables
  * SQLite's FTS5 virtual tables, pkg/sqlite3/sqlite3.go:20-23).
  *
  * Spark-native design: the FTS "virtual table" becomes an inverted
  * postings DataFrame (term, doc, tf) — one explode + hash aggregation to
  * build, hash-partitioned by term so lookups and joins scale; MATCH
  * becomes a postings join with AND/OR/NOT set semantics; ranking is BM25
  * (what FTS5's rank column uses), computed with exact integer tf/df/len
  * inputs so scores are reproducible across engines.
  *
  * FTS5 is a PERSISTED index: the reference builds it once on write and
  * every MATCH reads the stored shadow tables. The same shape here: the
  * index is three DataFrames — `postings` (term, doc, tf), `docLengths`
  * (doc, dl) and a 1-row `corpusStats` (n, sumdl) — that an engine stores
  * as catalog tables (graft.engine.GraftSession.createFtsIndex) and every
  * search consumes via `searchIndex`/`phraseSearchIndex`/
  * `prefixSearchIndex`. All search entry points are single distributed
  * plans with ZERO driver-side actions: the corpus stats ride in as a
  * broadcast 1-row cross join, never a driver `count()`.
  */
object Fts {

  private def words(c: Column): Column =
    split(regexp_replace(lower(trim(c)), "\\s+", " "), " ")

  /** Inverted index: one row per (term, doc) with term frequency. */
  def postings(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs.select(col(idCol).as("doc"), explode(words(col(textCol))).as("term"))
      .groupBy("term", "doc").agg(count(lit(1)).as("tf"))

  /** Per-document token counts (BM25's |D|). */
  def docLengths(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs.select(col(idCol).as("doc"), size(words(col(textCol))).cast("long").as("dl"))

  /** 1-row corpus statistics (document count, total token count) — the
    * third stored-index table. Broadcast into search plans so BM25 never
    * needs a driver-side aggregation. */
  def corpusStats(docLengths: DataFrame): DataFrame =
    docLengths.agg(count(lit(1)).cast("double").as("n"),
      sum(col("dl")).cast("double").as("sumdl"))

  /** Collapse fold-maintenance deltas into the live postings view.
    *
    * UPDATE/DELETE maintain the stored index by APPENDING the touched
    * documents' old postings with negated tf (and the re-tokenized
    * replacements with positive tf) — O(changed docs) write work, the
    * same shape as SQLite fts5's transactional per-row index maintenance
    * (it folds delete-markers into its shadow-table segments rather than
    * rebuilding; fts5.html "Data Structures"). Readers sum the folds:
    * a live (term, doc) nets to its true tf; a dead one nets to <= 0 and
    * is dropped. The aggregation runs AFTER the term predicate (Catalyst
    * pushes filters on grouping keys below the Aggregate), so a MATCH
    * still touches only its terms' postings. Compaction collapses folds
    * physically, restoring the raw one-row-per-(term,doc) form. */
  def livePostings(post: DataFrame): DataFrame =
    post.groupBy(col("term"), col("doc")).agg(sum(col("tf")).as("tf"))
      .filter(col("tf") > 0)

  /** Collapse fold deltas in the doc-lengths table: a live doc nets to its
    * current length; a deleted one nets to 0 and (having no live postings)
    * never joins into a score. */
  def liveDl(dl: DataFrame): DataFrame =
    dl.groupBy(col("doc")).agg(sum(col("dl")).as("dl"))

  case class MatchQuery(must: Seq[String], should: Seq[String], mustNot: Seq[String])

  /** Parse an FTS-ish query string: space = AND, OR alternates,
    * -term = NOT. ("spark query OR merge -slow") */
  def parse(q: String): MatchQuery = {
    val toks = q.trim.toLowerCase.split("\\s+").toSeq
    val mustNot = toks.filter(_.startsWith("-")).map(_.drop(1))
    val rest = toks.filterNot(_.startsWith("-"))
    val orIdx = rest.indexWhere(_ == "or")
    if (orIdx >= 0) {
      val should = rest.filterNot(_ == "or")
      MatchQuery(Nil, should, mustNot)
    } else MatchQuery(rest, Nil, mustNot)
  }

  /** MATCH + BM25 rank over an ad-hoc corpus: builds the index in-plan and
    * delegates to `searchIndex`. One distributed plan, no driver actions —
    * for repeated queries over the same corpus, persist the index once and
    * call `searchIndex` directly (that is what the engine's FTS virtual
    * tables do). */
  def search(docs: DataFrame, textCol: String, idCol: String, query: String,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val dl = docLengths(docs, textCol, idCol)
    searchIndex(postings(docs, textCol, idCol), dl, corpusStats(dl), query, k1, b)
  }

  /** MATCH + BM25 rank against a (possibly persisted) index. Returns
    * (doc, score, n_terms_hit) for documents satisfying the boolean query,
    * highest score first.
    *
    * k1 = 1.2, b = 0.75 (FTS5 defaults). All BM25 inputs (tf, df, dl) are
    * exact integers; n/sumdl arrive as the stored stats row — broadcast,
    * so the per-row score expression is pure codegen'd arithmetic. */
  def searchIndex(post: DataFrame, dl: DataFrame, stats: DataFrame,
      query: String, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val mq = parse(query)
    val positive = if (mq.must.nonEmpty) mq.must else mq.should
    val hit = post.filter(col("term").isin(positive: _*))
      .join(broadcast(post.filter(col("term").isin(positive: _*))
        .groupBy("term").agg(countDistinct("doc").as("df"))), Seq("term"))
      .join(dl, Seq("doc"))
      .crossJoin(broadcast(stats))
    val idf = log((col("n") - col("df") + 0.5) / (col("df") + 0.5) + 1.0)
    val avgdl = col("sumdl") / col("n")
    val tfNorm = (col("tf") * (k1 + 1)) /
      (col("tf") + lit(k1) * (lit(1.0) - b + lit(b) * col("dl") / avgdl))
    val scored = hit
      .withColumn("term_score", idf * tfNorm)
      .groupBy(col("doc"))
      .agg(round(sum(col("term_score")), 6).as("score"),
        countDistinct(col("term")).as("n_terms_hit"))
    val matched =
      if (mq.must.nonEmpty) scored.filter(col("n_terms_hit") === mq.must.length)
      else scored
    val withoutNegated =
      if (mq.mustNot.isEmpty) matched
      else matched.join(
        post.filter(col("term").isin(mq.mustNot: _*)).select("doc").distinct(),
        Seq("doc"), "left_anti")
    withoutNegated.orderBy(col("score").desc, col("doc"))
  }

  /** FTS5 phrase query (`"a b c"`: terms adjacent, in order). Scale shape:
    * the postings index first prunes to docs containing EVERY phrase term
    * (one filter + one aggregation, no joins per term), then adjacency is
    * verified with a single normalized-substring test on those candidates
    * only — the text re-scan never touches non-candidate documents. */
  def phraseSearch(docs: DataFrame, textCol: String, idCol: String,
      phrase: String): DataFrame =
    phraseSearchIndex(docs, postings(docs, textCol, idCol), textCol, idCol, phrase)

  /** Phrase query against a stored postings index: candidates come from the
    * index; only they are re-read from the corpus for adjacency. */
  def phraseSearchIndex(docs: DataFrame, post: DataFrame, textCol: String,
      idCol: String, phrase: String): DataFrame = {
    val terms = phrase.trim.toLowerCase.split("\\s+").toSeq.distinct
    val candidates = post
      .filter(col("term").isin(terms: _*))
      .groupBy(col("doc"))
      .agg(count_distinct(col("term")).as("nt"))
      .filter(col("nt") === terms.length)
      .select(col("doc"))
    val norm = concat(lit(" "),
      regexp_replace(lower(trim(col(textCol))), "\\s+", " "), lit(" "))
    docs.join(candidates, docs(idCol) === candidates("doc"))
      .filter(norm.contains(s" ${phrase.trim.toLowerCase.split("\\s+").mkString(" ")} "))
      .select(col("doc"))
  }

  /** FTS5 prefix query (`tok*`): any term starting with the prefix; a
    * prefix range over the term-partitioned postings. Returns
    * (doc, hits = total matching-term occurrences). */
  def prefixSearch(docs: DataFrame, textCol: String, idCol: String,
      prefix: String): DataFrame =
    prefixSearchIndex(postings(docs, textCol, idCol), prefix)

  /** Prefix query against a stored postings index. */
  def prefixSearchIndex(post: DataFrame, prefix: String): DataFrame =
    post.filter(col("term").startsWith(prefix.toLowerCase))
      .groupBy(col("doc"))
      .agg(sum(col("tf")).as("hits"))
}
