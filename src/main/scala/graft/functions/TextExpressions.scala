package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the text-analysis hot path. The HOF
  * formulations in [[graft.operators.TextAnalysis]] are correct and
  * oracle-replayable, but interpreted lambda bodies pay per-element
  * closure dispatch and get no common-subexpression elimination — the
  * sf0.1 lexical-diversity entry spent ~3 s almost entirely inside
  * them. A single static kernel does the same sort + run-length walk in
  * one pass per row and stays inside whole-stage codegen (same pattern
  * as [[JsonExpressions]]/[[StringExpressions]]).
  *
  * Bitwise compatibility is the design constraint, not a side effect:
  * the DuckDB oracle hash-compares every double, so the kernel
  * reproduces the HOF's exact float-op sequence — Σp² folds run over
  * run lengths in SORTED symbol order (code-point order == UTF-8 byte
  * order == Spark's binary string sort), each term computed as
  * (n/total)*(n/total) and added left-to-right from a 0.0 seed.
  * OperatorsSpec pins kernel == HOF on real documents and random
  * adversaries.
  */
object TextExpressions {

  /** Per-document lexical-diversity bundle over a text column: char and
    * word counts, type-token ratio, Simpson (1 − Σp²) concentration for
    * chars and words, and top-symbol mass — the whole
    * [[graft.operators.TextAnalysis.lexicalDiversity]] row in ONE pass.
    * Chars are code points of the raw text; words are the canonical
    * normalization (trim spaces, lowercase, collapse \s+, split on
    * ' ', drop empties). */
  case class LexicalDiversity(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LexicalDiversity.schema
    override def nullable: Boolean = true
    override def prettyName: String = "lexical_diversity"

    override protected def nullSafeEval(x: Any): Any =
      TextOps.lexicalDiversity(x.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        x => s"graft.functions.TextOps.lexicalDiversity($x)")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  object LexicalDiversity {
    val schema: StructType = StructType(Seq(
      StructField("n_chars_d", LongType, nullable = false),
      StructField("n_words", LongType, nullable = false),
      StructField("n_word_types", LongType, nullable = false),
      StructField("ttr", DoubleType, nullable = false),
      StructField("simpson_char", DoubleType, nullable = false),
      StructField("simpson_word", DoubleType, nullable = false),
      StructField("top_char_frac", DoubleType, nullable = false),
      StructField("top_word_frac", DoubleType, nullable = false)))
  }

  /** xxhash64 of every n-word window of a word array, as one
    * Array[Long] — the shingle generator under p34/p37/p45 and friends,
    * which the r13 StageProfile showed spending 43–74% of those lines'
    * CPU inside the interpreted `transform(sequence(...), i ->
    * xxhash64(element_at...))` lambda (per-element closure dispatch, no
    * CSE). Bitwise-identical to Spark's `xxhash64(w_i, ..., w_{i+n-1})`
    * BY CONSTRUCTION: that expression folds seed 42 through
    * XXH64.hashUTF8String word by word, and this kernel runs the same
    * fold in compiled bytecode ([[TextOps.gramHashes]]); the HOF twin
    * stays in [[graft.operators.TextAnalysis]] and OperatorsSpec pins
    * kernel == HOF on hostile inputs. */
  case class WordGramHashes(child: Expression, n: Int)
      extends UnaryExpression {
    require(n >= 1, s"need n >= 1: $n")
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = true
    override def prettyName: String = "word_gram_hashes"

    override protected def nullSafeEval(x: Any): Any =
      TextOps.gramHashes(
        x.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], n)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        x => s"graft.functions.TextOps.gramHashes($x, $n)")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Per n-word window: struct(gram = xxhash64 of all n words, prefix =
    * xxhash64 of the first n−1) — the n-gram LM shape. The sequential
    * xxhash64 fold makes the prefix hash an INTERMEDIATE of the gram
    * hash, so the kernel computes both in one pass at half the HOF
    * twin's hash work, bitwise-equal to evaluating the two xxhash64
    * calls separately (hash(w_1..w_n) = step(hash(w_1..w_{n-1}), w_n)
    * is the fold's definition, not an approximation). */
  case class WordGramPrefixHashes(child: Expression, n: Int)
      extends UnaryExpression {
    require(n >= 2, s"need n >= 2 for a conditional LM: $n")
    override def dataType: DataType =
      ArrayType(WordGramPrefixHashes.elem, containsNull = false)
    override def nullable: Boolean = true
    override def prettyName: String = "word_gram_prefix_hashes"

    override protected def nullSafeEval(x: Any): Any =
      TextOps.gramPrefixHashes(
        x.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], n)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        x => s"graft.functions.TextOps.gramPrefixHashes($x, $n)")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  object WordGramPrefixHashes {
    val elem: StructType = StructType(Seq(
      StructField("gram", LongType, nullable = false),
      StructField("prefix", LongType, nullable = false)))
  }

  /** DISTINCT 31-bit md5-derived gram hashes of a word array,
    * first-occurrence order — the kernel form of
    * [[graft.operators.Dedup.wordShingleHashes]]'s
    * `array_distinct(transform(sequence, i ->
    * conv(substring(md5(concat_ws(' ', window)), 1, 8), 16, 10) &
    * 2147483647))` (r18 optimization: that interpreted lambda — one hex
    * string materialized and re-parsed per window — was 52% of p03's
    * CPU after the scan spread). Bitwise-identical by construction: the
    * first 8 hex chars of an md5 ARE its first four digest bytes
    * big-endian, so the kernel masks the raw digest instead of printing
    * and parsing hex; OperatorsSpec pins kernel == HOF on real and
    * adversarial inputs. */
  case class WordGram31Hashes(child: Expression, n: Int)
      extends UnaryExpression {
    require(n >= 1, s"need n >= 1: $n")
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = true
    override def prettyName: String = "word_gram31_hashes"

    override protected def nullSafeEval(x: Any): Any =
      TextOps.gram31Hashes(
        x.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], n)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        x => s"graft.functions.TextOps.gram31Hashes($x, $n)")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** DISTINCT n-word shingle strings of a word array, first-occurrence
    * order — the kernel form of [[graft.operators.Dedup.shinglesOf]]'s
    * `array_distinct(transform(sequence, i -> concat_ws(' ', slice)))`.
    * Strings are built by `UTF8String.concatWs` (the same routine the
    * concat_ws expression calls), so equality is byte-exact. */
  case class WordShingles(child: Expression, n: Int)
      extends UnaryExpression {
    require(n >= 1, s"need n >= 1: $n")
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullable: Boolean = true
    override def prettyName: String = "word_shingles"

    override protected def nullSafeEval(x: Any): Any =
      TextOps.shingles(
        x.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], n)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, x => s"graft.functions.TextOps.shingles($x, $n)")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Every n-word window WITH its start position: struct(q, gram) where
    * gram is the xxhash64 of the window — the span-removal family's
    * detection shape ([[graft.operators.TextAnalysis]] removeDupSpans). */
  case class WordGramHashesWithPos(child: Expression, n: Int)
      extends UnaryExpression {
    require(n >= 1, s"need n >= 1: $n")
    override def dataType: DataType =
      ArrayType(WordGramHashesWithPos.elem, containsNull = false)
    override def nullable: Boolean = true
    override def prettyName: String = "word_gram_hashes_with_pos"

    override protected def nullSafeEval(x: Any): Any =
      TextOps.gramHashesWithPos(
        x.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], n)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        x => s"graft.functions.TextOps.gramHashesWithPos($x, $n)")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  object WordGramHashesWithPos {
    val elem: StructType = StructType(Seq(
      StructField("q", IntegerType, nullable = false),
      StructField("gram", LongType, nullable = false)))
  }

  /** struct(q, gram) with the gram as the concat_ws-joined STRING —
    * the contamination variant (the removed windows must byte-match
    * eval shingles built by [[WordShingles]]). */
  case class WordGramStringsWithPos(child: Expression, n: Int)
      extends UnaryExpression {
    require(n >= 1, s"need n >= 1: $n")
    override def dataType: DataType =
      ArrayType(WordGramStringsWithPos.elem, containsNull = false)
    override def nullable: Boolean = true
    override def prettyName: String = "word_gram_strings_with_pos"

    override protected def nullSafeEval(x: Any): Any =
      TextOps.gramStringsWithPos(
        x.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], n)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        x => s"graft.functions.TextOps.gramStringsWithPos($x, $n)")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  object WordGramStringsWithPos {
    val elem: StructType = StructType(Seq(
      StructField("q", IntegerType, nullable = false),
      StructField("gram", StringType, nullable = false)))
  }

  /** Rebuild a document from the words NOT at a removed position, in
    * document order — the kernel form of the span-removal rebuild's
    * `concat_ws(' ', transform(array_except(sequence(0, size-1), __rm),
    * p -> element_at(__ws, p+1)))`. The removed set builds one hash set
    * and the walk is O(L + |rm|), same as array_except's — minus three
    * interpreted lambda layers and two intermediate arrays. */
  case class RebuildText(left: Expression, right: Expression)
      extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
    override def dataType: DataType = StringType
    override def nullable: Boolean = true
    override def prettyName: String = "rebuild_text"

    override protected def nullSafeEval(ws: Any, rm: Any): Any =
      TextOps.rebuildText(
        ws.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
        rm.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        (ws, rm) => s"graft.functions.TextOps.rebuildText($ws, $rm)")

    override protected def withNewChildrenInternal(newLeft: Expression,
        newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }
}

/** Static kernels called from generated code (top-level object with
  * JVM-static methods, for janino). */
object TextOps {

  private val WS = java.util.regex.Pattern.compile("\\s+")

  // the expressions' children are `words(text)` arrays (split output):
  // elements are never null in practice, but Spark's xxhash64 SKIPS a
  // null input (hash unchanged) — match that exactly rather than NPE
  private def step(h: Long, w: UTF8String): Long =
    if (w == null) h
    else org.apache.spark.sql.catalyst.expressions.XXH64.hashUTF8String(w, h)

  /** xxhash64(w_i, ..., w_{i+n-1}) for every window start i; empty when
    * the array holds fewer than n words (explode then drops the row,
    * matching the HOF lineage's `where(size >= n)`). */
  def gramHashes(words: org.apache.spark.sql.catalyst.util.ArrayData,
      n: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val len = words.numElements()
    val m = len - n + 1
    if (m <= 0)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array.emptyLongArray)
    val ws = new Array[UTF8String](len)
    var i = 0
    while (i < len) { ws(i) = words.getUTF8String(i); i += 1 }
    val out = new Array[Long](m)
    i = 0
    while (i < m) {
      var h = 42L // xxhash64's default seed
      var j = 0
      while (j < n) { h = step(h, ws(i + j)); j += 1 }
      out(i) = h
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  private val SPACE = UTF8String.fromString(" ")

  /** DISTINCT window strings, first-occurrence order (array_distinct's
    * order over the transform output). UTF8String equality/hashCode are
    * byte-exact, so the set dedups exactly like array_distinct. */
  def shingles(words: org.apache.spark.sql.catalyst.util.ArrayData,
      n: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val len = words.numElements()
    val m = len - n + 1
    if (m <= 0)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array.empty[Any])
    val ws = new Array[UTF8String](len)
    var i = 0
    while (i < len) { ws(i) = words.getUTF8String(i); i += 1 }
    val seen = new java.util.LinkedHashSet[UTF8String]()
    val buf = new Array[UTF8String](n)
    i = 0
    while (i < m) {
      System.arraycopy(ws, i, buf, 0, n)
      seen.add(UTF8String.concatWs(SPACE, buf: _*))
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      seen.toArray(Array.empty[AnyRef]))
  }

  private val MD5 = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  /** DISTINCT 31-bit md5-derived gram identities, first-occurrence
    * order. Value = the md5 digest's first four bytes big-endian masked
    * to 31 bits — exactly `conv(substring(md5(gram), 1, 8), 16, 10) &
    * 2147483647` without the hex round-trip (the first 8 hex chars ARE
    * the first 4 digest bytes). The digest input is the window's words
    * joined with single spaces in UTF-8, which is what Spark's
    * md5(string) hashes. */
  def gram31Hashes(words: org.apache.spark.sql.catalyst.util.ArrayData,
      n: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val len = words.numElements()
    val m = len - n + 1
    if (m <= 0)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array.emptyLongArray)
    val ws = new Array[UTF8String](len)
    var i = 0
    while (i < len) { ws(i) = words.getUTF8String(i); i += 1 }
    val md = MD5.get()
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    val buf = new Array[UTF8String](n)
    i = 0
    while (i < m) {
      System.arraycopy(ws, i, buf, 0, n)
      md.reset()
      val d = md.digest(UTF8String.concatWs(SPACE, buf: _*).getBytes)
      seen.add(((d(0) & 0xFFL) << 24 | (d(1) & 0xFFL) << 16 |
        (d(2) & 0xFFL) << 8 | (d(3) & 0xFFL)) & 0x7FFFFFFFL)
      i += 1
    }
    val out = new Array[Long](seen.size())
    val it = seen.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** (q, xxhash64 window) per window start. */
  def gramHashesWithPos(words: org.apache.spark.sql.catalyst.util.ArrayData,
      n: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val len = words.numElements()
    val m = len - n + 1
    if (m <= 0)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array.empty[Any])
    val ws = new Array[UTF8String](len)
    var i = 0
    while (i < len) { ws(i) = words.getUTF8String(i); i += 1 }
    val out = new Array[Any](m)
    i = 0
    while (i < m) {
      var h = 42L
      var j = 0
      while (j < n) { h = step(h, ws(i + j)); j += 1 }
      out(i) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](i, h))
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** (q, concat_ws-joined window string) per window start. */
  def gramStringsWithPos(words: org.apache.spark.sql.catalyst.util.ArrayData,
      n: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val len = words.numElements()
    val m = len - n + 1
    if (m <= 0)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array.empty[Any])
    val ws = new Array[UTF8String](len)
    var i = 0
    while (i < len) { ws(i) = words.getUTF8String(i); i += 1 }
    val out = new Array[Any](m)
    val buf = new Array[UTF8String](n)
    i = 0
    while (i < m) {
      System.arraycopy(ws, i, buf, 0, n)
      out(i) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](i, UTF8String.concatWs(SPACE, buf: _*)))
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Words at positions NOT in `removed`, joined with single spaces in
    * document order — array_except(sequence, rm) + element_at walk. */
  def rebuildText(words: org.apache.spark.sql.catalyst.util.ArrayData,
      removed: org.apache.spark.sql.catalyst.util.ArrayData): UTF8String = {
    val len = words.numElements()
    val rm = new java.util.HashSet[Integer]()
    var i = 0
    while (i < removed.numElements()) { rm.add(removed.getInt(i)); i += 1 }
    val kept = new java.util.ArrayList[UTF8String](len)
    i = 0
    while (i < len) {
      if (!rm.contains(i)) kept.add(words.getUTF8String(i))
      i += 1
    }
    UTF8String.concatWs(SPACE, kept.toArray(Array.empty[UTF8String]): _*)
  }

  /** struct(gram, prefix) hashes per window — one fold yields both. */
  def gramPrefixHashes(words: org.apache.spark.sql.catalyst.util.ArrayData,
      n: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val len = words.numElements()
    val m = len - n + 1
    if (m <= 0)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array.empty[Any])
    val ws = new Array[UTF8String](len)
    var i = 0
    while (i < len) { ws(i) = words.getUTF8String(i); i += 1 }
    val out = new Array[Any](m)
    i = 0
    while (i < m) {
      var h = 42L
      var j = 0
      while (j < n - 1) { h = step(h, ws(i + j)); j += 1 }
      val prefix = h
      val gram = step(h, ws(i + n - 1))
      out(i) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](gram, prefix))
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Code-point order on strings — identical to UTF-8 byte order, i.e.
    * to Spark's `array_sort` on StringType (UTF8String binary compare)
    * and DuckDB's default `list_sort`. Java's String.compareTo is
    * UTF-16-unit order, which DIFFERS above the BMP — not used. */
  private val cpOrder: java.util.Comparator[String] =
    new java.util.Comparator[String] {
      override def compare(a: String, b: String): Int = {
        var i = 0
        var j = 0
        while (i < a.length && j < b.length) {
          val ca = a.codePointAt(i)
          val cb = b.codePointAt(j)
          if (ca != cb) return Integer.compare(ca, cb)
          i += Character.charCount(ca)
          j += Character.charCount(cb)
        }
        Integer.compare(a.length - i, b.length - j)
      }
    }

  /** (types, 1 − Σp², maxRun/total) over runs of a sorted sequence,
    * folding in run (= sorted-symbol) order with the HOF's exact op
    * sequence. `eq(i, j)` compares positions of the sorted sequence. */
  private def runStats(n: Int, eq: (Int, Int) => Boolean): (Long, Double, Double) = {
    if (n == 0) return (0L, 0.0, 0.0)
    val total = n.toDouble
    var acc = 0.0
    var types = 0L
    var maxRun = 0
    var i = 0
    while (i < n) {
      var j = i + 1
      while (j < n && eq(i, j)) j += 1
      val run = j - i
      val p = run.toDouble / total
      acc += p * p
      if (run > maxRun) maxRun = run
      types += 1L
      i = j
    }
    (types, 1.0 - acc, maxRun.toDouble / total)
  }

  def lexicalDiversity(text: UTF8String): InternalRow = {
    // chars: code points of the RAW text, sorted (int sort == the
    // HOF's array_sort over single-code-point strings)
    val s = text.toString
    var nCp = 0
    var i = 0
    while (i < s.length) { i += Character.charCount(s.codePointAt(i)); nCp += 1 }
    val cps = new Array[Int](nCp)
    i = 0
    var k = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      cps(k) = cp
      k += 1
      i += Character.charCount(cp)
    }
    java.util.Arrays.sort(cps)
    val (_, simpsonChar, topCharFrac) = runStats(nCp, (a, b) => cps(a) == cps(b))

    // words: UTF8String.trim/toLowerCase are EXACTLY Spark's
    // trim()/lower(); then the canonical \s+ collapse and space split
    // with Java's limit=-1 trailing-empty behavior, empties dropped
    val lowered = text.trim().toLowerCase.toString
    val parts = WS.matcher(lowered).replaceAll(" ").split(" ", -1)
    var nW = 0
    var pi = 0
    while (pi < parts.length) { if (parts(pi).length > 0) nW += 1; pi += 1 }
    val words = new Array[String](nW)
    pi = 0
    k = 0
    while (pi < parts.length) {
      if (parts(pi).length > 0) { words(k) = parts(pi); k += 1 }
      pi += 1
    }
    java.util.Arrays.sort(words, cpOrder)
    val (wordTypes, simpsonWord, topWordFrac) =
      runStats(nW, (a, b) => words(a) == words(b))

    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](nCp.toLong, nW.toLong, wordTypes,
        if (nW == 0) 0.0 else wordTypes.toDouble / nW.toDouble,
        if (nCp == 0) 0.0 else simpsonChar,
        if (nW == 0) 0.0 else simpsonWord,
        if (nCp == 0) 0.0 else topCharFrac,
        if (nW == 0) 0.0 else topWordFrac))
  }
}
