package graft.operators

import java.io.ByteArrayOutputStream
import java.util.zip.{Deflater, Inflater}

import org.apache.spark.sql.{Dataset, SparkSession}

/** Minimal PDF writer + text extractor — the "books and papers" ingest path
  * of a training-data pipeline (PDF→text is how print corpora enter
  * pretraining mixes).
  *
  * Everything here is the public PDF 1.4 core (ISO 32000-1): objects, xref,
  * FlateDecode content streams, and the text-showing operators
  * Tj / TJ / ' / " with Td/TD/T* line moves. PDF string literals are byte
  * strings; this implementation treats them as Latin-1 (chars > 0xFF are
  * out of scope — real Unicode extraction needs embedded /ToUnicode CMaps),
  * with the standard \-escapes and \ooo octal for non-printable bytes, so
  * write→extract round-trips byte-exactly.
  *
  * Scale shape: both directions are per-row byte walks behind the same
  * mapPartitions codec seam as [[Multimodal]] — zero shuffle, scan-bound.
  * The reference ships PDFs only as opaque BLOBs (no parser in litebase);
  * this operator is training-pipeline surface beyond it.
  */
object Pdf {

  // ---------------------------------------------------------------- writer

  private def escape(s: String): String = {
    val b = new StringBuilder
    s.foreach {
      case '\\' => b.append("\\\\")
      case '(' => b.append("\\(")
      case ')' => b.append("\\)")
      case c if c >= ' ' && c <= '~' => b.append(c)
      case c if c <= 0xFF => b.append(f"\\${c.toInt}%03o")
      case c => throw new IllegalArgumentException(
        s"char U+${c.toInt}%04X exceeds Latin-1; PDF text strings are byte strings")
    }
    b.toString
  }

  private def deflate(data: Array[Byte]): Array[Byte] = {
    val d = new Deflater()
    d.setInput(data); d.finish()
    val out = new ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  private def inflate(data: Array[Byte]): Array[Byte] = {
    val inf = new Inflater()
    inf.setInput(data)
    val out = new ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!inf.finished() && !inf.needsInput()) out.write(buf, 0, inf.inflate(buf))
    inf.end()
    out.toByteArray
  }

  /** One page's content stream: position once, then show each line —
    * `Tj` per line, or (`chunked`) a kerned `TJ` array of ≤24-char pieces,
    * with `T*` line moves between lines. */
  private def contentStream(lines: Seq[String], chunked: Boolean): String = {
    val shows = lines.map { line =>
      if (!chunked) s"(${escape(line)}) Tj"
      else line.grouped(24).toSeq match {
        case Seq() => "() Tj"
        case chunks => chunks.map(c => s"(${escape(c)})").mkString("[ ", " -12 ", " ] TJ")
      }
    }
    shows.mkString("BT\n/F1 12 Tf\n14 TL\n72 760 Td\n", "\nT*\n", "\nET\n")
  }

  /** Encode `text` as a complete PDF: lines split on \n, `linesPerPage`
    * per page, each page a FlateDecode content stream, plus catalog /
    * pages / font objects, xref table and trailer. */
  def encodePdf(text: String, chunked: Boolean = false,
      linesPerPage: Int = 50): Array[Byte] = {
    val lines = text.split("\n", -1).toSeq
    val pages = lines.grouped(linesPerPage).toSeq match {
      case Seq() => Seq(Seq(""))
      case ps => ps
    }
    val n = pages.length
    // object ids: 1 catalog, 2 pages, 3 font, 4..3+n page, 4+n..3+2n content
    val objs = scala.collection.mutable.ArrayBuffer[String]()
    objs += s"<< /Type /Catalog /Pages 2 0 R >>"
    objs += ("<< /Type /Pages /Kids [ " +
      (0 until n).map(i => s"${4 + i} 0 R").mkString(" ") + s" ] /Count $n >>")
    objs += "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    pages.indices.foreach { i =>
      objs += ("<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
        s"/Resources << /Font << /F1 3 0 R >> >> /Contents ${4 + n + i} 0 R >>")
    }
    val streams = pages.map(p =>
      deflate(contentStream(p, chunked).getBytes("ISO-8859-1")))
    val out = new ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes("ISO-8859-1"))
    w("%PDF-1.4\n")
    val offsets = scala.collection.mutable.ArrayBuffer[Int]()
    objs.zipWithIndex.foreach { case (body, i) =>
      offsets += out.size()
      w(s"${i + 1} 0 obj\n$body\nendobj\n")
    }
    streams.zipWithIndex.foreach { case (data, i) =>
      offsets += out.size()
      w(s"${4 + n + i} 0 obj\n<< /Length ${data.length} /Filter /FlateDecode >>\nstream\n")
      out.write(data, 0, data.length)
      w("\nendstream\nendobj\n")
    }
    val xref = out.size()
    val total = offsets.length + 1
    w(s"xref\n0 $total\n0000000000 65535 f \n")
    offsets.foreach(o => w(f"$o%010d 00000 n \n"))
    w(s"trailer\n<< /Size $total /Root 1 0 R >>\nstartxref\n$xref\n%%EOF\n")
    out.toByteArray
  }

  // ---------------------------------------------------------------- parser

  /** Decode a PDF string literal starting at `(`; returns (text, next index).
    * Handles \-escapes, \ooo octal, escaped newlines and nested parens. */
  private[graft] def parseString(s: String, start: Int): (String, Int) = {
    val b = new StringBuilder
    var i = start + 1
    var depth = 1
    while (i < s.length && depth > 0) {
      s.charAt(i) match {
        case '\\' if i + 1 < s.length =>
          s.charAt(i + 1) match {
            case 'n' => b.append('\n'); i += 2
            case 'r' => b.append('\r'); i += 2
            case 't' => b.append('\t'); i += 2
            case 'b' => b.append('\b'); i += 2
            case 'f' => b.append('\f'); i += 2
            case '\n' => i += 2 // escaped line break = line continuation
            case d if d >= '0' && d <= '7' =>
              var oct = 0; var k = i + 1
              while (k < s.length && k < i + 4 && s.charAt(k) >= '0' && s.charAt(k) <= '7') {
                oct = oct * 8 + (s.charAt(k) - '0'); k += 1
              }
              b.append((oct & 0xFF).toChar); i = k
            case c => b.append(c); i += 2
          }
        case '(' => depth += 1; b.append('('); i += 1
        case ')' =>
          depth -= 1
          if (depth > 0) b.append(')')
          i += 1
        case c => b.append(c); i += 1
      }
    }
    (b.toString, i)
  }

  /** Extract show-text content from one (inflated) content stream into `out`.
    * Newline ops (T*, Td, TD, ', ") append '\n' only once text has been
    * shown — the initial positioning Td must not fake a leading blank line.
    * Returns whether any show op ran. */
  private[graft] def extractContent(cs: String, out: StringBuilder,
      shownAtEntry: Boolean): Boolean = {
    var shown = shownAtEntry
    var pendingStrings = List.empty[String]
    var i = 0
    def newline(): Unit = if (shown) out.append('\n')
    while (i < cs.length) {
      cs.charAt(i) match {
        case '(' =>
          val (str, next) = parseString(cs, i)
          pendingStrings ::= str; i = next
        case '%' => // comment to end of line
          while (i < cs.length && cs.charAt(i) != '\n') i += 1
        case c if c.isLetter || c == '\'' || c == '"' || c == '*' =>
          val start = i
          while (i < cs.length && !cs.charAt(i).isWhitespace &&
            cs.charAt(i) != '(' && cs.charAt(i) != '[' && cs.charAt(i) != ']') i += 1
          val op = cs.substring(start, i)
          op match {
            case "Tj" =>
              pendingStrings.headOption.foreach(out.append(_)); shown = true
            case "TJ" =>
              pendingStrings.reverse.foreach(out.append(_)); shown = true
            case "'" =>
              newline(); pendingStrings.headOption.foreach(out.append(_)); shown = true
            case "\"" =>
              newline(); pendingStrings.headOption.foreach(out.append(_)); shown = true
            case "T*" => newline()
            case "Td" | "TD" => newline()
            case _ => ()
          }
          if (op == "Tj" || op == "TJ" || op == "'" || op == "\"" ||
            op == "T*" || op == "Td" || op == "TD" || op.nonEmpty)
            pendingStrings = Nil
        case _ => i += 1
      }
    }
    shown
  }

  /** All FlateDecode stream payloads in document order, located via each
    * stream dict's direct /Length (falling back to an `endstream` scan when
    * /Length is an indirect reference — compressed bytes may legally
    * contain the word "endstream", which is why /Length is preferred). */
  private[graft] def streamPayloads(bytes: Array[Byte]): Seq[Array[Byte]] = {
    val latin = new String(bytes, "ISO-8859-1")
    val res = scala.collection.mutable.ArrayBuffer[Array[Byte]]()
    var from = 0
    while ({ val at = latin.indexOf("stream", from); at >= 0 && {
      // require it to be the keyword, not "endstream"
      val isEnd = at >= 3 && latin.regionMatches(at - 3, "end", 0, 3)
      if (!isEnd) {
        val dictStart = latin.lastIndexOf("<<", at)
        val dict = if (dictStart >= 0) latin.substring(dictStart, at) else ""
        var dataStart = at + "stream".length
        if (dataStart < latin.length && latin.charAt(dataStart) == '\r') dataStart += 1
        if (dataStart < latin.length && latin.charAt(dataStart) == '\n') dataStart += 1
        val lenRe = """/Length\s+(\d+)(?!\s+0\s+R)""".r
        val known = lenRe.findFirstMatchIn(dict).map(m => dataStart + m.group(1).toInt)
        val end = known.getOrElse(latin.indexOf("endstream", dataStart) match {
          case -1 => latin.length
          case e => e
        })
        if (dict.contains("/FlateDecode"))
          // corrupt/truncated deflate data skips THIS stream, never throws
          // (crawler-grade contract shared with Tar/Warc/Zip)
          try res += inflate(java.util.Arrays.copyOfRange(bytes, dataStart,
            math.min(end, bytes.length)))
          catch { case _: Exception => () }
        // with a direct /Length, resume the scan AFTER the payload — the
        // compressed bytes may legally contain the word "endstream"
        from = latin.indexOf("endstream", math.min(end, latin.length)) match {
          case -1 => latin.length
          case e => e + 9
        }
      } else from = at + "stream".length
      true
    } }) ()
    res.toSeq
  }

  private val pageRe = """/Type\s*/Page(?![a-zA-Z])""".r
  private val objRe = """(?m)^\d+ 0 obj""".r

  final case class PdfDoc(media_id: Long, n_pages: Long, n_objects: Long,
    extracted: String)

  /** Parse one PDF: page/object counts from the object graph, text from
    * every FlateDecode content stream in order (page boundaries become
    * line breaks, matching the writer's one-text-column layout). */
  def extract(mediaId: Long, bytes: Array[Byte]): PdfDoc = {
    val latin = new String(bytes, "ISO-8859-1")
    val nPages = pageRe.findAllMatchIn(latin).size
    val nObjects = objRe.findAllMatchIn(latin).size
    val out = new StringBuilder
    var shown = false
    streamPayloads(bytes).foreach { payload =>
      if (shown) out.append('\n')
      shown = extractContent(new String(payload, "ISO-8859-1"), out, false) || shown
    }
    PdfDoc(mediaId, nPages.toLong, nObjects.toLong, out.toString)
  }

  /** Per-row PDF text extraction behind the mapPartitions codec seam —
    * iterator-in/iterator-out, zero shuffle, same shape as
    * [[Multimodal.decodeImages]]. */
  def extractPdfs(media: Dataset[Multimodal.MediaRow])
      (implicit spark: SparkSession): Dataset[PdfDoc] = {
    import spark.implicits._
    media.mapPartitions(rows => rows.map(m => extract(m.media_id, m.payload)))
  }
}
