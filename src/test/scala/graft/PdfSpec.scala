package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Multimodal, Pdf}

/** Write→extract round-trips for the PDF operator: escapes, TJ chunking,
  * multi-line and multi-page layouts, and structural counts. */
class PdfSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def roundTrip(text: String, chunked: Boolean = false,
      linesPerPage: Int = 50): Pdf.PdfDoc =
    Pdf.extract(0L, Pdf.encodePdf(text, chunked, linesPerPage))

  test("plain text round-trips byte-exactly (Tj and TJ modes)") {
    val t = "hello pdf world this is a simple single line document"
    assert(roundTrip(t).extracted == t)
    assert(roundTrip(t, chunked = true).extracted == t)
  }

  test("escapes round-trip: parens, backslashes, tabs, high latin-1 bytes") {
    val nasty = "par(en)s \\ back\\slash\tand high bytes " +
      new String(Array(0xE9.toChar, 0xFC.toChar, 0xA0.toChar)) + " end()"
    assert(roundTrip(nasty).extracted == nasty)
    assert(roundTrip(nasty, chunked = true).extracted == nasty)
  }

  test("multi-line text round-trips, including empty first and last lines") {
    val t = "\nfirst real line\nsecond line\n\nafter blank\n"
    assert(roundTrip(t).extracted == t)
    assert(roundTrip(t, chunked = true).extracted == t)
  }

  test("multi-page: page boundaries rebuild the original line breaks") {
    val lines = (1 to 23).map(i => s"line number $i with words")
    val t = lines.mkString("\n")
    val doc = roundTrip(t, linesPerPage = 5)
    assert(doc.extracted == t)
    assert(doc.n_pages == 5) // ceil(23/5)
    // 3 fixed objects + page + content per page
    assert(doc.n_objects == 3 + 2 * 5)
  }

  test("single-page structure: 5 objects, 1 page") {
    val doc = roundTrip("just one line")
    assert(doc.n_pages == 1)
    assert(doc.n_objects == 5)
  }

  test("a corrupt stream is skipped; intact pages still extract, no throw") {
    val lines = (1 to 60).map(i => s"line $i")
    val bytes = Pdf.encodePdf(lines.mkString("\n"), linesPerPage = 50)
    val latin = new String(bytes, "ISO-8859-1")
    val firstData = latin.indexOf("stream\n") + 7
    (0 until 8).foreach(i => bytes(firstData + i) = 0x55)
    val doc = Pdf.extract(1L, bytes)
    assert(doc.n_pages == 2)
    // page 1's deflate is destroyed; page 2 survives byte-exact
    assert(doc.extracted == lines.drop(50).mkString("\n"))
  }

  test("string parser handles nested parens and octal escapes") {
    assert(Pdf.parseString("(a(b)c)", 0)._1 == "a(b)c")
    assert(Pdf.parseString("(\\101\\102)", 0)._1 == "AB")
    assert(Pdf.parseString("(line\\nbreak)", 0)._1 == "line\nbreak")
  }

  test("extractPdfs runs distributed over the media seam") {
    implicit val s = spark
    val media = (0L to 9L).map { id =>
      Multimodal.MediaRow(id, "pdf", Pdf.encodePdf(s"document body $id", chunked = id % 2 == 1))
    }.toDS()
    val got = Pdf.extractPdfs(media).collect().map(d => d.media_id -> d.extracted).toMap
    (0L to 9L).foreach(id => assert(got(id) == s"document body $id"))
  }
}
