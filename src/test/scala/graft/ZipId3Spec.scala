package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Id3, Zip}

/** ZIP + ID3 codec exactness, including interop with the JDK's own zip
  * streams as an INDEPENDENT implementation in both directions. */
class ZipId3Spec extends AnyFunSuite {

  private val members = Seq(
    ("a/doc.txt", "hello zip world, stored and deflated".getBytes("UTF-8"), true),
    ("meta.bin", Array.tabulate[Byte](300)(i => (i % 251).toByte), false))

  test("zip round-trips names, methods, payloads and CRCs") {
    val got = Zip.parse(Zip.encode(members))
    assert(got.map(_.name) == members.map(_._1))
    assert(got.map(_.method) == Seq(8, 0))
    assert(got.forall(_.crc_ok))
    got.zip(members).foreach { case (m, (_, data, _)) =>
      assert(java.util.Arrays.equals(m.payload, data))
      assert(m.uncomp_size == data.length)
    }
  }

  test("the JDK's ZipInputStream reads our archives (independent reader)") {
    val in = new java.util.zip.ZipInputStream(
      new java.io.ByteArrayInputStream(Zip.encode(members)))
    val got = Iterator.continually(in.getNextEntry).takeWhile(_ != null).map { e =>
      val b = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](4096)
      Iterator.continually(in.read(buf)).takeWhile(_ >= 0)
        .foreach(n => b.write(buf, 0, n))
      (e.getName, b.toByteArray)
    }.toList
    assert(got.map(_._1) == members.map(_._1))
    got.zip(members).foreach { case ((_, data), (_, want, _)) =>
      assert(java.util.Arrays.equals(data, want))
    }
  }

  test("we read the JDK's ZipOutputStream archives (independent writer)") {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.util.zip.ZipOutputStream(bos)
    members.foreach { case (name, data, _) =>
      out.putNextEntry(new java.util.zip.ZipEntry(name))
      out.write(data); out.closeEntry()
    }
    out.close()
    val got = Zip.parse(bos.toByteArray)
    // JDK streaming entries use the data-descriptor flag (zero sizes in
    // the local header, real values in the descriptor + central
    // directory) — the central-directory fallback must recover ALL of
    // them byte-correct
    assert(got.map(_.name) == members.map(_._1))
    assert(got.forall(_.crc_ok))
    got.zip(members).foreach { case (m, (_, want, _)) =>
      assert(java.util.Arrays.equals(m.payload, want))
    }
  }

  test("a flipped payload byte fails the member CRC, parsing continues") {
    val bytes = Zip.encode(Seq(("x.bin", Array.tabulate[Byte](64)(_.toByte), false),
      ("y.bin", "fine".getBytes, false)))
    bytes(30 + 5 + 10) = 99 // inside x.bin's stored payload
    val got = Zip.parse(bytes)
    assert(got.map(_.name) == Seq("x.bin", "y.bin"))
    assert(got.map(_.crc_ok) == Seq(false, true))
  }

  test("id3v2.3 round-trips text frames; v1 truncates at 30 bytes") {
    val audio = Array.tabulate[Byte](100)(_.toByte)
    val v2 = Id3.parse(1L, Id3.encodeV2("A Long Title Indeed", "Some Artist",
      "The Album", audio))
    assert(v2.valid && v2.version == "2.3")
    assert((v2.title, v2.artist, v2.album) ==
      (("A Long Title Indeed", "Some Artist", "The Album")))
    assert(v2.n_frames == 3)
    val longTitle = "this title is definitely longer than thirty bytes total"
    val v1 = Id3.parse(2L, Id3.encodeV1(longTitle, "artist x", "album y", audio))
    assert(v1.valid && v1.version == "1")
    assert(v1.title == longTitle.take(30).stripTrailing())
    assert(v1.artist == "artist x" && v1.album == "album y")
    // no tag at all -> invalid row, never a throw
    assert(!Id3.parse(3L, audio).valid)
    // truncated v2 tag -> invalid, no crash
    val cut = Id3.encodeV2("t", "a", "b", audio).take(14)
    assert(!Id3.parse(4L, cut).valid)
  }

  test("id3v2 UTF-16 text frames decode") {
    // hand-build a single UTF-16 TIT2 frame (encoding byte 1 + BOM)
    val text = "café 中文"
    val payload = 1.toByte +: (Array(0xFE.toByte, 0xFF.toByte) ++
      text.getBytes("UTF-16BE"))
    val size = payload.length
    val frame = "TIT2".getBytes("US-ASCII") ++ Array(
      ((size >> 24) & 0xFF).toByte, ((size >> 16) & 0xFF).toByte,
      ((size >> 8) & 0xFF).toByte, (size & 0xFF).toByte, 0.toByte, 0.toByte) ++
      payload
    val tag = "ID3".getBytes("US-ASCII") ++
      Array(3.toByte, 0.toByte, 0.toByte) ++
      Array(((frame.length >> 21) & 0x7F).toByte, ((frame.length >> 14) & 0x7F).toByte,
        ((frame.length >> 7) & 0x7F).toByte, (frame.length & 0x7F).toByte) ++ frame
    val got = Id3.parse(9L, tag)
    assert(got.valid && got.title == text)
  }
}
