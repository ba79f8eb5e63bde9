package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Multimodal, TextAnalysis}

/** Seeded-random fuzz over the multimodal codecs and chunking geometry:
  * encode→decode must be the identity for ARBITRARY payloads (not just
  * the oracle fixtures), across dimension edge cases (1-pixel images,
  * row strides that need padding, single-sample audio, single-frame
  * video). Deterministic seed — failures reproduce. */
class CodecFuzzSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def rnd = new scala.util.Random(0xC0DEC5EEDL)

  test("PPM round-trips arbitrary images") {
    val r = rnd
    for (_ <- 1 to 100) {
      val w = 1 + r.nextInt(32); val h = 1 + r.nextInt(32)
      val rgb = Array.fill[Byte](w * h * 3)(r.nextInt(256).toByte)
      val (dw, dh, drgb) = Multimodal.decodePpm(Multimodal.encodePpm(w, h, rgb))
      assert(dw == w && dh == h && drgb.toSeq == rgb.toSeq, s"${w}x$h")
    }
  }

  test("BMP round-trips arbitrary images") {
    val r = rnd
    for (_ <- 1 to 50) {
      val w = 1 + r.nextInt(24); val h = 1 + r.nextInt(24)
      val rgb = Array.fill[Byte](w * h * 3)(r.nextInt(256).toByte)
      val (dw, dh, drgb) = Multimodal.decodeBmp(Multimodal.encodeBmp(w, h, rgb))
      assert(dw == w && dh == h && drgb.toSeq == rgb.toSeq, s"${w}x$h")
    }
  }

  test("WAV round-trips arbitrary PCM16 streams") {
    val r = rnd
    for (_ <- 1 to 50) {
      val rate = Seq(8000, 11025, 16000, 44100)(r.nextInt(4))
      val n = 1 + r.nextInt(2048)
      val samples = Array.fill[Short](n)(r.nextInt(65536).toShort)
      val (dRate, dCh, dSamples) =
        Multimodal.decodeWav(Multimodal.encodeWavPcm16(rate, samples))
      assert(dRate == rate && dCh == 1 && dSamples.toSeq == samples.toSeq,
        s"rate=$rate n=$n")
    }
  }

  test("G.711 WAVs round-trip arbitrary code streams through decodeWav") {
    val r = rnd
    for (_ <- 1 to 50) {
      val n = 1 + r.nextInt(2048)
      val codes = Array.fill[Byte](n)(r.nextInt(256).toByte)
      val aLaw = r.nextBoolean()
      val (rate, ch, samples) =
        Multimodal.decodeWav(Multimodal.encodeWavG711(8000, codes, aLaw))
      assert(rate == 8000 && ch == 1 && samples.length == n)
      val expect = codes.map(b =>
        if (aLaw) Multimodal.alawDecode(b & 0xFF) else Multimodal.ulawDecode(b & 0xFF))
      assert(samples.toSeq == expect.toSeq, s"aLaw=$aLaw n=$n")
    }
  }

  test("truncated G.711 WAVs are rejected, not mis-decoded") {
    val r = rnd
    val full = Multimodal.encodeWavG711(8000,
      Array.fill[Byte](64)(r.nextInt(256).toByte), aLaw = false)
    for (cut <- Seq(4, 12, 20, full.length - 8, full.length - 1)) {
      // an error (bad header, corrupt chunk, unreadable stream) — never a
      // silently wrong decode
      intercept[Exception] { Multimodal.decodeWav(full.take(cut)) }
    }
  }

  test("AVI round-trips arbitrary frame stacks") {
    val r = rnd
    for (_ <- 1 to 40) {
      val w = 1 + r.nextInt(24); val h = 1 + r.nextInt(16)
      val fps = 1 + r.nextInt(60)
      val nf = 1 + r.nextInt(6)
      val frames = Seq.fill(nf)(Array.fill[Byte](w * h * 3)(r.nextInt(256).toByte))
      val (dw, dh, dFps, dFrames) =
        Multimodal.decodeAvi(Multimodal.encodeAvi(w, h, fps, frames))
      assert(dw == w && dh == h && dFps == fps && dFrames.length == nf,
        s"${w}x$h fps=$fps nf=$nf")
      dFrames.zip(frames).foreach { case (d, o) =>
        assert(d.toSeq == o.toSeq, s"${w}x$h frame mismatch")
      }
    }
  }

  test("PNG and grayscale GIF round-trip arbitrary images") {
    val r = rnd
    for (_ <- 1 to 40) {
      val w = 1 + r.nextInt(24); val h = 1 + r.nextInt(24)
      val rgb = Array.fill[Byte](w * h * 3)(r.nextInt(256).toByte)
      val (pw, ph, prgb) = Multimodal.decodeBmp(Multimodal.encodePng(w, h, rgb))
      assert(pw == w && ph == h && prgb.toSeq == rgb.toSeq, s"png ${w}x$h")
      val gray = Array.fill[Byte](w * h)(r.nextInt(256).toByte)
      val (gw, gh, grgb) = Multimodal.decodeBmp(Multimodal.encodeGifGray(w, h, gray))
      assert(gw == w && gh == h, s"gif ${w}x$h")
      (0 until w * h).foreach(i => assert(grgb(i * 3) == gray(i), s"gif ${w}x$h px $i"))
    }
  }

  test("MJPEG AVI decodes arbitrary frame stacks with exact geometry") {
    val r = rnd
    for (_ <- 1 to 15) {
      val w = 1 + r.nextInt(20); val h = 1 + r.nextInt(16)
      val fps = 1 + r.nextInt(60); val nf = 1 + r.nextInt(4)
      val frames = Seq.fill(nf)(Array.fill[Byte](w * h * 3)(r.nextInt(256).toByte))
      val (dw, dh, dfps, df) =
        Multimodal.decodeAvi(Multimodal.encodeAviMjpeg(w, h, fps, frames))
      assert(dw == w && dh == h && dfps == fps && df.length == nf, s"${w}x$h@$fps x$nf")
      df.foreach(f => assert(f.length == w * h * 3))
    }
  }

  test("IMA-ADPCM decodes arbitrary PCM16 streams deterministically") {
    val r = rnd
    for (_ <- 1 to 40) {
      val rate = Seq(8000, 16000, 22050)(r.nextInt(3))
      val n = 1 + r.nextInt(1400)
      val samples = Array.fill[Short](n)((r.nextInt(65536) - 32768).toShort)
      val wav = Multimodal.encodeWavImaAdpcm(rate, samples)
      val (dr, ch, d1) = Multimodal.decodeWav(wav)
      assert(dr == rate && ch == 1 && d1.length == n, s"$rate/$n")
      val (_, _, d2) = Multimodal.decodeWav(wav)
      assert(d1.toSeq == d2.toSeq, "non-deterministic decode")
      // the first sample is stored verbatim in the block header
      assert(d1(0) == samples(0))
    }
  }

  test("FLAC round-trips arbitrary PCM16 streams across block sizes") {
    import graft.operators.Flac
    val r = rnd
    for (_ <- 1 to 40) {
      val rate = Seq(8000, 16000, 44100, 48000)(r.nextInt(4))
      val n = 1 + r.nextInt(4000)
      val blockSize = Seq(16, 64, 256, 1024, 4096)(r.nextInt(5))
      // mix of signal shapes so every predictor order gets exercised:
      // white noise, constant runs, ramps, smooth sine-ish curves
      val kind = r.nextInt(4)
      val samples = Array.tabulate[Short](n) { i =>
        kind match {
          case 0 => r.nextInt(65536).toShort
          case 1 => 1234.toShort
          case 2 => ((i * 7 - 5000) % 32768).toShort
          case _ => (math.sin(i / 50.0) * 20000).toShort
        }
      }
      val flac = Flac.encode(rate, samples, blockSize)
      val (dRate, dCh, dSamples) = Flac.decode(flac)
      assert(dRate == rate && dCh == 1 && dSamples.toSeq == samples.toSeq,
        s"rate=$rate n=$n block=$blockSize kind=$kind")
      // compression sanity: smooth signals actually shrink vs raw PCM
      if (kind == 1 && n > 512) assert(flac.length < n * 2)
    }
  }

  test("FLAC decodes through the decodeAudio operator seam") {
    import graft.operators.Flac
    import spark.implicits._
    implicit val s = spark
    val r = rnd
    val rows = (0 until 8).map { id =>
      val samples = Array.tabulate[Short](200 + id)(i => ((id * 31 + i * 17) % 3000).toShort)
      Multimodal.MediaRow(id.toLong, "flac", Flac.encode(8000, samples, 64))
    }
    val out = Multimodal.decodeAudio(rows.toDS()).collect().sortBy(_.media_id)
    out.zipWithIndex.foreach { case (d, id) =>
      assert(d.sample_rate == 8000L && d.channels == 1L &&
        d.n_samples == 200L + id)
    }
  }

  test("corrupt FLAC payloads are rejected, not mis-decoded") {
    import graft.operators.Flac
    val r = rnd
    val samples = Array.tabulate[Short](500)(i => (i * 13 % 2000).toShort)
    val good = Flac.encode(16000, samples, 128)
    // control: the pristine stream decodes
    assert(Flac.decode(good)._3.length == 500)
    intercept[IllegalArgumentException](Flac.decode(Array[Byte](1, 2, 3)))
    intercept[IllegalArgumentException](
      Flac.decode(good.take(good.length / 2))) // truncated
    for (_ <- 1 to 30) {
      // flip one random byte anywhere: header CRC-8, frame CRC-16 or the
      // STREAMINFO MD5 must catch it (never a silent wrong answer)
      val bad = good.clone()
      val at = r.nextInt(bad.length)
      bad(at) = (bad(at) ^ (1 + r.nextInt(255))).toByte
      val caught = try {
        val (_, _, d) = Flac.decode(bad)
        // if it decoded, the samples must still be EXACT (the flip hit
        // e.g. ignorable STREAMINFO fields like min/max frame size)
        d.toSeq == samples.toSeq
      } catch { case _: IllegalArgumentException => true }
      assert(caught, s"flip at $at silently mis-decoded")
    }
  }

  test("chunkWords geometry holds for arbitrary sizes") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val r = rnd
    val md5of = (s: String) => java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    for (_ <- 1 to 12) {
      val n = 1 + r.nextInt(300)
      val chunkSize = 2 + r.nextInt(60)
      val overlap = r.nextInt(chunkSize) // 0 .. chunkSize-1
      val stride = chunkSize - overlap
      val words = (1 to n).map(i => s"w$i")
      val df = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
      val got = TextAnalysis.chunkWords(df, "text", "doc_id", chunkSize, overlap)
        .orderBy(col("chunk_idx"))
        .collect().map(row => (row.getLong(1), row.getLong(2), row.getString(3)))
      val expected = (0 until n by stride).zipWithIndex.map { case (start, idx) =>
        val slice = words.slice(start, start + chunkSize)
        (idx.toLong, slice.length.toLong, md5of(slice.mkString(" ")))
      }
      assert(got.toSeq == expected,
        s"n=$n chunkSize=$chunkSize overlap=$overlap")
    }
  }

  test("MP3 probe recovers synthesized frame chains exactly (fuzzed)") {
    import graft.operators.Mp3
    val r = rnd
    for (_ <- 1 to 60) {
      val version = 1 + r.nextInt(2)
      val layer = 1 + r.nextInt(3)
      val srIdx = r.nextInt(3)
      val stereo = r.nextBoolean()
      val n = 1 + r.nextInt(12)
      val brIdx = Seq.fill(n)(1 + r.nextInt(14))
      val pads = Seq.fill(n)(r.nextInt(2))
      val bytes = Mp3.encodeFrames(version, layer, srIdx, brIdx, pads, stereo)
      val m = Mp3.probe(7L, bytes)
      assert(m.valid && m.n_frames == n, s"v$version L$layer sr=$srIdx n=$n -> $m")
      assert(m.layer == layer && m.channels == (if (stereo) 2 else 1))
      assert(m.total_frame_bytes == bytes.length, "walk must cover every byte")
      // every bitrate table is injective over indices 1-14, so distinct
      // indices <=> distinct kbps
      assert(m.vbr == (brIdx.distinct.size > 1))
      val expSamples = (version, layer) match {
        case (_, 1) => 384
        case (_, 2) => 1152
        case (1, _) => 1152
        case _ => 576
      }
      assert(math.abs(m.duration_s - n.toDouble * expSamples / m.sample_rate) < 1e-12)
    }
  }

  test("MP3 probe survives leading junk, ID3v2 tags, and truncated tails") {
    import graft.operators.Mp3
    val clean = Mp3.encodeFrames(1, 3, 0, Seq(9, 9, 9), Seq(0, 0, 0), stereo = true)
    // leading junk: resync finds the first frame
    val junk = Array.fill[Byte](37)(0x55) ++ clean
    assert(Mp3.probe(1L, junk).n_frames == 3)
    // ID3v2 tag: skipped via the syncsafe size, not byte-scanned
    val tagBody = Array.fill[Byte](200)(0x41)
    val id3 = Array[Byte]('I', 'D', '3', 4, 0, 0,
      0, 0, (200 >> 7).toByte, (200 & 0x7F).toByte) ++ tagBody ++ clean
    assert(Mp3.probe(2L, id3).n_frames == 3)
    // truncated final frame does not count; full frames before it do
    val cut = clean.dropRight(5)
    assert(Mp3.probe(3L, cut).n_frames == 2)
    // trailing ID3v1 tag stops the walk cleanly
    val v1tag = "TAG".getBytes("US-ASCII") ++ Array.fill[Byte](125)(0)
    assert(Mp3.probe(4L, clean ++ v1tag).n_frames == 3)
    // garbage-only input is invalid, not an exception
    assert(!Mp3.probe(5L, Array.fill[Byte](64)(0x11)).valid)
    assert(!Mp3.probe(6L, Array.emptyByteArray).valid)
  }

  test("MP3 probe parses a real-world file when one is available") {
    import graft.operators.Mp3
    val p = java.nio.file.Paths.get(
      "/usr/lib/google-cloud-sdk/platform/gsutil/gslib/tests/test_data/test.mp3")
    assume(java.nio.file.Files.exists(p), "fixture not on this machine")
    val m = Mp3.probe(0L, java.nio.file.Files.readAllBytes(p))
    assert(m.valid && m.n_frames > 0 && m.sample_rate > 0 && m.duration_s > 0,
      s"real-world parse: $m")
  }

  test("MP4 probe recovers synthesized containers exactly (fuzzed)") {
    import graft.operators.Mp4
    val r = rnd
    val handlers = Seq("vide", "soun", "text")
    val codecs = Map("vide" -> Seq("avc1", "hev1", "mp4v"),
      "soun" -> Seq("mp4a", "opus"), "text" -> Seq("tx3g"))
    for (_ <- 1 to 60) {
      val timescale = Seq(600L, 1000L, 90000L)(r.nextInt(3))
      val durUnits = 1L + r.nextInt(100000)
      val n = 1 + r.nextInt(4)
      val tracks = Seq.fill(n) {
        val hd = handlers(r.nextInt(3))
        (hd, codecs(hd)(r.nextInt(codecs(hd).size)),
          if (hd == "vide") 16 * (1 + r.nextInt(120)) else 0,
          if (hd == "vide") 16 * (1 + r.nextInt(68)) else 0)
      }
      val m = Mp4.probe(5L, Mp4.encode("mp42", timescale, durUnits, tracks))
      assert(m.valid && m.brand == "mp42" && m.n_tracks == n, s"$tracks -> $m")
      assert(math.abs(m.duration_s - durUnits.toDouble / timescale) < 1e-12)
      tracks.find(_._1 == "vide") match {
        case Some((_, codec, w, h)) =>
          assert(m.video_codec == codec && m.width == w && m.height == h)
        case None => assert(m.video_codec == "" && m.width == 0)
      }
      tracks.find(_._1 == "soun") match {
        case Some((_, codec, _, _)) => assert(m.audio_codec == codec)
        case None => assert(m.audio_codec == "")
      }
    }
  }

  test("MP4 probe rejects malformed input without throwing") {
    import graft.operators.Mp4
    assert(!Mp4.probe(1L, Array.emptyByteArray).valid)
    assert(!Mp4.probe(2L, Array.fill[Byte](64)(0x42)).valid)
    // truncated mid-moov: walk stops, stays invalid instead of overrunning
    val good = Mp4.encode("isom", 1000L, 5000L, Seq(("vide", "avc1", 320, 240)))
    assert(!Mp4.probe(3L, good.take(40)).valid)
    assert(Mp4.probe(4L, good).valid)
  }

  test("EXIF probe recovers fields in both byte orders (fuzzed)") {
    import graft.operators.Exif
    val r = rnd
    val base = Multimodal.encodeJpeg(4, 3,
      Array.tabulate[Byte](36)(i => (i * 7).toByte))
    for (i <- 1 to 60) {
      val le = r.nextBoolean()
      val make = "Mk" + r.nextInt(100)
      val model = "Model " + r.nextInt(100) // spaces survive (NUL-terminated)
      val orient = 1 + r.nextInt(8)
      val dt = f"20${r.nextInt(30)}%02d:0${1 + r.nextInt(9)}:10 08:30:00"
      val den = 1 + r.nextInt(4000).toLong
      val f10 = 10 + r.nextInt(300).toLong
      val iso = 50 * (1 + r.nextInt(100))
      val (px, py) = (1 + r.nextInt(9999).toLong, 1 + r.nextInt(9999).toLong)
      val jpg = Exif.encodeJpegWithExif(base, le, make, model, orient, dt,
        den, f10, iso, px, py)
      val m = Exif.probe(i.toLong, jpg)
      assert(m.has_exif && m.byte_order == (if (le) "II" else "MM"), s"i=$i")
      assert(m.make == make && m.model == model && m.orientation == orient)
      assert(m.datetime == dt && m.exposure_den == den &&
        m.fnumber_x10 == f10 && m.iso == iso)
      assert(m.pixel_x == px && m.pixel_y == py)
      // the JPEG stays decodable by a stock reader after APP1 insertion
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(jpg))
      assert(img != null && img.getWidth == 4 && img.getHeight == 3)
    }
  }

  test("EXIF probe is safe on missing, foreign and truncated segments") {
    import graft.operators.Exif
    val base = Multimodal.encodeJpeg(4, 3,
      Array.tabulate[Byte](36)(i => (i * 3).toByte))
    assert(!Exif.probe(1L, base).has_exif)            // plain JPEG
    assert(!Exif.probe(2L, Array.emptyByteArray).has_exif)
    assert(!Exif.probe(3L, "not a jpeg at all".getBytes).has_exif)
    val good = Exif.encodeJpegWithExif(base, littleEndian = true,
      "M", "C", 1, "2024:01:01 00:00:00", 250L, 28L, 200, 640L, 480L)
    // truncation anywhere must not throw; cut inside the APP1 loses EXIF
    (2 until good.length by 7).foreach { cut =>
      Exif.probe(4L, good.take(cut)) // must not throw
    }
    assert(!Exif.probe(5L, good.take(12)).has_exif)
    // a non-EXIF APP1 (XMP-style) is skipped, not mis-parsed
    val xmp = "http://ns.adobe.com/xap/1.0/".getBytes("US-ASCII")
    val app1 = Array[Byte](0xFF.toByte, 0xE1.toByte,
      (((xmp.length + 2) >> 8) & 0xFF).toByte,
      ((xmp.length + 2) & 0xFF).toByte) ++ xmp
    val withXmp = base.take(2) ++ app1 ++ base.drop(2)
    assert(!Exif.probe(6L, withXmp).has_exif)
  }

  test("WARC round-trips arbitrary record chains, plain and gzipped") {
    import graft.operators.Warc
    val r = rnd
    for (i <- 1 to 40) {
      val n = 1 + r.nextInt(5)
      val recs = (0 until n).map { j =>
        val payload = Array.fill[Byte](r.nextInt(300))(r.nextInt(256).toByte)
        (s"type$j", s"https://h/$i/$j", s"2024-02-0${1 + j % 9}T00:00:00Z",
          s"<urn:uuid:$i-$j>", payload)
      }
      val encoded = recs.map { case (t, u, d, id, p) =>
        Warc.encodeRecord(t, u, d, id, p,
          extraHeaders = Seq("X-Custom" -> "v")) }
      Seq(encoded.reduce(_ ++ _), Warc.gzipMembers(encoded)).foreach { blob =>
        val got = Warc.parse(i.toLong, blob)
        assert(got.length == n && got.forall(_.valid), s"i=$i n=$n")
        got.zip(recs).zipWithIndex.foreach { case ((g, (t, u, d, id, p)), j) =>
          assert(g.rec_index == j && g.warc_type == t && g.target_uri == u)
          assert(g.warc_date == d && g.record_id == id)
          assert(g.content_length == p.length && g.payload.toSeq == p.toSeq)
        }
      }
    }
  }

  test("malformed WARC blobs end in one visible invalid row, never a throw") {
    import graft.operators.Warc
    assert(Warc.parse(1L, Array.emptyByteArray).isEmpty)
    assert(Warc.parse(2L, "HTTP/1.1 200 OK\r\n\r\n".getBytes)
      .exists(!_.valid))
    val good = Warc.encodeRecord("response", "https://h/x",
      "2024-01-01T00:00:00Z", "<urn:uuid:x>", "hello world".getBytes)
    // truncation anywhere parses the intact prefix then flags the cut
    (1 until good.length).foreach { cut =>
      val rs = Warc.parse(3L, good.take(cut))
      assert(rs.isEmpty || !rs.last.valid || rs.last.content_length == 11L)
    }
    // bad content-length (overruns) is invalid, not an overread
    val lied = new String(good, "UTF-8").replace("Content-Length: 11",
      "Content-Length: 9999").getBytes("UTF-8")
    assert(Warc.parse(4L, lied).exists(!_.valid))
    // corrupt gzip magic with garbage behind it
    assert(Warc.parse(5L, Array[Byte](0x1F, 0x8B.toByte, 1, 2, 3))
      .exists(!_.valid))
  }

  test("robots pattern matching agrees with a regex reference (fuzzed)") {
    import graft.operators.Robots
    val r = rnd
    val alphabet = "ab/.z*"
    def randStr(maxLen: Int): String =
      (0 until r.nextInt(maxLen)).map(_ => alphabet(r.nextInt(alphabet.length))).mkString
    for (_ <- 1 to 3000) {
      val pat0 = "/" + randStr(8)
      val pat = if (r.nextBoolean()) pat0 + "$" else pat0
      val path = "/" + randStr(10).replace("*", "x") // paths have no wildcards
      val (core, anchored) =
        if (pat.endsWith("$")) (pat.dropRight(1), true) else (pat, false)
      val rx = core.split("\\*", -1).map(java.util.regex.Pattern.quote)
        .mkString(".*") // quoted segments joined by wildcard gaps
      val full = "^" + rx + (if (anchored) "$" else ".*") + "$"
      val expected = path.matches(full)
      assert(Robots.patternMatches(pat, path) == expected,
        s"pattern '$pat' vs path '$path': expected $expected")
    }
  }

  test("FFT matches a naive DFT and preserves energy (Parseval)") {
    import graft.operators.AudioFeatures
    val r = rnd
    for (_ <- 1 to 20) {
      val n = 1 << (3 + r.nextInt(5)) // 8..128
      val x = Array.fill(n)(r.nextDouble() * 2 - 1)
      val re = x.clone(); val im = new Array[Double](n)
      AudioFeatures.fft(re, im)
      // naive O(n²) DFT as the independent reference
      for (k <- 0 until n) {
        var dr = 0.0; var di = 0.0
        for (t <- 0 until n) {
          val a = -2.0 * math.Pi * k * t / n
          dr += x(t) * math.cos(a); di += x(t) * math.sin(a)
        }
        assert(math.abs(re(k) - dr) < 1e-8 && math.abs(im(k) - di) < 1e-8,
          s"n=$n k=$k")
      }
      val timeE = x.map(v => v * v).sum
      val freqE = (0 until n).map(k => re(k) * re(k) + im(k) * im(k)).sum / n
      assert(math.abs(timeE - freqE) < 1e-8 * n)
    }
  }

  test("log-mel: tones at filter centres land in their own bin, edges behave") {
    import graft.operators.AudioFeatures
    val rate = 16000.0
    val nMels = 16
    for (k <- 0 until nMels) {
      val f = AudioFeatures.melCenterHz(k, nMels, rate)
      val samples = Array.tabulate[Short](2048)(i =>
        math.round(8000.0 * math.sin(2.0 * math.Pi * f * i / rate)).toShort)
      val mel = AudioFeatures.logMel(samples, rate, 512, 256, nMels)
      assert(mel.nonEmpty && mel.head.length == nMels)
      val sums = Array.tabulate(nMels)(b => mel.map(_(b)).sum)
      val dom = sums.zipWithIndex.maxBy(t => (t._1, -t._2))._2
      assert(dom == k, s"tone at centre of bin $k dominated bin $dom")
    }
    // silence floors every bin; a clip shorter than one frame has 0 frames
    val silent = AudioFeatures.logMel(new Array[Short](1024), rate, 512, 256, nMels)
    assert(silent.flatten.forall(v => math.abs(v + 10.0) < 1e-9))
    assert(AudioFeatures.logMel(new Array[Short](100), rate, 512, 256, nMels).isEmpty)
  }

  test("DCT-II is orthonormal: basis vectors concentrate, energy is preserved") {
    import graft.operators.AudioFeatures
    val n = 16
    // input = orthonormal DCT basis vector u ⇒ coefficient u is 1, rest 0
    for (u <- 0 until n) {
      val s = if (u == 0) math.sqrt(1.0 / n) else math.sqrt(2.0 / n)
      val x = Array.tabulate(n)(j => s * math.cos(math.Pi * (2 * j + 1) * u / (2.0 * n)))
      val c = AudioFeatures.dct2(x, n)
      for (v <- 0 until n)
        assert(math.abs(c(v) - (if (v == u) 1.0 else 0.0)) < 1e-10, s"u=$u v=$v")
    }
    // Parseval on random vectors; truncation = plain prefix
    val r = rnd
    for (_ <- 1 to 10) {
      val x = Array.fill(n)(r.nextDouble() * 4 - 2)
      val c = AudioFeatures.dct2(x, n)
      assert(math.abs(x.map(v => v * v).sum - c.map(v => v * v).sum) < 1e-9)
      assert(AudioFeatures.dct2(x, 13).toSeq == c.take(13).toSeq)
    }
  }

  test("audio landmarks: amplitude-invariant, twins pair, unrelated don't") {
    import graft.operators.{AudioFeatures, Multimodal}
    val spark = SparkTestSession.spark
    import spark.implicits._
    implicit val s = spark
    val rate = 16000
    def clip(id: Long, binSeq: Seq[Int], amp: Double): Multimodal.MediaRow = {
      val samples = new Array[Short](binSeq.length * 2048)
      binSeq.zipWithIndex.foreach { case (bin, k) =>
        val f = AudioFeatures.melCenterHz(bin, 16, rate)
        (0 until 2048).foreach { i =>
          samples(k * 2048 + i) =
            math.round(amp * math.sin(2.0 * math.Pi * f * i / rate)).toShort
        }
      }
      Multimodal.MediaRow(id, "wav", Multimodal.encodeWavPcm16(rate, samples))
    }
    val seqA = Seq(3, 11, 7, 0, 14, 9, 5, 12)
    val seqB = Seq(8, 2, 15, 6, 1, 13, 4, 10)
    val media = Seq(
      clip(0L, seqA, 8000.0),
      clip(1L, seqA, 3000.0), // same constellation, very different bytes
      clip(2L, seqB, 8000.0)).toDS()
    val lm = AudioFeatures.landmarkHashes(media, 512, 512, 16,
      dts = Seq(2, 5, 9, 13, 18)).toDF()
    // amplitude invariance: identical landmark SETS for the quiet twin
    val sets = lm.collect().groupBy(_.getLong(0))
      .map { case (id, rs) => id -> rs.map(_.getLong(2)).toSet }
    assert(sets(0L) == sets(1L))
    assert((sets(0L) & sets(2L)).size < 5)
    val pairs = AudioFeatures.audioNearDup(lm, minShared = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((0L, 1L)))
    // per-frame peaks are the injected bins (4 frames per segment)
    val (_, _, samples) = Multimodal.decodeWav(clip(9L, seqA, 8000.0).payload)
    val peaks = AudioFeatures.peakBins(samples, rate.toDouble, 512, 512, 16)
    assert(peaks.toSeq == seqA.flatMap(b => Seq.fill(4)(b)))
  }

  test("tfrecord parser survives arbitrary garbage and truncations") {
    import graft.operators.TfRecord
    val r = rnd
    for (_ <- 1 to 200) {
      val junk = Array.fill[Byte](r.nextInt(200))(r.nextInt(256).toByte)
      TfRecord.parse(junk) // must terminate, never throw
    }
    // valid shards truncated at EVERY byte boundary: the intact prefix
    // records always survive, nothing throws
    val payloads = Seq("abc".getBytes("UTF-8"),
      Array.fill[Byte](50)(r.nextInt(256).toByte))
    val blob = TfRecord.encode(payloads.iterator)
    for (cut <- 0 to blob.length) {
      val recs = TfRecord.parse(java.util.Arrays.copyOf(blob, cut))
      assert(recs.length <= payloads.length)
      recs.zip(payloads).foreach { case (rec, p) =>
        assert(rec.payload.toSeq == p.toSeq)
      }
    }
  }

  test("tf.example decoder terminates on arbitrary garbage") {
    import graft.operators.TfExample
    val r = rnd
    for (_ <- 1 to 500) {
      val junk = Array.fill[Byte](r.nextInt(120))(r.nextInt(256).toByte)
      try TfExample.decode(junk)
      catch { case _: Exception => () } // throw is fine; hang/OOM is not
    }
    // and every truncation of a real example either decodes a prefix or
    // throws cleanly
    val ex = TfExample.encode(Seq(
      "a" -> TfExample.BytesFeature(Seq("payload".getBytes("UTF-8"))),
      "b" -> TfExample.Int64Feature(Seq(1L, 2L, 3L))))
    for (cut <- 0 to ex.length) {
      try TfExample.decode(java.util.Arrays.copyOf(ex, cut))
      catch { case _: Exception => () }
    }
  }

  test("resampler handles degenerate clip lengths at any ratio") {
    import graft.operators.AudioFeatures
    val r = rnd
    for (_ <- 1 to 50) {
      val n = r.nextInt(40) // includes 0- and sub-kernel-length clips
      val s = Array.fill[Short](n)(r.nextInt(65536).toShort)
      for ((src, dst) <- Seq((8000, 16000), (16000, 8000), (44100, 16000),
          (8000, 11025))) {
        val out = AudioFeatures.resample(s, src, dst)
        assert(out.length == (n.toLong * dst / src).toInt, s"$n $src->$dst")
      }
    }
  }

  test("mfcc: c0 is the scaled frame mean of log-mel; silence gives flat cepstrum") {
    import graft.operators.AudioFeatures
    val rate = 16000.0
    val silent = new Array[Short](2048)
    val m = AudioFeatures.mfcc(silent, rate, 512, 256, 16, 13)
    assert(m.nonEmpty)
    // silence: every mel bin is the -10 floor ⇒ c0 = -10·√16, higher = 0
    m.foreach { frame =>
      assert(math.abs(frame(0) - (-10.0 * math.sqrt(16.0))) < 1e-9)
      frame.drop(1).foreach(v => assert(math.abs(v) < 1e-9))
    }
  }
}
