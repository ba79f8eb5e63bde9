package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Multimodal, Srt}

/** SRT/WebVTT round-trips plus the tolerance behaviors (BOM, CRLF, missing
  * indices, cue settings, NOTE blocks, malformed cues skipped). */
class SrtSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val cues = Seq(
    (0L, 1500L, "first cue words"),
    (1500L, 3000L, "second cue\nspanning two lines"),
    (3000L, 4750L, "third"))

  test("srt round-trips: indices, millisecond timings, multi-line text") {
    val got = Srt.parse(7L, Srt.encode(cues, vtt = false))
    assert(got.map(c => (c.start_ms, c.end_ms, c.cue_text)) == cues)
    assert(got.map(_.cue_index) == Seq(1L, 2L, 3L))
    assert(got.forall(_.media_id == 7L))
  }

  test("webvtt round-trips: header line and dot separators") {
    val enc = Srt.encode(cues, vtt = true)
    assert(enc.startsWith("WEBVTT\n"))
    assert(enc.contains("00:00:01.500"))
    val got = Srt.parse(1L, enc)
    assert(got.map(c => (c.start_ms, c.end_ms, c.cue_text)) == cues)
  }

  test("tolerant parse: BOM, CRLF, index-less cues, settings, NOTE blocks") {
    val messy = "﻿WEBVTT\r\n\r\nNOTE a comment\r\n\r\n" +
      "00:00:00.000 --> 00:00:02.000 align:start position:10%\r\n" +
      "no index here\r\n\r\n" +
      "00:01:02.500 --> 00:01:04.000\r\nsecond\r\n\r\n" +
      "garbage block without timing\r\n"
    val got = Srt.parse(0L, messy)
    assert(got.map(c => (c.cue_index, c.start_ms, c.end_ms, c.cue_text)) == Seq(
      (1L, 0L, 2000L, "no index here"),
      (2L, 62500L, 64000L, "second")))
  }

  test("hour-scale timings survive the format round-trip") {
    val long = Seq((3599999L, 7325042L, "late cue"))
    val got = Srt.parse(0L, Srt.encode(long, vtt = false))
    assert(got.map(c => (c.start_ms, c.end_ms, c.cue_text)) == long)
  }

  test("parseSubtitles explodes cue rows distributed") {
    implicit val s = spark
    val media = Seq(
      Multimodal.MediaRow(0L, "srt", Srt.encode(cues, vtt = false).getBytes("UTF-8")),
      Multimodal.MediaRow(1L, "vtt", Srt.encode(cues, vtt = true).getBytes("UTF-8"))).toDS()
    val got = Srt.parseSubtitles(media).collect()
    assert(got.length == 6)
    assert(got.count(_.media_id == 0L) == 3)
  }
}
