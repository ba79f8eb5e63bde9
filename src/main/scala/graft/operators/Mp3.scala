package graft.operators

import org.apache.spark.sql.{Dataset, SparkSession}

/** MPEG audio (MP3) FRAME-LEVEL metadata: header walk, frame count,
  * duration, bitrate statistics, VBR detection — what a training pipeline
  * needs to catalog, sample and filter audio WITHOUT decoding it.
  *
  * Frame headers are pure public arithmetic (ISO/IEC 11172-3 §2.4.1.3;
  * ISO/IEC 13818-3 for the lower-sampling-frequency extension). Full
  * Layer III DECODE additionally needs the ISO huffman code tables and
  * synthesis window, which cannot be reproduced in this sandbox — decode
  * stays behind the documented stub seam ([[Multimodal.stubDecode]]);
  * everything up to that codec boundary is real and spec-tested here.
  * The reference only ever moves audio as opaque BLOB columns (no codec
  * in litebase), so this prober is pipeline surface beyond it.
  */
object Mp3 {

  /** Bitrate (kbps) by layer (row: L1, L2, L3) and 4-bit index; index 0 =
    * free-format and 15 = invalid, both rejected. MPEG-1 table. */
  private val BitrateV1: Array[Array[Int]] = Array(
    Array(0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448),
    Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384),
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320))

  /** MPEG-2 / MPEG-2.5 (LSF) bitrate table; Layers II and III share a row. */
  private val BitrateV2: Array[Array[Int]] = Array(
    Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256),
    Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
    Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160))

  /** Sample rates by version bits (3 = MPEG-1, 2 = MPEG-2, 0 = MPEG-2.5)
    * and 2-bit index (index 3 invalid). */
  private val SampleRates: Map[Int, Array[Int]] = Map(
    3 -> Array(44100, 48000, 32000),
    2 -> Array(22050, 24000, 16000),
    0 -> Array(11025, 12000, 8000))

  final case class FrameInfo(offset: Int, length: Int, version: String,
    layer: Int, sampleRate: Int, bitrateKbps: Int, channels: Int,
    samplesPerFrame: Int)

  final case class Mp3Meta(media_id: Long, valid: Boolean, version: String,
    layer: Int, sample_rate: Int, channels: Int, n_frames: Long,
    total_frame_bytes: Long, duration_s: Double, avg_bitrate_kbps: Double,
    vbr: Boolean)

  /** Parse the 4-byte frame header at `off`; None when it is not a valid,
    * length-computable frame start. */
  def parseHeader(b: Array[Byte], off: Int): Option[FrameInfo] = {
    if (off < 0 || off + 4 > b.length) return None
    val b0 = b(off) & 0xFF; val b1 = b(off + 1) & 0xFF
    val b2 = b(off + 2) & 0xFF; val b3 = b(off + 3) & 0xFF
    if (b0 != 0xFF || (b1 & 0xE0) != 0xE0) return None
    val verBits = (b1 >> 3) & 3 // 0 = MPEG-2.5, 1 = reserved, 2 = MPEG-2, 3 = MPEG-1
    val layerBits = (b1 >> 1) & 3 // 0 = reserved, 1 = III, 2 = II, 3 = I
    if (verBits == 1 || layerBits == 0) return None
    val layer = 4 - layerBits
    val brIdx = (b2 >> 4) & 0xF
    val srIdx = (b2 >> 2) & 3
    if (brIdx == 0 || brIdx == 15 || srIdx == 3) return None
    val padding = (b2 >> 1) & 1
    val mode = (b3 >> 6) & 3
    val channels = if (mode == 3) 1 else 2
    val sr = SampleRates(verBits)(srIdx)
    val isV1 = verBits == 3
    val br = (if (isV1) BitrateV1 else BitrateV2)(layer - 1)(brIdx) * 1000
    val samples = layer match {
      case 1 => 384
      case 2 => 1152
      case _ => if (isV1) 1152 else 576
    }
    val len =
      if (layer == 1) (12 * br / sr + padding) * 4
      else samples / 8 * br / sr + padding
    if (len < 4) return None
    val version = if (isV1) "1" else if (verBits == 2) "2" else "2.5"
    Some(FrameInfo(off, len, version, layer, sr, br / 1000, channels, samples))
  }

  /** Byte offset just past an ID3v2 tag at the stream start (10-byte
    * header + syncsafe 28-bit size), or 0 if none. */
  def skipId3v2(b: Array[Byte]): Int =
    if (b.length >= 10 && b(0) == 'I'.toByte && b(1) == 'D'.toByte &&
        b(2) == '3'.toByte) {
      val sz = ((b(6) & 0x7F) << 21) | ((b(7) & 0x7F) << 14) |
        ((b(8) & 0x7F) << 7) | (b(9) & 0x7F)
      math.min(10 + sz, b.length)
    } else 0

  /** A "Xing" (VBR) or "Info" (CBR) LAME header sits after the side info
    * of the first frame; returns the magic if present. */
  private def xingMagic(b: Array[Byte], f: FrameInfo): Option[String] = {
    val crcBytes = if ((b(f.offset + 1) & 1) == 0) 2 else 0
    val side = (f.version, f.channels) match {
      case ("1", 1) => 17
      case ("1", _) => 32
      case (_, 1) => 9
      case (_, _) => 17
    }
    val at = f.offset + 4 + crcBytes + side
    if (at + 4 <= b.length && at + 4 <= f.offset + f.length) {
      val m = new String(b, at, 4, "US-ASCII")
      if (m == "Xing" || m == "Info") Some(m) else None
    } else None
  }

  /** Walk the frame chain and aggregate metadata.
    *
    * Leading junk before the FIRST frame is scanned past byte-by-byte
    * (streams captured mid-air start anywhere); after the first frame the
    * walk stops at the first bytes that are not a consistent next frame
    * (ID3v1 / APE trailers, a codec change). Only COMPLETE frames count —
    * a truncated final frame is ignored. `vbr` is true when the stream
    * carries a "Xing" VBR header or more than one distinct frame bitrate.
    */
  def probe(media_id: Long, bytes: Array[Byte]): Mp3Meta = {
    var pos = skipId3v2(bytes)
    var first: FrameInfo = null
    var n = 0L
    var totalBytes = 0L
    var brSum = 0L
    var brDistinct = Set.empty[Int]
    var sawXingVbr = false
    var walking = true
    while (walking && pos + 4 <= bytes.length) {
      parseHeader(bytes, pos) match {
        case Some(f) if pos + f.length <= bytes.length &&
            (first == null || (f.sampleRate == first.sampleRate &&
              f.version == first.version && f.layer == first.layer)) =>
          if (first == null) {
            first = f
            sawXingVbr = xingMagic(bytes, f).contains("Xing")
          }
          n += 1
          totalBytes += f.length
          brSum += f.bitrateKbps
          brDistinct += f.bitrateKbps
          pos += f.length
        case _ if first == null => pos += 1 // still hunting for sync
        case _ => walking = false // trailer / truncated frame: stop
      }
    }
    if (first == null)
      Mp3Meta(media_id, valid = false, "", 0, 0, 0, 0L, 0L, 0.0, 0.0, vbr = false)
    else
      Mp3Meta(media_id, valid = true, first.version, first.layer,
        first.sampleRate, first.channels, n, totalBytes,
        n * first.samplesPerFrame.toDouble / first.sampleRate,
        brSum.toDouble / n, brDistinct.size > 1 || sawXingVbr)
  }

  /** Synthesize a valid frame chain with zero-filled payloads — the spec /
    * oracle fixture generator (frame-level metadata never looks at payload
    * content). `version` 1 or 2; `bitrateIndices`/`paddings` give one
    * entry per frame. */
  def encodeFrames(version: Int, layer: Int, sampleRateIdx: Int,
      bitrateIndices: Seq[Int], paddings: Seq[Int],
      stereo: Boolean): Array[Byte] = {
    require(version == 1 || version == 2, s"version 1 or 2, got $version")
    require(layer >= 1 && layer <= 3, s"layer 1-3, got $layer")
    require(bitrateIndices.length == paddings.length, "one padding per frame")
    val verBits = if (version == 1) 3 else 2
    val layerBits = 4 - layer
    val out = new java.io.ByteArrayOutputStream()
    bitrateIndices.zip(paddings).foreach { case (brIdx, pad) =>
      require(brIdx >= 1 && brIdx <= 14, s"bitrate index 1-14, got $brIdx")
      require(pad == 0 || pad == 1, s"padding 0/1, got $pad")
      val hdr = Array[Byte](
        0xFF.toByte,
        (0xE0 | (verBits << 3) | (layerBits << 1) | 1).toByte, // no CRC
        ((brIdx << 4) | (sampleRateIdx << 2) | (pad << 1)).toByte,
        (if (stereo) 0x00 else 0xC0).toByte)
      val f = parseHeader(hdr ++ new Array[Byte](4), 0).getOrElse(
        throw new IllegalArgumentException(
          s"unencodable frame: v$version L$layer br=$brIdx sr=$sampleRateIdx"))
      out.write(hdr)
      out.write(new Array[Byte](f.length - 4))
    }
    out.toByteArray
  }

  /** Partition-parallel metadata probe behind the same mapPartitions seam
    * as the other codecs: binary rows in, typed metadata out, iterator-in/
    * iterator-out. */
  def probeMp3s(media: Dataset[Multimodal.MediaRow])(
      implicit spark: SparkSession): Dataset[Mp3Meta] = {
    import spark.implicits._
    media.mapPartitions(rows => rows.map(r => probe(r.media_id, r.payload)))
  }
}
