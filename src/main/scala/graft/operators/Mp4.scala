package graft.operators

import org.apache.spark.sql.{Dataset, SparkSession}

/** MP4 / ISO base-media (ISO/IEC 14496-12) CONTAINER metadata: box walk,
  * movie duration, per-track handler + codec fourcc + dimensions — what a
  * training pipeline needs to catalog, sample and filter video/audio
  * assets WITHOUT any codec. The box grammar is pure public arithmetic
  * (size+type headers, big-endian fields); H.264/AAC payload DECODE stays
  * behind the documented stub seam ([[Multimodal.stubDecode]]) — this
  * prober is the real plumbing up to that codec boundary, like
  * [[Mp3.probe]] for MPEG audio. The reference moves video only as opaque
  * BLOBs (no codec in litebase), so this is pipeline surface beyond it.
  */
object Mp4 {

  final case class TrackInfo(handler: String, codec: String,
    width: Int, height: Int)

  final case class Mp4Meta(media_id: Long, valid: Boolean, brand: String,
    duration_s: Double, n_tracks: Long, video_codec: String,
    width: Long, height: Long, audio_codec: String)

  private def u32(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xFFL) << 24) | ((b(off + 1) & 0xFFL) << 16) |
      ((b(off + 2) & 0xFFL) << 8) | (b(off + 3) & 0xFFL)

  private def u64(b: Array[Byte], off: Int): Long =
    (u32(b, off) << 32) | u32(b, off + 4)

  private def fourcc(b: Array[Byte], off: Int): String =
    new String(b, off, 4, "ISO-8859-1")

  /** Iterate (type, payloadStart, payloadEnd) over the boxes in
    * [start, end); malformed sizes end the walk. */
  private def boxes(b: Array[Byte], start: Int, end: Int): Iterator[(String, Int, Int)] =
    new Iterator[(String, Int, Int)] {
      private var pos = start
      def hasNext: Boolean = pos + 8 <= end
      def next(): (String, Int, Int) = {
        val size = u32(b, pos)
        val typ = fourcc(b, pos + 4)
        val (payload, boxEnd) =
          if (size == 1 && pos + 16 <= end) (pos + 16, pos + u64(b, pos + 8))
          else if (size == 0) (pos + 8, end.toLong)
          else (pos + 8, pos + size)
        if (size != 0 && size != 1 && size < 8 || boxEnd > end || boxEnd <= pos) {
          pos = end // malformed: stop
          ("", 0, 0)
        } else {
          pos = boxEnd.toInt
          (typ, payload, boxEnd.toInt)
        }
      }
    }.filter(_._1.nonEmpty)

  private def findBox(b: Array[Byte], start: Int, end: Int,
      typ: String): Option[(Int, Int)] =
    boxes(b, start, end).collectFirst { case (t, s, e) if t == typ => (s, e) }

  private def parseTrack(b: Array[Byte], s: Int, e: Int): Option[TrackInfo] = {
    val (w, h) = findBox(b, s, e, "tkhd").map { case (ts, _) =>
      val ver = b(ts) & 0xFF
      // v0: ctime(4) mtime(4) id(4) res(4) dur(4); v1: 8/8/4/4/8 — then
      // res(8) layer(2) alt(2) vol(2) res(2) matrix(36) width(4) height(4)
      val afterDur = ts + 4 + (if (ver == 1) 32 else 20)
      val wOff = afterDur + 8 + 2 + 2 + 2 + 2 + 36
      if (wOff + 8 <= e) ((u32(b, wOff) >> 16).toInt, (u32(b, wOff + 4) >> 16).toInt)
      else (0, 0)
    }.getOrElse((0, 0))
    findBox(b, s, e, "mdia").map { case (ms, me) =>
      val handler = findBox(b, ms, me, "hdlr").map { case (hs, _) =>
        fourcc(b, hs + 8) // version+flags(4) predefined(4) handler_type
      }.getOrElse("")
      val codec = (for {
        (ns, ne) <- findBox(b, ms, me, "minf")
        (ss, se) <- findBox(b, ns, ne, "stbl")
        (ds, de) <- findBox(b, ss, se, "stsd")
        if ds + 16 <= de && u32(b, ds + 4) >= 1
      } yield fourcc(b, ds + 12)).getOrElse("")
      TrackInfo(handler, codec, w, h)
    }
  }

  /** Parse container metadata; `valid` is false when no moov/mvhd movie
    * header is found. Unknown boxes are skipped by size — the walk never
    * looks inside codec payloads. */
  def probe(media_id: Long, bytes: Array[Byte]): Mp4Meta = {
    val brand = findBox(bytes, 0, bytes.length, "ftyp")
      .filter { case (s, e) => s + 4 <= e }
      .map { case (s, _) => fourcc(bytes, s) }.getOrElse("")
    val moov = findBox(bytes, 0, bytes.length, "moov")
    val mvhd = moov.flatMap { case (s, e) => findBox(bytes, s, e, "mvhd") }
    mvhd match {
      case None =>
        Mp4Meta(media_id, valid = false, brand, 0.0, 0L, "", 0L, 0L, "")
      case Some((ms, _)) =>
        val ver = bytes(ms) & 0xFF
        val (timescale, duration) =
          if (ver == 1) (u32(bytes, ms + 20), u64(bytes, ms + 24))
          else (u32(bytes, ms + 12), u32(bytes, ms + 16))
        val (s, e) = moov.get
        val tracks = boxes(bytes, s, e)
          .collect { case ("trak", ts, te) => parseTrack(bytes, ts, te) }
          .flatten.toVector
        val video = tracks.find(_.handler == "vide")
        val audio = tracks.find(_.handler == "soun")
        Mp4Meta(media_id, valid = true, brand,
          if (timescale == 0) 0.0 else duration.toDouble / timescale,
          tracks.length.toLong,
          video.map(_.codec).getOrElse(""),
          video.map(_.width.toLong).getOrElse(0L),
          video.map(_.height.toLong).getOrElse(0L),
          audio.map(_.codec).getOrElse(""))
    }
  }

  // --- fixture encoder ------------------------------------------------------

  private def be32(v: Long): Array[Byte] = Array(
    ((v >> 24) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
    ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)

  private def box(typ: String, payload: Array[Byte]*): Array[Byte] = {
    val body = payload.flatten.toArray
    be32(body.length + 8) ++ typ.getBytes("ISO-8859-1") ++ body
  }

  /** Synthesize a minimal valid container: ftyp + moov(mvhd + one trak per
    * entry) + an mdat stub. Track spec: (handlerType, codecFourcc, width,
    * height). The spec/oracle fixture generator — payloads are irrelevant
    * to container metadata. */
  def encode(brand: String, timescale: Long, duration: Long,
      tracks: Seq[(String, String, Int, Int)]): Array[Byte] = {
    val mvhd = box("mvhd", Array[Byte](0, 0, 0, 0),
      be32(0), be32(0), be32(timescale), be32(duration),
      be32(0x00010000L), be32(0x01000000L), new Array[Byte](8),
      new Array[Byte](36), new Array[Byte](24),
      be32(tracks.length + 1L))
    val traks = tracks.zipWithIndex.map { case ((handler, codec, w, h), i) =>
      val tkhd = box("tkhd", Array[Byte](0, 0, 0, 7),
        be32(0), be32(0), be32(i + 1L), be32(0), be32(duration),
        new Array[Byte](8), new Array[Byte](2 + 2 + 2 + 2),
        new Array[Byte](36),
        be32(w.toLong << 16), be32(h.toLong << 16))
      val hdlr = box("hdlr", Array[Byte](0, 0, 0, 0), be32(0),
        handler.getBytes("ISO-8859-1"), new Array[Byte](12),
        Array[Byte](0))
      val sampleEntry = be32(16L) ++ codec.getBytes("ISO-8859-1") ++
        new Array[Byte](8)
      val stsd = box("stsd", Array[Byte](0, 0, 0, 0), be32(1L), sampleEntry)
      val stbl = box("stbl", stsd)
      val minf = box("minf", stbl)
      val mdia = box("mdia", hdlr, minf)
      box("trak", tkhd, mdia)
    }
    val ftyp = box("ftyp", brand.getBytes("ISO-8859-1"), be32(0),
      brand.getBytes("ISO-8859-1"))
    val moov = box("moov", (mvhd +: traks): _*)
    val mdat = box("mdat", new Array[Byte](16))
    ftyp ++ moov ++ mdat
  }

  /** Partition-parallel metadata probe behind the same mapPartitions seam
    * as the other codecs. */
  def probeMp4s(media: Dataset[Multimodal.MediaRow])(
      implicit spark: SparkSession): Dataset[Mp4Meta] = {
    import spark.implicits._
    media.mapPartitions(rows => rows.map(r => probe(r.media_id, r.payload)))
  }
}
