package graft.operators

import org.apache.spark.sql.{Dataset, SparkSession}

/** EXIF metadata extraction from JPEG — the camera/capture catalog pass
  * of an image pipeline (dedup by device, filter by capture time,
  * orientation-aware resize routing) which must NOT decode pixels.
  *
  * EXIF is public structure end-to-end (JIS/CIPA DC-008 aka EXIF 2.x,
  * carried per ISO/IEC 10918-1 JPEG markers): an APP1 segment tagged
  * "Exif\0\0" holding a TIFF 6.0 container — 2-byte byte order
  * ("II" little / "MM" big endian), magic 42, then linked IFDs of
  * 12-byte (tag, type, count, value-or-offset) entries, values over 4
  * bytes living in a data area addressed relative to the TIFF header.
  * Both byte orders are parsed (and exercised by the p53 fixtures).
  * The walk stops at the codec boundary by construction: only marker
  * segments are touched, never entropy-coded data.
  */
object Exif {

  // IFD0 tags
  private val TagMake = 0x010F
  private val TagModel = 0x0110
  private val TagOrientation = 0x0112
  private val TagDateTime = 0x0132
  private val TagExifPointer = 0x8769
  // Exif sub-IFD tags
  private val TagExposureTime = 0x829A
  private val TagFNumber = 0x829D
  private val TagIso = 0x8827
  private val TagPixelX = 0xA002
  private val TagPixelY = 0xA003

  final case class ExifMeta(media_id: Long, has_exif: Boolean,
    byte_order: String, make: String, model: String, orientation: Long,
    datetime: String, exposure_den: Long, fnumber_x10: Long, iso: Long,
    pixel_x: Long, pixel_y: Long)

  // ---------------------------------------------------------------- encode

  private final case class Entry(tag: Int, typ: Int, count: Int,
    inline: Option[Long], data: Array[Byte])

  private def ascii(tag: Int, s: String): Entry = {
    val b = (s + "\u0000").getBytes("US-ASCII") // TIFF ASCII: NUL-terminated
    Entry(tag, 2, b.length, None, b)
  }
  private def short(tag: Int, v: Int): Entry =
    Entry(tag, 3, 1, Some(v.toLong), Array.emptyByteArray)
  private def long(tag: Int, v: Long): Entry =
    Entry(tag, 4, 1, Some(v), Array.emptyByteArray)
  private def rational(tag: Int, num: Long, den: Long): Entry = {
    val b = new Array[Byte](8)
    writeU32(b, 0, num, le = true) // placeholder; rewritten per byte order
    writeU32(b, 4, den, le = true)
    Entry(tag, 5, 1, None, b)
  }

  private def writeU16(b: Array[Byte], off: Int, v: Int, le: Boolean): Unit =
    if (le) { b(off) = v.toByte; b(off + 1) = (v >> 8).toByte }
    else { b(off) = (v >> 8).toByte; b(off + 1) = v.toByte }
  private def writeU32(b: Array[Byte], off: Int, v: Long, le: Boolean): Unit =
    if (le) (0 until 4).foreach(i => b(off + i) = (v >> (8 * i)).toByte)
    else (0 until 4).foreach(i => b(off + i) = (v >> (8 * (3 - i))).toByte)

  /** Serialize one IFD at `ifdOff` (relative to TIFF start) with its data
    * area immediately after; returns (bytes, nextFreeOffset). Entries with
    * a `data` array over 4 bytes get offsets into the data area; rational
    * payloads are re-endianized here. */
  private def buildIfd(entries: Seq[Entry], ifdOff: Int,
      le: Boolean): (Array[Byte], Int) = {
    val tableLen = 2 + entries.length * 12 + 4
    var dataOff = ifdOff + tableLen
    val out = new java.io.ByteArrayOutputStream()
    val head = new Array[Byte](2)
    writeU16(head, 0, entries.length, le)
    out.write(head)
    val dataArea = new java.io.ByteArrayOutputStream()
    entries.sortBy(_.tag).foreach { e =>
      val ent = new Array[Byte](12)
      writeU16(ent, 0, e.tag, le)
      writeU16(ent, 2, e.typ, le)
      writeU32(ent, 4, e.count.toLong, le)
      e.inline match {
        case Some(v) if e.typ == 3 => writeU16(ent, 8, v.toInt, le)
        case Some(v) => writeU32(ent, 8, v, le)
        case None =>
          val payload =
            if (e.typ == 5) { // rationals carry the IFD's byte order
              val b = new Array[Byte](8)
              val num = readU32(e.data, 0, le = true)
              val den = readU32(e.data, 4, le = true)
              writeU32(b, 0, num, le); writeU32(b, 4, den, le); b
            } else e.data
          if (payload.length <= 4) payload.copyToArray(ent, 8)
          else {
            writeU32(ent, 8, dataOff.toLong, le)
            dataArea.write(payload)
            dataOff += payload.length
          }
      }
      out.write(ent)
    }
    val next = new Array[Byte](4)
    writeU32(next, 0, 0L, le) // single-chained IFDs here
    out.write(next)
    out.write(dataArea.toByteArray)
    (out.toByteArray, dataOff)
  }

  /** A complete JPEG: SOI + EXIF APP1 + the pixel stream of a real
    * baseline JPEG (everything after its SOI), so the result decodes in
    * any JPEG reader AND carries metadata. */
  def encodeJpegWithExif(jpeg: Array[Byte], littleEndian: Boolean,
      make: String, model: String, orientation: Int, datetime: String,
      exposureDen: Long, fnumberX10: Long, iso: Int,
      pixelX: Long, pixelY: Long): Array[Byte] = {
    require(jpeg.length >= 2 && (jpeg(0) & 0xFF) == 0xFF &&
      (jpeg(1) & 0xFF) == 0xD8, "not a JPEG")
    val le = littleEndian
    // Exif sub-IFD is laid out right after IFD0; IFD0's pointer tag needs
    // the sub-IFD's offset, which depends on IFD0's own size — compute
    // IFD0 with a placeholder first, then for real.
    def ifd0(exifOff: Long) = Seq(
      ascii(TagMake, make), ascii(TagModel, model),
      short(TagOrientation, orientation), ascii(TagDateTime, datetime),
      long(TagExifPointer, exifOff))
    val exifEntries = Seq(
      rational(TagExposureTime, 1L, exposureDen),
      rational(TagFNumber, fnumberX10, 10L),
      short(TagIso, iso), long(TagPixelX, pixelX), long(TagPixelY, pixelY))
    val (probe, probeEnd) = buildIfd(ifd0(0L), 8, le)
    val exifOff = probeEnd
    val (ifd0Bytes, _) = buildIfd(ifd0(exifOff.toLong), 8, le)
    assert(ifd0Bytes.length == probe.length, "IFD0 size must be stable")
    val (exifBytes, _) = buildIfd(exifEntries, exifOff, le)
    val tiff = new java.io.ByteArrayOutputStream()
    tiff.write((if (le) "II" else "MM").getBytes("US-ASCII"))
    val hdr = new Array[Byte](6)
    writeU16(hdr, 0, 42, le); writeU32(hdr, 2, 8L, le)
    tiff.write(hdr)
    tiff.write(ifd0Bytes)
    tiff.write(exifBytes)
    val payload = "Exif\u0000\u0000".getBytes("US-ASCII") ++ tiff.toByteArray
    val app1 = new java.io.ByteArrayOutputStream()
    app1.write(0xFF); app1.write(0xE1)
    val len = payload.length + 2
    app1.write((len >> 8) & 0xFF); app1.write(len & 0xFF)
    app1.write(payload)
    jpeg.take(2) ++ app1.toByteArray ++ jpeg.drop(2)
  }

  // ----------------------------------------------------------------- parse

  private def readU16(b: Array[Byte], off: Int, le: Boolean): Int =
    if (le) (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8)
    else ((b(off) & 0xFF) << 8) | (b(off + 1) & 0xFF)
  private def readU32(b: Array[Byte], off: Int, le: Boolean): Long =
    if (le) (0 until 4).map(i => (b(off + i) & 0xFFL) << (8 * i)).sum
    else (0 until 4).map(i => (b(off + i) & 0xFFL) << (8 * (3 - i))).sum

  private final case class RawEntry(typ: Int, count: Int, fieldOff: Int)

  /** One IFD's entries as tag → (type, count, absolute value offset);
    * bounds-checked so truncated segments return what they have. */
  private def readIfd(tiff: Array[Byte], ifdOff: Int,
      le: Boolean): Map[Int, RawEntry] = {
    if (ifdOff < 0 || ifdOff + 2 > tiff.length) return Map.empty
    val n = readU16(tiff, ifdOff, le)
    (0 until n).flatMap { i =>
      val e = ifdOff + 2 + i * 12
      if (e + 12 > tiff.length) None
      else {
        val tag = readU16(tiff, e, le)
        val typ = readU16(tiff, e + 2, le)
        val count = readU32(tiff, e + 4, le).toInt
        val sz = typeSize(typ) * count.toLong
        val valOff = if (sz <= 4) e + 8 else readU32(tiff, e + 8, le).toInt
        if (valOff < 0 || valOff + sz > tiff.length) None
        else Some(tag -> RawEntry(typ, count, valOff))
      }
    }.toMap
  }

  private def typeSize(t: Int): Int = t match {
    case 1 | 2 | 7 => 1
    case 3 => 2
    case 4 | 9 => 4
    case 5 | 10 => 8
    case _ => 1
  }

  private def asLong(tiff: Array[Byte], e: RawEntry, le: Boolean): Long =
    e.typ match {
      case 3 => readU16(tiff, e.fieldOff, le).toLong
      case 4 => readU32(tiff, e.fieldOff, le)
      case _ => 0L
    }
  private def asAscii(tiff: Array[Byte], e: RawEntry): String =
    if (e.typ != 2 || e.count <= 0) ""
    else new String(tiff, e.fieldOff, e.count, "US-ASCII")
      .takeWhile(_ != '\u0000')
  private def asRational(tiff: Array[Byte], e: RawEntry,
      le: Boolean): (Long, Long) =
    if (e.typ != 5) (0L, 0L)
    else (readU32(tiff, e.fieldOff, le), readU32(tiff, e.fieldOff + 4, le))

  /** Locate the EXIF APP1 segment by walking JPEG markers (stops at SOS —
    * never reads entropy-coded data) and extract the common tags. */
  def probe(media_id: Long, bytes: Array[Byte]): ExifMeta = {
    val none = ExifMeta(media_id, has_exif = false, "", "", "", 0L, "",
      0L, 0L, 0L, 0L, 0L)
    if (bytes.length < 4 || (bytes(0) & 0xFF) != 0xFF ||
      (bytes(1) & 0xFF) != 0xD8) return none
    var pos = 2
    while (pos + 4 <= bytes.length && (bytes(pos) & 0xFF) == 0xFF) {
      val marker = bytes(pos + 1) & 0xFF
      if (marker == 0xDA || marker == 0xD9) return none // SOS/EOI: no EXIF
      val len = ((bytes(pos + 2) & 0xFF) << 8) | (bytes(pos + 3) & 0xFF)
      if (len < 2 || pos + 2 + len > bytes.length) return none
      if (marker == 0xE1 && len >= 8 &&
        new String(bytes, pos + 4, 6, "US-ASCII") == "Exif\u0000\u0000") {
        val tiff = java.util.Arrays.copyOfRange(bytes, pos + 10, pos + 2 + len)
        if (tiff.length < 8) return none
        val order = new String(tiff, 0, 2, "US-ASCII")
        if (order != "II" && order != "MM") return none
        val le = order == "II"
        if (readU16(tiff, 2, le) != 42) return none
        val ifd0 = readIfd(tiff, readU32(tiff, 4, le).toInt, le)
        val sub = ifd0.get(TagExifPointer)
          .map(p => readIfd(tiff, readU32(tiff, p.fieldOff, le).toInt, le))
          .getOrElse(Map.empty)
        val exp = sub.get(TagExposureTime)
          .map(asRational(tiff, _, le)).getOrElse((0L, 0L))
        val fn = sub.get(TagFNumber)
          .map(asRational(tiff, _, le)).getOrElse((0L, 0L))
        return ExifMeta(media_id, has_exif = true, order,
          ifd0.get(TagMake).map(asAscii(tiff, _)).getOrElse(""),
          ifd0.get(TagModel).map(asAscii(tiff, _)).getOrElse(""),
          ifd0.get(TagOrientation).map(asLong(tiff, _, le)).getOrElse(0L),
          ifd0.get(TagDateTime).map(asAscii(tiff, _)).getOrElse(""),
          if (exp._1 == 1L) exp._2 else 0L,
          if (fn._2 == 10L) fn._1 else 0L,
          sub.get(TagIso).map(asLong(tiff, _, le)).getOrElse(0L),
          sub.get(TagPixelX).map(asLong(tiff, _, le)).getOrElse(0L),
          sub.get(TagPixelY).map(asLong(tiff, _, le)).getOrElse(0L))
      }
      pos += 2 + len
    }
    none
  }

  /** Partition-parallel probe behind the same mapPartitions seam as the
    * other codec walks: binary rows in, typed metadata out. */
  def probeExif(media: Dataset[Multimodal.MediaRow])(
      implicit spark: SparkSession): Dataset[ExifMeta] = {
    import spark.implicits._
    media.mapPartitions(rows => rows.map(r => probe(r.media_id, r.payload)))
  }
}
