package graft.operators

import java.io.ByteArrayOutputStream
import java.util.zip.{CRC32, Deflater, Inflater}

import org.apache.spark.sql.{Dataset, SparkSession}

/** ZIP archive writer + parser (PKWARE APPNOTE layout) — the other shard
  * container corpora arrive in (scraped site exports, Kaggle-style data
  * drops, office-document internals are all ZIPs).
  *
  * The writer emits local file headers (PK) with STORE or
  * DEFLATE members plus a central directory + end record, so external
  * tools read the output; the parser walks the local headers directly —
  * streaming-friendly (no seek to the central directory), verifying each
  * member's CRC-32 and stopping at the first corrupt header with the
  * valid prefix (same crawler-grade contract as [[Tar]]/[[Warc]]).
  *
  * Scale shape: per-row mapPartitions walk, rows out ∝ members, zero
  * shuffle. The reference moves archives as opaque BLOBs only.
  */
object Zip {

  final case class Member(name: String, method: Int, comp_size: Long,
    uncomp_size: Long, crc_ok: Boolean, payload: Array[Byte])

  private def u16(v: Int): Array[Byte] =
    Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
  private def u32(v: Long): Array[Byte] = Array(
    (v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
    ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)

  /** Encode members; each (name, data, deflate?) becomes one entry. */
  def encode(members: Seq[(String, Array[Byte], Boolean)]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val dirEntries = scala.collection.mutable.ArrayBuffer[Array[Byte]]()
    members.foreach { case (name, data, deflate) =>
      val crc = new CRC32(); crc.update(data)
      val comp =
        if (!deflate) data
        else {
          val d = new Deflater(Deflater.DEFAULT_COMPRESSION, true)
          d.setInput(data); d.finish()
          val buf = new Array[Byte](8192)
          val b = new ByteArrayOutputStream()
          while (!d.finished()) b.write(buf, 0, d.deflate(buf))
          d.end(); b.toByteArray
        }
      val method = if (deflate) 8 else 0
      val nameB = name.getBytes("US-ASCII")
      val offset = out.size()
      out.write(Array[Byte](0x50, 0x4B, 3, 4))
      out.write(u16(20)); out.write(u16(0)); out.write(u16(method))
      out.write(u16(0)); out.write(u16(0)) // mod time/date: epoch-fixed
      out.write(u32(crc.getValue)); out.write(u32(comp.length.toLong))
      out.write(u32(data.length.toLong)); out.write(u16(nameB.length))
      out.write(u16(0))
      out.write(nameB); out.write(comp)
      val dir = new ByteArrayOutputStream()
      dir.write(Array[Byte](0x50, 0x4B, 1, 2))
      dir.write(u16(20)); dir.write(u16(20)); dir.write(u16(0))
      dir.write(u16(method)); dir.write(u16(0)); dir.write(u16(0))
      dir.write(u32(crc.getValue)); dir.write(u32(comp.length.toLong))
      dir.write(u32(data.length.toLong)); dir.write(u16(nameB.length))
      dir.write(u16(0)); dir.write(u16(0)); dir.write(u16(0)); dir.write(u16(0))
      dir.write(u32(0L)); dir.write(u32(offset.toLong)); dir.write(nameB)
      dirEntries += dir.toByteArray
    }
    val dirStart = out.size()
    dirEntries.foreach(out.write)
    val dirSize = out.size() - dirStart
    out.write(Array[Byte](0x50, 0x4B, 5, 6))
    out.write(u16(0)); out.write(u16(0))
    out.write(u16(members.length)); out.write(u16(members.length))
    out.write(u32(dirSize.toLong)); out.write(u32(dirStart.toLong))
    out.write(u16(0))
    out.toByteArray
  }

  private def rd16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8)
  private def rd32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xFFL) | ((b(off + 1) & 0xFFL) << 8) |
      ((b(off + 2) & 0xFFL) << 16) | ((b(off + 3) & 0xFFL) << 24)

  /** Central-directory sizes keyed by local-header offset — the fallback
    * for STREAMED entries (general-purpose bit 3): their local headers
    * carry zero crc/sizes, the real values live in a data descriptor and
    * the central directory. Missing/corrupt directory → empty map. */
  private def centralSizes(bytes: Array[Byte]): Map[Long, (Long, Long, Long)] = {
    // find the end-of-central-directory record (scan back over the comment)
    var eocd = -1
    var i = bytes.length - 22
    while (eocd < 0 && i >= 0 && i >= bytes.length - 22 - 0xFFFF) {
      if (bytes(i) == 0x50 && bytes(i + 1) == 0x4B &&
        bytes(i + 2) == 5 && bytes(i + 3) == 6) eocd = i
      i -= 1
    }
    if (eocd < 0) return Map.empty
    var off = rd32(bytes, eocd + 16).toInt
    val out = scala.collection.mutable.Map[Long, (Long, Long, Long)]()
    while (off + 46 <= bytes.length && bytes(off) == 0x50 &&
        bytes(off + 1) == 0x4B && bytes(off + 2) == 1 && bytes(off + 3) == 2) {
      val crc = rd32(bytes, off + 16)
      val comp = rd32(bytes, off + 20)
      val uncomp = rd32(bytes, off + 24)
      val nameLen = rd16(bytes, off + 28)
      val extraLen = rd16(bytes, off + 30)
      val commentLen = rd16(bytes, off + 32)
      val local = rd32(bytes, off + 42)
      out(local) = (crc, comp, uncomp)
      off += 46 + nameLen + extraLen + commentLen
    }
    out.toMap
  }

  /** Walk local file headers; stop at the central directory or the first
    * corrupt/truncated entry, returning every valid member seen. Streamed
    * entries (data-descriptor flag, zero sizes up front — the JDK's
    * ZipOutputStream shape) resolve their sizes via the central
    * directory. */
  def parse(bytes: Array[Byte]): Seq[Member] = {
    lazy val central = centralSizes(bytes)
    val out = scala.collection.mutable.ArrayBuffer[Member]()
    var off = 0
    var done = false
    while (!done && off + 30 <= bytes.length) {
      if (!(bytes(off) == 0x50 && bytes(off + 1) == 0x4B &&
          bytes(off + 2) == 3 && bytes(off + 3) == 4)) done = true
      else {
        val method = rd16(bytes, off + 8)
        val flags = rd16(bytes, off + 6)
        val streamed = (flags & 0x8) != 0
        val (crcStored, compSize, uncompSize) =
          if (streamed)
            central.getOrElse(off.toLong,
              (rd32(bytes, off + 14), rd32(bytes, off + 18), rd32(bytes, off + 22)))
          else
            (rd32(bytes, off + 14), rd32(bytes, off + 18), rd32(bytes, off + 22))
        val nameLen = rd16(bytes, off + 26)
        val extraLen = rd16(bytes, off + 28)
        val dataStart = off + 30 + nameLen + extraLen
        if (dataStart + compSize > bytes.length) done = true
        else {
          val name = new String(bytes, off + 30, nameLen, "US-ASCII")
          val comp = java.util.Arrays.copyOfRange(bytes, dataStart,
            (dataStart + compSize).toInt)
          val data =
            if (method == 0) comp
            else if (method == 8) {
              val inf = new Inflater(true)
              inf.setInput(comp)
              val b = new ByteArrayOutputStream()
              val buf = new Array[Byte](8192)
              try {
                while (!inf.finished() && !inf.needsInput())
                  b.write(buf, 0, inf.inflate(buf))
              } finally inf.end()
              b.toByteArray
            } else Array.empty[Byte]
          val crc = new CRC32(); crc.update(data)
          out += Member(name, method, compSize, data.length.toLong,
            crc.getValue == crcStored && data.length.toLong == uncompSize, data)
          var next = (dataStart + compSize).toInt
          if (streamed && next + 4 <= bytes.length) {
            // skip the data descriptor: 12 bytes, or 16 with the optional
            // PK signature
            val sig = bytes(next) == 0x50 && bytes(next + 1) == 0x4B &&
              bytes(next + 2) == 7 && bytes(next + 3) == 8
            next += (if (sig) 16 else 12)
          }
          off = next
        }
      }
    }
    out.toSeq
  }

  final case class ZipMember(media_id: Long, name: String, method: Long,
    uncomp_size: Long, crc_ok: Boolean, payload: Array[Byte])

  /** Explode archive members per row behind the mapPartitions seam. */
  def parseZips(media: Dataset[Multimodal.MediaRow])
      (implicit spark: SparkSession): Dataset[ZipMember] = {
    import spark.implicits._
    media.mapPartitions(rows => rows.flatMap { m =>
      parse(m.payload).map(e => ZipMember(m.media_id, e.name, e.method.toLong,
        e.uncomp_size, e.crc_ok, e.payload))
    })
  }
}
