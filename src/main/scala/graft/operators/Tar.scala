package graft.operators

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{Dataset, SparkSession}

/** POSIX ustar tar archive writer + parser — WebDataset-style shard ingest.
  *
  * Large multimodal training sets ship as tar shards whose members group
  * into samples by key: `sample000123.jpg` + `sample000123.txt` +
  * `sample000123.json` is one (image, caption, metadata) record. Training
  * loaders stream these shards sequentially; a Spark ingest needs the same
  * walk behind the codec seam, one shard per row, exploding members (and
  * their sample keys) as rows.
  *
  * The format is the public POSIX 1003.1 ustar layout: 512-byte headers
  * (name, octal size/mtime, checksum over the header with the checksum
  * field blanked to spaces, `ustar` magic), payload in 512-byte blocks,
  * two zero blocks at the end. The parser verifies checksums and magic,
  * skips non-regular-file entries, and treats truncation or a corrupt
  * header as end-of-archive after the valid prefix (a crawler-grade shard
  * walk must not throw).
  *
  * Scale shape: per-row mapPartitions walk, rows out ∝ members, zero
  * shuffle; sample reassembly downstream is a (shard, key)-keyed
  * aggregation. The reference moves archives only as opaque BLOBs.
  */
object Tar {

  final case class Member(name: String, size: Long, payload: Array[Byte])

  private def octal(v: Long, width: Int): Array[Byte] = {
    val s = java.lang.Long.toOctalString(v)
    val padded = ("0" * (width - 1 - s.length)) + s + "\u0000"
    padded.getBytes("US-ASCII")
  }

  /** ONE member's bytes written to `out` — ustar header + payload +
    * block padding, NO archive terminator (mode 0644, epoch mtime, root
    * ownership — deterministic bytes for a given input). An archive is a
    * concatenation of these plus [[terminator]]; exposing the entry walk
    * lets a distributed shard writer stream members one at a time
    * ([[shardExport]]) instead of materializing whole archives as rows. */
  private def writeEntry(out: ByteArrayOutputStream, name: String,
      data: Array[Byte]): Unit = {
    val h = new Array[Byte](512)
    def put(off: Int, bytes: Array[Byte]): Unit =
      System.arraycopy(bytes, 0, h, off, bytes.length)
    val nameBytes = name.getBytes("US-ASCII")
    require(nameBytes.length <= 100, s"name too long for ustar name field: $name")
    put(0, nameBytes)
    put(100, octal(420, 8)) // 0644
    put(108, octal(0, 8)); put(116, octal(0, 8))
    put(124, octal(data.length.toLong, 12))
    put(136, octal(0, 12))
    java.util.Arrays.fill(h, 148, 156, ' '.toByte) // checksum = spaces while summing
    h(156) = '0' // regular file
    put(257, "ustar\u000000".getBytes("US-ASCII"))
    put(265, "root".getBytes("US-ASCII")); put(297, "root".getBytes("US-ASCII"))
    var sum = 0
    h.foreach(b => sum += b & 0xFF)
    val chk = java.lang.Long.toOctalString(sum.toLong)
    put(148, (("0" * (6 - chk.length)) + chk + "\u0000 ").getBytes("US-ASCII"))
    out.write(h)
    out.write(data)
    val pad = (512 - data.length % 512) % 512
    out.write(new Array[Byte](pad))
  }

  /** The two zero blocks ending every archive. */
  def terminator: Array[Byte] = new Array[Byte](1024)

  /** Encode regular-file members as a ustar archive (deterministic bytes
    * for a given input — see [[writeEntry]]). */
  def encode(members: Seq[(String, Array[Byte])]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    members.foreach { case (name, data) => writeEntry(out, name, data) }
    out.write(terminator)
    out.toByteArray
  }

  /** Pack (shard, sortKey, memberName, payload) rows into ONE ustar /
    * WebDataset archive per shard, members in sortKey order — the tar
    * twin of [[TfRecord.shardExport]]'s secondary-sort idiom: shuffle
    * once on the shard key, sort within partitions, stream each shard's
    * consecutive run through the entry writer and close it with the
    * terminator. No groupBy materialization; shard count is the caller's
    * file-size knob, exactly how WebDataset exporters size their tars. */
  def shardExport(rows: Dataset[(Long, Long, String, Array[Byte])])
      (implicit spark: SparkSession): Dataset[Multimodal.MediaRow] = {
    import spark.implicits._
    val Array(shardCol, keyCol, _, _) = rows.columns
    rows.repartition(org.apache.spark.sql.functions.col(shardCol))
      .sortWithinPartitions(shardCol, keyCol)
      .mapPartitions { it =>
        new Iterator[Multimodal.MediaRow] {
          private val buf = it.buffered
          def hasNext: Boolean = buf.hasNext
          def next(): Multimodal.MediaRow = {
            val shard = buf.head._1
            val out = new ByteArrayOutputStream()
            while (buf.hasNext && buf.head._1 == shard) {
              val (_, _, name, data) = buf.next()
              writeEntry(out, name, data)
            }
            out.write(terminator)
            Multimodal.MediaRow(shard, "tar", out.toByteArray)
          }
        }
      }
  }

  private def parseOctal(b: Array[Byte], off: Int, len: Int): Option[Long] = {
    var i = off; val end = off + len
    while (i < end && (b(i) == ' ' || b(i) == 0)) i += 1
    var v = 0L; var any = false
    while (i < end && b(i) >= '0' && b(i) <= '7') { v = v * 8 + (b(i) - '0'); any = true; i += 1 }
    if (any) Some(v) else None
  }

  /** Walk the archive; stops cleanly at the zero terminator, a bad
    * checksum/magic, or truncation — returning every valid member seen. */
  def parse(bytes: Array[Byte]): Seq[Member] = {
    val out = scala.collection.mutable.ArrayBuffer[Member]()
    var off = 0
    var done = false
    while (!done && off + 512 <= bytes.length) {
      val zero = (off until off + 512).forall(bytes(_) == 0)
      if (zero) done = true
      else {
        val stored = parseOctal(bytes, off + 148, 8)
        var sum = 0
        (0 until 512).foreach { k =>
          sum += (if (k >= 148 && k < 156) ' '.toInt else bytes(off + k) & 0xFF)
        }
        val magicOk = bytes(off + 257) == 'u' && bytes(off + 258) == 's' &&
          bytes(off + 259) == 't' && bytes(off + 260) == 'a' && bytes(off + 261) == 'r'
        parseOctal(bytes, off + 124, 12) match {
          case Some(size) if magicOk && stored.contains(sum.toLong) &&
              off + 512 + size <= bytes.length =>
            var end = off
            while (end < off + 100 && bytes(end) != 0) end += 1
            val name = new String(bytes, off, end - off, "US-ASCII")
            if (bytes(off + 156) == '0' || bytes(off + 156) == 0)
              out += Member(name, size,
                java.util.Arrays.copyOfRange(bytes, off + 512, off + 512 + size.toInt))
            off += 512 + ((size + 511) / 512).toInt * 512
          case _ => done = true // corrupt or truncated: keep the valid prefix
        }
      }
    }
    out.toSeq
  }

  final case class ShardMember(media_id: Long, key: String, ext: String,
    member_size: Long, payload: Array[Byte])

  /** Explode WebDataset shards into sample members: key = member name up
    * to the first dot (the sample id), ext = the rest. One row per member,
    * per-row behind the mapPartitions seam. */
  def webdatasetMembers(media: Dataset[Multimodal.MediaRow])
      (implicit spark: SparkSession): Dataset[ShardMember] = {
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { m =>
        parse(m.payload).map { mem =>
          val dot = mem.name.indexOf('.')
          val (key, ext) =
            if (dot < 0) (mem.name, "") else (mem.name.substring(0, dot), mem.name.substring(dot + 1))
          ShardMember(m.media_id, key, ext, mem.size, mem.payload)
        }
      }
    }
  }
}
