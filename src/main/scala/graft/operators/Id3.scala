package graft.operators

import org.apache.spark.sql.{Dataset, SparkSession}

/** ID3 tag metadata (the catalog layer of an audio corpus — title/artist/
  * album text frames riding in front of MP3 audio). Both public layouts:
  *
  *  - ID3v2.3 (id3.org): 10-byte header `ID3` + version + flags +
  *    28-bit SYNCSAFE size, then frames of [4-byte id][4-byte size]
  *    [2 flag bytes][payload]; text frames (`Txxx`) carry an encoding
  *    byte (0 = ISO-8859-1, 1 = UTF-16 with BOM) then the text.
  *  - ID3v1: a fixed 128-byte `TAG` trailer (title/artist/album 30 bytes
  *    each, space/NUL padded).
  *
  * The prober reads tags WITHOUT touching the audio frames behind them —
  * the same triage contract as [[Mp3.probe]]: per-row byte walk, zero
  * shuffle, truncation-safe (malformed tags yield an invalid row, never a
  * throw). The reference ships audio as opaque BLOBs — pipeline surface.
  */
object Id3 {

  final case class Tag(media_id: Long, version: String, valid: Boolean,
    title: String, artist: String, album: String, n_frames: Long,
    tag_bytes: Long)

  private def syncsafe(v: Int): Array[Byte] = Array(
    ((v >> 21) & 0x7F).toByte, ((v >> 14) & 0x7F).toByte,
    ((v >> 7) & 0x7F).toByte, (v & 0x7F).toByte)

  private def readSyncsafe(b: Array[Byte], off: Int): Int =
    ((b(off) & 0x7F) << 21) | ((b(off + 1) & 0x7F) << 14) |
      ((b(off + 2) & 0x7F) << 7) | (b(off + 3) & 0x7F)

  /** Encode an ID3v2.3 tag (ISO-8859-1 text frames) followed by
    * `audio` bytes. */
  def encodeV2(title: String, artist: String, album: String,
      audio: Array[Byte]): Array[Byte] = {
    def frame(id: String, text: String): Array[Byte] = {
      val payload = 0.toByte +: text.getBytes("ISO-8859-1")
      val size = payload.length
      id.getBytes("US-ASCII") ++ Array(
        ((size >> 24) & 0xFF).toByte, ((size >> 16) & 0xFF).toByte,
        ((size >> 8) & 0xFF).toByte, (size & 0xFF).toByte,
        0.toByte, 0.toByte) ++ payload
    }
    val frames = frame("TIT2", title) ++ frame("TPE1", artist) ++
      frame("TALB", album)
    "ID3".getBytes("US-ASCII") ++ Array(3.toByte, 0.toByte, 0.toByte) ++
      syncsafe(frames.length) ++ frames ++ audio
  }

  /** Encode audio followed by an ID3v1 trailer. */
  def encodeV1(title: String, artist: String, album: String,
      audio: Array[Byte]): Array[Byte] = {
    def f30(s: String): Array[Byte] = {
      val b = new Array[Byte](30)
      val src = s.getBytes("ISO-8859-1").take(30)
      System.arraycopy(src, 0, b, 0, src.length)
      b
    }
    val tag = new Array[Byte](128)
    System.arraycopy("TAG".getBytes("US-ASCII"), 0, tag, 0, 3)
    System.arraycopy(f30(title), 0, tag, 3, 30)
    System.arraycopy(f30(artist), 0, tag, 33, 30)
    System.arraycopy(f30(album), 0, tag, 63, 30)
    audio ++ tag
  }

  /** Parse whichever tag layout is present (v2 header preferred; v1
    * trailer otherwise). Unknown/absent → an invalid row with empties. */
  def parse(mediaId: Long, bytes: Array[Byte]): Tag = {
    if (bytes.length >= 10 && bytes(0) == 'I' && bytes(1) == 'D' &&
        bytes(2) == '3') {
      val size = readSyncsafe(bytes, 6)
      val end = math.min(10 + size, bytes.length)
      var off = 10
      var title = ""; var artist = ""; var album = ""; var n = 0L
      // a declared tag size past the buffer IS truncation — invalid even
      // if no individual frame overruns what bytes remain
      var bad = 10 + size > bytes.length
      while (off + 10 <= end && bytes(off) != 0 && !bad) {
        val id = new String(bytes, off, 4, "US-ASCII")
        val fsize = ((bytes(off + 4) & 0xFF) << 24) |
          ((bytes(off + 5) & 0xFF) << 16) |
          ((bytes(off + 6) & 0xFF) << 8) | (bytes(off + 7) & 0xFF)
        if (fsize < 0 || off + 10 + fsize > end) bad = true
        else {
          val text =
            if (fsize >= 1 && bytes(off + 10) == 0)
              new String(bytes, off + 11, fsize - 1, "ISO-8859-1")
            else if (fsize >= 3 && bytes(off + 10) == 1)
              new String(bytes, off + 11, fsize - 1, "UTF-16")
            else ""
          id match {
            case "TIT2" => title = text
            case "TPE1" => artist = text
            case "TALB" => album = text
            case _ => ()
          }
          n += 1
          off += 10 + fsize
        }
      }
      Tag(mediaId, "2.3", !bad, title, artist, album, n, (10 + size).toLong)
    } else if (bytes.length >= 128 &&
        bytes(bytes.length - 128) == 'T' && bytes(bytes.length - 127) == 'A' &&
        bytes(bytes.length - 126) == 'G') {
      val base = bytes.length - 128
      def f30(off: Int): String =
        new String(bytes, base + off, 30, "ISO-8859-1")
          .takeWhile(_ != '\u0000').stripTrailing()
      Tag(mediaId, "1", valid = true, f30(3), f30(33), f30(63), 3L, 128L)
    } else Tag(mediaId, "", valid = false, "", "", "", 0L, 0L)
  }

  /** Per-row tag extraction behind the mapPartitions seam. */
  def parseTags(media: Dataset[Multimodal.MediaRow])
      (implicit spark: SparkSession): Dataset[Tag] = {
    import spark.implicits._
    media.mapPartitions(rows => rows.map(m => parse(m.media_id, m.payload)))
  }
}
