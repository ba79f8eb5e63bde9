package graft.operators

import org.apache.spark.sql.{Dataset, SparkSession}

/** WARC (ISO 28500) record parsing — the Common Crawl ingest container.
  * A crawl pipeline's first distributed step is splitting WARC blobs into
  * records (response/request/metadata/conversion) and lifting the headers
  * every downstream stage keys on: target URI, date, record type, payload.
  *
  * Format is plain public structure: a version line ("WARC/1.0" or 1.1),
  * CRLF-separated `Name: value` headers (case-insensitive names),
  * `Content-Length` driving an exact payload read, and a CRLF CRLF record
  * terminator. Real .warc.gz files are CONCATENATED GZIP MEMBERS (one per
  * record, so readers can skip without decompressing everything);
  * `parse` detects the 1F 8B magic and inflates the member chain first
  * (GZIPInputStream consumes concatenated members natively).
  *
  * Scale shape: one blob parses inside a single task (mapPartitions,
  * iterator-in/iterator-out, rows ∝ records); blob size is governed by
  * the ingest split, exactly like the other codec seams.
  */
object Warc {

  final case class WarcRecord(media_id: Long, rec_index: Int,
    warc_type: String, target_uri: String, warc_date: String,
    record_id: String, content_length: Long, payload: Array[Byte],
    valid: Boolean)

  /** Serialize one record; `extraHeaders` ride after the standard four. */
  def encodeRecord(warcType: String, targetUri: String, date: String,
      recordId: String, payload: Array[Byte],
      extraHeaders: Seq[(String, String)] = Nil): Array[Byte] = {
    val sb = new StringBuilder
    sb.append("WARC/1.0\r\n")
    sb.append(s"WARC-Type: $warcType\r\n")
    sb.append(s"WARC-Record-ID: $recordId\r\n")
    sb.append(s"WARC-Date: $date\r\n")
    if (targetUri.nonEmpty) sb.append(s"WARC-Target-URI: $targetUri\r\n")
    extraHeaders.foreach { case (k, v) => sb.append(s"$k: $v\r\n") }
    sb.append(s"Content-Length: ${payload.length}\r\n\r\n")
    sb.toString.getBytes("UTF-8") ++ payload ++ "\r\n\r\n".getBytes("UTF-8")
  }

  /** Gzip each record as its own member and concatenate — the .warc.gz
    * layout real crawl archives use. */
  def gzipMembers(records: Seq[Array[Byte]]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    records.foreach { r =>
      val gz = new java.util.zip.GZIPOutputStream(out)
      // close(), not just finish(): each member otherwise leaks its
      // native zlib Deflater until finalization — at corpus scale that
      // is one ~256 KB native allocation per record riding on GC/cleaner
      // churn (r18; closing the wrapper is safe, ByteArrayOutputStream's
      // close is a no-op)
      gz.write(r); gz.close()
    }
    out.toByteArray
  }

  private def inflate(bytes: Array[Byte]): Array[Byte] = {
    val in = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try in.readAllBytes() finally in.close()
  }

  /** All records of one (possibly gzipped) WARC blob, in order. A
    * malformed record ends the walk with a single `valid = false` row so
    * corruption is visible, never silently truncated-over. */
  def parse(media_id: Long, blob: Array[Byte]): Seq[WarcRecord] = {
    val bytes =
      if (blob.length >= 2 && (blob(0) & 0xFF) == 0x1F &&
        (blob(1) & 0xFF) == 0x8B)
        try inflate(blob)
        catch { case _: java.io.IOException =>
          return Seq(WarcRecord(media_id, 0, "", "", "", "", 0L,
            Array.emptyByteArray, valid = false)) }
      else blob
    val out = Seq.newBuilder[WarcRecord]
    var pos = 0
    var idx = 0
    def lineEnd(from: Int): Int = {
      var i = from
      while (i + 1 < bytes.length &&
        !(bytes(i) == '\r' && bytes(i + 1) == '\n')) i += 1
      if (i + 1 < bytes.length) i else -1
    }
    while (pos < bytes.length) {
      // skip inter-record padding
      while (pos + 1 < bytes.length && bytes(pos) == '\r' &&
        bytes(pos + 1) == '\n') pos += 2
      if (pos >= bytes.length) return out.result()
      val ve = lineEnd(pos)
      val version =
        if (ve < 0) "" else new String(bytes, pos, ve - pos, "UTF-8")
      if (!version.startsWith("WARC/")) {
        out += WarcRecord(media_id, idx, "", "", "", "", 0L,
          Array.emptyByteArray, valid = false)
        return out.result()
      }
      pos = ve + 2
      var headers = Map.empty[String, String]
      var headersOk = true
      var done = false
      while (!done && headersOk) {
        val he = lineEnd(pos)
        if (he < 0) headersOk = false
        else if (he == pos) { pos += 2; done = true } // blank line
        else {
          val line = new String(bytes, pos, he - pos, "UTF-8")
          val ci = line.indexOf(':')
          if (ci <= 0) headersOk = false
          else {
            headers += (line.substring(0, ci).trim.toLowerCase ->
              line.substring(ci + 1).trim)
            pos = he + 2
          }
        }
      }
      val len = headers.get("content-length").flatMap(_.toLongOption)
      if (!headersOk || len.isEmpty || pos + len.get > bytes.length) {
        out += WarcRecord(media_id, idx, "", "", "", "", 0L,
          Array.emptyByteArray, valid = false)
        return out.result()
      }
      val payload = java.util.Arrays.copyOfRange(bytes, pos,
        pos + len.get.toInt)
      pos += len.get.toInt
      out += WarcRecord(media_id, idx,
        headers.getOrElse("warc-type", ""),
        headers.getOrElse("warc-target-uri", ""),
        headers.getOrElse("warc-date", ""),
        headers.getOrElse("warc-record-id", ""),
        len.get, payload, valid = true)
      idx += 1
    }
    out.result()
  }

  /** Partition-parallel record explosion: one binary blob row in, one row
    * per WARC record out — the crawl-ingest seam. */
  def parseWarcs(media: Dataset[Multimodal.MediaRow])(
      implicit spark: SparkSession): Dataset[WarcRecord] = {
    import spark.implicits._
    media.mapPartitions(rows =>
      rows.flatMap(r => parse(r.media_id, r.payload)))
  }
}
