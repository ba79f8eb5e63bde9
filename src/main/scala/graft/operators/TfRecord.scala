package graft.operators

import java.io.ByteArrayOutputStream
import java.util.zip.CRC32C

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** TFRecord shard writer + parser — the de-facto training-shard format on
  * the OUTPUT side of a curation pipeline (TensorFlow's tf.data readers,
  * and most JAX/PyTorch loaders via `tfds`/`webdataset` bridges, consume
  * it). Format is public (TensorFlow docs, `tensorflow/core/lib/io/
  * record_writer.h` layout description): each record is
  *
  *   uint64 length (LE) | uint32 masked_crc32c(length bytes) (LE)
  *   | data[length]     | uint32 masked_crc32c(data) (LE)
  *
  * with `mask(crc) = rotr15(crc) + 0xa282ead8` (mod 2^32). CRC32C
  * (Castagnoli) ships in the JDK (`java.util.zip.CRC32C`).
  *
  * Parsing is crawler-grade defensive like [[Tar]]/[[Zip]]/[[Warc]]: a bad
  * LENGTH crc stops the walk (the length field itself can't be trusted, so
  * neither can any later offset), a bad DATA crc flags the record but keeps
  * walking (framing is still intact), and a truncated tail drops the
  * partial record — every complete valid prefix survives.
  *
  * Scale shape: shard assembly is the secondary-sort idiom — repartition on
  * the shard key, sortWithinPartitions(shard, sort key), then one
  * mapPartitions pass that builds each shard from its consecutive run of
  * rows. No groupBy materialization, no driver collect; shard count (and
  * so shard size) is the caller's knob, exactly how a 100 TB exporter
  * controls file sizes. The reference (litebase) only moves binary data as
  * opaque BLOB columns; shard export is pipeline surface beyond it.
  */
object TfRecord {

  private val MaskDelta = 0xa282ead8L

  /** TFRecord's masked CRC: rotate right 15 then add the mask constant. */
  def maskCrc(crc: Long): Long =
    (((crc >>> 15) | (crc << 17)) + MaskDelta) & 0xFFFFFFFFL

  private def crc32c(b: Array[Byte], off: Int, len: Int): Long = {
    val c = new CRC32C(); c.update(b, off, len); c.getValue
  }

  private def u64le(v: Long): Array[Byte] =
    Array.tabulate[Byte](8)(i => ((v >>> (8 * i)) & 0xFF).toByte)
  private def u32le(v: Long): Array[Byte] =
    Array.tabulate[Byte](4)(i => ((v >>> (8 * i)) & 0xFF).toByte)
  private def rd64le(b: Array[Byte], off: Int): Long =
    (0 until 8).foldLeft(0L)((a, i) => a | ((b(off + i) & 0xFFL) << (8 * i)))
  private def rd32le(b: Array[Byte], off: Int): Long =
    (0 until 4).foldLeft(0L)((a, i) => a | ((b(off + i) & 0xFFL) << (8 * i)))

  /** Append one record to `out`. */
  def writeRecord(out: ByteArrayOutputStream, payload: Array[Byte]): Unit = {
    val len = u64le(payload.length.toLong)
    out.write(len)
    out.write(u32le(maskCrc(crc32c(len, 0, 8))))
    out.write(payload)
    out.write(u32le(maskCrc(crc32c(payload, 0, payload.length))))
  }

  /** Encode payloads into one shard blob (iterator in, so a shard builds
    * in one streaming pass without holding the inputs). */
  def encode(payloads: Iterator[Array[Byte]]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    payloads.foreach(writeRecord(out, _))
    out.toByteArray
  }

  final case class Rec(index: Int, offset: Long, length: Long,
    len_crc_ok: Boolean, data_crc_ok: Boolean, payload: Array[Byte])

  /** Walk a shard; every structurally-complete record in the valid prefix
    * is returned (see class doc for the corruption contract). */
  def parse(bytes: Array[Byte]): Seq[Rec] = {
    val out = scala.collection.mutable.ArrayBuffer[Rec]()
    var off = 0
    var done = false
    while (!done && off + 12 <= bytes.length) {
      val lenOk = maskCrc(crc32c(bytes, off, 8)) == rd32le(bytes, off + 8)
      if (!lenOk) done = true // length untrustworthy: no safe next offset
      else {
        val len = rd64le(bytes, off)
        val dataStart = off + 12
        if (len < 0 || dataStart + len + 4 > bytes.length) done = true
        else {
          val dataOk = maskCrc(crc32c(bytes, dataStart, len.toInt)) ==
            rd32le(bytes, (dataStart + len).toInt)
          out += Rec(out.length, off.toLong, len, lenOk, dataOk,
            java.util.Arrays.copyOfRange(bytes, dataStart, (dataStart + len).toInt))
          off = (dataStart + len + 4).toInt
        }
      }
    }
    out.toSeq
  }

  final case class Shard(shard: Long, n_records: Long, bytes: Array[Byte])

  /** Pack (shard, sortKey, payload) rows into one TFRecord blob per shard,
    * each shard's records in sortKey order. Secondary-sort shape: shuffle
    * once on the shard key, sort within partitions, stream consecutive
    * runs — a partition holds whole shards but never more than one shard's
    * blob in memory at a time beyond the one being built. */
  def shardExport(rows: Dataset[(Long, Long, Array[Byte])])
      (implicit spark: SparkSession): Dataset[Shard] = {
    import spark.implicits._
    rows.toDF("shard", "key", "payload")
      .repartition(col("shard"))
      .sortWithinPartitions("shard", "key")
      .as[(Long, Long, Array[Byte])]
      .mapPartitions { it =>
        new Iterator[Shard] {
          private val buf = it.buffered
          def hasNext: Boolean = buf.hasNext
          def next(): Shard = {
            val shard = buf.head._1
            val out = new ByteArrayOutputStream()
            var n = 0L
            while (buf.hasNext && buf.head._1 == shard) {
              writeRecord(out, buf.next()._3); n += 1
            }
            Shard(shard, n, out.toByteArray)
          }
        }
      }
  }

  /** [[shardExport]] for records ASSEMBLED from multiple input rows:
    * `(shard, recKey, fragKey, fragment)` rows shuffle ONCE on the shard
    * key and secondary-sort by (shard, recKey, fragKey); the partition
    * walk hands each record's consecutive fragment run (fragKey order)
    * to `assemble` and frames the returned payload. A record whose bytes
    * come from many rows — a packed token sequence spanning document
    * boundaries — pays the SAME single exchange as single-row export;
    * the alternative (groupBy recKey + collect_list, then shardExport)
    * adds a second corpus-sized exchange and materializes whole records
    * as rows. `assemble` sees (shard, recKey, fragments) and must return
    * the record payload; an unconsumed tail of the fragment iterator is
    * drained for it. */
  def shardExportAssembled[F](rows: Dataset[(Long, Long, Long, F)],
      assemble: (Long, Long, Iterator[F]) => Array[Byte])
      (implicit spark: SparkSession): Dataset[Shard] = {
    import spark.implicits._
    // a typed Dataset keeps its SOURCE column names (not _1.._4) — key
    // the exchange and sort positionally
    val Array(shardCol, recCol, fragCol, _) = rows.columns
    rows.repartition(col(shardCol))
      .sortWithinPartitions(shardCol, recCol, fragCol)
      .mapPartitions { it =>
        new Iterator[Shard] {
          private val buf = it.buffered
          def hasNext: Boolean = buf.hasNext
          def next(): Shard = {
            val shard = buf.head._1
            val out = new ByteArrayOutputStream()
            var n = 0L
            while (buf.hasNext && buf.head._1 == shard) {
              val rec = buf.head._2
              val frags = new Iterator[F] {
                def hasNext: Boolean = buf.hasNext &&
                  buf.head._1 == shard && buf.head._2 == rec
                def next(): F = buf.next()._4
              }
              writeRecord(out, assemble(shard, rec, frags))
              while (frags.hasNext) frags.next() // assemble may not drain
              n += 1
            }
            Shard(shard, n, out.toByteArray)
          }
        }
      }
  }

  /** Size-balanced shard assignment: global rank by (size desc, id) →
    * shard = rank % k, i.e. round-robin over the size-sorted corpus — the
    * standard way to keep training-shard files near-equal when document
    * sizes are skewed (hash-by-id spreads COUNTS, not BYTES).
    *
    * The global rank uses the `zipWithIndex` idiom, NOT a global window
    * (`Window.orderBy` with no partition key pulls the corpus into ONE
    * partition): range-partitioned sort stays parallel, and zipWithIndex
    * adds exact global indexes with one extra per-partition count job
    * over the SAME RDD — same lineage, same shuffle files, so both
    * passes are guaranteed to see identical partition contents (two
    * separate DataFrame actions would re-sample range boundaries and
    * could disagree). The RDD hop is the textbook use-case Spark built
    * zipWithIndex for; everything before and after stays columnar. */
  def balancedShardAssign(df: DataFrame, sizeCol: String, idCol: String,
      k: Int): DataFrame = {
    require(k > 0, s"shards: $k")
    val spark = df.sparkSession
    val sorted = df.sort(col(sizeCol).desc, col(idCol))
    val indexed = sorted.rdd.zipWithIndex().map { case (row, i) =>
      org.apache.spark.sql.Row.fromSeq(row.toSeq :+ i :+ (i % k))
    }
    val schema = org.apache.spark.sql.types.StructType(
      sorted.schema.fields :+
        org.apache.spark.sql.types.StructField("rank",
          org.apache.spark.sql.types.LongType, nullable = false) :+
        org.apache.spark.sql.types.StructField("shard",
          org.apache.spark.sql.types.LongType, nullable = false))
    spark.createDataFrame(indexed, schema)
  }

  /** Per-GROUP size-balanced shard assignment: within each value of
    * `groupCol` (a train/val/test split, a language, a source), rank
    * rows by (size desc, id) and deal them round-robin over k shards —
    * so every group's shard files stay near-equal in bytes WITHOUT
    * mixing groups in one file (a training loader must never read val
    * docs out of a train shard).
    *
    * Scale shape: the obvious `row_number() OVER (PARTITION BY group
    * ORDER BY size DESC)` pulls each group into ONE partition — with 3
    * splits that is the whole corpus in 3 tasks, the global-window
    * anti-pattern [[balancedShardAssign]] exists to avoid. Instead the
    * global idiom runs ONCE over the corpus sorted by (group, size
    * desc, id): the range-partitioned sort stays parallel, zipWithIndex
    * adds exact global ranks on the same lineage, and each group's rank
    * OFFSET (its minimum global rank) is a #groups-row aggregate joined
    * back broadcast. Because the sort is grouped-first, within-group
    * rank = global rank − group offset, identical to the per-group
    * row_number. Adds (rank, shard); `rank` is the WITHIN-GROUP rank. */
  def balancedShardAssignPerGroup(df: DataFrame, groupCol: String,
      sizeCol: String, idCol: String, k: Int): DataFrame = {
    require(k > 0, s"shards: $k")
    val spark = df.sparkSession
    val sorted = df.sort(col(groupCol), col(sizeCol).desc, col(idCol))
    val indexed = sorted.rdd.zipWithIndex().map { case (row, i) =>
      org.apache.spark.sql.Row.fromSeq(row.toSeq :+ i)
    }
    val schema = org.apache.spark.sql.types.StructType(
      sorted.schema.fields :+
        org.apache.spark.sql.types.StructField("__grank",
          org.apache.spark.sql.types.LongType, nullable = false))
    val ranked = spark.createDataFrame(indexed, schema)
    // each group's offset = rows in groups sorting before it — an
    // exclusive prefix sum over the GROUP COUNTS, so it costs one cheap
    // map-side-partial count scan, never a second run of the sort. The
    // unpartitioned window is bounded by GROUP CARDINALITY (#splits,
    // #languages — a recipe-table-sized frame), the same boundedness
    // class as the #sources collects elsewhere, not a corpus window.
    val w = org.apache.spark.sql.expressions.Window.orderBy(col(groupCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val offsets = df.groupBy(col(groupCol)).agg(count(lit(1)).as("__n"))
      .select(col(groupCol),
        coalesce(sum(col("__n")).over(w), lit(0L)).as("__g0"))
    ranked.join(broadcast(offsets), Seq(groupCol))
      .withColumn("rank", col("__grank") - col("__g0"))
      .withColumn("shard", col("rank") % k)
      .drop("__grank", "__g0")
  }

  final case class ShardRec(shard: Long, rec_index: Long, offset: Long,
    length: Long, len_crc_ok: Boolean, data_crc_ok: Boolean,
    payload: Array[Byte])

  /** Re-ingest: explode each shard blob back into records (per-row walk,
    * zero shuffle). */
  def parseShards(shards: Dataset[Shard])
      (implicit spark: SparkSession): Dataset[ShardRec] = {
    import spark.implicits._
    shards.mapPartitions(_.flatMap { s =>
      parse(s.bytes).map(r => ShardRec(s.shard, r.index.toLong, r.offset,
        r.length, r.len_crc_ok, r.data_crc_ok, r.payload))
    })
  }
}
