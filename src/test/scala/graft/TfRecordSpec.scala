package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TfRecord

/** TFRecord framing exactness: known-answer CRC masking, roundtrip,
  * the corruption contract (bad length-crc stops, bad data-crc flags and
  * continues, truncation drops the tail), and the distributed
  * secondary-sort shard export. */
class TfRecordSpec extends AnyFunSuite {

  private val payloads = Seq(
    "first record".getBytes("UTF-8"),
    Array.emptyByteArray,
    Array.tabulate[Byte](1000)(i => (i * 7 % 251).toByte),
    "tail".getBytes("UTF-8"))

  test("masked crc32c matches the published check vector") {
    // CRC32C("123456789") = 0xE3069283 is the standard Castagnoli check
    // value; its TFRecord mask (rotr15 + 0xa282ead8) computed by hand.
    val c = new java.util.zip.CRC32C()
    c.update("123456789".getBytes("US-ASCII"))
    assert(c.getValue == 0xE3069283L)
    assert(TfRecord.maskCrc(0xE3069283L) == 0xC78AB0E5L)
    assert(TfRecord.maskCrc(0L) == 0xA282EAD8L) // empty-input mask
  }

  test("roundtrip preserves payloads, offsets and lengths") {
    val blob = TfRecord.encode(payloads.iterator)
    assert(blob.length == payloads.map(_.length + 16).sum)
    val recs = TfRecord.parse(blob)
    assert(recs.length == payloads.length)
    recs.zip(payloads).foreach { case (r, p) =>
      assert(r.len_crc_ok && r.data_crc_ok)
      assert(r.length == p.length.toLong)
      assert(java.util.Arrays.equals(r.payload, p))
    }
    assert(recs.map(_.offset) ==
      payloads.map(_.length + 16L).scanLeft(0L)(_ + _).init)
  }

  test("a corrupt payload byte flags that record but parsing continues") {
    val blob = TfRecord.encode(payloads.iterator)
    // flip a byte inside record 0's payload (starts at offset 12)
    blob(14) = (blob(14) ^ 0x5A).toByte
    val recs = TfRecord.parse(blob)
    assert(recs.length == payloads.length)
    assert(!recs.head.data_crc_ok)
    assert(recs.tail.forall(_.data_crc_ok))
  }

  test("a corrupt length field stops the walk (no trustworthy offsets)") {
    val blob = TfRecord.encode(payloads.iterator)
    val secondOff = payloads.head.length + 16
    blob(secondOff) = (blob(secondOff) ^ 0xFF).toByte // record 1's length
    val recs = TfRecord.parse(blob)
    assert(recs.length == 1) // record 0 intact, nothing after
    assert(recs.head.data_crc_ok)
  }

  test("a truncated tail drops only the partial record") {
    val blob = TfRecord.encode(payloads.iterator)
    val cut = java.util.Arrays.copyOf(blob, blob.length - 3)
    val recs = TfRecord.parse(cut)
    assert(recs.length == payloads.length - 1)
    assert(recs.forall(r => r.len_crc_ok && r.data_crc_ok))
  }

  test("balanced shard assignment round-robins by descending size") {
    implicit val spark: org.apache.spark.sql.SparkSession = SparkTestSession.spark
    import spark.implicits._
    // heavily skewed sizes: doc 0 is 1000x bigger than the tail
    val docs = (0 until 97).map(i =>
      (i.toLong, if (i == 0) 100000L else (1000L - i))).toDF("doc_id", "sz")
    val got = TfRecord.balancedShardAssign(docs, "sz", "doc_id", k = 4)
      .select("doc_id", "rank", "shard")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // rank must equal the driver-side sort position, shard = rank % 4
    val want = (0 until 97).map(i =>
      (i.toLong, if (i == 0) 100000L else (1000L - i)))
      .sortBy { case (id, sz) => (-sz, id) }
      .zipWithIndex.map { case ((id, _), r) => (id, r.toLong, r.toLong % 4) }
    assert(got.sortBy(_._2).toSeq == want)
    // byte totals stay near-equal despite the skew: every shard's total
    // is within one max-document of the mean (round-robin desc property
    // on this fixture)
    val totals = TfRecord.balancedShardAssign(docs, "sz", "doc_id", k = 4)
      .groupBy("shard").sum("sz").collect().map(_.getLong(1))
    assert(totals.length == 4)
    val tailMax = 999L
    assert(totals.max - totals.min <= 100000L - tailMax + 3 * tailMax)
  }

  test("per-group balanced assignment equals the per-group row_number dealing") {
    implicit val spark: org.apache.spark.sql.SparkSession = SparkTestSession.spark
    import spark.implicits._
    // three uneven groups with skewed sizes and a cross-group size tie
    // (doc 50 in "b" and doc 51 in "c" share sz) — the grouped-first
    // global-rank + broadcast-offset trick must still equal the plain
    // per-group row_number
    val docs = (0 until 97).map { i =>
      val g = if (i % 7 == 0) "a" else if (i % 3 == 0) "b" else "c"
      val sz = if (i == 50 || i == 51) 500L
        else if (i == 0) 100000L else (1000L - i)
      (i.toLong, g, sz)
    }.toDF("doc_id", "grp", "sz").repartition(7)
    val got = TfRecord
      .balancedShardAssignPerGroup(docs, "grp", "sz", "doc_id", k = 4)
      .select("doc_id", "grp", "rank", "shard")
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getLong(2), r.getLong(3))).sortBy(_._1)
    val want = (0 until 97).map { i =>
      val g = if (i % 7 == 0) "a" else if (i % 3 == 0) "b" else "c"
      val sz = if (i == 50 || i == 51) 500L
        else if (i == 0) 100000L else (1000L - i)
      (i.toLong, g, sz)
    }.groupBy(_._2).toSeq.flatMap { case (g, rows) =>
      rows.sortBy { case (id, _, sz) => (-sz, id) }
        .zipWithIndex.map { case ((id, _, _), r) =>
          (id, g, r.toLong, r.toLong % 4) }
    }.sortBy(_._1)
    assert(got.toSeq == want)
    // rank is the WITHIN-group rank: each group restarts at 0 and every
    // group's shards stay populated round-robin
    val byGroup = got.groupBy(_._2)
    byGroup.foreach { case (g, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (0L until rows.length).toSeq,
        s"group $g ranks must be a dense 0..n-1")
    }
  }

  test("shard export packs each shard in key order and re-ingests exactly") {
    implicit val spark: org.apache.spark.sql.SparkSession = SparkTestSession.spark
    import spark.implicits._
    // 40 rows over 4 shards, keys deliberately out of order
    val rows = spark.createDataset((0 until 40).reverse.map { i =>
      (i.toLong % 4, i.toLong, s"payload-$i".getBytes("UTF-8"))
    })
    val shards = TfRecord.shardExport(rows).collect()
    assert(shards.length == 4)
    assert(shards.forall(_.n_records == 10))
    val recs = TfRecord.parseShards(
      TfRecord.shardExport(rows)).collect()
    assert(recs.length == 40)
    assert(recs.forall(r => r.len_crc_ok && r.data_crc_ok))
    // within each shard, records come back in ascending key order
    (0 until 4).foreach { sh =>
      val got = recs.filter(_.shard == sh).sortBy(_.rec_index)
        .map(r => new String(r.payload, "UTF-8"))
      val want = (0 until 40).filter(_ % 4 == sh).sorted
        .map(i => s"payload-$i")
      assert(got.toSeq == want)
    }
  }

  test("assembled shard export merges each record's fragment run in order") {
    implicit val spark: org.apache.spark.sql.SparkSession = SparkTestSession.spark
    import spark.implicits._
    // records 0..11 over 3 shards (rec % 3); record r has r % 4 + 1
    // fragments "r:f"; rows shuffled and over-partitioned so the single
    // export exchange does ALL the co-location and ordering work
    val flat = for {
      rec <- 0 until 12
      frag <- 0 to rec % 4
    } yield (rec.toLong % 3, rec.toLong, frag.toLong, s"$rec:$frag")
    val rows = spark.createDataset(scala.util.Random.shuffle(flat))
      .repartition(7)
    val shards = TfRecord.shardExportAssembled[String](rows,
      (shard, rec, frags) =>
        s"s$shard r$rec [${frags.mkString(",")}]".getBytes("UTF-8"))
    val recs = TfRecord.parseShards(shards).collect()
    assert(recs.length == 12)
    assert(recs.forall(r => r.len_crc_ok && r.data_crc_ok))
    recs.foreach { r =>
      val rec = r.shard + 3 * r.rec_index // shard round-robin by rec % 3
      val want = s"s${r.shard} r$rec [" +
        (0 to rec.toInt % 4).map(f => s"$rec:$f").mkString(",") + "]"
      assert(new String(r.payload, "UTF-8") == want,
        s"shard ${r.shard} rec_index ${r.rec_index}")
    }
    // an assemble that does NOT drain its fragments must still advance
    // to the next record (the export drains the tail for it)
    val lazyShards = TfRecord.shardExportAssembled[String](rows,
      (shard, rec, frags) => s"s$shard r$rec ${frags.next()}".getBytes("UTF-8"))
    val lazyRecs = TfRecord.parseShards(lazyShards).collect()
    assert(lazyRecs.length == 12)
    lazyRecs.foreach { r =>
      val rec = r.shard + 3 * r.rec_index
      assert(new String(r.payload, "UTF-8") == s"s${r.shard} r$rec $rec:0")
    }
  }
}
