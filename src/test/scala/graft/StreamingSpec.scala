package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.EventStreams

/** Streaming-vs-batch equivalence: the streaming transforms must converge
  * to the same results as their batch twins once all input is processed. */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private lazy val eventsDir: String = {
    // stage the events parquet into a directory (streaming sources read dirs)
    val dir = Files.createTempDirectory("graft-stream").toString
    val src = java.nio.file.Paths.get(SparkTestSession.sfDir, "events.parquet")
    java.nio.file.Files.copy(src, java.nio.file.Paths.get(dir, "events.parquet"))
    dir
  }

  test("streaming tumbling counts converge to the batch result") {
    val q = EventStreams.tumblingCounts(EventStreams.source(spark, eventsDir))
      .writeStream.format("memory").queryName("tumbling")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val streamed = spark.sql(
        "SELECT CAST(w_start AS STRING) w, event_type, n FROM tumbling")
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
      val batch = Tables.load(spark, SparkTestSession.sfDir, "events")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(col("window.start").cast("string"), col("event_type"), col("n"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
      assert(streamed == batch)
    } finally q.stop()
  }

  test("streaming content dedup emits exactly the batch-distinct keys") {
    val q = EventStreams.dedupByContent(
        EventStreams.source(spark, eventsDir), Seq("event_type", "props"))
      .writeStream.format("memory").queryName("dedup")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val streamed = spark.sql("SELECT event_type, props FROM dedup")
        .collect().map(r => (r.getString(0), r.getString(1)))
      assert(streamed.length == streamed.toSet.size, "no duplicate keys emitted")
      val batchDistinct = Tables.load(spark, SparkTestSession.sfDir, "events")
        .select("event_type", "props").distinct().count()
      assert(streamed.length == batchDistinct)
    } finally q.stop()
  }

  test("pipeline prep ops (sample/redact/chunk) run unchanged in a stream") {
    // deterministic sampling, PII redaction and chunking are stateless
    // codegen'd row transforms, so the SAME operator code runs inside a
    // Structured Streaming ingest — the shape a 100 TB/day pipeline needs
    // (filter/transform in the stream, no batch re-pass). Stream output
    // must equal the batch run on identical data.
    import graft.operators.{Sampling, TextAnalysis}
    val docsDir = Files.createTempDirectory("graft-stream-docs").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(SparkTestSession.sfDir, "documents.parquet"),
      java.nio.file.Paths.get(docsDir, "documents.parquet"))
    val batchDocs = spark.read.parquet(docsDir)
    def prep(df: org.apache.spark.sql.DataFrame) =
      TextAnalysis.chunkWords(
        Sampling.hashSample(df, "doc_id", 0.2)
          .withColumn("text", TextAnalysis.redactPii(col("text"))),
        "text", "doc_id", chunkSize = 32, overlap = 8)
    val q = prep(spark.readStream.schema(batchDocs.schema).parquet(docsDir))
      .writeStream.format("memory").queryName("prep").outputMode("append").start()
    try {
      q.processAllAvailable()
      val streamed = spark.sql("SELECT doc_id, chunk_idx, n_words, chunk_md5 FROM prep")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
      val batch = prep(batchDocs)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
      assert(streamed == batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("r9 per-row annotators (diversity/encoding-health) run unchanged in a stream") {
    // lexicalDiversity and encodingHealth are shuffle-free per-row
    // transforms, so the identical operator code annotates a live ingest
    import graft.operators.TextAnalysis
    val docsDir = Files.createTempDirectory("graft-stream-annot").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(SparkTestSession.sfDir, "documents.parquet"),
      java.nio.file.Paths.get(docsDir, "documents.parquet"))
    val batchDocs = spark.read.parquet(docsDir)
    val q1 = TextAnalysis.lexicalDiversity(
        spark.readStream.schema(batchDocs.schema).parquet(docsDir),
        "text", "doc_id")
      .writeStream.format("memory").queryName("annotdiv")
      .outputMode("append").start()
    val q2 = TextAnalysis.encodingHealth(
        spark.readStream.schema(batchDocs.schema).parquet(docsDir),
        "text", "doc_id")
      .writeStream.format("memory").queryName("annotenc")
      .outputMode("append").start()
    try {
      q1.processAllAvailable(); q2.processAllAvailable()
      val sd = spark.sql(
          "SELECT doc_id, n_word_types, ttr, simpson_char FROM annotdiv")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSet
      val bd = TextAnalysis.lexicalDiversity(batchDocs, "text", "doc_id")
        .select(col("doc_id"), col("n_word_types"), col("ttr"), col("simpson_char"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSet
      assert(sd == bd && sd.nonEmpty)
      val se = spark.sql("SELECT doc_id, clean FROM annotenc")
        .collect().map(r => (r.getLong(0), r.getBoolean(1))).toSet
      val be = TextAnalysis.encodingHealth(batchDocs, "text", "doc_id")
        .select(col("doc_id"), col("clean"))
        .collect().map(r => (r.getLong(0), r.getBoolean(1))).toSet
      assert(se == be && se.nonEmpty)
    } finally { q1.stop(); q2.stop() }
  }

  test("web-curation ops (c4/html/url/quality) run unchanged in a stream") {
    // the r7 curation stages are stateless per-row chains, so the SAME
    // operator code filters a live ingest: C4 cleanup -> HTML of the
    // survivors -> URL canonicalization -> quality-classifier scoring
    import graft.operators.{Quality, TextAnalysis}
    val docsDir = Files.createTempDirectory("graft-stream-web").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(SparkTestSession.sfDir, "documents.parquet"),
      java.nio.file.Paths.get(docsDir, "documents.parquet"))
    val batchDocs = spark.read.parquet(docsDir)
    def curate(df: org.apache.spark.sql.DataFrame) = {
      val paged = df.select(col("doc_id"),
        concat(col("text"), lit(".\nshort\nGood closing line right here."),
          when(col("doc_id") % 5 === 0, lit("\n{ }")).otherwise(lit("")))
          .as("page"),
        concat(lit("HTTP://WWW.S"), col("doc_id") % 3,
          lit(".example.com:80/d?utm_s=1&id="), col("doc_id")).as("url"))
      val cleaned = TextAnalysis.c4Clean(paged, "page", "doc_id",
          minWords = 3, minLines = 2)
        .filter(col("page_kept"))
      Quality.score(
          cleaned.withColumn("text",
            TextAnalysis.htmlToText(concat(lit("<p>"), col("clean_text"),
              lit("</p>")))),
          "text", Seq(-2.0, 3.0, -4.0, 2.0, 0.1))
        .join(paged.select(col("doc_id"),
          TextAnalysis.normalizeUrl(col("url")).as("url_norm")), Seq("doc_id"))
        .select(col("doc_id"), col("quality_logit"), col("keep"),
          col("url_norm"))
    }
    val q = curate(spark.readStream.schema(batchDocs.schema).parquet(docsDir))
      .writeStream.format("memory").queryName("webcurate")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val streamed = spark.sql(
          "SELECT doc_id, quality_logit, keep, url_norm FROM webcurate")
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2),
          r.getString(3))).toSet
      val batch = curate(batchDocs)
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2),
          r.getString(3))).toSet
      assert(streamed == batch)
      assert(streamed.nonEmpty)
      // brace pages were dropped in-stream
      assert(!streamed.exists(_._1 % 5 == 0))
    } finally q.stop()
  }

  test("multimodal shard ingest (tar/pdf/srt/dhash) runs unchanged in a stream") {
    // the r7 ingest codecs are stateless per-row walks, so the SAME
    // operator code unpacks live shard arrivals: each doc becomes a
    // WebDataset tar (pdf + subtitle + image members), the stream
    // explodes members and routes each extension to its decoder
    import graft.operators.{ImageHash, Multimodal, Pdf, Srt, Tar}
    import spark.implicits._
    implicit val s = spark
    val docsDir = Files.createTempDirectory("graft-stream-shard").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(SparkTestSession.sfDir, "documents.parquet"),
      java.nio.file.Paths.get(docsDir, "documents.parquet"))
    val batchDocs = spark.read.parquet(docsDir)
    def ingest(df: org.apache.spark.sql.DataFrame) = {
      val media = df.select(col("doc_id"), col("text")).as[(Long, String)]
        .map { case (id, text) =>
          val key = f"s$id%06d"
          val px = Array.tabulate[Byte](18 * 16 * 3)(i => ((id * 31 + i) % 256).toByte)
          val cues = text.trim.split("\\s+").toSeq.grouped(8).toSeq.zipWithIndex
            .map { case (ws, i) => (i * 1000L, (i + 1) * 1000L, ws.mkString(" ")) }
          Multimodal.MediaRow(id, "tar", Tar.encode(Seq(
            s"$key.pdf" -> Pdf.encodePdf(text),
            s"$key.srt" -> Srt.encode(cues, vtt = false).getBytes("UTF-8"),
            s"$key.ppm" -> Multimodal.encodePpm(18, 16, px))))
        }
      val members = Tar.webdatasetMembers(media)
      val pdfText = Pdf.extractPdfs(
          members.filter(_.ext == "pdf")
            .map(m => Multimodal.MediaRow(m.media_id, "pdf", m.payload))).toDF()
        .select(col("media_id").as("doc_id"), lit("pdf").as("kind"),
          md5(col("extracted")).as("value"))
      val srtCues = Srt.parseSubtitles(
          members.filter(_.ext == "srt")
            .map(m => Multimodal.MediaRow(m.media_id, "srt", m.payload))).toDF()
        .select(col("media_id").as("doc_id"), lit("srt").as("kind"),
          concat_ws(":", col("cue_index"), col("start_ms"),
            md5(col("cue_text"))).as("value"))
      val imgHash = ImageHash.dHashImages(
          members.filter(_.ext == "ppm")
            .map(m => Multimodal.MediaRow(m.media_id, "ppm", m.payload))).toDF()
        .select(col("media_id").as("doc_id"), lit("ppm").as("kind"),
          col("dhash").cast("string").as("value"))
      pdfText.unionByName(srtCues).unionByName(imgHash)
    }
    val q = ingest(spark.readStream.schema(batchDocs.schema).parquet(docsDir))
      .writeStream.format("memory").queryName("shardingest")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val streamed = spark.sql("SELECT doc_id, kind, value FROM shardingest")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
      val batch = ingest(batchDocs)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
      assert(streamed == batch)
      assert(streamed.count(_._2 == "pdf") > 0)
      assert(streamed.count(_._2 == "srt") > 0)
      assert(streamed.count(_._2 == "ppm") > 0)
    } finally q.stop()
  }

  test("tfrecord shard export runs per micro-batch (foreachBatch sink twin)") {
    // the export sink shape at scale: stream → foreachBatch → the SAME
    // shardExport used in batch (sortWithinPartitions is legal there
    // because each micro-batch is a plain DataFrame). Re-parsing every
    // shard written across all batches must yield exactly the batch
    // payload multiset, every record CRC-clean.
    import graft.operators.TfRecord
    import spark.implicits._
    implicit val s = spark
    val docsDir = Files.createTempDirectory("graft-stream-tfrec").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(SparkTestSession.sfDir, "documents.parquet"),
      java.nio.file.Paths.get(docsDir, "documents.parquet"))
    val batchDocs = spark.read.parquet(docsDir)
    def toRows(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_id"), col("text")).as[(Long, String)]
        .map { case (id, t) => (id % 4, id, t.getBytes("UTF-8")) }
    val streamed = scala.collection.mutable.ArrayBuffer[(Long, String)]()
    val q = spark.readStream.schema(batchDocs.schema).parquet(docsDir)
      .writeStream.outputMode("append")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        TfRecord.parseShards(TfRecord.shardExport(toRows(df)))
          .collect().foreach { r =>
            assert(r.len_crc_ok && r.data_crc_ok)
            streamed.synchronized {
              streamed += ((r.shard, new String(r.payload, "UTF-8"))) }
          }
      }.start()
    try {
      q.processAllAvailable()
      val batch = TfRecord.parseShards(TfRecord.shardExport(toRows(batchDocs)))
        .collect().map(r => (r.shard, new String(r.payload, "UTF-8")))
      assert(streamed.nonEmpty)
      assert(streamed.sorted.toSeq == batch.sorted.toSeq)
    } finally q.stop()
  }

  test("streaming range tagging == batch RangeJoin on wave-boundary adversaries") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val M = 60000L
    def ev(id: Long, tsMs: Long, tpe: String) =
      EventStreams.EventRow(id, new java.sql.Timestamp(tsMs), id, tpe, 1.0, "{}")
    // error -> 10-minute incident window [ts, ts+10m); purchase -> point
    val wave1 = Seq(
      ev(1, 60 * M, "error"),        // window [60m, 70m)
      ev(100, 65 * M, "purchase"),   // inside, same wave
      ev(101, 120 * M, "purchase"),  // matched by wave 2's error window
      ev(102, 300 * M, "purchase"))  // never inside any window
    val wave2 = Seq(
      // late-but-inside-watermark point against wave 1's INTERVAL state
      ev(103, 62 * M, "purchase"),
      // late interval whose window contains wave 1's POINT 101
      ev(2, 118 * M, "error"),       // window [118m, 128m)
      // per-SIDE watermark sentinels (each side only sees its own type);
      // the sentinel point sits outside the sentinel window
      ev(998, 10000 * M, "error"),     // window [10000m, 10010m)
      ev(999, 10020 * M, "purchase"))  // matches nothing
    def pointsOf(df: org.apache.spark.sql.DataFrame) =
      df.where(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("ts").as("p_ts"))
    def winsOf(df: org.apache.spark.sql.DataFrame) =
      df.where(col("event_type") === "error")
        .select(col("event_id").as("error_id"), col("ts").as("w_start"),
          (col("ts") + expr("INTERVAL 10 MINUTES")).as("w_end"))
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[EventStreams.EventRow]
    // maxBucketsPerInterval = 4: the state-eviction length bound is 50 min
    // instead of the default's 650, so wave-1 state is evictable in-test
    val q = EventStreams.rangeTagging(pointsOf(ms.toDF()), winsOf(ms.toDF()),
        "p_ts", "w_start", "w_end", bucket = 600L,
        maxBucketsPerInterval = 4, watermark = "1 hour")
      .writeStream.format("memory").queryName("range_tags")
      .outputMode("append").start()
    try {
      ms.addData(wave1); q.processAllAvailable()
      ms.addData(wave2); q.processAllAvailable()
      val streamed = spark.sql(
        "SELECT purchase_id, error_id FROM range_tags").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(streamed == Set((100L, 1L), (103L, 1L), (101L, 2L)))
      // the batch operator (s06) agrees on the same rows — and so does
      // the twin run in BATCH mode (one code path, two engines)
      val all = (wave1 ++ wave2).toDF()
      val batch = graft.operators.RangeJoin.pointInInterval(
          pointsOf(all), winsOf(all), "p_ts", "w_start", "w_end",
          bucket = 600L)
        .select("purchase_id", "error_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(streamed == batch)
      val twinBatch = EventStreams.rangeTagging(pointsOf(all), winsOf(all),
          "p_ts", "w_start", "w_end", bucket = 600L)
        .select("purchase_id", "error_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(streamed == twinBatch)
      // REAL expiry: the sentinel watermark (≈9940m) is far past every
      // wave-1/2 row + the 50 min length bound, so only the sentinel
      // era's rows (1 point + ≤ 2 window buckets) may remain
      val stateRows = q.lastProgress.stateOperators.head.numRowsTotal
      assert(stateRows <= 4, s"range-tagging state not expiring: $stateRows rows")
    } finally q.stop()
  }

  test("streaming overlap tagging == batch RangeJoin.intervalOverlap, duplicate-free") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val M = 60000L
    def ev(id: Long, tsMs: Long, tpe: String) =
      EventStreams.EventRow(id, new java.sql.Timestamp(tsMs), id, tpe, 1.0, "{}")
    // error -> 10m window, signup -> 15m window; overlaps span bucket
    // boundaries (600 s buckets) so the owner-bucket dedup is exercised
    val wave1 = Seq(
      ev(1, 60 * M, "error"),     // [60m, 70m)
      ev(500, 55 * M, "signup"),  // [55m, 70m) — overlaps 1 across 2 buckets
      ev(501, 200 * M, "signup")) // [200m, 215m) — matched by wave 2's error
    val wave2 = Seq(
      ev(2, 62 * M, "error"),     // late: [62m, 72m) overlaps 500 AND 1's era
      ev(3, 210 * M, "error"),    // [210m, 220m) overlaps held 501
      // per-SIDE watermark sentinels (the join's watermark is the min
      // across both inputs, and each side only sees its own type);
      // disjoint windows so the sentinels pair with nothing
      ev(998, 10000 * M, "error"),    // [10000m, 10010m)
      ev(999, 10020 * M, "signup"))   // [10020m, 10035m)
    def errsOf(df: org.apache.spark.sql.DataFrame) =
      df.where(col("event_type") === "error")
        .select(col("event_id").as("error_id"), col("ts").as("w_start"),
          (col("ts") + expr("INTERVAL 10 MINUTES")).as("w_end"))
    def signupsOf(df: org.apache.spark.sql.DataFrame) =
      df.where(col("event_type") === "signup")
        .select(col("event_id").as("signup_id"), col("ts").as("s_start"),
          (col("ts") + expr("INTERVAL 15 MINUTES")).as("s_end"))
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[EventStreams.EventRow]
    // maxBucketsPerInterval = 4 keeps the state-eviction length bound at
    // 50 min (not the default 64 -> 650 min), so the wave-1 rows are
    // actually evictable inside this test's horizon
    val q = EventStreams.overlapTagging(errsOf(ms.toDF()), signupsOf(ms.toDF()),
        "w_start", "w_end", "s_start", "s_end", bucket = 600L,
        maxBucketsPerInterval = 4, watermark = "1 hour")
      .writeStream.format("memory").queryName("overlap_tags")
      .outputMode("append").start()
    try {
      ms.addData(wave1); q.processAllAvailable()
      ms.addData(wave2); q.processAllAvailable()
      // duplicate-free: collect as a LIST and assert no pair repeats
      val streamedList = spark.sql(
        "SELECT error_id, signup_id FROM overlap_tags").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(streamedList.distinct.size == streamedList.size,
        s"owner-bucket dedup failed in-stream: $streamedList")
      val streamed = streamedList.toSet
      assert(streamed == Set((1L, 500L), (2L, 500L), (3L, 501L)))
      val all = (wave1 ++ wave2).toDF()
      val batch = graft.operators.RangeJoin.intervalOverlap(
          errsOf(all), signupsOf(all), "w_start", "w_end",
          "s_start", "s_end", bucket = 600L)
        .select("error_id", "signup_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(streamed == batch)
      val twinBatch = EventStreams.overlapTagging(errsOf(all), signupsOf(all),
          "w_start", "w_end", "s_start", "s_end", bucket = 600L)
        .select("error_id", "signup_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(streamed == twinBatch)
      // REAL expiry: the sentinel watermark (≈9940m) is far past every
      // wave-1/2 window + the 50 min length bound, so only the sentinel
      // era's exploded rows (≤ 2 + 3 buckets) may remain in the stores
      val stateRows = q.lastProgress.stateOperators.head.numRowsTotal
      assert(stateRows <= 5, s"overlap-tagging state not expiring: $stateRows rows")
    } finally q.stop()
  }

  test("streaming range tagging converges to the batch twin on the full events table") {
    val src = EventStreams.source(spark, eventsDir)
    def pointsOf(df: org.apache.spark.sql.DataFrame) =
      df.where(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("ts").as("p_ts"))
    def winsOf(df: org.apache.spark.sql.DataFrame) =
      df.where(col("event_type") === "error")
        .select(col("event_id").as("error_id"), col("ts").as("w_start"),
          (col("ts") + expr("INTERVAL 10 MINUTES")).as("w_end"))
    val q = EventStreams.rangeTagging(pointsOf(src), winsOf(src),
        "p_ts", "w_start", "w_end", bucket = 600L)
      .writeStream.format("memory").queryName("range_tags_full")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val streamed = spark.sql(
        "SELECT purchase_id, error_id FROM range_tags_full").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val ev = Tables.load(spark, SparkTestSession.sfDir, "events")
      val batch = graft.operators.RangeJoin.pointInInterval(
          pointsOf(ev), winsOf(ev), "p_ts", "w_start", "w_end", bucket = 600L)
        .select("purchase_id", "error_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(streamed == batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("stream-stream interval join emits exactly the batch join pairs") {
    val src = EventStreams.source(spark, eventsDir)
    val q = EventStreams.clickAttribution(src, src)
      .writeStream.format("memory").queryName("attrib")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val streamed = spark.sql("SELECT purchase_id, click_id FROM attrib")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val ev = Tables.load(spark, SparkTestSession.sfDir, "events")
      val batch = EventStreams.clickAttribution(ev, ev)
        .select("purchase_id", "click_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(streamed == batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("streaming as-of attribution: held purchases, late clicks, tie-break, bounded state") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val H = 3600000L
    def ev(id: Long, tsMs: Long, user: Long, tpe: String) =
      EventStreams.EventRow(id, new java.sql.Timestamp(tsMs), user, tpe, 1.0, "{}")
    val wave1 = Seq(
      ev(10, 1 * H, 1, "click"),
      ev(100, 3 * H, 1, "purchase"),   // held: wm after wave1 is 2h < 3h
      ev(200, 1 * H, 2, "purchase"),   // no click ever -> None
      ev(20, H / 2, 3, "click"),
      ev(21, H / 2, 3, "click"),       // same-ts tie: 21 must win
      ev(300, 1 * H, 3, "purchase"))
    val wave2 = Seq(
      // arrives AFTER purchase 100 but precedes it in event time and is
      // inside the watermark: the held purchase must match THIS click,
      // not wave 1's — emit-on-arrival would get this wrong
      ev(11, 5 * H / 2, 1, "click"),
      ev(999, 100 * H, 999, "click"))  // sentinel: flushes every hold
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[EventStreams.EventRow]
    val q = EventStreams.asofAttribution(spark, ms.toDF(), watermark = "1 hour")
      .writeStream.format("memory").queryName("asof_attrib")
      .outputMode("append").start()
    try {
      ms.addData(wave1); q.processAllAvailable()
      ms.addData(wave2); q.processAllAvailable()
      val streamed = spark.sql(
        "SELECT purchase_id, click_id FROM asof_attrib").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
        .toMap
      assert(streamed == Map(100L -> 11L, 200L -> -1L, 300L -> 21L))
      // exactly-once: one output row per purchase
      assert(spark.sql("SELECT count(*) FROM asof_attrib").head().getLong(0) == 3)
      // the batch twin (the s05 operator) agrees on the same rows
      val all = (wave1 ++ wave2).toDF()
      val batch = graft.operators.Asof.join(
          all.where(col("event_type") === "purchase")
            .select(col("user_id"), col("ts"), col("event_id").as("purchase_id")),
          all.where(col("event_type") === "click")
            .select(col("user_id"), col("ts"), col("event_id")),
          "user_id", "ts", "event_id", Seq("event_id"))
        .collect()
        .map(r => r.getAs[Long]("purchase_id") ->
          (if (r.isNullAt(r.fieldIndex("asof_event_id"))) -1L
           else r.getAs[Long]("asof_event_id"))).toMap
      assert(streamed == batch)
      // bounded state: every finalized user collapses to at most one
      // carry click and zero pending purchases
      val stateRows = q.lastProgress.stateOperators.head.numRowsTotal
      assert(stateRows <= 4, s"as-of state not collapsing: $stateRows rows")
    } finally q.stop()
  }

  test("streaming as-of attribution converges to the batch twin on the full events table") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // the real events table fed as two ts-ordered waves + a far-future
    // sentinel (watermark semantics need multiple batches to mean
    // anything; the sentinel flushes the final holds deterministically)
    val ev = Tables.load(spark, SparkTestSession.sfDir, "events")
    val rows = ev.orderBy("ts", "event_id").as[EventStreams.EventRow].collect()
    // split at a ts CHANGE so no event time straddles the watermark edge
    // (equal-to-watermark rows have engine-version-dependent lateness)
    val splitTs = rows(rows.length / 2 - 1).ts.getTime
    val (waveA, waveB) = rows.partition(_.ts.getTime <= splitTs)
    val sentinel = EventStreams.EventRow(-1L,
      new java.sql.Timestamp(rows.last.ts.getTime + 365L * 86400000L),
      -1L, "click", 0.0, "{}")
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[EventStreams.EventRow]
    val q = EventStreams.asofAttribution(spark, ms.toDF(), watermark = "0 seconds")
      .writeStream.format("memory").queryName("asof_full")
      .outputMode("append").start()
    try {
      ms.addData(waveA.toSeq); q.processAllAvailable()
      ms.addData(waveB.toSeq); q.processAllAvailable()
      ms.addData(Seq(sentinel)); q.processAllAvailable()
      val streamed = spark.sql(
        "SELECT purchase_id, click_id FROM asof_full").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
        .toMap
      val batch = graft.operators.Asof.joinBucketed(
          ev.where(col("event_type") === "purchase")
            .select(col("user_id"), col("ts"), col("event_id").as("purchase_id")),
          ev.where(col("event_type") === "click")
            .select(col("user_id"), col("ts"), col("event_id")),
          "user_id", "ts", "event_id", Seq("event_id"), bucket = 3600L)
        .collect()
        .map(r => r.getAs[Long]("purchase_id") ->
          (if (r.isNullAt(r.fieldIndex("asof_event_id"))) -1L
           else r.getAs[Long]("asof_event_id"))).toMap
      assert(streamed.size == batch.size,
        s"${batch.size} batch vs ${streamed.size} streamed")
      assert(streamed == batch)
    } finally q.stop()
  }

  test("stateful running totals: final per-user state matches batch totals") {
    val q = EventStreams.runningUserTotals(spark,
        EventStreams.source(spark, eventsDir))
      .writeStream.format("memory").queryName("usertotals")
      .outputMode("update").start()
    try {
      q.processAllAvailable()
      // last update per user is its final state
      val streamed = spark.sql(
        """SELECT user_id, events, total FROM (
          |  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY events DESC) rn
          |  FROM usertotals) WHERE rn = 1""".stripMargin)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
      val batch = Tables.load(spark, SparkTestSession.sfDir, "events")
        .groupBy("user_id").agg(count(lit(1)).as("n"), sum("value").as("t"))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
      assert(streamed.keySet == batch.keySet)
      streamed.foreach { case (u, (n, t)) =>
        assert(n == batch(u)._1, s"user $u count")
        assert(math.abs(t - batch(u)._2) < 1e-6, s"user $u total")
      }
    } finally q.stop()
  }

  test("streaming query metrics converge to the batch m03 aggregation") {
    val q = EventStreams.queryMetrics(EventStreams.source(spark, eventsDir))
      .writeStream.format("memory").queryName("qmetrics")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val streamed = spark.sql(
        """SELECT CAST(bucket AS STRING), event_type, n, lat_min, lat_max
          |FROM qmetrics""".stripMargin)
        .collect()
        .map(r => (r.getString(0), r.getString(1)) ->
          (r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
      val batch = Tables.load(spark, SparkTestSession.sfDir, "events")
        .groupBy(window(col("ts"), "1 minute"), col("event_type"))
        .agg(count(lit(1)).as("n"), min("value").as("mn"), max("value").as("mx"))
        .select(col("window.start").cast("string"), col("event_type"),
          col("n"), col("mn"), col("mx"))
        .collect()
        .map(r => (r.getString(0), r.getString(1)) ->
          (r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
      assert(streamed.keySet == batch.keySet)
      streamed.foreach { case (k, (n, mn, mx)) =>
        assert((n, mn, mx) == batch(k), s"bucket $k")
      }
    } finally q.stop()
  }

  test("session windows produce the same sessions as the batch twin") {
    val q = EventStreams.sessionCounts(EventStreams.source(spark, eventsDir))
      .writeStream.format("memory").queryName("sessions")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val streamed = spark.sql("SELECT COUNT(*), SUM(n) FROM sessions").head()
      val batch = Tables.load(spark, SparkTestSession.sfDir, "events")
        .groupBy(col("user_id"), session_window(col("ts"), "10 minutes"))
        .agg(count(lit(1)).as("n"))
        .agg(count(lit(1)), sum("n")).head()
      assert(streamed.getLong(0) == batch.getLong(0))
      assert(streamed.getLong(1) == batch.getLong(1))
    } finally q.stop()
  }

  test("running totals state is bounded: idle users expire via event-time TTL") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[EventStreams.EventRow]
    def wave(users: Range, hour: Int): Seq[EventStreams.EventRow] =
      users.map(u => EventStreams.EventRow(u.toLong * 10 + hour,
        new java.sql.Timestamp(hour * 3600000L), u.toLong, "click", 1.0, "{}"))
    // 1s TTL, zero watermark delay: each hour-apart wave pushes the
    // watermark far past the previous wave's timeout, so churned users'
    // state must be dropped, not accumulated
    val q = EventStreams.runningUserTotals(spark, ms.toDF(),
        watermark = "0 seconds", ttlMs = 1000L)
      .writeStream.format("memory").queryName("ttl_totals")
      .outputMode("update").start()
    try {
      ms.addData(wave(1 to 50, 0)); q.processAllAvailable()
      ms.addData(wave(51 to 100, 1)); q.processAllAvailable()
      ms.addData(wave(101 to 150, 2)); q.processAllAvailable()
      ms.addData(wave(151 to 151, 3)); q.processAllAvailable()
      val stateRows = q.lastProgress.stateOperators.head.numRowsTotal
      assert(stateRows < 150, s"state grew with lifetime user cardinality: $stateRows")
      assert(stateRows <= 60, s"idle users did not expire: $stateRows rows in state")
      // the live wave's totals still came through
      val last = spark.sql(
        "SELECT count(DISTINCT user_id) FROM ttl_totals WHERE user_id > 100").head()
      assert(last.getLong(0) == 51)
    } finally q.stop()
  }

  test("streaming LM scoring against a static model matches the batch scorer") {
    import spark.implicits._
    import graft.streaming.DocStreams
    import graft.operators.TextAnalysis
    val ref = Seq(
      (100L, "the cat sat on the mat while the dog ran on the mat"),
      (101L, "a cat ran on a mat and the dog sat on the mat"))
      .toDF("doc_id", "text")
    val docs = Seq(
      (0L, "the cat sat on the mat", "2024-01-01 00:00:00"),
      (1L, "quantum kazoo ensembles juggle", "2024-01-01 00:01:00"),
      (2L, "the dog ran on the mat today", "2024-01-01 00:02:00"))
      .map { case (id, t, ts) => (id, t, java.sql.Timestamp.valueOf(ts)) }
    // the pre-trained model: the batch operator's pruned gram table shape
    val model = {
      val g = ref.select(col("doc_id"),
        split(regexp_replace(lower(trim(col("text"))), "\\s+", " "), " ")
          .as("__ws"))
        .where(size(col("__ws")) >= 2)
        .select(explode(expr(
          "transform(sequence(0, size(__ws) - 2), i -> " +
            "xxhash64(element_at(__ws, i + 1), element_at(__ws, i + 2)))"))
          .as("gram"))
      g.groupBy("gram").agg(count(lit(1)).as("c")).filter(col("c") >= 2)
        .select("gram")
    }
    val dir = Files.createTempDirectory("graft-lmstream").toString
    Seq(docs.head).toDF("doc_id", "text", "ts")
      .coalesce(1).write.mode("append").parquet(dir)
    val q = DocStreams.lmScoredStream(
        spark.readStream.schema("doc_id LONG, text STRING, ts TIMESTAMP")
          .parquet(dir), model, "text", "doc_id", "ts")
      .writeStream.format("memory").queryName("lmstream")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      docs.tail.foreach { d =>
        Seq(d).toDF("doc_id", "text", "ts")
          .coalesce(1).write.mode("append").parquet(dir)
        q.processAllAvailable()
      }
      // sentinel pushes the watermark past every window
      Seq((99L, "late late sentinel", java.sql.Timestamp.valueOf("2024-01-01 04:00:00")))
        .toDF("doc_id", "text", "ts").coalesce(1).write.mode("append").parquet(dir)
      q.processAllAvailable()
      val streamed = spark.sql(
          "SELECT id, n_positions, lm_hits, hit_frac FROM lmstream WHERE id < 99")
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
      // batch twin: score the same docs against the same ref corpus
      val batch = TextAnalysis.lmScore(
          docs.map(d => (d._1, d._2)).toDF("doc_id", "text"), ref,
          "text", "doc_id", n = 2, minCount = 2L)
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
      assert(streamed.keySet == batch.keySet)
      batch.foreach { case (id, (np, hits, frac)) =>
        assert(streamed(id) == ((np, hits, frac)), s"doc $id")
      }
      assert(streamed(1L)._2 == 0L) // all-OOV doc scores zero hits
    } finally q.stop()
  }

  test("streaming LM gate consumes the persisted lm_model artifact; stale model refused") {
    import spark.implicits._
    import graft.streaming.DocStreams
    import graft.operators.TextAnalysis
    val ref = Seq(
      (100L, "the cat sat on the mat while the dog ran on the mat"),
      (101L, "a cat ran on a mat and the dog sat on the mat"))
      .toDF("doc_id", "text")
    val store = new graft.engine.GramArtifactStore(
      Files.createTempDirectory("graft-lmgate-store"))
    store.buildLmModel("gate-lm", ref, "text", "doc_id",
      n = 2, minCount = 2L, corpusVersion = "ref@1")
    val docs = Seq(
      (0L, "the cat sat on the mat", "2024-01-01 00:00:00"),
      (1L, "quantum kazoo ensembles juggle", "2024-01-01 00:01:00"))
      .map { case (id, t, ts) => (id, t, java.sql.Timestamp.valueOf(ts)) }
    // a stale model (older reference snapshot / different pruning)
    // refuses BEFORE the stream starts — scoring against the wrong
    // model silently shifts every hit_frac
    val empty = Files.createTempDirectory("graft-lmgate-empty").toString
    val streamEmpty = spark.readStream
      .schema("doc_id LONG, text STRING, ts TIMESTAMP").parquet(empty)
    val eV = intercept[IllegalArgumentException](
      DocStreams.lmScoredStreamFromArtifact(streamEmpty, store, "gate-lm",
        "ref@2", 2, 2L, "text", "doc_id", "ts"))
    assert(eV.getMessage.contains("ref@1") && eV.getMessage.contains("ref@2"))
    val eP = intercept[IllegalArgumentException](
      DocStreams.lmScoredStreamFromArtifact(streamEmpty, store, "gate-lm",
        "ref@1", 2, 5L, "text", "doc_id", "ts"))
    assert(eP.getMessage.contains("minCount"))
    // the matching consume scores the stream IDENTICALLY to the batch
    // operator trained inline on the same reference
    val dir = Files.createTempDirectory("graft-lmgate").toString
    val q = DocStreams.lmScoredStreamFromArtifact(
        spark.readStream.schema("doc_id LONG, text STRING, ts TIMESTAMP")
          .parquet(dir),
        store, "gate-lm", "ref@1", 2, 2L, "text", "doc_id", "ts")
      .writeStream.format("memory").queryName("lmgate_art")
      .outputMode("append").start()
    try {
      docs.foreach { d =>
        Seq(d).toDF("doc_id", "text", "ts")
          .coalesce(1).write.mode("append").parquet(dir)
        q.processAllAvailable()
      }
      Seq((99L, "late late sentinel",
          java.sql.Timestamp.valueOf("2024-01-01 04:00:00")))
        .toDF("doc_id", "text", "ts").coalesce(1).write.mode("append").parquet(dir)
      q.processAllAvailable()
      val streamed = spark.sql(
          "SELECT id, n_positions, lm_hits, hit_frac FROM lmgate_art WHERE id < 99")
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
      val batch = TextAnalysis.lmScore(
          docs.map(d => (d._1, d._2)).toDF("doc_id", "text"), ref,
          "text", "doc_id", n = 2, minCount = 2L)
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
      assert(streamed == batch)
      assert(streamed(1L)._2 == 0L) // all-OOV doc scores zero hits
    } finally q.stop()
  }

  test("streaming quality gate consumes the persisted quality_model artifact; stale recipe refused") {
    import spark.implicits._
    import graft.streaming.DocStreams
    import graft.operators.Quality
    // trusted (labeled) corpus: clean prose positive, symbol soup negative
    val labeled = Seq(
      (100L, "the quick brown fox and the dog run over a clean page.", 1.0),
      (101L, "a fine sentence of plain words is right here to read.", 1.0),
      (102L, "!!! ??? ### $$$ %%% ^^^ &&& *** ((( )))", 0.0),
      (103L, "@@@@ #### $$$$ %%%% 1234 5678 !!!! ????", 0.0))
      .toDF("doc_id", "text", "label")
    val store = new graft.engine.GramArtifactStore(
      Files.createTempDirectory("graft-qgate-store"))
    store.buildQualityModel("gate-qm", labeled, "text", "label",
      iters = 20, step = 1.0, l2 = 1e-3, corpusVersion = "trusted@1")
    // a stale recipe / snapshot refuses BEFORE the stream starts —
    // gating with the wrong classifier silently shifts every decision
    val empty = Files.createTempDirectory("graft-qgate-empty").toString
    val streamEmpty = spark.readStream
      .schema("doc_id LONG, text STRING, ts TIMESTAMP").parquet(empty)
    val eV = intercept[IllegalArgumentException](
      DocStreams.qualityGateFromArtifact(streamEmpty, store, "gate-qm",
        "trusted@2", "label", 20, 1.0, 1e-3, "text", "doc_id", "ts"))
    assert(eV.getMessage.contains("trusted@1") &&
      eV.getMessage.contains("trusted@2"))
    val eR = intercept[IllegalArgumentException](
      DocStreams.qualityGateFromArtifact(streamEmpty, store, "gate-qm",
        "trusted@1", "label", 50, 1.0, 1e-3, "text", "doc_id", "ts"))
    assert(eR.getMessage.contains("iters"))
    // the matching consume scores the stream IDENTICALLY to the batch
    // operator with the same persisted weights (stateless gate: every
    // row emits immediately, no watermark to push)
    val docs = Seq(
      (0L, "a perfectly ordinary document with the usual words.",
        "2024-01-01 00:00:00"),
      (1L, "%%% ### !!! 000 111 222 ???", "2024-01-01 00:01:00"))
      .map { case (id, t, ts) => (id, t, java.sql.Timestamp.valueOf(ts)) }
    val dir = Files.createTempDirectory("graft-qgate").toString
    val q = DocStreams.qualityGateFromArtifact(
        spark.readStream.schema("doc_id LONG, text STRING, ts TIMESTAMP")
          .parquet(dir),
        store, "gate-qm", "trusted@1", "label", 20, 1.0, 1e-3,
        "text", "doc_id", "ts")
      .writeStream.format("memory").queryName("qgate_art")
      .outputMode("append").start()
    try {
      docs.foreach { d =>
        Seq(d).toDF("doc_id", "text", "ts")
          .coalesce(1).write.mode("append").parquet(dir)
        q.processAllAvailable()
      }
      val streamed = spark.sql(
          "SELECT id, quality_logit, keep FROM qgate_art")
        .collect().map(r => r.getLong(0) ->
          (r.getDouble(1), r.getLong(2))).toMap
      val w = store.qualityModel(spark, "gate-qm", "trusted@1", "label",
        20, 1.0, 1e-3)
      val batch = Quality.score(
          docs.map(d => (d._1, d._2)).toDF("doc_id", "text"), "text", w)
        .collect().map(r => r.getAs[Long]("doc_id") ->
          (r.getAs[Double]("quality_logit"), r.getAs[Long]("keep"))).toMap
      assert(streamed == batch)
      // the classifier actually separates: prose kept, symbol soup not
      assert(streamed(0L)._2 == 1L && streamed(1L)._2 == 0L)
    } finally q.stop()
  }

  test("streaming resample gate admits exactly the batch Gumbel keys over threshold") {
    import spark.implicits._
    import graft.streaming.DocStreams
    import graft.operators.Sampling
    // weights spread around 0 so the fixed threshold keeps SOME rows of
    // each batch but not all — both branches of the gate exercised
    val docs = (0L until 40L).map(i =>
      (i, (i % 7).toDouble / 7.0 - 0.5,
        java.sql.Timestamp.valueOf(s"2024-01-01 00:${(i % 60) / 10}${i % 10}:00")))
    val dir = Files.createTempDirectory("graft-rgate").toString
    val q = DocStreams.resampleGate(
        spark.readStream.schema("doc_id LONG, lw DOUBLE, ts TIMESTAMP")
          .parquet(dir),
        "lw", "doc_id", "ts", threshold = 0.7)
      .writeStream.format("memory").queryName("rgate")
      .outputMode("append").start()
    try {
      docs.grouped(20).foreach { batch =>
        batch.toDF("doc_id", "lw", "ts")
          .coalesce(1).write.mode("append").parquet(dir)
        q.processAllAvailable()
      }
      val streamed = spark.sql("SELECT id, gumbel_key, keep FROM rgate")
        .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getBoolean(2)))
        .toMap
      // the batch twin: the same key expression + the same threshold
      // (the stateless gate IS the batch filter, row for row)
      val batch = docs.toDF("doc_id", "lw", "ts")
        .select(col("doc_id"),
          Sampling.gumbelKey(col("doc_id"), col("lw")).as("k"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(streamed.keySet == batch.keySet)
      streamed.foreach { case (id, (k, keep)) =>
        assert(k == batch(id) && keep == (k > 0.7))
      }
      val kept = streamed.count(_._2._2)
      assert(kept > 0 && kept < docs.size,
        "fixture must exercise both admitted and dropped rows")
    } finally q.stop()
  }

  test("streaming near-dup admission matches the batch first-in-every-bucket twin") {
    import spark.implicits._
    import graft.streaming.DocStreams
    import org.apache.spark.sql.expressions.Window
    val base = "alpha bravo charlie delta echo foxtrot golf hotel india " +
      "juliet kilo lima mike november oscar papa quebec romeo sierra tango"
    val docs = Seq(
      (0L, base, "2024-01-01 00:00:00"),
      (1L, "one completely different document about spark adaptive execution and shuffle partition choices", "2024-01-01 00:01:00"),
      (2L, base, "2024-01-01 00:02:00"), // exact dup of 0 -> must drop
      (3L, base.replace("alpha", "zulu"), "2024-01-01 00:03:00"), // near dup of 0
      (4L, "third unrelated text mentioning parquet row groups column chunks and page headers only", "2024-01-01 00:04:00"),
      (5L, base.replace("tango", "whiskey"), "2024-01-01 00:05:00")) // near dup of 0
      .map { case (id, t, ts) => (id, t, java.sql.Timestamp.valueOf(ts)) }

    val dir = Files.createTempDirectory("graft-neardup").toString
    val q = DocStreams.nearDupAdmitted(
        spark.readStream.schema("doc_id LONG, text STRING, ts TIMESTAMP")
          .option("maxFilesPerTrigger", "1").parquet(dir),
        "text", "doc_id", "ts")
      .writeStream.format("memory").queryName("neardup")
      .outputMode("append").start()
    try {
      // one file + drain per doc: stream arrival order == ts order, so the
      // batch rank-by-ts twin below sees the same "first arrival"
      docs.foreach { d =>
        Seq(d).toDF("doc_id", "text", "ts")
          .coalesce(1).write.mode("append").parquet(dir)
        q.processAllAvailable()
      }
      // sentinel 3h later pushes the watermark past every bucket window
      Seq((99L, "late sentinel document full of its own entirely novel wording here",
          java.sql.Timestamp.valueOf("2024-01-01 03:30:00")))
        .toDF("doc_id", "text", "ts").coalesce(1).write.mode("append").parquet(dir)
      q.processAllAvailable()
      val admitted = spark.sql("SELECT id FROM neardup")
        .collect().map(_.getLong(0)).toSet - 99L

      // batch twin: same per-row signatures + banding, admitted iff first
      // (by ts) in EVERY band bucket
      val k = 32; val rowsPerBand = 4; val bands = k / rowsPerBand
      val sigs = graft.operators.Dedup.minHashSignaturesPerDoc(
        docs.toDF("doc_id", "text", "ts"), "text", "doc_id", 3, k, 42L, Seq("ts"))
      val bandCols = graft.operators.Dedup.bandKeyCols(k, rowsPerBand)
      val exploded = sigs
        .select(col("id"), col("ts"), explode(array(bandCols: _*)).as("b"))
        .select(col("id"), col("ts"), col("b.band").as("band"), col("b.bh").as("bh"))
      val batchAdmitted = exploded
        .withColumn("rn", row_number().over(
          Window.partitionBy("band", "bh").orderBy("ts")))
        .groupBy("id").agg(max("rn").as("worst"))
        .filter(col("worst") === 1)
        .collect().map(_.getLong(0)).toSet
      assert(admitted == batchAdmitted,
        s"stream=$admitted batch=$batchAdmitted")
      // the invariants the operator contract promises
      assert(!admitted.contains(2L), "exact duplicate must be dropped")
      assert(Set(0L, 1L, 4L).subsetOf(admitted), "novel docs must be admitted")
    } finally q.stop()
  }

  test("streaming contamination gate matches the batch 13-gram twin") {
    import spark.implicits._
    import graft.streaming.DocStreams
    import graft.operators.{Dedup, Sampling}
    val evalText = (1 to 30).map(i => s"e$i").mkString(" ")
    val evalDocs = Seq((500L, evalText)).toDF("doc_id", "text")
    val clean = (1 to 30).map(i => s"c$i").mkString(" ")
    // doc 1 embeds a full 13-word run of the eval doc -> contaminated;
    // doc 2 shares only 12 consecutive words -> clean at n=13
    val docs = Seq(
      (0L, clean, "2024-01-01 00:00:00"),
      (1L, "prefix words then " + (5 to 17).map(i => s"e$i").mkString(" ") +
        " and a tail", "2024-01-01 00:01:00"),
      (2L, "start " + (5 to 16).map(i => s"e$i").mkString(" ") + " end",
        "2024-01-01 00:02:00"),
      (3L, "too short", "2024-01-01 00:03:00")) // < 13 words: never emits
      .map { case (id, t, ts) => (id, t, java.sql.Timestamp.valueOf(ts)) }
    val evalGrams = Dedup.wordShingles(evalDocs, "text", "doc_id", 13)
      .select(col("gram")).distinct()
    val dir = Files.createTempDirectory("graft-contamstream").toString
    val q = DocStreams.contaminationGate(
        spark.readStream.schema("doc_id LONG, text STRING, ts TIMESTAMP")
          .parquet(dir), evalGrams, "text", "doc_id", "ts")
      .writeStream.format("memory").queryName("contamgate")
      .outputMode("append").start()
    try {
      docs.foreach { d =>
        Seq(d).toDF("doc_id", "text", "ts")
          .coalesce(1).write.mode("append").parquet(dir)
        q.processAllAvailable()
      }
      Seq((99L, (1 to 20).map(i => s"z$i").mkString(" "),
          java.sql.Timestamp.valueOf("2024-01-01 04:00:00")))
        .toDF("doc_id", "text", "ts").coalesce(1).write.mode("append").parquet(dir)
      q.processAllAvailable()
      val streamed = spark.sql(
          "SELECT id, shared_grams, contaminated FROM contamgate WHERE id < 99")
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2)))
        .toMap
      // batch twin: the pair-level operator names the same train docs
      val batchPairs = Sampling.contamination(
          docs.map(d => (d._1, d._2)).toDF("doc_id", "text"), evalDocs,
          "text", "doc_id", n = 13)
        .collect().map(r => r.getLong(0)).toSet
      assert(streamed.filter(_._2._2).keySet == batchPairs)
      assert(streamed.keySet == Set(0L, 1L, 2L)) // doc 3 too short to emit
      assert(streamed(1L) == ((1L, true)))  // exactly one shared 13-gram
      assert(streamed(0L) == ((0L, false)) && streamed(2L) == ((0L, false)))
    } finally q.stop()
  }

  test("streaming fuzzy contamination gate matches the batch cross-LSH twin") {
    import spark.implicits._
    import graft.streaming.DocStreams
    import graft.operators.Dedup
    val base = "alpha bravo charlie delta echo foxtrot golf hotel india " +
      "juliet kilo lima mike november oscar papa quebec romeo sierra tango"
    val evalDocs = Seq((500L, base + " extended with a short tail"))
      .toDF("doc_id", "text")
    val docs = Seq(
      (0L, base, "2024-01-01 00:00:00"),                 // fuzzy twin -> flag
      (1L, "a fully unrelated training document about shuffle partitions",
        "2024-01-01 00:01:00"),
      (2L, base.replace("alpha", "zulu"), "2024-01-01 00:02:00")) // near twin
      .map { case (id, t, ts) => (id, t, java.sql.Timestamp.valueOf(ts)) }
    val evalBands = Dedup.bandedSignatures(evalDocs, "text", "doc_id")
    val dir = Files.createTempDirectory("graft-fuzzygate").toString
    val q = DocStreams.fuzzyContaminationGate(
        spark.readStream.schema("doc_id LONG, text STRING, ts TIMESTAMP")
          .parquet(dir), evalBands, "text", "doc_id", "ts", threshold = 0.5)
      .writeStream.format("memory").queryName("fuzzygate")
      .outputMode("append").start()
    try {
      docs.foreach { d =>
        Seq(d).toDF("doc_id", "text", "ts")
          .coalesce(1).write.mode("append").parquet(dir)
        q.processAllAvailable()
      }
      Seq((99L, (1 to 25).map(i => s"nv$i").mkString(" "),
          java.sql.Timestamp.valueOf("2024-01-01 04:00:00")))
        .toDF("doc_id", "text", "ts").coalesce(1).write.mode("append").parquet(dir)
      q.processAllAvailable()
      val streamed = spark.sql(
          "SELECT id, max_est, contaminated FROM fuzzygate WHERE id < 99")
        .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getBoolean(2)))
        .toMap
      // batch twin: per-doc max estimate over all cross-LSH candidates
      val batchMax = Dedup.crossMinHashPairs(
          docs.map(d => (d._1, d._2)).toDF("doc_id", "text"), evalDocs,
          "text", "doc_id", threshold = 0.0)
        .groupBy(col("big_id")).agg(max(col("est_jaccard")).as("m"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      docs.map(_._1).foreach { id =>
        val sEst = streamed(id)._1
        assert(sEst == batchMax.getOrElse(id, 0.0),
          s"doc $id: stream est $sEst vs batch ${batchMax.get(id)}")
      }
      assert(streamed(0L)._2, "fuzzy twin must be flagged")
      assert(!streamed(1L)._2, "unrelated doc must pass")
    } finally q.stop()
  }

  test("fuzzy gate refuses an artifact built with mismatched params") {
    import spark.implicits._
    import graft.streaming.DocStreams
    import graft.operators.Dedup
    // same SCHEMA, different shingleLen: pre-r10 the column-name check
    // passed and the gate joined nothing, silently marking everything
    // clean — the p_* literal params must be required to match
    val evalDocs = Seq((500L, "alpha bravo charlie delta echo foxtrot"))
      .toDF("doc_id", "text")
    val mismatched = Dedup.bandedSignatures(evalDocs, "text", "doc_id",
      shingleLen = 4)
    val stream = spark.readStream
      .schema("doc_id LONG, text STRING, ts TIMESTAMP")
      .parquet(Files.createTempDirectory("graft-fuzzyguard").toString)
    val e = intercept[IllegalArgumentException] {
      DocStreams.fuzzyContaminationGate(
        stream, mismatched, "text", "doc_id", "ts")
    }
    assert(e.getMessage.contains("rebuild the artifact"))
    // rowsPerBand mismatch: band COUNT differs only in row content, the
    // columns are again identical — the p_ guard is what catches it
    val e2 = intercept[IllegalArgumentException] {
      DocStreams.fuzzyContaminationGate(
        stream, Dedup.bandedSignatures(evalDocs, "text", "doc_id",
          rowsPerBand = 8), "text", "doc_id", "ts")
    }
    assert(e2.getMessage.contains("rebuild the artifact"))
  }

  test("streaming ingest dashboard aggregates per (window, source) like batch") {
    import spark.implicits._
    import graft.streaming.DocStreams
    val docs = Seq(
      (0L, "five clean ascii words here", "web", "2024-01-01 00:01:00"),
      (1L, "bad � doc", "web", "2024-01-01 00:02:00"),
      (2L, "two tokens", "books", "2024-01-01 00:03:00"),
      (3L, "late window doc arrives", "web", "2024-01-01 00:14:00"))
      .map { case (id, t, s0, ts) => (id, t, s0, java.sql.Timestamp.valueOf(ts)) }
    val dir = Files.createTempDirectory("graft-ingeststats").toString
    val q = DocStreams.ingestStats(
        spark.readStream
          .schema("doc_id LONG, text STRING, source STRING, ts TIMESTAMP")
          .parquet(dir), "text", "source", "ts")
      .writeStream.format("memory").queryName("ingeststats")
      .outputMode("append").start()
    try {
      docs.foreach { d =>
        Seq(d).toDF("doc_id", "text", "source", "ts")
          .coalesce(1).write.mode("append").parquet(dir)
        q.processAllAvailable()
      }
      Seq((99L, "sentinel", "web",
          java.sql.Timestamp.valueOf("2024-01-01 04:00:00")))
        .toDF("doc_id", "text", "source", "ts")
        .coalesce(1).write.mode("append").parquet(dir)
      q.processAllAvailable()
      val got = spark.sql(
          """SELECT source, n_docs, tokens, clean_docs, clean_frac
            |FROM ingeststats WHERE window_start < '2024-01-01 01:00'""".stripMargin)
        .collect().map(r => (r.getString(0), r.getLong(1)) ->
          (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
      // 00:00-00:10 window: web has docs 0 (5 tokens, clean) + 1 (3
      // tokens, dirty); books has doc 2. 00:10-00:20: web doc 3.
      assert(got((("web", 2L))) == ((8L, 1L, 0.5)))
      assert(got((("books", 1L))) == ((2L, 1L, 1.0)))
      assert(got((("web", 1L))) == ((4L, 1L, 1.0)))
    } finally q.stop()
  }

  test("streaming surgical decon gate rebuilds identically to the batch operator") {
    import spark.implicits._
    import graft.streaming.DocStreams
    import graft.operators.{Dedup, TextAnalysis}
    val evalDoc = (1 to 20).map(i => s"e$i").mkString(" ")
    val evalGrams = Dedup.wordShingles(
      Seq((500L, evalDoc)).toDF("doc_id", "text"), "text", "doc_id", 13)
      .select(col("gram"))
    val docs = Seq(
      (0L, "keep one two " + (4 to 16).map(i => s"e$i").mkString(" ") +
        " tail alpha beta", "2024-01-01 00:00:00"),
      (1L, "clean words only in this one nothing shared with the eval side " +
        "and long enough for windows", "2024-01-01 00:01:00"),
      (2L, evalDoc, "2024-01-01 00:02:00"),
      (3L, "short doc", "2024-01-01 00:03:00"))
      .map { case (id, t, ts) => (id, t, java.sql.Timestamp.valueOf(ts)) }
    val dir = Files.createTempDirectory("graft-surgical").toString
    val q = DocStreams.surgicalDeconGate(
        spark.readStream.schema("doc_id LONG, text STRING, ts TIMESTAMP")
          .parquet(dir), evalGrams, "text", "doc_id", "ts")
      .writeStream.format("memory").queryName("surgical")
      .outputMode("append").start()
    try {
      docs.foreach { d =>
        Seq(d).toDF("doc_id", "text", "ts")
          .coalesce(1).write.mode("append").parquet(dir)
        q.processAllAvailable()
      }
      val streamed = spark.sql(
          "SELECT id, n_words, n_removed, kept_text FROM surgical")
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2), r.getString(3))).toMap
      val batch = TextAnalysis.removeContaminatedSpans(
          docs.map(d => (d._1, d._2)).toDF("doc_id", "text"), evalGrams,
          "text", "doc_id", 13)
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2), r.getString(3))).toMap
      assert(streamed == batch, s"stream=$streamed batch=$batch")
      assert(streamed(0L)._3 == "keep one two tail alpha beta")
      assert(streamed(2L)._3 == "")
    } finally q.stop()
  }

  test("streaming split gate assigns the batch twin's splits, cluster-atomically") {
    import spark.implicits._
    import graft.streaming.DocStreams
    import graft.operators.{Dedup, Sampling}
    // an adversarial CHAIN component (0-1-2-3) + a pair + singletons —
    // the graph shapes the batch split's atomicity pins use
    val pairs = Seq((0L, 1L), (1L, 2L), (2L, 3L), (10L, 11L))
      .toDF("id_a", "id_b")
    val labels = Dedup.dupClusters(pairs).select(col("id"), col("cluster"))
      .localCheckpoint()
    val docs = (Seq(0L, 1L, 2L, 3L, 10L, 11L, 20L, 21L).zipWithIndex).map {
      case (id, i) =>
        (id, java.sql.Timestamp.valueOf(s"2024-01-01 00:0$i:00"))
    }
    val dir = Files.createTempDirectory("graft-splitgate").toString
    val q = DocStreams.splitGate(
        spark.readStream.schema("doc_id LONG, ts TIMESTAMP").parquet(dir),
        labels, "doc_id", "ts", valFrac = 0.25, testFrac = 0.25)
      .writeStream.format("memory").queryName("splitgate")
      .outputMode("append").start()
    try {
      // arrival order scrambled across micro-batches: assignment is a
      // pure function of the key, so order cannot matter
      docs.grouped(3).foreach { batch =>
        batch.toDF("doc_id", "ts")
          .coalesce(1).write.mode("append").parquet(dir)
        q.processAllAvailable()
      }
      val streamed = spark.sql("SELECT id, split_key, split FROM splitgate")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      // the batch twin (the vetted one-join path p116 ships) on the
      // identical docs + labels
      val batch = Sampling.leakageSafeSplitsFromVettedLabels(
          docs.map(_._1).toDF("doc_id"), labels, "doc_id", 0.25, 0.25)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      assert(streamed.toSet == batch.toSet,
        s"stream=${streamed.toSet} batch=${batch.toSet}")
      assert(streamed.length == docs.length, "one assignment per doc")
      // cluster atomicity holds in the stream: the whole chain lands in
      // ONE split, keyed on the component min id
      val chain = streamed.filter(_._1 <= 3L)
      assert(chain.map(_._2).toSet == Set(0L) &&
        chain.map(_._3).toSet.size == 1,
        s"chain component split apart in the stream: $chain")
      // singletons hash on their own id
      assert(streamed.filter(t => t._1 >= 20L).forall(t => t._2 == t._1))
    } finally q.stop()
  }

  test("streaming split gate converges to the batch twin on the full documents table") {
    import graft.streaming.DocStreams
    import graft.operators.{Dedup, Sampling}
    // the REAL corpus end-to-end: labels from the p116 pair derivation
    // (minHashDedup at 0.5 -> dupClusters), docs streamed by file source
    val docsBatch = Tables.load(spark, SparkTestSession.sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val labels = Dedup.dupClusters(
        Dedup.minHashDedup(docsBatch, "text", "doc_id", threshold = 0.5)
          .select(col("id_a"), col("id_b")))
      .select(col("id"), col("cluster")).localCheckpoint()
    val dir = Files.createTempDirectory("graft-splitgate-full").toString
    docsBatch.select(col("doc_id"),
        lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")).as("ts"))
      .write.mode("append").parquet(dir)
    val q = DocStreams.splitGate(
        spark.readStream.schema("doc_id LONG, ts TIMESTAMP").parquet(dir),
        labels, "doc_id", "ts", valFrac = 0.1, testFrac = 0.1)
      .writeStream.format("memory").queryName("splitgate_full")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val streamed = spark.sql(
        "SELECT id, split_key, split FROM splitgate_full").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
      val batch = Sampling.leakageSafeSplitsFromVettedLabels(
          docsBatch.select(col("doc_id")), labels, "doc_id", 0.1, 0.1)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
      assert(streamed == batch)
      assert(streamed.nonEmpty && streamed.map(_._3).contains("train"))
      // and some real near-dup cluster exists and moved as one unit
      val clustered = streamed.filter(t => t._1 != t._2)
      assert(clustered.nonEmpty, "corpus should contain near-dup clusters")
    } finally q.stop()
  }

  test("split gate refuses a stale dup-clusters artifact before the stream starts") {
    import spark.implicits._
    import graft.streaming.DocStreams
    val store = new graft.engine.GramArtifactStore(
      Files.createTempDirectory("graft-splitgate-store"))
    val params = Map("pairs" -> "spec", "threshold" -> "0.5")
    store.buildDupClusters("gate-cc",
      Seq((0L, 1L), (1L, 2L)).toDF("id_a", "id_b"), "docs@1", params)
    val streamDocs = spark.readStream.schema("doc_id LONG, ts TIMESTAMP")
      .parquet(Files.createTempDirectory("graft-splitgate-empty").toString)
    // wrong pair-derivation params: different clusters — refuse loudly,
    // never assign splits on the wrong granularity
    val eP = intercept[IllegalArgumentException](
      DocStreams.splitGateFromArtifact(streamDocs, store, "gate-cc",
        "docs@1", params + ("threshold" -> "0.9"), "doc_id", "ts",
        0.25, 0.25))
    assert(eP.getMessage.contains("params"))
    // stale corpus snapshot: same refusal
    val eV = intercept[IllegalArgumentException](
      DocStreams.splitGateFromArtifact(streamDocs, store, "gate-cc",
        "docs@2", params, "doc_id", "ts", 0.25, 0.25))
    assert(eV.getMessage.contains("docs@1") && eV.getMessage.contains("docs@2"))
    // and the matching consume WORKS end-to-end through the artifact
    val dir = Files.createTempDirectory("graft-splitgate-art").toString
    val q = DocStreams.splitGateFromArtifact(
        spark.readStream.schema("doc_id LONG, ts TIMESTAMP").parquet(dir),
        store, "gate-cc", "docs@1", params, "doc_id", "ts", 0.25, 0.25)
      .writeStream.format("memory").queryName("splitgate_art")
      .outputMode("append").start()
    try {
      Seq((0L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00")),
          (2L, java.sql.Timestamp.valueOf("2024-01-01 00:01:00")),
          (9L, java.sql.Timestamp.valueOf("2024-01-01 00:02:00")))
        .toDF("doc_id", "ts")
        .coalesce(1).write.mode("append").parquet(dir)
      q.processAllAvailable()
      val got = spark.sql("SELECT id, split_key FROM splitgate_art")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // 0 and 2 share the chain's min-id key; 9 is a singleton
      assert(got == Map(0L -> 0L, 2L -> 0L, 9L -> 9L), got.toString)
    } finally q.stop()
  }

  test("split gate: mid-stream artifact rebuild is invisible; the restart refuses it") {
    // Pins the documented deployment rule (splitGateFromArtifact
    // scaladoc, COVERAGE.md): staleness is validated ONCE at stream
    // construction, so a rebuild of the artifact mid-stream does NOT
    // change a running gate's assignments — split stability for the
    // snapshot's lifetime is the leakage guard working, not a gap — and
    // the per-snapshot RESTART is where the new corpus version takes
    // effect, with a forgotten rebuild refused loudly.
    import spark.implicits._
    import graft.streaming.DocStreams
    val store = new graft.engine.GramArtifactStore(
      Files.createTempDirectory("graft-splitgate-rebuild"))
    val params = Map("pairs" -> "spec", "threshold" -> "0.5")
    store.buildDupClusters("roll-cc",
      Seq((0L, 1L), (1L, 2L)).toDF("id_a", "id_b"), "docs@1", params)
    val dir = Files.createTempDirectory("graft-splitgate-roll").toString
    val q = DocStreams.splitGateFromArtifact(
        spark.readStream.schema("doc_id LONG, ts TIMESTAMP").parquet(dir),
        store, "roll-cc", "docs@1", params, "doc_id", "ts", 0.25, 0.25)
      .writeStream.format("memory").queryName("splitgate_roll")
      .outputMode("append").start()
    try {
      def feed(ids: Long*): Unit = {
        ids.toSeq.map(i => (i,
            java.sql.Timestamp.valueOf(s"2024-01-01 00:0$i:00")))
          .toDF("doc_id", "ts")
          .coalesce(1).write.mode("append").parquet(dir)
        q.processAllAvailable()
      }
      feed(0L, 2L)
      // corpus snapshot rolls: the CC pass rebuilds the SAME artifact
      // name for docs@2 with different chains ({2,9} instead of {0,1,2})
      store.buildDupClusters("roll-cc",
        Seq((2L, 9L)).toDF("id_a", "id_b"), "docs@2", params)
      feed(9L)
      val running = spark.sql("SELECT id, split_key FROM splitgate_roll")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // the RUNNING gate still assigns on the labels it validated at
      // start: 0 and 2 keep the old chain's key, 9 stays a singleton
      // (under docs@2's labels it would key on 2)
      assert(running == Map(0L -> 0L, 2L -> 0L, 9L -> 9L), running.toString)
      // a restart that forgot the rebuild refuses before starting ...
      val e = intercept[IllegalArgumentException](
        DocStreams.splitGateFromArtifact(
          spark.readStream.schema("doc_id LONG, ts TIMESTAMP").parquet(dir),
          store, "roll-cc", "docs@1", params, "doc_id", "ts", 0.25, 0.25))
      assert(e.getMessage.contains("docs@2"))
    } finally q.stop()
    // ... and the per-snapshot restart against docs@2 picks up the new
    // cluster granularity for the same doc ids
    val dir2 = Files.createTempDirectory("graft-splitgate-roll2").toString
    val q2 = DocStreams.splitGateFromArtifact(
        spark.readStream.schema("doc_id LONG, ts TIMESTAMP").parquet(dir2),
        store, "roll-cc", "docs@2", params, "doc_id", "ts", 0.25, 0.25)
      .writeStream.format("memory").queryName("splitgate_roll2")
      .outputMode("append").start()
    try {
      Seq((2L, java.sql.Timestamp.valueOf("2024-01-01 00:02:00")),
          (9L, java.sql.Timestamp.valueOf("2024-01-01 00:09:00")))
        .toDF("doc_id", "ts")
        .coalesce(1).write.mode("append").parquet(dir2)
      q2.processAllAvailable()
      val restarted = spark.sql("SELECT id, split_key FROM splitgate_roll2")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(restarted == Map(2L -> 2L, 9L -> 2L), restarted.toString)
    } finally q2.stop()
  }

  test("split-at-ingest feeds per-split shard export; no record crosses splits") {
    // the two deployment legs composed IN A STREAM (the streaming shape
    // of p119's batch funnel): splitGateFromArtifact assigns each
    // arriving doc its leakage-safe split, foreachBatch packs every
    // micro-batch into split-disjoint TFRecord shards with p119's
    // packed-id scheme (test 0-3, val 4-7, train 8-11). Re-parsing all
    // shards across batches must (a) keep every record inside its own
    // split's shard range and (b) reproduce the batch assignment.
    import graft.operators.{TfRecord, Sampling}
    import graft.streaming.DocStreams
    import spark.implicits._
    implicit val s = spark
    val store = new graft.engine.GramArtifactStore(
      Files.createTempDirectory("graft-splitexp-store"))
    val params = Map("pairs" -> "spec", "threshold" -> "0.5")
    store.buildDupClusters("exp-cc",
      Seq((0L, 1L), (1L, 2L), (7L, 9L)).toDF("id_a", "id_b"),
      "docs@1", params)
    val dir = Files.createTempDirectory("graft-splitexp").toString
    val packed = scala.collection.mutable.ArrayBuffer[(Long, Long, String)]()
    val q = DocStreams.splitGateFromArtifact(
        spark.readStream.schema("doc_id LONG, ts TIMESTAMP").parquet(dir),
        store, "exp-cc", "docs@1", params, "doc_id", "ts", 0.25, 0.25)
      .writeStream.outputMode("append")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        val si = when(col("split") === "test", 0L)
          .when(col("split") === "val", 1L).otherwise(2L)
        val rows = df.select((si * 4 + pmod(col("id"), lit(4))).as("packed"),
            col("id"), col("split"))
          .as[(Long, Long, String)]
          .map { case (p, id, sp) =>
            (p, id, s"$id|$sp".getBytes("UTF-8")) }
        TfRecord.parseShards(TfRecord.shardExport(rows))
          .collect().foreach { r =>
            assert(r.len_crc_ok && r.data_crc_ok)
            val Array(id, sp) = new String(r.payload, "UTF-8").split("\\|")
            packed.synchronized { packed += ((r.shard, id.toLong, sp)) }
          }
      }.start()
    try {
      def feed(ids: Long*): Unit = {
        ids.toSeq.map(i => (i, java.sql.Timestamp.valueOf(
            s"2024-01-01 00:${10 + i}:00")))
          .toDF("doc_id", "ts")
          .coalesce(1).write.mode("append").parquet(dir)
        q.processAllAvailable()
      }
      feed(0L, 1L, 2L); feed(7L, 9L, 42L)
      val bySplit = Map("test" -> 0L, "val" -> 1L, "train" -> 2L)
      // (a) shard ranges are split-disjoint
      packed.foreach { case (shard, id, sp) =>
        assert(shard / 4 == bySplit(sp),
          s"doc $id ($sp) landed in shard $shard outside its split range")
      }
      // (b) the streamed assignment IS the batch assignment
      val batch = Sampling.leakageSafeSplitsFromVettedLabels(
          Seq(0L, 1L, 2L, 7L, 9L, 42L).toDF("doc_id"),
          store.dupClusterLabels(spark, "exp-cc", "docs@1", params),
          "doc_id", 0.25, 0.25)
        .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
      assert(packed.map(p => p._2 -> p._3).toMap == batch)
    } finally q.stop()
  }

  test("split-at-ingest feeds per-split WebDataset tars; members stay split-disjoint") {
    // p128's streaming shape: the split gate assigns each arriving doc
    // its leakage-safe split, foreachBatch packs every micro-batch into
    // split-disjoint ustar tar shards with Tar.shardExport (legal there —
    // each micro-batch is a plain DataFrame), and re-parsing every tar
    // written across batches must keep each member inside its own
    // split's shard block and reproduce the batch assignment.
    import graft.operators.{Tar, Sampling}
    import graft.streaming.DocStreams
    import spark.implicits._
    implicit val s = spark
    val store = new graft.engine.GramArtifactStore(
      Files.createTempDirectory("graft-wdsexp-store"))
    val params = Map("pairs" -> "spec", "threshold" -> "0.5")
    store.buildDupClusters("wds-cc",
      Seq((0L, 1L), (7L, 9L)).toDF("id_a", "id_b"), "docs@1", params)
    val dir = Files.createTempDirectory("graft-wdsexp").toString
    val seen = scala.collection.mutable.ArrayBuffer[(Long, Long, String)]()
    val q = DocStreams.splitGateFromArtifact(
        spark.readStream.schema("doc_id LONG, ts TIMESTAMP").parquet(dir),
        store, "wds-cc", "docs@1", params, "doc_id", "ts", 0.25, 0.25)
      .writeStream.outputMode("append")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        val si = when(col("split") === "test", 0L)
          .when(col("split") === "val", 1L).otherwise(2L)
        val rows = df.select((si * 4 + pmod(col("id"), lit(4))).as("shard"),
            col("id"), col("split"))
          .as[(Long, Long, String)]
          .map { case (sh, id, sp) =>
            (sh, id, f"sample$id%06d.json",
              s"""{"id":$id,"split":"$sp"}""".getBytes("UTF-8")) }
        Tar.webdatasetMembers(Tar.shardExport(rows))
          .collect().foreach { m =>
            val js = new String(m.payload, "UTF-8")
            val sp = js.split("\\\"split\\\":\\\"")(1).takeWhile(_ != '"')
            seen.synchronized { seen += ((m.media_id, m.key.drop(6).toLong, sp)) }
          }
      }.start()
    try {
      def feed(ids: Long*): Unit = {
        ids.toSeq.map(i => (i, java.sql.Timestamp.valueOf(
            s"2024-01-01 00:${10 + i}:00")))
          .toDF("doc_id", "ts")
          .coalesce(1).write.mode("append").parquet(dir)
        q.processAllAvailable()
      }
      feed(0L, 1L, 7L); feed(9L, 23L)
      val bySplit = Map("test" -> 0L, "val" -> 1L, "train" -> 2L)
      seen.foreach { case (shard, id, sp) =>
        assert(shard / 4 == bySplit(sp),
          s"doc $id ($sp) landed in tar shard $shard outside its split block")
      }
      val batch = Sampling.leakageSafeSplitsFromVettedLabels(
          Seq(0L, 1L, 7L, 9L, 23L).toDF("doc_id"),
          store.dupClusterLabels(spark, "wds-cc", "docs@1", params),
          "doc_id", 0.25, 0.25)
        .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
      assert(seen.map(t => t._2 -> t._3).toMap == batch)
    } finally q.stop()
  }

  test("streaming snapshot-dedup gate matches the batch againstSnapshot twin") {
    import spark.implicits._
    import graft.streaming.DocStreams
    import graft.operators.Dedup
    val snapshot = Seq(
      (0L, "shared content one"), (1L, " SHARED  content ONE "), // dup of 0
      (2L, "snapshot only text"))
      .toDF("doc_id", "text")
    val index = Dedup.snapshotHashIndex(snapshot, "text", "doc_id")
    // the index collapses the normalized dup group to its lowest holder
    assert(index.collect().map(r => r.getString(0) -> r.getLong(1))
      .toMap.values.toSet == Set(0L, 2L))
    val docs = Seq(
      (10L, "Shared Content One", "2024-01-01 00:00:00"),   // re-crawl -> 0
      (11L, "a genuinely novel doc", "2024-01-01 00:01:00"),
      (12L, "snapshot only text", "2024-01-01 00:02:00"))   // mirror -> 2
      .map { case (id, t, ts) => (id, t, java.sql.Timestamp.valueOf(ts)) }
    val dir = Files.createTempDirectory("graft-snapgate").toString
    val q = DocStreams.snapshotDedupGate(
        spark.readStream.schema("doc_id LONG, text STRING, ts TIMESTAMP")
          .parquet(dir), index, "text", "doc_id", "ts")
      .writeStream.format("memory").queryName("snapgate")
      .outputMode("append").start()
    try {
      docs.foreach { d =>
        Seq(d).toDF("doc_id", "text", "ts")
          .coalesce(1).write.mode("append").parquet(dir)
        q.processAllAvailable()
      }
      val streamed = spark.sql("SELECT id, is_dup, dup_of FROM snapgate")
        .collect().map(r => r.getLong(0) ->
          (r.getBoolean(1), if (r.isNullAt(2)) -1L else r.getLong(2))).toMap
      // batch twin on the identical inputs
      val batch = Dedup.againstSnapshot(
          docs.map(d => (d._1, d._2)).toDF("doc_id", "text"),
          snapshot, "text", "doc_id")
        .collect().map(r => r.getLong(0) ->
          (r.getBoolean(1), if (r.isNullAt(2)) -1L else r.getLong(2))).toMap
      assert(streamed == batch, s"stream=$streamed batch=$batch")
      assert(streamed == Map(
        10L -> ((true, 0L)), 11L -> ((false, -1L)), 12L -> ((true, 2L))))
    } finally q.stop()
  }
}
