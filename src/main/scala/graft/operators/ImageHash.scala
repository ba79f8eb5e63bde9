package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Perceptual image hashing (dHash) + hamming-banded near-duplicate pairs —
  * the image-side analog of the text SimHash path ([[Dedup.simHashSignatures]]).
  *
  * A multimodal training corpus dedups images by CONTENT, not bytes: the same
  * photo re-encoded (PNG vs JPEG), resized, or brightness-shifted must land in
  * the same near-dup cluster even though every byte differs. dHash is the
  * standard cheap answer (difference hash: gradient signs of a tiny grayscale
  * thumbnail — public domain, popularized by Krawetz's "Kind of Like That"
  * and the imagehash library): decode → integer luma → box-filter to a 9×8
  * grid → 64 bits of "is the right neighbor brighter".
  *
  * Scale shape (100 TB): hashing is per-row mapPartitions behind the same
  * codec seam as [[Multimodal.decodeImages]] — zero shuffle, scan-bound.
  * Pair generation never compares all pairs: identical to the SimHash path,
  * 16-bit band buckets turn hamming<=3 into at most 4 exact-match equi-joins
  * (pigeonhole), with a bucket cap so boilerplate images (blank thumbnails)
  * cannot make the self-join quadratic.
  *
  * The reference stores image payloads only as opaque BLOBs (no codec in
  * litebase) — this operator is training-pipeline surface beyond it.
  */
object ImageHash {

  /** Integer BT.601 luma in fixed-point — exactly reproducible in SQL
    * ((299r + 587g + 114b) div 1000), so oracle hashes match bit-for-bit. */
  def luma(r: Int, g: Int, b: Int): Int = (299 * r + 587 * g + 114 * b) / 1000

  /** Box-filter an RGB image to a `gw`×`gh` grayscale grid (integer mean of
    * the cell's lumas). Cells partition the image by integer pixel ranges
    * [r*h/gh, (r+1)*h/gh) × [c*w/gw, (c+1)*w/gw) — every source pixel lands
    * in exactly one cell, so the thumbnail is a true pooling, not a sample. */
  def grayGrid(w: Int, h: Int, rgb: Array[Byte], gw: Int, gh: Int): Array[Int] = {
    require(w >= gw && h >= gh, s"image ${w}x$h smaller than grid ${gw}x$gh")
    val out = new Array[Int](gw * gh)
    var r = 0
    while (r < gh) {
      val y0 = r * h / gh; val y1 = (r + 1) * h / gh
      var c = 0
      while (c < gw) {
        val x0 = c * w / gw; val x1 = (c + 1) * w / gw
        var sum = 0L; var n = 0
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) {
            val i = (y * w + x) * 3
            sum += luma(rgb(i) & 0xFF, rgb(i + 1) & 0xFF, rgb(i + 2) & 0xFF)
            n += 1; x += 1
          }
          y += 1
        }
        out(r * gw + c) = (sum / n).toInt
        c += 1
      }
      r += 1
    }
    out
  }

  /** 64-bit difference hash: bit r*8+c is set iff grid(r, c+1) > grid(r, c)
    * on the 9-wide × 8-tall luma grid (strict >, ties = 0 — deterministic). */
  def dHash64(w: Int, h: Int, rgb: Array[Byte]): Long = {
    val g = grayGrid(w, h, rgb, 9, 8)
    var bits = 0L
    var r = 0
    while (r < 8) {
      var c = 0
      while (c < 8) {
        if (g(r * 9 + c + 1) > g(r * 9 + c)) bits |= 1L << (r * 8 + c)
        c += 1
      }
      r += 1
    }
    bits
  }

  /** 64-bit DCT perceptual hash (classic pHash): 32×32 luma thumbnail →
    * separable 2D DCT-II (orthonormal, via [[AudioFeatures.dct2]] — row
    * pass keeps 8 coefficients, column pass over those) → top-left 8×8
    * low-frequency block → bit i set iff coeff(i) > median of the 63 AC
    * coefficients (DC excluded from the median; odd count, so the median
    * is an element — no averaging, fully deterministic). Invariant under
    * global brightness scaling (all coefficients and the median scale
    * together) and robust to local edits, where dHash's fixed-gradient
    * bits flip more readily. */
  def pHash64(w: Int, h: Int, rgb: Array[Byte]): Long = {
    val g = grayGrid(w, h, rgb, 32, 32)
    // row-wise DCT (keep 8), then column-wise DCT over the 8 kept columns
    val rows = Array.tabulate(32)(r =>
      AudioFeatures.dct2(Array.tabulate(32)(c => g(r * 32 + c).toDouble), 8))
    val block = Array.tabulate(8)(u =>
      AudioFeatures.dct2(Array.tabulate(32)(r => rows(r)(u)), 8))
    // block(u)(v): u = horizontal frequency, v = vertical; flatten 8x8
    val v = Array.tabulate(64)(i => block(i % 8)(i / 8))
    val ac = v.drop(1).sorted
    val median = ac(31) // 32nd smallest of 63
    var bits = 0L
    var i = 0
    while (i < 64) { if (v(i) > median) bits |= 1L << i; i += 1 }
    bits
  }

  final case class ImageSig(media_id: Long, dhash: Long)

  /** Decode + hash behind the mapPartitions codec seam: PPM via the hand
    * parser, everything else via the stock JDK readers — the same dispatch
    * as [[Multimodal.decodeImages]]. Iterator-in/iterator-out, zero shuffle. */
  def dHashImages(media: Dataset[Multimodal.MediaRow])
      (implicit spark: SparkSession): Dataset[ImageSig] = {
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { m =>
        val (w, h, rgb) = m.kind match {
          case "ppm" => Multimodal.decodePpm(m.payload)
          case _ => Multimodal.decodeBmp(m.payload)
        }
        ImageSig(m.media_id, dHash64(w, h, rgb))
      }
    }
  }

  /** Decode + pHash behind the same codec seam as [[dHashImages]]; the
    * output column is still named `dhash` so [[nearDupPairs]]' banded
    * hamming join applies unchanged. */
  def pHashImages(media: Dataset[Multimodal.MediaRow])
      (implicit spark: SparkSession): Dataset[ImageSig] = {
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { m =>
        val (w, h, rgb) = m.kind match {
          case "ppm" => Multimodal.decodePpm(m.payload)
          case _ => Multimodal.decodeBmp(m.payload)
        }
        ImageSig(m.media_id, pHash64(w, h, rgb))
      }
    }
  }

  final case class FrameHash(media_id: Long, frame_idx: Long, dhash: Long)

  /** Per-frame dHash over decoded AVI videos (every `stride`-th frame) —
    * the video fingerprint: a re-cut or re-uploaded clip keeps its frames'
    * hashes even when every container byte differs. Per-row decode behind
    * the mapPartitions seam, rows out ∝ sampled frames. */
  def videoFrameHashes(media: Dataset[Multimodal.MediaRow], stride: Int = 1)
      (implicit spark: SparkSession): Dataset[FrameHash] = {
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { m =>
        val (w, h, _, frames) = Multimodal.decodeAvi(m.payload)
        frames.zipWithIndex.collect {
          case (rgb, i) if i % stride == 0 =>
            FrameHash(m.media_id, i.toLong, dHash64(w, h, rgb))
        }
      }
    }
  }

  /** Video near-dup pairs: clips sharing >= `minShared` DISTINCT frame
    * hashes — the overlap criterion that catches a re-cut (same footage,
    * different in/out points) exactly. Equi-join on the frame hash with
    * the usual bucket cap (a ubiquitous frame — black leader, color bars —
    * must not square the join); never all-pairs. */
  def videoNearDup(frameHashes: DataFrame, minShared: Int = 4,
      maxBucket: Int = 1000): DataFrame = {
    val distinctFh = frameHashes.select(col("media_id"), col("dhash")).distinct()
    val buckets = distinctFh
      .withColumn("sz", count(lit(1)).over(Window.partitionBy("dhash")))
      .filter(col("sz").between(2, maxBucket))
      .drop("sz")
    buckets.as("a").join(buckets.as("b"),
        col("a.dhash") === col("b.dhash") &&
          col("a.media_id") < col("b.media_id"))
      .groupBy(col("a.media_id").as("id_a"), col("b.media_id").as("id_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** Near-dup pairs within `maxHamming` bits of dHash, via exact-match joins
    * on 4 × 16-bit bands (pigeonhole: hamming<=3 ⇒ at least one band agrees).
    * `maxBucket` caps degenerate buckets — a corpus of near-blank thumbnails
    * collapses onto few band values; without the cap the self-join goes
    * quadratic on exactly the images a dedup pass wants gone wholesale.
    * Same window-count guard over one exchange as [[Dedup.simHashCandidates]]
    * (a groupBy + semi-join guard would defeat AQE stage reuse). */
  def nearDupPairs(sigs: DataFrame, maxHamming: Int = 3,
      maxBucket: Int = 1000): DataFrame = {
    val bands = 4
    val bandCols = (0 until bands).map(j =>
      struct(lit(j).as("band"),
        shiftrightunsigned(col("dhash"), j * 16).bitwiseAND(lit(0xFFFFL)).as("bh")))
    val exploded = sigs
      .select(col("media_id"), col("dhash"), explode(array(bandCols: _*)).as("b"))
      .select(col("media_id"), col("dhash"), col("b.band").as("band"),
        col("b.bh").as("bh"))
    val buckets = exploded
      .withColumn("sz", count(lit(1)).over(Window.partitionBy("band", "bh")))
      .filter(col("sz").between(2, maxBucket))
      .drop("sz")
    buckets.as("a").join(buckets.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.media_id") < col("b.media_id"))
      .select(col("a.media_id").as("id_a"), col("b.media_id").as("id_b"),
        bit_count(col("a.dhash").bitwiseXOR(col("b.dhash"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
