package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{ImageHash, Multimodal}

/** dHash exactness (vs a straight re-computation), cross-codec invariance
  * (PPM vs BMP of the same pixels hash identically), planted near-dup
  * recall through the banded join, and the pigeonhole no-recall-loss
  * property the p63 oracle relies on. */
class ImageHashSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def fixturePixels(seed: Long, w: Int = 18, h: Int = 16): Array[Byte] =
    Array.tabulate[Byte](w * h * 3) { i =>
      val x = (seed * 131 + i.toLong * 7919 + 12345) % 65536
      (((x * x) / 4096) % 256).toByte
    }

  test("dHash on a 9x8 image is the raw gradient-sign bitmap (identity pooling)") {
    val w = 9; val h = 8
    val rgb = fixturePixels(3L, w, h)
    def lum(x: Int, y: Int): Int = {
      val i = (y * w + x) * 3
      ImageHash.luma(rgb(i) & 0xFF, rgb(i + 1) & 0xFF, rgb(i + 2) & 0xFF)
    }
    var want = 0L
    for (r <- 0 until 8; c <- 0 until 8)
      if (lum(c + 1, r) > lum(c, r)) want |= 1L << (r * 8 + c)
    assert(ImageHash.dHash64(w, h, rgb) == want)
  }

  test("grayGrid pools exact integer means over disjoint cells") {
    val w = 18; val h = 16
    val rgb = fixturePixels(7L)
    val grid = ImageHash.grayGrid(w, h, rgb, 9, 8)
    def lum(x: Int, y: Int): Int = {
      val i = (y * w + x) * 3
      ImageHash.luma(rgb(i) & 0xFF, rgb(i + 1) & 0xFF, rgb(i + 2) & 0xFF)
    }
    for (r <- 0 until 8; c <- 0 until 9) {
      val want = (lum(2 * c, 2 * r) + lum(2 * c + 1, 2 * r) +
        lum(2 * c, 2 * r + 1) + lum(2 * c + 1, 2 * r + 1)) / 4
      assert(grid(r * 9 + c) == want, s"cell ($r,$c)")
    }
    // non-divisible grid still partitions every pixel exactly once
    val g2 = ImageHash.grayGrid(w, h, rgb, 7, 5)
    assert(g2.length == 35)
  }

  test("same pixels hash identically through PPM and BMP containers") {
    implicit val s = spark
    val rgb = fixturePixels(11L)
    val media = Seq(
      Multimodal.MediaRow(0L, "ppm", Multimodal.encodePpm(18, 16, rgb)),
      Multimodal.MediaRow(1L, "bmp", Multimodal.encodeBmp(18, 16, rgb))).toDS()
    val hs = ImageHash.dHashImages(media).collect().map(r => r.media_id -> r.dhash).toMap
    assert(hs(0L) == hs(1L))
    assert(hs(0L) == ImageHash.dHash64(18, 16, rgb))
  }

  test("perturbed twin stays within hamming 3 and is found; unrelated images are not") {
    implicit val s = spark
    val base = fixturePixels(5L)
    val twin = base.clone()
    twin(0) = ((twin(0) + 120) % 256).toByte
    twin(437) = ((twin(437) + 120) % 256).toByte
    val media = Seq(
      Multimodal.MediaRow(0L, "ppm", Multimodal.encodePpm(18, 16, base)),
      Multimodal.MediaRow(1L, "bmp", Multimodal.encodeBmp(18, 16, twin)),
      Multimodal.MediaRow(2L, "ppm", Multimodal.encodePpm(18, 16, fixturePixels(99L))),
      Multimodal.MediaRow(3L, "bmp", Multimodal.encodeBmp(18, 16, fixturePixels(150L)))).toDS()
    val pairs = ImageHash.nearDupPairs(ImageHash.dHashImages(media).toDF())
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(pairs.contains((0L, 1L)))
    assert(pairs((0L, 1L)) <= 3)
    assert(pairs.keySet == Set((0L, 1L)))
  }

  test("pHash: brightness-scaling invariant, local edits near, unrelated far") {
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val w = 64; val h = 64
    // natural-like fixture: gradient + several decaying frequencies, so
    // the DCT block carries coefficients of varied magnitude (a pure
    // noise or pure sinusoid image parks most ACs at the median, where
    // comparisons are coin flips — outside pHash's design domain)
    def natural(seed: Int): Array[Byte] =
      Array.tabulate[Byte](w * h * 3) { i =>
        val p = i / 3; val x = p % w; val y = p / w
        val s = seed.toDouble
        val v = 100 + x * 0.6 + y * 0.4 +
          45 * math.sin(2 * math.Pi * (x + 3 * s) / 40.0) +
          28 * math.cos(2 * math.Pi * (y + 2 * s) / 24.0) +
          18 * math.sin(2 * math.Pi * (x + y + s) / 15.0) +
          9 * math.cos(2 * math.Pi * (x - y + 5 * s) / 9.0)
        math.max(0, math.min(255, v.round.toInt)).toByte
      }
    val base = natural(0)
    val pBase = ImageHash.pHash64(w, h, base)
    // global brightness ×0.8 (no clipping downward): every coefficient
    // and the AC median scale together — bits survive up to integer-luma
    // rounding
    val dim = ham(pBase, ImageHash.pHash64(w, h,
      base.map(b => ((b & 0xFF) * 4 / 5).toByte)))
    assert(dim <= 6, s"dim $dim")
    // a blacked-out 8x8 corner is a REAL low-frequency edit — nearer
    // than any unrelated image, farther than a brightness change
    val edited = base.clone()
    for (y <- 0 until 8; x <- 0 until 8; ch <- 0 until 3)
      edited((y * w + x) * 3 + ch) = 0
    val edit = ham(pBase, ImageHash.pHash64(w, h, edited))
    // seeds chosen so no term's phase shift lands near a full period
    // (e.g. seed 14 would put 3s=42 on the /40 term's period — a planted
    // near-dup, which is exactly what pHash would — correctly — match)
    val others = Seq(3, 7, 9).map(s => ham(pBase, ImageHash.pHash64(w, h, natural(s))))
    assert(edit < others.min, s"edit $edit vs $others")
    assert(others.forall(_ >= 26), s"unrelated too close: $others")
    // and the distributed seam agrees with the direct computation
    implicit val s = spark
    val media = Seq(
      Multimodal.MediaRow(1L, "ppm", Multimodal.encodePpm(w, h, base)),
      Multimodal.MediaRow(2L, "ppm", Multimodal.encodePpm(w, h, edited)))
      .toDS()
    val got = ImageHash.pHashImages(media).collect()
      .map(r => r.media_id -> r.dhash).toMap
    assert(got(1L) == pBase)
    assert(ham(got(1L), got(2L)) == edit)
  }

  test("video near-dup: a re-cut clip pairs with its source, unrelated clips don't") {
    implicit val s = spark
    def frame(seed: Long): Array[Byte] = fixturePixels(seed)
    // source: frames 0..5; clip: frames 1..5 plus one new frame; unrelated
    val src = (0L to 5L).map(frame)
    val clip = (1L to 5L).map(frame) :+ frame(99L)
    val other = (50L to 55L).map(frame)
    val media = Seq(
      Multimodal.MediaRow(0L, "avi", Multimodal.encodeAvi(18, 16, 10, src)),
      Multimodal.MediaRow(1L, "avi", Multimodal.encodeAvi(18, 16, 10, clip)),
      Multimodal.MediaRow(2L, "avi", Multimodal.encodeAvi(18, 16, 10, other))).toDS()
    val fh = ImageHash.videoFrameHashes(media).toDF()
    // frame hashes through the AVI container equal the direct pixel hash
    val direct = ImageHash.dHash64(18, 16, frame(3L))
    val viaAvi = fh.filter(col("media_id") === 0L && col("frame_idx") === 3L)
      .collect().head.getLong(2)
    assert(viaAvi == direct)
    val pairs = ImageHash.videoNearDup(fh, minShared = 4)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(pairs.keySet == Set((0L, 1L)))
    assert(pairs((0L, 1L)) == 5L) // frames 1..5 shared
  }

  test("banding loses no recall at hamming <= 3 (pigeonhole, randomized)") {
    val rnd = new scala.util.Random(42)
    // pairs of ids: even id random, odd id a <=3-bit twin of the previous
    val sigs = (0 until 100).flatMap { g =>
      val base = rnd.nextLong()
      var twin = base
      (0 until rnd.nextInt(4)).foreach(_ => twin ^= 1L << rnd.nextInt(64))
      Seq((2L * g, base), (2L * g + 1, twin))
    }
    val df = spark.createDataFrame(sigs).toDF("media_id", "dhash")
    val got = ImageHash.nearDupPairs(df)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // exact all-pairs reference
    val want = (for {
      (a, ha) <- sigs; (b, hb) <- sigs if a < b
      if java.lang.Long.bitCount(ha ^ hb) <= 3
    } yield (a, b)).toSet
    assert(got == want)
  }
}
