package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads as opaque binary
  * columns with typed metadata.
  *
  * The container has no image/audio codecs, so the decode step is a
  * clearly-marked deterministic STUB (byte-histogram "features",
  * length-based "duration"), but the Spark-side plumbing is real: binary
  * columns, typed Dataset schema, partition-parallel mapPartitions decode
  * with batch-shaped iteration, and metadata extraction that stays in
  * codegen. Swap `stubDecode` for a real codec and nothing else changes.
  */
object Multimodal {

  case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])
  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
    sha256: String, histogram: Array[Double], mean_byte: Double)

  /** Attach typed metadata to a binary payload column — pure codegen'd
    * expressions (length, hash, magic-byte sniffing). */
  def withMetadata(df: DataFrame, payloadCol: String): DataFrame =
    df.withColumn("n_bytes", length(col(payloadCol)).cast("long"))
      .withColumn("payload_sha256", sha2(col(payloadCol), 256))
      .withColumn("sniffed_kind",
        when(substring(col(payloadCol), 1, 4) === lit("PNG".getBytes("ISO-8859-1")), "png")
          .when(substring(col(payloadCol), 1, 3) === lit("ID3".getBytes("ISO-8859-1")), "mp3")
          .otherwise("unknown"))

  /** STUB decoder: a real implementation would decode the codec here.
    * This one computes a deterministic 16-bin byte histogram so the
    * downstream plumbing (feature schema, batching, partition parallelism)
    * is fully exercised and testable. */
  def stubDecode(payload: Array[Byte]): (Array[Double], Double) = {
    val hist = new Array[Double](16)
    var sum = 0L
    var i = 0
    while (i < payload.length) {
      val b = payload(i) & 0xFF
      hist(b >> 4) += 1.0
      sum += b
      i += 1
    }
    val n = math.max(payload.length, 1)
    (hist.map(_ / n), sum.toDouble / n)
  }

  /** Partition-parallel decode: binary rows -> typed features. Iterator-in /
    * iterator-out (never materializes a partition), the Spark idiom for
    * batch-shaped UDF work at scale. */
  def decodeFeatures(media: Dataset[MediaRow])(implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { rows =>
      val digest = java.security.MessageDigest.getInstance("SHA-256")
      rows.map { r =>
        val (hist, mean) = stubDecode(r.payload)
        digest.reset()
        val sha = digest.digest(r.payload).map("%02x".format(_)).mkString
        MediaFeatures(r.media_id, r.kind, r.payload.length.toLong, sha, hist, mean)
      }
    }
  }

  /** Simulated frame sampling: for a payload treated as fixed-size frames,
    * emit every `stride`-th frame offset (plumbing for video frame
    * extraction: explode + slice over binary). */
  def sampleFrames(df: DataFrame, payloadCol: String, frameSize: Int, stride: Int): DataFrame =
    df.withColumn("frame_offset",
        explode(sequence(lit(0), greatest(length(col(payloadCol)) - frameSize, lit(0)),
          lit(frameSize * stride))))
      .withColumn("frame", expr(s"substring($payloadCol, frame_offset + 1, $frameSize)"))
      .withColumn("frame_sha", sha2(col("frame"), 256))

  case class ResizedMedia(media_id: Long, kind: String, factor: Int,
    n_bytes: Long, payload: Array[Byte])

  /** STUB resize (a real implementation would decode, scale, re-encode):
    * average-pools the raw bytes by `factor`, shrinking the payload
    * deterministically so the downstream plumbing — typed schema,
    * partition-parallel transform, re-encoded binary output — is fully
    * exercised. Iterator-in/iterator-out like decodeFeatures. */
  def resizeStub(media: Dataset[MediaRow], factor: Int)
      (implicit spark: SparkSession): Dataset[ResizedMedia] = {
    import spark.implicits._
    require(factor >= 1, s"resize factor must be >= 1: $factor")
    media.mapPartitions { rows =>
      rows.map { r =>
        val n = (r.payload.length + factor - 1) / factor
        val outBytes = new Array[Byte](n)
        var i = 0
        while (i < n) {
          var sum = 0
          var k = 0
          while (k < factor && i * factor + k < r.payload.length) {
            sum += r.payload(i * factor + k) & 0xFF
            k += 1
          }
          outBytes(i) = (sum / math.max(k, 1)).toByte
          i += 1
        }
        ResizedMedia(r.media_id, r.kind, factor, n.toLong, outBytes)
      }
    }
  }
}
