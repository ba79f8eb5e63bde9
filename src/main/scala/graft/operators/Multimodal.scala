package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads as opaque binary
  * columns with typed metadata.
  *
  * Every modality has a REAL container codec behind the partition-parallel
  * mapPartitions seam: IMAGE — PPM (P6) via a hand parser and BMP via
  * javax.imageio ([[decodeImages]]); AUDIO — WAV/PCM16 via
  * javax.sound.sampled ([[decodeAudio]]); VIDEO — uncompressed AVI (RIFF
  * walker over raw DIB 'vids' frames, [[decodeVideos]]). COMPRESSED
  * codecs (JPEG beyond imageio, MP3, H.264) need native libraries this
  * sandbox lacks, so [[stubDecode]]/[[resizeStub]] keep a clearly-marked
  * deterministic seam with identical plumbing — binary columns, typed
  * Dataset schema, iterator-in/iterator-out batching — so swapping such a
  * codec in changes nothing else.
  */
object Multimodal {

  // ImageIO's default stream cache backs every encode/decode with a TEMP
  // FILE — one disk create/write/delete round-trip per image, serialized
  // on the cache directory under partition-parallel codec work (r18:
  // p32's MJPEG pass inflated 6.4 → 130 s of CPU at 8-way parallelism
  // before this). All payloads here are small in-memory images; the
  // memory-backed stream is strictly better.
  javax.imageio.ImageIO.setUseCache(false)

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
          .when(substring(col(payloadCol), 1, 4) === lit("fLaC".getBytes("ISO-8859-1")), "flac")
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

  // --- real image codecs ---------------------------------------------------

  /** Encode RGB pixels as PPM P6 (maxval 255) — a real container format:
    * text header + raw RGB rows. */
  def encodePpm(width: Int, height: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == width * height * 3, "rgb length must be w*h*3")
    val header = s"P6\n$width $height\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + rgb.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(rgb, 0, out, header.length, rgb.length)
    out
  }

  /** Parse PPM P6: returns (width, height, rgb). Handles comment lines and
    * arbitrary whitespace per the netpbm spec. */
  def decodePpm(bytes: Array[Byte]): (Int, Int, Array[Byte]) = {
    var i = 0
    def token(): String = {
      val sb = new StringBuilder
      while (i < bytes.length &&
          (Character.isWhitespace(bytes(i)) || bytes(i) == '#')) {
        if (bytes(i) == '#') { while (i < bytes.length && bytes(i) != '\n') i += 1 }
        else i += 1
      }
      while (i < bytes.length && !Character.isWhitespace(bytes(i))) {
        sb.append(bytes(i).toChar); i += 1
      }
      sb.toString
    }
    require(token() == "P6", "not a P6 ppm")
    val w = token().toInt; val h = token().toInt
    val maxval = token().toInt
    require(maxval == 255, s"unsupported maxval $maxval")
    i += 1 // single whitespace after maxval
    val rgb = java.util.Arrays.copyOfRange(bytes, i, i + w * h * 3)
    (w, h, rgb)
  }

  private def toBufferedImage(width: Int, height: Int,
      rgb: Array[Byte]): java.awt.image.BufferedImage = {
    require(rgb.length == width * height * 3, "rgb length must be w*h*3")
    val img = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    var p = 0
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val r = rgb(p) & 0xFF; val g = rgb(p + 1) & 0xFF; val b = rgb(p + 2) & 0xFF
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        p += 3; x += 1
      }
      y += 1
    }
    img
  }

  private def writeImage(img: java.awt.image.RenderedImage,
      format: String): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    require(javax.imageio.ImageIO.write(img, format, bos),
      s"no imageio writer for $format")
    bos.toByteArray
  }

  /** Encode RGB pixels as 24-bit BMP via javax.imageio (pure JDK). */
  def encodeBmp(width: Int, height: Int, rgb: Array[Byte]): Array[Byte] =
    writeImage(toBufferedImage(width, height, rgb), "bmp")

  /** Encode RGB pixels as PNG (lossless) via javax.imageio (pure JDK). */
  def encodePng(width: Int, height: Int, rgb: Array[Byte]): Array[Byte] =
    writeImage(toBufferedImage(width, height, rgb), "png")

  /** Encode RGB pixels as JPEG via javax.imageio (pure JDK — the stock
    * JDK ships a JPEG plugin). Lossy: decoded stats are approximate, so
    * JPEG is exercised by tolerance specs, not the hash oracle. */
  def encodeJpeg(width: Int, height: Int, rgb: Array[Byte]): Array[Byte] =
    writeImage(toBufferedImage(width, height, rgb), "jpeg")

  /** Encode RGB pixels as baseline TIFF via the JDK-9+ imageio TIFF
    * plugin (pure JDK). `compression` exercises the writer's real
    * codecs — "Deflate" and "LZW" are LOSSLESS, so decoded stats stay
    * closed-form oracle-checkable either way; None writes uncompressed
    * strips. */
  def encodeTiff(width: Int, height: Int, rgb: Array[Byte],
      compression: Option[String] = None): Array[Byte] = {
    val img = toBufferedImage(width, height, rgb)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("tiff").next()
    val param = writer.getDefaultWriteParam
    compression.foreach { c =>
      param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      param.setCompressionType(c)
    }
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
    } finally { writer.dispose(); ios.close() }
    bos.toByteArray
  }

  /** Encode 8-bit grayscale pixels as GIF with an explicit 256-entry gray
    * palette: every sample maps to its own palette slot, so the encode is
    * LOSSLESS (arbitrary-RGB GIF would quantize to 256 colors — not
    * oracle-checkable; grayscale is). */
  def encodeGifGray(width: Int, height: Int, pixels: Array[Byte]): Array[Byte] = {
    require(pixels.length == width * height, "pixel length must be w*h")
    val ramp = Array.tabulate[Byte](256)(_.toByte)
    val cm = new java.awt.image.IndexColorModel(8, 256, ramp, ramp, ramp)
    val img = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, cm)
    img.getRaster.setDataElements(0, 0, width, height, pixels)
    // explicit writer with interlace OFF: the JDK GIF writer's default
    // progressive mode scrambles rows for heights < 5
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val param = writer.getDefaultWriteParam
    if (param.canWriteProgressive)
      param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DISABLED)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
    } finally { writer.dispose(); ios.close() }
    bos.toByteArray
  }

  /** Decode any stock-JDK imageio format (BMP, PNG, GIF, JPEG) into
    * (width, height, rgb). Named for its first client; the path is the
    * generic ImageIO reader. */
  def decodeBmp(bytes: Array[Byte]): (Int, Int, Array[Byte]) = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    require(img != null, "not a decodable image")
    val w = img.getWidth; val h = img.getHeight
    val rgb = new Array[Byte](w * h * 3)
    var p = 0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val px = img.getRGB(x, y)
        rgb(p) = ((px >> 16) & 0xFF).toByte
        rgb(p + 1) = ((px >> 8) & 0xFF).toByte
        rgb(p + 2) = (px & 0xFF).toByte
        p += 3; x += 1
      }
      y += 1
    }
    (w, h, rgb)
  }

  case class DecodedImage(media_id: Long, format: String, width: Long,
    height: Long, mean_pixel: Double)

  /** REAL image decode behind the mapPartitions seam: PPM by a hand
    * container parser; BMP/PNG/GIF/JPEG by the stock JDK's imageio
    * readers. The decoded stats (dimensions + channel mean) are what
    * downstream quality filters consume. Iterator-in/iterator-out, no
    * partition materialization — the same shape real codec fleets run at
    * 100 TB. */
  def decodeImages(media: Dataset[MediaRow])(implicit spark: SparkSession): Dataset[DecodedImage] = {
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val (w, h, rgb) = r.kind match {
          case "ppm" => decodePpm(r.payload)
          case "bmp" | "png" | "gif" | "jpeg" | "jpg" | "tiff" | "tif" =>
            decodeBmp(r.payload)
          case k => throw new IllegalArgumentException(s"no codec for kind $k")
        }
        var sum = 0L
        var i = 0
        while (i < rgb.length) { sum += rgb(i) & 0xFF; i += 1 }
        DecodedImage(r.media_id, r.kind, w.toLong, h.toLong,
          sum.toDouble / math.max(rgb.length, 1))
      }
    }
  }

  // --- real audio codec (WAV / 16-bit PCM) ---------------------------------

  /** Encode mono 16-bit PCM samples as a canonical RIFF/WAVE container
    * (44-byte header + little-endian data chunk) — the format every audio
    * tool reads. */
  def encodeWavPcm16(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2) // byte rate
      .putShort(2) // block align
      .putShort(16) // bits per sample
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(bb.putShort)
    bb.array()
  }

  /** Decode a WAV: PCM16 via javax.sound.sampled (pure JDK); IMA-ADPCM
    * (format tag 0x11 — the JDK reader can't) and G.711 µ-law/A-law
    * (tags 7/6) via the hand codecs. Returns (sampleRate, channels,
    * interleaved 16-bit samples). */
  def decodeWav(bytes: Array[Byte]): (Int, Int, Array[Short]) = {
    wavFormatTag(bytes) match {
      case 0x11 => return decodeWavImaAdpcm(bytes)
      case 6 | 7 => return decodeWavG711(bytes)
      case _ => ()
    }
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      val fmt = ais.getFormat
      require(fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
        fmt.getSampleSizeInBits == 16, s"unsupported wav encoding $fmt")
      val data = ais.readAllBytes()
      val out = new Array[Short](data.length / 2)
      val bb = java.nio.ByteBuffer.wrap(data).order(
        if (fmt.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
        else java.nio.ByteOrder.LITTLE_ENDIAN)
      var i = 0
      while (i < out.length) { out(i) = bb.getShort(); i += 1 }
      (fmt.getSampleRate.toInt, fmt.getChannels, out)
    } finally ais.close()
  }

  // --- compressed audio codec (IMA ADPCM, WAVE format tag 0x11) ------------
  //
  // The first COMPRESSED audio format the engine decodes for real, in pure
  // JVM: IMA/DVI ADPCM stores one 4-bit adaptive delta per 16-bit sample
  // (4:1). The JDK's AudioSystem cannot read it, so both sides are hand
  // implementations of the public IMA algorithm (step/index tables).

  private val imaStepTable: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894, 6484,
    7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289, 16818,
    18500, 20350, 22385, 24623, 27086, 29794, 32767)
  private val imaIndexTable: Array[Int] = Array(-1, -1, -1, -1, 2, 4, 6, 8)

  private def imaClampIndex(i: Int): Int = math.min(88, math.max(0, i))
  private def imaClampSample(s: Int): Int = math.min(32767, math.max(-32768, s))

  /** Reconstruct the sample a 4-bit IMA code stands for; returns the new
    * (predictor, stepIndex). Shared verbatim by encode and decode so the
    * encoder's predictor never drifts from the decoder's. */
  private def imaStep(code: Int, pred: Int, index: Int): (Int, Int) = {
    val step = imaStepTable(index)
    var diff = step >> 3
    if ((code & 1) != 0) diff += step >> 2
    if ((code & 2) != 0) diff += step >> 1
    if ((code & 4) != 0) diff += step
    val p = imaClampSample(if ((code & 8) != 0) pred - diff else pred + diff)
    (p, imaClampIndex(index + imaIndexTable(code & 7)))
  }

  /** Encode mono 16-bit samples as an IMA-ADPCM WAVE (format tag 0x11,
    * 256-byte blocks: 4-byte header = first sample + step index, then one
    * nibble per sample, low nibble first; `fact` chunk carries the true
    * sample count so a partial last block decodes exactly). */
  def encodeWavImaAdpcm(sampleRate: Int, samples: Array[Short],
      blockAlign: Int = 256): Array[Byte] = {
    require(samples.nonEmpty, "no samples")
    require(blockAlign >= 8 && blockAlign % 4 == 0, s"bad blockAlign $blockAlign")
    val samplesPerBlock = (blockAlign - 4) * 2 + 1
    val nBlocks = (samples.length + samplesPerBlock - 1) / samplesPerBlock
    val dataLen = nBlocks * blockAlign
    val byteRate = math.max(1, sampleRate * blockAlign / samplesPerBlock)
    val bb = java.nio.ByteBuffer.allocate(12 + 8 + 20 + 8 + 4 + 8 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(4 + 8 + 20 + 8 + 4 + 8 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(20)
      .putShort(0x11) // WAVE_FORMAT_IMA_ADPCM
      .putShort(1) // mono
      .putInt(sampleRate)
      .putInt(byteRate)
      .putShort(blockAlign.toShort)
      .putShort(4) // bits per (encoded) sample
      .putShort(2) // cbSize
      .putShort(samplesPerBlock.toShort)
    bb.put("fact".getBytes("US-ASCII")).putInt(4).putInt(samples.length)
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
    var s = 0
    while (s < samples.length) {
      var pred: Int = samples(s)
      var index = 0
      bb.putShort(pred.toShort).put(0.toByte).put(0.toByte) // block header
      s += 1
      var nib = 0
      var lowNibble = -1
      while (nib < (blockAlign - 4) * 2) {
        val target: Int = if (s < samples.length) samples(s) else pred
        if (s < samples.length) s += 1
        // pick the code whose reconstruction lands closest (standard
        // greedy IMA encoder: magnitude thresholds against the step)
        val step = imaStepTable(index)
        var delta = target - pred
        var code = 0
        if (delta < 0) { code = 8; delta = -delta }
        if (delta >= step) { code |= 4; delta -= step }
        if (delta >= (step >> 1)) { code |= 2; delta -= step >> 1 }
        if (delta >= (step >> 2)) { code |= 1 }
        val (p2, i2) = imaStep(code, pred, index)
        pred = p2; index = i2
        if (lowNibble < 0) lowNibble = code
        else { bb.put((lowNibble | (code << 4)).toByte); lowNibble = -1 }
        nib += 1
      }
    }
    bb.array()
  }

  /** Walk a WAVE's flat top-level RIFF sub-chunks, calling
    * f(id, payloadOffset, size) for each. `strict` decoders throw on a
    * malformed header or corrupt chunk; lenient sniffers get `false` for
    * a non-WAVE payload and a silently stopped walk on corruption. One
    * shared loop so a bounds/padding fix can never diverge between the
    * ADPCM, G.711 and format-tag paths (the AVI walker stays separate:
    * it recurses into LIST containers). */
  private def walkWaveChunks(bytes: Array[Byte], strict: Boolean)(
      f: (String, Int, Int) => Unit): Boolean = {
    def cc(off: Int): String = new String(bytes, off, 4, "US-ASCII")
    if (bytes.length < 12 || cc(0) != "RIFF" || cc(8) != "WAVE") {
      require(!strict, "not a WAVE")
      return false
    }
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var off = 12
    while (off + 8 <= bytes.length) {
      val id = cc(off); val size = bb.getInt(off + 4)
      if (size < 0 || off + 8L + size > bytes.length) {
        require(!strict, s"corrupt WAVE: chunk $id claims $size bytes")
        return true
      }
      f(id, off + 8, size)
      off += 8 + size + (size & 1)
    }
    true
  }

  /** Decode an IMA-ADPCM WAVE produced by any conforming encoder: walks
    * the RIFF chunks, honors blockAlign/samplesPerBlock/fact, returns
    * (sampleRate, channels, pcm16 samples). */
  def decodeWavImaAdpcm(bytes: Array[Byte]): (Int, Int, Array[Short]) = {
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var rate = 0; var blockAlign = 0; var samplesPerBlock = 0
    var nSamples = -1
    var dataOff = -1; var dataLen = 0
    walkWaveChunks(bytes, strict = true) { (id, off, size) =>
      id match {
        case "fmt " =>
          require(size >= 16, "corrupt WAVE: short fmt")
          require(bb.getShort(off) == 0x11, "not IMA ADPCM")
          require(bb.getShort(off + 2) == 1, "only mono IMA ADPCM supported")
          rate = bb.getInt(off + 4)
          blockAlign = bb.getShort(off + 12) & 0xFFFF
          samplesPerBlock =
            if (size >= 22) bb.getShort(off + 18) & 0xFFFF
            else (blockAlign - 4) * 2 + 1
        case "fact" if size >= 4 => nSamples = bb.getInt(off)
        case "data" => dataOff = off; dataLen = size
        case _ => ()
      }
    }
    require(rate > 0 && blockAlign >= 8 && dataOff >= 0, "no ADPCM stream")
    val total =
      if (nSamples >= 0) nSamples
      else (dataLen / blockAlign) * samplesPerBlock
    val out = new Array[Short](total)
    var produced = 0
    var blockOff = dataOff
    while (produced < total && blockOff + blockAlign <= dataOff + dataLen) {
      var pred: Int = bb.getShort(blockOff)
      var index = imaClampIndex(bytes(blockOff + 2) & 0xFF)
      out(produced) = pred.toShort; produced += 1
      var i = 0
      while (i < (blockAlign - 4) * 2 && produced < total) {
        val b = bytes(blockOff + 4 + (i >> 1)) & 0xFF
        val code = if ((i & 1) == 0) b & 0xF else (b >> 4) & 0xF
        val (p2, i2) = imaStep(code, pred, index)
        pred = p2; index = i2
        out(produced) = pred.toShort; produced += 1
        i += 1
      }
      blockOff += blockAlign
    }
    require(produced == total, s"short ADPCM stream: $produced of $total samples")
    (rate, 1, out)
  }

  // --- compressed audio codec (G.711 µ-law / A-law, WAVE tags 7 / 6) -------
  //
  // The ITU-T G.711 telephony companding codecs: 8 bits per sample, 2:1
  // vs PCM16. Unlike ADPCM's stateful predictor, decode is a pure
  // per-byte integer mapping — so the decoded WAVEFORM is reproducible in
  // plain SQL and p38's oracle checks sample statistics, not just
  // container fields. The expansion formulas below are the public G.711
  // definitions; OperatorsSpec cross-checks all 256 code points of both
  // laws against the JDK's own ULAW/ALAW converters.

  /** µ-law byte → linear PCM16: undo the complement, then expand
    * mantissa/exponent around bias 0x84. */
  def ulawDecode(b: Int): Short = {
    val u = ~b & 0xFF
    val t = (((u & 0x0F) << 3) + 0x84) << ((u >> 4) & 0x07)
    (if ((u & 0x80) != 0) 0x84 - t else t - 0x84).toShort
  }

  /** A-law byte → linear PCM16: undo the 0x55 toggle, then per-segment
    * expansion. */
  def alawDecode(b: Int): Short = {
    val a = b ^ 0x55
    val base = (a & 0x0F) << 4
    val t = ((a & 0x70) >> 4) match {
      case 0 => base + 8
      case 1 => base + 0x108
      case s => (base + 0x108) << (s - 1)
    }
    (if ((a & 0x80) != 0) t else -t).toShort
  }

  /** Wrap raw G.711 code bytes in a WAVE (format tag 7 = µ-law, 6 =
    * A-law; 8 bits/sample, mono). */
  def encodeWavG711(sampleRate: Int, codes: Array[Byte],
      aLaw: Boolean): Array[Byte] = {
    require(codes.nonEmpty, "no samples")
    val pad = codes.length & 1 // RIFF chunks pad to even
    val bb = java.nio.ByteBuffer.allocate(12 + 8 + 18 + 8 + codes.length + pad)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII"))
      .putInt(4 + 8 + 18 + 8 + codes.length + pad)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(18)
      .putShort(if (aLaw) 6 else 7)
      .putShort(1) // mono
      .putInt(sampleRate)
      .putInt(sampleRate) // byte rate: 1 byte per sample
      .putShort(1) // block align
      .putShort(8) // bits per sample
      .putShort(0) // cbSize
    bb.put("data".getBytes("US-ASCII")).putInt(codes.length)
    bb.put(codes)
    bb.array()
  }

  /** Decode a G.711 WAVE (µ-law tag 7 / A-law tag 6) to PCM16. */
  def decodeWavG711(bytes: Array[Byte]): (Int, Int, Array[Short]) = {
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var tag = -1; var rate = 0; var channels = 0
    var dataOff = -1; var dataLen = 0
    walkWaveChunks(bytes, strict = true) { (id, off, size) =>
      id match {
        case "fmt " =>
          require(size >= 16, "corrupt WAVE: short fmt")
          tag = bb.getShort(off) & 0xFFFF
          channels = bb.getShort(off + 2) & 0xFFFF
          rate = bb.getInt(off + 4)
          require((bb.getShort(off + 14) & 0xFFFF) == 8, "G.711 is 8 bits/sample")
        case "data" => dataOff = off; dataLen = size
        case _ => ()
      }
    }
    require((tag == 6 || tag == 7) && rate > 0 && channels >= 1 && dataOff >= 0,
      "no G.711 stream")
    val out = new Array[Short](dataLen)
    var i = 0
    while (i < dataLen) {
      val c = bytes(dataOff + i) & 0xFF
      out(i) = if (tag == 7) ulawDecode(c) else alawDecode(c)
      i += 1
    }
    (rate, channels, out)
  }

  /** WAVE fmt-chunk format tag, or -1 when the payload isn't RIFF/WAVE. */
  private def wavFormatTag(bytes: Array[Byte]): Int = {
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var tag = -1
    walkWaveChunks(bytes, strict = false) { (id, off, size) =>
      if (tag < 0 && id == "fmt " && size >= 2) tag = bb.getShort(off) & 0xFFFF
    }
    tag
  }

  case class DecodedAudio(media_id: Long, sample_rate: Long, channels: Long,
    n_samples: Long, duration_ms: Double, mean_amp: Double, rms: Double)

  /** REAL audio decode behind the mapPartitions seam: WAV payloads are
    * parsed by the JDK's audio reader (ADPCM/G.711 by the hand codecs),
    * FLAC by the hand decoder in [[Flac]]; the decoded stats (duration,
    * mean amplitude, RMS energy) are what downstream loudness/quality
    * filters consume. Iterator-in/iterator-out like [[decodeImages]]. */
  def decodeAudio(media: Dataset[MediaRow])(implicit spark: SparkSession): Dataset[DecodedAudio] = {
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        require(r.kind == "wav" || r.kind == "flac",
          s"no codec for kind ${r.kind}")
        val (rate, channels, samples) =
          if (r.kind == "flac") Flac.decode(r.payload)
          else decodeWav(r.payload)
        val frames = samples.length / channels
        var sum = 0L
        var sumSq = 0L
        var i = 0
        while (i < samples.length) {
          sum += samples(i); sumSq += samples(i).toLong * samples(i); i += 1
        }
        val n = math.max(samples.length, 1)
        DecodedAudio(r.media_id, rate.toLong, channels.toLong, frames.toLong,
          frames.toDouble * 1000.0 / rate, sum.toDouble / n,
          math.sqrt(sumSq.toDouble / n))
      }
    }
  }

  // --- real video codec (AVI / raw DIB frames) -----------------------------

  private def fourcc(s: String): Array[Byte] = s.getBytes("US-ASCII")

  /** Encode RGB frames as an uncompressed AVI (RIFF container, 'vids'/
    * 'DIB ' stream, BI_RGB BITMAPINFOHEADER, one '00db' chunk per frame
    * holding bottom-up BGR rows padded to 4 bytes) — the canonical
    * raw-video container every tool reads. */
  def encodeAvi(width: Int, height: Int, fps: Int,
      frames: Seq[Array[Byte]]): Array[Byte] = {
    require(frames.nonEmpty && frames.forall(_.length == width * height * 3),
      "each frame must be w*h*3 rgb bytes")
    val stride = (width * 3 + 3) / 4 * 4
    val frameBytes = stride * height
    def dib(rgb: Array[Byte]): Array[Byte] = {
      val out = new Array[Byte](frameBytes)
      var y = 0
      while (y < height) {
        val srcRow = (height - 1 - y) * width * 3 // bottom-up
        var x = 0
        while (x < width) {
          out(y * stride + x * 3) = rgb(srcRow + x * 3 + 2)     // B
          out(y * stride + x * 3 + 1) = rgb(srcRow + x * 3 + 1) // G
          out(y * stride + x * 3 + 2) = rgb(srcRow + x * 3)     // R
          x += 1
        }
        y += 1
      }
      out
    }
    val bb = java.nio.ByteBuffer.allocate(
        12 + 8 + 4 + 64 + 8 + 4 + 64 + 48 + 12 +
          frames.length * (8 + frameBytes))
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put(fourcc("RIFF")).putInt(0).put(fourcc("AVI ")) // size patched below
    // LIST hdrl: avih + LIST strl(strh, strf)
    bb.put(fourcc("LIST")).putInt(4 + 64 + 8 + 4 + 64 + 48).put(fourcc("hdrl"))
    bb.put(fourcc("avih")).putInt(56)
      .putInt(1000000 / fps).putInt(frameBytes * fps).putInt(0).putInt(0)
      .putInt(frames.length).putInt(0).putInt(1).putInt(frameBytes)
      .putInt(width).putInt(height).putInt(0).putInt(0).putInt(0).putInt(0)
    bb.put(fourcc("LIST")).putInt(4 + 64 + 48).put(fourcc("strl"))
    bb.put(fourcc("strh")).putInt(56)
      .put(fourcc("vids")).put(fourcc("DIB "))
      .putInt(0).putInt(0).putInt(0)
      .putInt(1).putInt(fps) // scale, rate -> fps frames/sec
      .putInt(0).putInt(frames.length).putInt(frameBytes)
      .putInt(-1).putInt(0)
      .putShort(0).putShort(0)
      .putShort(width.toShort).putShort(height.toShort)
    bb.put(fourcc("strf")).putInt(40)
      .putInt(40).putInt(width).putInt(height).putShort(1).putShort(24)
      .putInt(0).putInt(frameBytes).putInt(0).putInt(0).putInt(0).putInt(0)
    bb.put(fourcc("LIST")).putInt(4 + frames.length * (8 + frameBytes))
      .put(fourcc("movi"))
    frames.foreach { f =>
      bb.put(fourcc("00db")).putInt(frameBytes).put(dib(f))
    }
    val out = bb.array()
    // RIFF size = file length minus the 8-byte RIFF chunk header
    java.nio.ByteBuffer.wrap(out).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(4, out.length - 8)
    out
  }

  /** Encode RGB frames as a MOTION-JPEG AVI ('MJPG' handler + biCompression,
    * one JPEG image per '00dc' chunk) — the first COMPRESSED video format
    * the engine writes/reads for real: the container is the same RIFF walk
    * as the raw form, the frames go through the stock JDK's JPEG codec. */
  def encodeAviMjpeg(width: Int, height: Int, fps: Int,
      frames: Seq[Array[Byte]]): Array[Byte] = {
    require(frames.nonEmpty && frames.forall(_.length == width * height * 3),
      "each frame must be w*h*3 rgb bytes")
    val jpegs = frames.map(encodeJpeg(width, height, _))
    val moviPayload = jpegs.map(j => 8 + j.length + (j.length & 1)).sum
    val bb = java.nio.ByteBuffer.allocate(
        12 + 8 + 4 + 64 + 8 + 4 + 64 + 48 + 12 + moviPayload)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put(fourcc("RIFF")).putInt(0).put(fourcc("AVI ")) // size patched below
    bb.put(fourcc("LIST")).putInt(4 + 64 + 8 + 4 + 64 + 48).put(fourcc("hdrl"))
    bb.put(fourcc("avih")).putInt(56)
      .putInt(1000000 / fps).putInt(0).putInt(0).putInt(0)
      .putInt(frames.length).putInt(0).putInt(1).putInt(0)
      .putInt(width).putInt(height).putInt(0).putInt(0).putInt(0).putInt(0)
    bb.put(fourcc("LIST")).putInt(4 + 64 + 48).put(fourcc("strl"))
    bb.put(fourcc("strh")).putInt(56)
      .put(fourcc("vids")).put(fourcc("MJPG"))
      .putInt(0).putInt(0).putInt(0)
      .putInt(1).putInt(fps) // scale, rate -> fps frames/sec
      .putInt(0).putInt(frames.length).putInt(0)
      .putInt(-1).putInt(0)
      .putShort(0).putShort(0)
      .putShort(width.toShort).putShort(height.toShort)
    bb.put(fourcc("strf")).putInt(40)
      .putInt(40).putInt(width).putInt(height).putShort(1).putShort(24)
      .put(fourcc("MJPG")) // biCompression
      .putInt(0).putInt(0).putInt(0).putInt(0).putInt(0)
    bb.put(fourcc("LIST")).putInt(4 + moviPayload).put(fourcc("movi"))
    jpegs.foreach { j =>
      bb.put(fourcc("00dc")).putInt(j.length).put(j)
      if ((j.length & 1) == 1) bb.put(0.toByte) // word alignment
    }
    val out = bb.array()
    java.nio.ByteBuffer.wrap(out).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(4, out.length - 8)
    out
  }

  /** Parse an AVI: returns (width, height, fps, top-down RGB frames). A
    * generic RIFF chunk walk — reads avih for dimensions, strh for the
    * rate/scale clock and handler, and every 00db/00dc chunk in the movi
    * list as one frame: a bottom-up BGR DIB for the raw form, a JPEG
    * image (decoded via the stock JDK codec) when the stream handler is
    * 'MJPG' or the chunk opens with a JPEG SOI marker. */
  def decodeAvi(bytes: Array[Byte]): (Int, Int, Int, Seq[Array[Byte]]) = {
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def cc(off: Int): String = new String(bytes, off, 4, "US-ASCII")
    require(cc(0) == "RIFF" && cc(8) == "AVI ", "not an AVI")
    var width = 0; var height = 0; var fps = 0
    var mjpeg = false
    val frames = scala.collection.mutable.ArrayBuffer[Array[Byte]]()
    def walk(start: Int, end: Int, depth: Int): Unit = {
      // honest containers nest hdrl/strl/movi a handful deep; a crafted
      // LIST chain must fail cleanly, not blow the stack
      require(depth <= 32, "corrupt AVI: LIST nesting too deep")
      var off = start
      while (off + 8 <= end) {
        val id = cc(off)
        val size = bb.getInt(off + 4)
        // a malformed/truncated chunk must fail cleanly, not read OOB
        // (long arithmetic: a ~2 GiB claimed size would overflow int)
        require(size >= 0 && off + 8L + size <= bytes.length,
          s"corrupt AVI: chunk $id at $off claims $size bytes")
        if (id == "LIST") walk(off + 12, off + 8 + size, depth + 1)
        else id match {
          case "avih" =>
            require(size >= 40, "corrupt AVI: short avih")
            width = bb.getInt(off + 8 + 32); height = bb.getInt(off + 8 + 36)
            // long multiply: lying dimensions must not wrap past the guard
            require(width > 0 && height > 0 &&
              width.toLong * height <= (1L << 26),
              s"corrupt AVI: dimensions ${width}x$height")
          case "strh" if size >= 28 && cc(off + 8) == "vids" =>
            if (cc(off + 12) == "MJPG") mjpeg = true
            val scale = bb.getInt(off + 8 + 20); val rate = bb.getInt(off + 8 + 24)
            if (scale > 0) fps = rate / scale
          case "00db" | "00dc" =>
            val isJpegFrame = mjpeg || (size >= 2 &&
              (bytes(off + 8) & 0xFF) == 0xFF && (bytes(off + 9) & 0xFF) == 0xD8)
            if (isJpegFrame) {
              val (fw, fh, rgb) = decodeBmp(
                java.util.Arrays.copyOfRange(bytes, off + 8, off + 8 + size))
              require(fw == width && fh == height,
                s"corrupt AVI: MJPEG frame ${fw}x$fh in a ${width}x$height stream")
              frames += rgb
            } else {
              val stride = (width * 3 + 3) / 4 * 4
              require(width > 0 && height > 0 &&
                size >= stride.toLong * height,
                s"corrupt AVI: frame chunk of $size bytes for ${width}x$height")
              val rgb = new Array[Byte](width * height * 3)
              var y = 0
              while (y < height) {
                val src = off + 8 + (height - 1 - y) * stride
                var x = 0
                while (x < width) {
                  rgb(y * width * 3 + x * 3) = bytes(src + x * 3 + 2)     // R
                  rgb(y * width * 3 + x * 3 + 1) = bytes(src + x * 3 + 1) // G
                  rgb(y * width * 3 + x * 3 + 2) = bytes(src + x * 3)     // B
                  x += 1
                }
                y += 1
              }
              frames += rgb
            }
          case _ => () // unknown chunk: skip (idx1, JUNK, ...)
        }
        off += 8 + size + (size & 1) // chunks are word-aligned
      }
    }
    walk(12, bytes.length, 0)
    require(width > 0 && height > 0 && frames.nonEmpty, "no video stream")
    (width, height, fps, frames.toSeq)
  }

  case class DecodedVideo(media_id: Long, width: Long, height: Long,
    n_frames: Long, fps: Long, mean_pixel: Double)

  /** REAL video decode behind the mapPartitions seam: AVI payloads are
    * parsed by the RIFF walker; per-video stats (dimensions, frame count,
    * fps, channel mean over all frames) feed downstream sampling/quality
    * filters. Iterator-in/iterator-out like [[decodeImages]]. */
  def decodeVideos(media: Dataset[MediaRow])(implicit spark: SparkSession): Dataset[DecodedVideo] = {
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        require(r.kind == "avi", s"no codec for kind ${r.kind}")
        val (w, h, fps, frames) = decodeAvi(r.payload)
        var sum = 0L
        var n = 0L
        frames.foreach { f =>
          var i = 0
          while (i < f.length) { sum += f(i) & 0xFF; i += 1 }
          n += f.length
        }
        DecodedVideo(r.media_id, w.toLong, h.toLong, frames.length.toLong,
          fps.toLong, sum.toDouble / math.max(n, 1))
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

  case class ResizedImage(media_id: Long, kind: String, width: Long,
    height: Long, n_bytes: Long, mean_pixel: Double, payload: Array[Byte])

  /** REAL image resize: decode (PPM/BMP) -> box-filter downscale by an
    * integer factor (each output channel = floor of the factor×factor
    * block average; trailing edge pixels that don't fill a block drop, the
    * standard integer-pooling convention) -> re-encode as PPM. Same
    * iterator-in/iterator-out mapPartitions shape as the decoders. */
  def resizeImages(media: Dataset[MediaRow], factor: Int)
      (implicit spark: SparkSession): Dataset[ResizedImage] = {
    import spark.implicits._
    require(factor >= 1, s"resize factor must be >= 1: $factor")
    media.mapPartitions { rows =>
      rows.map { r =>
        val (w, h, rgb) = r.kind match {
          case "ppm" => decodePpm(r.payload)
          case "bmp" | "png" | "gif" | "jpeg" | "jpg" | "tiff" | "tif" =>
            decodeBmp(r.payload)
          case k => throw new IllegalArgumentException(s"no image codec for kind $k")
        }
        val w2 = w / factor
        val h2 = h / factor
        require(w2 > 0 && h2 > 0, s"factor $factor collapses a ${w}x$h image")
        val out = new Array[Byte](w2 * h2 * 3)
        var by = 0
        while (by < h2) {
          var bx = 0
          while (bx < w2) {
            var c = 0
            while (c < 3) {
              var sum = 0
              var dy = 0
              while (dy < factor) {
                var dx = 0
                while (dx < factor) {
                  sum += rgb(((by * factor + dy) * w + bx * factor + dx) * 3 + c) & 0xFF
                  dx += 1
                }
                dy += 1
              }
              out((by * w2 + bx) * 3 + c) = (sum / (factor * factor)).toByte
              c += 1
            }
            bx += 1
          }
          by += 1
        }
        val ppm = encodePpm(w2, h2, out)
        var s = 0L
        var i = 0
        while (i < out.length) { s += out(i) & 0xFF; i += 1 }
        ResizedImage(r.media_id, "ppm", w2.toLong, h2.toLong, ppm.length.toLong,
          s.toDouble / math.max(out.length, 1), ppm)
      }
    }
  }

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
