package graft.operators

/** Hand-written FLAC codec (the public xiph.org format spec; no JDK or
  * external library reads FLAC). Decode supports the full 16-bit subset a
  * real encoder emits: CONSTANT, VERBATIM, FIXED (orders 0-4) and LPC
  * subframes, Rice-partitioned residuals with escape codes, wasted bits,
  * all four stereo channel assignments (independent, left/side,
  * right/side, mid/side), and verifies header CRC-8, frame CRC-16 and the
  * STREAMINFO MD5 of the decoded PCM. The encoder (spec/fixture side)
  * writes mono 16-bit streams with per-block best FIXED predictors and
  * single-partition Rice residuals — a conforming stream any FLAC player
  * accepts, and lossless, so decoded samples are bit-exact inputs for
  * closed-form oracles (same pattern as the WAV/AVI codecs).
  *
  * Deliberately strict: a malformed container throws
  * IllegalArgumentException rather than guessing (CodecFuzzSpec drives
  * corrupt payloads).
  */
object Flac {

  // --- bit I/O (MSB-first, like the FLAC spec) -----------------------------

  private final class BitReader(val bytes: Array[Byte]) {
    var bitPos: Long = 0L
    def bytePos: Int = (bitPos / 8).toInt
    private def demand(n: Long): Unit =
      if (bitPos + n > bytes.length.toLong * 8)
        throw new IllegalArgumentException("flac: truncated stream")
    def bit(): Int = {
      demand(1)
      val b = (bytes((bitPos / 8).toInt) >> (7 - (bitPos % 8).toInt)) & 1
      bitPos += 1; b
    }
    def bits(n: Int): Long = {
      require(n >= 0 && n <= 57, s"bits($n)")
      demand(n)
      var v = 0L; var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
    def signedBits(n: Int): Long = {
      val v = bits(n)
      if (n == 0) 0L else (v << (64 - n)) >> (64 - n)
    }
    def unary(): Int = {
      var q = 0
      while (bit() == 0) {
        q += 1
        if (q > (1 << 24)) throw new IllegalArgumentException("flac: runaway unary")
      }
      q
    }
    def alignToByte(): Unit = bitPos = (bitPos + 7) / 8 * 8
  }

  private final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var acc = 0; private var nAcc = 0
    def putBit(b: Int): Unit = {
      acc = (acc << 1) | (b & 1); nAcc += 1
      if (nAcc == 8) { out.write(acc); acc = 0; nAcc = 0 }
    }
    def putBits(v: Long, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) { putBit(((v >> i) & 1).toInt); i -= 1 }
    }
    def alignToByte(): Unit = while (nAcc != 0) putBit(0)
    def toBytes: Array[Byte] = { require(nAcc == 0, "unaligned"); out.toByteArray }
  }

  // --- CRCs (FLAC spec: CRC-8 poly 0x07, CRC-16 poly 0x8005, init 0) -------

  private def crc8(bytes: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= bytes(i) & 0xFF
      var b = 0
      while (b < 8) {
        crc = if ((crc & 0x80) != 0) ((crc << 1) ^ 0x07) & 0xFF else (crc << 1) & 0xFF
        b += 1
      }
      i += 1
    }
    crc
  }

  private def crc16(bytes: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= (bytes(i) & 0xFF) << 8
      var b = 0
      while (b < 8) {
        crc = if ((crc & 0x8000) != 0) ((crc << 1) ^ 0x8005) & 0xFFFF
          else (crc << 1) & 0xFFFF
        b += 1
      }
      i += 1
    }
    crc
  }

  // --- decode --------------------------------------------------------------

  private val blockSizeTable = Array(0, 192, 576, 1152, 2304, 4608, -1, -2,
    256, 512, 1024, 2048, 4096, 8192, 16384, 32768) // -1/-2: 8/16-bit follows
  private val sampleRateTable = Array(0, 88200, 176400, 192000, 8000, 16000,
    22050, 24000, 32000, 44100, 48000, 96000, -1, -2, -3, 0) // -n: follows

  /** Decode a FLAC stream to (sampleRate, channels, interleaved PCM16). */
  def decode(bytes: Array[Byte]): (Int, Int, Array[Short]) = {
    require(bytes.length >= 42 &&
      new String(bytes, 0, 4, "US-ASCII") == "fLaC", "not a FLAC stream")
    var off = 4
    var rate = -1; var channels = -1; var bps = -1; var total = -1L
    var md5 = new Array[Byte](16)
    var last = false
    var sawStreamInfo = false
    while (!last) {
      require(off + 4 <= bytes.length, "flac: truncated metadata")
      val hdr = bytes(off) & 0xFF
      last = (hdr & 0x80) != 0
      val btype = hdr & 0x7F
      val len = ((bytes(off + 1) & 0xFF) << 16) | ((bytes(off + 2) & 0xFF) << 8) |
        (bytes(off + 3) & 0xFF)
      off += 4
      require(off + len <= bytes.length, "flac: truncated metadata block")
      if (btype == 0) {
        require(len == 34, "flac: bad STREAMINFO length")
        sawStreamInfo = true
        val r = new BitReader(java.util.Arrays.copyOfRange(bytes, off, off + len))
        r.bits(16); r.bits(16) // min/max block size
        r.bits(24); r.bits(24) // min/max frame size
        rate = r.bits(20).toInt
        channels = r.bits(3).toInt + 1
        bps = r.bits(5).toInt + 1
        total = r.bits(36)
        md5 = java.util.Arrays.copyOfRange(bytes, off + 18, off + 34)
      }
      off += len
    }
    require(sawStreamInfo, "flac: missing STREAMINFO")
    require(rate > 0, s"flac: bad sample rate $rate")
    require(bps == 16, s"flac: only 16-bit supported, got $bps")
    require(channels >= 1 && channels <= 2, s"flac: $channels channels unsupported")

    val out = Array.fill(channels)(new scala.collection.mutable.ArrayBuffer[Int]())
    val r = new BitReader(bytes)
    r.bitPos = off.toLong * 8
    while (r.bytePos < bytes.length &&
        (total == 0 || out(0).length < total)) {
      decodeFrame(r, bytes, rate, channels, bps, out)
    }
    if (total > 0) require(out(0).length >= total, "flac: short stream")
    val n = if (total > 0) total.toInt else out(0).length
    val inter = new Array[Short](n * channels)
    var i = 0
    while (i < n) {
      var c = 0
      while (c < channels) { inter(i * channels + c) = out(c)(i).toShort; c += 1 }
      i += 1
    }
    // STREAMINFO MD5 is over the little-endian interleaved PCM
    if (!md5.forall(_ == 0)) {
      val d = java.security.MessageDigest.getInstance("MD5")
      val pcm = java.nio.ByteBuffer.allocate(inter.length * 2)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      inter.foreach(pcm.putShort)
      require(java.util.Arrays.equals(d.digest(pcm.array()), md5),
        "flac: MD5 mismatch — corrupt stream")
    }
    (rate, channels, inter)
  }

  private def decodeFrame(r: BitReader, bytes: Array[Byte], rate: Int,
      channels: Int, bps: Int,
      out: Array[scala.collection.mutable.ArrayBuffer[Int]]): Unit = {
    val frameStart = r.bytePos
    val sync = r.bits(14)
    require(sync == 0x3FFE, f"flac: bad frame sync $sync%x")
    require(r.bit() == 0, "flac: reserved bit set")
    r.bit() // blocking strategy
    val bsCode = r.bits(4).toInt
    val srCode = r.bits(4).toInt
    val chanAsgn = r.bits(4).toInt
    val ssCode = r.bits(3).toInt
    require(r.bit() == 0, "flac: reserved bit set")
    readUtf8Number(r) // frame/sample number
    val blockSize = blockSizeTable(bsCode) match {
      case 0 => throw new IllegalArgumentException("flac: reserved block size")
      case -1 => r.bits(8).toInt + 1
      case -2 => r.bits(16).toInt + 1
      case v => v
    }
    sampleRateTable(srCode) match {
      case -1 => r.bits(8)
      case -2 => r.bits(16)
      case -3 => r.bits(16)
      case _ => ()
    }
    val frameBps = ssCode match {
      case 0 => bps
      case 1 => 8
      case 2 => 12
      case 4 => 16
      case 5 => 20
      case 6 => 24
      case 7 => 32
      case _ => throw new IllegalArgumentException("flac: reserved sample size")
    }
    require(frameBps == 16, s"flac: frame bps $frameBps unsupported")
    // header CRC-8 covers everything from the sync to here
    val hdrEnd = r.bytePos
    val wantCrc8 = r.bits(8).toInt
    require(crc8(bytes, frameStart, hdrEnd) == wantCrc8, "flac: header CRC mismatch")

    val nCh = chanAsgn match {
      case a if a <= 7 => a + 1
      case _ => 2
    }
    require(nCh == channels, s"flac: channel assignment/count mismatch")
    val chans = Array.ofDim[Array[Int]](nCh)
    var c = 0
    while (c < nCh) {
      // side channels carry one extra bit (spec: difference needs bps+1)
      val extra = chanAsgn match {
        case 8 if c == 1 => 1 // left/side
        case 9 if c == 0 => 1 // right/side
        case 10 if c == 1 => 1 // mid/side
        case _ => 0
      }
      chans(c) = decodeSubframe(r, blockSize, frameBps + extra)
      c += 1
    }
    r.alignToByte()
    val crcEnd = r.bytePos
    val wantCrc16 = r.bits(16).toInt
    require(crc16(bytes, frameStart, crcEnd) == wantCrc16,
      "flac: frame CRC mismatch")
    // undo stereo decorrelation
    chanAsgn match {
      case a if a <= 7 =>
        var i = 0
        while (i < nCh) { out(i) ++= chans(i); i += 1 }
      case 8 => // left/side: right = left - side
        var i = 0
        while (i < blockSize) {
          out(0) += chans(0)(i); out(1) += chans(0)(i) - chans(1)(i); i += 1
        }
      case 9 => // right/side: left = right + side
        var i = 0
        while (i < blockSize) {
          out(0) += chans(1)(i) + chans(0)(i); out(1) += chans(1)(i); i += 1
        }
      case 10 => // mid/side
        var i = 0
        while (i < blockSize) {
          val side = chans(1)(i)
          val m2 = (chans(0)(i) << 1) | (side & 1)
          out(0) += (m2 + side) >> 1; out(1) += (m2 - side) >> 1; i += 1
        }
      case a => throw new IllegalArgumentException(s"flac: reserved channel assignment $a")
    }
  }

  private def readUtf8Number(r: BitReader): Long = {
    val b0 = r.bits(8).toInt
    if ((b0 & 0x80) == 0) return b0
    var nFollow = 0
    var mask = 0x40
    while ((b0 & mask) != 0) { nFollow += 1; mask >>= 1 }
    require(nFollow >= 1 && nFollow <= 6, "flac: bad coded number")
    var v: Long = b0 & (mask - 1)
    var i = 0
    while (i < nFollow) {
      val b = r.bits(8).toInt
      require((b & 0xC0) == 0x80, "flac: bad coded number continuation")
      v = (v << 6) | (b & 0x3F)
      i += 1
    }
    v
  }

  private def decodeSubframe(r: BitReader, blockSize: Int, bps: Int): Array[Int] = {
    require(r.bit() == 0, "flac: subframe padding bit set")
    val stype = r.bits(6).toInt
    var wasted = 0
    if (r.bit() == 1) { wasted = r.unary() + 1 }
    val effBps = bps - wasted
    val out: Array[Int] = stype match {
      case 0 => // CONSTANT: ONE value, replicated
        val v = r.signedBits(effBps).toInt
        Array.fill(blockSize)(v)
      case 1 => // VERBATIM
        Array.fill(blockSize)(r.signedBits(effBps).toInt)
      case t if t >= 8 && t <= 12 => // FIXED, order t-8
        val order = t - 8
        val s = new Array[Int](blockSize)
        var i = 0
        while (i < order) { s(i) = r.signedBits(effBps).toInt; i += 1 }
        val res = decodeResiduals(r, blockSize, order)
        while (i < blockSize) {
          val p: Long = order match {
            case 0 => 0L
            case 1 => s(i - 1).toLong
            case 2 => 2L * s(i - 1) - s(i - 2)
            case 3 => 3L * s(i - 1) - 3L * s(i - 2) + s(i - 3)
            case 4 => 4L * s(i - 1) - 6L * s(i - 2) + 4L * s(i - 3) - s(i - 4)
          }
          s(i) = (p + res(i - order)).toInt
          i += 1
        }
        s
      case t if t >= 32 => // LPC, order t-31
        val order = t - 31
        val s = new Array[Int](blockSize)
        var i = 0
        while (i < order) { s(i) = r.signedBits(effBps).toInt; i += 1 }
        val precision = r.bits(4).toInt + 1
        require(precision <= 15, "flac: bad LPC precision")
        val shift = r.signedBits(5).toInt
        require(shift >= 0, "flac: negative LPC shift")
        val coefs = Array.fill(order)(r.signedBits(precision).toInt)
        val res = decodeResiduals(r, blockSize, order)
        while (i < blockSize) {
          var acc = 0L
          var j = 0
          while (j < order) { acc += coefs(j).toLong * s(i - 1 - j); j += 1 }
          s(i) = ((acc >> shift) + res(i - order)).toInt
          i += 1
        }
        s
      case t => throw new IllegalArgumentException(s"flac: reserved subframe type $t")
    }
    if (wasted > 0) {
      var i = 0
      while (i < out.length) { out(i) = out(i) << wasted; i += 1 }
    }
    out
  }

  private def decodeResiduals(r: BitReader, blockSize: Int, order: Int): Array[Long] = {
    val method = r.bits(2).toInt
    require(method <= 1, s"flac: reserved residual method $method")
    val paramBits = if (method == 0) 4 else 5
    val escape = (1 << paramBits) - 1
    val partOrder = r.bits(4).toInt
    val nParts = 1 << partOrder
    require(blockSize % nParts == 0, "flac: bad partition order")
    val out = new Array[Long](blockSize - order)
    var idx = 0
    var p = 0
    while (p < nParts) {
      val count = blockSize / nParts - (if (p == 0) order else 0)
      require(count >= 0, "flac: bad partition geometry")
      val param = r.bits(paramBits).toInt
      if (param == escape) {
        val raw = r.bits(5).toInt
        var i = 0
        while (i < count) { out(idx) = r.signedBits(raw); idx += 1; i += 1 }
      } else {
        var i = 0
        while (i < count) {
          val q = r.unary().toLong
          val v = (q << param) | r.bits(param)
          out(idx) = (v >>> 1) ^ -(v & 1) // zigzag
          idx += 1; i += 1
        }
      }
      p += 1
    }
    out
  }

  // --- encode (mono, 16-bit; FIXED predictors; single Rice partition) ------

  /** Encode mono PCM16 as a conforming FLAC stream. Per block the best
    * FIXED predictor order (by total residual magnitude) is chosen, the
    * residual Rice parameter estimated optimally for a single partition,
    * and header CRC-8 / frame CRC-16 / STREAMINFO MD5 all written for
    * real — decode() verifies every one. */
  def encode(sampleRate: Int, samples: Array[Short],
      blockSize: Int = 4096): Array[Byte] = {
    require(sampleRate > 0 && sampleRate < (1 << 20), s"bad rate $sampleRate")
    require(blockSize >= 16 && blockSize <= 65535, s"bad block size $blockSize")
    val out = new java.io.ByteArrayOutputStream()
    out.write("fLaC".getBytes("US-ASCII"))
    // STREAMINFO (last metadata block)
    val si = new BitWriter
    val lastBlock = if (samples.isEmpty) blockSize
      else { val rem = samples.length % blockSize; if (rem == 0) blockSize else rem }
    si.putBits(math.min(blockSize, lastBlock), 16)
    si.putBits(blockSize, 16)
    si.putBits(0, 24); si.putBits(0, 24) // frame sizes unknown
    si.putBits(sampleRate, 20)
    si.putBits(0, 3) // channels - 1
    si.putBits(15, 5) // bps - 1
    si.putBits(samples.length.toLong, 36)
    si.alignToByte()
    val md5 = {
      val pcm = java.nio.ByteBuffer.allocate(samples.length * 2)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      samples.foreach(pcm.putShort)
      java.security.MessageDigest.getInstance("MD5").digest(pcm.array())
    }
    val siBytes = si.toBytes ++ md5
    require(siBytes.length == 34, s"streaminfo ${siBytes.length}")
    out.write(0x80) // last-metadata flag | type 0
    out.write(0); out.write(0); out.write(34)
    out.write(siBytes)

    var frameNo = 0L
    var offset = 0
    while (offset < samples.length) {
      val n = math.min(blockSize, samples.length - offset)
      out.write(encodeFrame(samples, offset, n, frameNo))
      frameNo += 1
      offset += n
    }
    out.toByteArray
  }

  private def encodeFrame(samples: Array[Short], offset: Int, n: Int,
      frameNo: Long): Array[Byte] = {
    val w = new BitWriter
    w.putBits(0x3FFE, 14) // sync
    w.putBit(0) // reserved
    w.putBit(0) // fixed blocksize strategy
    w.putBits(7, 4) // block size: 16 bits follow
    w.putBits(0, 4) // sample rate: from STREAMINFO
    w.putBits(0, 4) // channel assignment: mono
    w.putBits(4, 3) // sample size: 16-bit
    w.putBit(0) // reserved
    writeUtf8Number(w, frameNo)
    w.putBits(n - 1, 16)
    w.alignToByte()
    val hdr = w.toBytes
    val w2 = new BitWriter
    hdr.foreach(b => w2.putBits(b & 0xFF, 8))
    w2.putBits(crc8(hdr, 0, hdr.length), 8)

    // pick the FIXED order with the smallest total residual magnitude
    def residuals(order: Int): Array[Long] = {
      val res = new Array[Long](n - order)
      var i = order
      while (i < n) {
        def s(k: Int): Long = samples(offset + i - k).toLong
        val r = order match {
          case 0 => s(0)
          case 1 => s(0) - s(1)
          case 2 => s(0) - 2 * s(1) + s(2)
          case 3 => s(0) - 3 * s(1) + 3 * s(2) - s(3)
          case 4 => s(0) - 4 * s(1) + 6 * s(2) - 4 * s(3) + s(4)
        }
        res(i - order) = r
        i += 1
      }
      res
    }
    val constant = (0 until n).forall(i => samples(offset + i) == samples(offset))
    if (constant) {
      w2.putBit(0); w2.putBits(0, 6); w2.putBit(0) // CONSTANT, no wasted bits
      w2.putBits(samples(offset).toLong & 0xFFFF, 16)
    } else {
      val maxOrder = math.min(4, n - 1)
      val best = (0 to maxOrder).minBy { o =>
        residuals(o).foldLeft(BigInt(0))((a, r) => a + BigInt(r).abs)
      }
      val res = residuals(best)
      w2.putBit(0); w2.putBits(8 + best, 6); w2.putBit(0) // FIXED(order)
      var i = 0
      while (i < best) {
        w2.putBits(samples(offset + i).toLong & 0xFFFF, 16); i += 1
      }
      // residual: method 0 (4-bit rice), partition order 0, one partition
      w2.putBits(0, 2); w2.putBits(0, 4)
      val zig = res.map(r => (r << 1) ^ (r >> 63))
      val param = (0 to 14).minBy { k =>
        zig.foldLeft(BigInt(0))((a, z) => a + BigInt(z >>> k) + k + 1)
      }
      w2.putBits(param, 4)
      zig.foreach { z =>
        val q = (z >>> param).toInt
        var j = 0
        while (j < q) { w2.putBit(0); j += 1 }
        w2.putBit(1)
        w2.putBits(z & ((1L << param) - 1), param)
      }
    }
    w2.alignToByte()
    val body = w2.toBytes
    val w3 = new BitWriter
    body.foreach(b => w3.putBits(b & 0xFF, 8))
    w3.putBits(crc16(body, 0, body.length), 16)
    w3.toBytes
  }

  private def writeUtf8Number(w: BitWriter, v: Long): Unit = {
    require(v >= 0 && v < (1L << 36), s"bad frame number $v")
    if (v < 0x80) { w.putBits(v, 8); return }
    // k continuation bytes; lead byte = (k+1) ones, a zero, (6-k) payload bits
    var k = 1
    while (k < 6 && v >= (1L << (6 - k + 6 * k))) k += 1
    var lead = 0
    var i = 0
    while (i < k + 1) { lead = (lead << 1) | 1; i += 1 }
    lead <<= 1 // the zero marker
    val leadPayloadBits = 6 - k
    lead = (lead << leadPayloadBits) |
      ((v >> (6 * k)) & ((1L << leadPayloadBits) - 1)).toInt
    w.putBits(lead.toLong, 8)
    var g = k - 1
    while (g >= 0) {
      w.putBits(0x80L | ((v >> (6 * g)) & 0x3F), 8)
      g -= 1
    }
  }
}
