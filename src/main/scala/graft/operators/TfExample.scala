package graft.operators

import java.io.ByteArrayOutputStream

/** tf.Example protobuf encoding — what TFRecord shards actually carry:
  * `Example { Features features = 1 }`, `Features { map<string,Feature>
  * feature = 1 }`, `Feature { oneof { BytesList=1, FloatList=2,
  * Int64List=3 } }`, each list `repeated value = 1` (numeric lists
  * packed). Wire format is public protobuf (LE base-128 varints,
  * length-delimited submessages; developers.google.com/protocol-buffers/
  * docs/encoding) and the field numbers are from TensorFlow's public
  * `example.proto`/`feature.proto`.
  *
  * Hand-rolled writer + tolerant reader (unknown fields skipped by wire
  * type, truncation returns the valid prefix of features) — no generated
  * code, no library. Composes with [[TfRecord]] for the full export path:
  * row → tf.Example bytes → TFRecord shard. All per-row arithmetic; the
  * reference moves binary data as opaque BLOBs only.
  */
object TfExample {

  sealed trait FeatureValue
  final case class BytesFeature(v: Seq[Array[Byte]]) extends FeatureValue
  final case class FloatFeature(v: Seq[Float]) extends FeatureValue
  final case class Int64Feature(v: Seq[Long]) extends FeatureValue

  private def writeVarint(out: ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7FL) != 0) {
      out.write(((v & 0x7F) | 0x80).toInt); v >>>= 7
    }
    out.write((v & 0x7F).toInt)
  }

  private def keyByte(field: Int, wire: Int): Int = (field << 3) | wire

  private def writeLenDelim(out: ByteArrayOutputStream, field: Int,
      body: Array[Byte]): Unit = {
    out.write(keyByte(field, 2))
    writeVarint(out, body.length.toLong)
    out.write(body)
  }

  private def encodeList(fv: FeatureValue): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    fv match {
      case BytesFeature(vs) => // repeated bytes value = 1 (not packable)
        vs.foreach(b => writeLenDelim(out, 1, b))
      case FloatFeature(vs) => // repeated float value = 1 [packed]
        val body = new ByteArrayOutputStream()
        vs.foreach { f =>
          val bits = java.lang.Float.floatToIntBits(f)
          (0 until 4).foreach(i => body.write((bits >>> (8 * i)) & 0xFF))
        }
        writeLenDelim(out, 1, body.toByteArray)
      case Int64Feature(vs) => // repeated int64 value = 1 [packed]
        val body = new ByteArrayOutputStream()
        vs.foreach(v => writeVarint(body, v))
        writeLenDelim(out, 1, body.toByteArray)
    }
    out.toByteArray
  }

  /** Serialize one Example. Features are written in the given order (a
    * real proto map is unordered; fixed order keeps output deterministic
    * for hashing). */
  def encode(features: Seq[(String, FeatureValue)]): Array[Byte] = {
    val featuresMsg = new ByteArrayOutputStream()
    features.foreach { case (name, fv) =>
      // map<string, Feature> entry: submessage {key=1: string, value=2: Feature}
      val feature = new ByteArrayOutputStream()
      val listField = fv match {
        case _: BytesFeature => 1
        case _: FloatFeature => 2
        case _: Int64Feature => 3
      }
      writeLenDelim(feature, listField, encodeList(fv))
      val entry = new ByteArrayOutputStream()
      writeLenDelim(entry, 1, name.getBytes("UTF-8"))
      writeLenDelim(entry, 2, feature.toByteArray)
      writeLenDelim(featuresMsg, 1, entry.toByteArray)
    }
    val out = new ByteArrayOutputStream()
    writeLenDelim(out, 1, featuresMsg.toByteArray) // Example.features = 1
    out.toByteArray
  }

  private final class Reader(b: Array[Byte], var pos: Int, val end: Int) {
    def hasMore: Boolean = pos < end
    def varint(): Long = {
      var v = 0L; var shift = 0; var more = true
      while (more) {
        if (pos >= end) throw new IllegalStateException("truncated varint")
        val x = b(pos) & 0xFF; pos += 1
        v |= (x & 0x7FL) << shift; shift += 7
        more = (x & 0x80) != 0
        if (shift > 70) throw new IllegalStateException("varint too long")
      }
      v
    }
    /** Returns (field, wire); skips nothing. */
    def key(): (Int, Int) = { val k = varint(); ((k >>> 3).toInt, (k & 7).toInt) }
    def lenDelim(): (Int, Int) = { // (start, end) of the body
      val len = varint().toInt
      if (len < 0 || pos + len > end) throw new IllegalStateException("truncated")
      val r = (pos, pos + len); pos += len; r
    }
    def skip(wire: Int): Unit = wire match {
      case 0 => varint()
      case 1 =>
        if (pos + 8 > end) throw new IllegalStateException("truncated")
        pos += 8
      case 2 => lenDelim()
      case 5 =>
        if (pos + 4 > end) throw new IllegalStateException("truncated")
        pos += 4
      case w => throw new IllegalStateException(s"wire type $w")
    }
  }

  /** Parse an Example back to its feature map (insertion order kept).
    * Unknown fields are skipped by wire type; structural corruption
    * throws (callers on the ingest path catch per row). */
  def decode(bytes: Array[Byte]): Seq[(String, FeatureValue)] = {
    val out = scala.collection.mutable.ArrayBuffer[(String, FeatureValue)]()
    val top = new Reader(bytes, 0, bytes.length)
    while (top.hasMore) {
      val (f, w) = top.key()
      if (f == 1 && w == 2) { // Features
        val (fs, fe) = top.lenDelim()
        val features = new Reader(bytes, fs, fe)
        while (features.hasMore) {
          val (ef, ew) = features.key()
          if (ef == 1 && ew == 2) { // map entry
            val (es, ee) = features.lenDelim()
            val entry = new Reader(bytes, es, ee)
            var name = ""
            var value: Option[FeatureValue] = None
            while (entry.hasMore) {
              val (nf, nw) = entry.key()
              if (nf == 1 && nw == 2) {
                val (ns, ne) = entry.lenDelim()
                name = new String(bytes, ns, ne - ns, "UTF-8")
              } else if (nf == 2 && nw == 2) {
                val (vs, ve) = entry.lenDelim()
                value = decodeFeature(bytes, vs, ve)
              } else entry.skip(nw)
            }
            value.foreach(v => out += ((name, v)))
          } else features.skip(ew)
        }
      } else top.skip(w)
    }
    out.toSeq
  }

  private def decodeFeature(bytes: Array[Byte], start: Int,
      end: Int): Option[FeatureValue] = {
    val r = new Reader(bytes, start, end)
    var result: Option[FeatureValue] = None
    while (r.hasMore) {
      val (f, w) = r.key()
      (f, w) match {
        case (1, 2) => // BytesList
          val (ls, le) = r.lenDelim()
          val list = new Reader(bytes, ls, le)
          val vs = scala.collection.mutable.ArrayBuffer[Array[Byte]]()
          while (list.hasMore) {
            val (vf, vw) = list.key()
            if (vf == 1 && vw == 2) {
              val (bs, be) = list.lenDelim()
              vs += java.util.Arrays.copyOfRange(bytes, bs, be)
            } else list.skip(vw)
          }
          result = Some(BytesFeature(vs.toSeq))
        case (2, 2) => // FloatList
          val (ls, le) = r.lenDelim()
          val list = new Reader(bytes, ls, le)
          val vs = scala.collection.mutable.ArrayBuffer[Float]()
          while (list.hasMore) {
            val (vf, vw) = list.key()
            if (vf == 1 && vw == 2) { // packed
              val (bs, be) = list.lenDelim()
              var p = bs
              while (p + 4 <= be) {
                var bits = 0
                (0 until 4).foreach(i => bits |= (bytes(p + i) & 0xFF) << (8 * i))
                vs += java.lang.Float.intBitsToFloat(bits); p += 4
              }
            } else if (vf == 1 && vw == 5) { // unpacked fixed32
              if (list.pos + 4 > list.end) throw new IllegalStateException("truncated")
              var bits = 0
              (0 until 4).foreach(i => bits |= (bytes(list.pos + i) & 0xFF) << (8 * i))
              vs += java.lang.Float.intBitsToFloat(bits); list.pos += 4
            } else list.skip(vw)
          }
          result = Some(FloatFeature(vs.toSeq))
        case (3, 2) => // Int64List
          val (ls, le) = r.lenDelim()
          val list = new Reader(bytes, ls, le)
          val vs = scala.collection.mutable.ArrayBuffer[Long]()
          while (list.hasMore) {
            val (vf, vw) = list.key()
            if (vf == 1 && vw == 2) { // packed
              val (bs, be) = list.lenDelim()
              val packed = new Reader(bytes, bs, be)
              while (packed.hasMore) vs += packed.varint()
            } else if (vf == 1 && vw == 0) { // unpacked varint
              vs += list.varint()
            } else list.skip(vw)
          }
          result = Some(Int64Feature(vs.toSeq))
        case (_, w2) => r.skip(w2)
      }
    }
    result
  }
}
