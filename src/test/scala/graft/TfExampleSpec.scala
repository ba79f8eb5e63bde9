package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TfExample
import graft.operators.TfExample.{BytesFeature, FloatFeature, Int64Feature}

/** tf.Example wire-format exactness: a hand-computed byte-level known
  * answer, roundtrips across all three list kinds, unknown-field
  * tolerance, and unpacked-numeric acceptance (proto3 parsers must read
  * both packed and unpacked repeated scalars). */
class TfExampleSpec extends AnyFunSuite {

  test("wire bytes match a hand-computed encoding") {
    // Example{features{feature{key:"n" value{int64_list{value:[7,300]}}}}}
    // computed by hand from the protobuf encoding rules
    val got = TfExample.encode(Seq("n" -> Int64Feature(Seq(7L, 300L))))
    assert(got.map("%02x".format(_)).mkString ==
      "0a0e0a0c0a016e12071a050a0307ac02")
  }

  test("all three feature kinds roundtrip exactly") {
    val fs = Seq(
      "text" -> BytesFeature(Seq("hello".getBytes("UTF-8"),
        Array[Byte](0, -1, 127))),
      "emb" -> FloatFeature(Seq(1.5f, -0.25f, Float.MinPositiveValue)),
      "ids" -> Int64Feature(Seq(0L, -1L, Long.MaxValue, Long.MinValue)))
    val back = TfExample.decode(TfExample.encode(fs))
    assert(back.map(_._1) == Seq("text", "emb", "ids"))
    val m = back.toMap
    val bs = m("text").asInstanceOf[BytesFeature].v
    assert(bs.length == 2 && new String(bs.head, "UTF-8") == "hello")
    assert(java.util.Arrays.equals(bs(1), Array[Byte](0, -1, 127)))
    assert(m("emb").asInstanceOf[FloatFeature].v == Seq(1.5f, -0.25f,
      Float.MinPositiveValue))
    assert(m("ids").asInstanceOf[Int64Feature].v ==
      Seq(0L, -1L, Long.MaxValue, Long.MinValue))
  }

  test("empty lists and empty examples decode cleanly") {
    assert(TfExample.decode(TfExample.encode(Nil)).isEmpty)
    val back = TfExample.decode(TfExample.encode(Seq(
      "e" -> Int64Feature(Nil))))
    assert(back == Seq("e" -> Int64Feature(Nil)))
  }

  test("unknown fields are skipped, not fatal") {
    // splice an unknown varint field (field 9, wire 0) into the top level
    val base = TfExample.encode(Seq("n" -> Int64Feature(Seq(42L))))
    val spliced = Array[Byte]((9 << 3).toByte, 1) ++ base
    val back = TfExample.decode(spliced)
    assert(back == Seq("n" -> Int64Feature(Seq(42L))))
  }

  test("unpacked int64 values are accepted alongside packed") {
    def ld(field: Int, body: Array[Byte]): Array[Byte] =
      Array[Byte](((field << 3) | 2).toByte, body.length.toByte) ++ body
    // Int64List{value: 5} with value UNPACKED (field 1, wire 0)
    val int64list = Array[Byte]((1 << 3).toByte, 5)
    val feature = ld(3, int64list)
    val entry = ld(1, "k".getBytes("UTF-8")) ++ ld(2, feature)
    val example = ld(1, ld(1, entry))
    val back = TfExample.decode(example)
    assert(back == Seq("k" -> Int64Feature(Seq(5L))))
  }

  test("truncated input throws rather than fabricating features") {
    val base = TfExample.encode(Seq("n" -> Int64Feature(Seq(300L))))
    intercept[Exception] {
      TfExample.decode(java.util.Arrays.copyOf(base, base.length - 1))
    }
  }
}
