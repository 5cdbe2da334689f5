package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TfExample
import graft.operators.TfExample.{BytesList, FloatList, Int64List}

/** tf.Example wire-format conformance: hand-computed golden vectors
  * from the public proto definitions (packed AND unpacked repeated
  * encodings), unknown-field skipping, and encoder round-trip.
  */
class TfExampleSpec extends AnyFunSuite {

  test("hand-computed golden vectors decode (packed and unpacked)") {
    // Example{features{feature{key:"x" value{int64_list{value:[3]}}}}}
    // with the PACKED list encoding
    val packed = Array[Byte](0x0A, 0x0C, 0x0A, 0x0A, 0x0A, 0x01, 0x78,
      0x12, 0x05, 0x1A, 0x03, 0x0A, 0x01, 0x03)
    val got = TfExample.parse(packed)
    assert(got != null && got.length == 1 && got(0)._1 == "x")
    assert(got(0)._2.asInstanceOf[Int64List].values.toSeq == Seq(3L))
    // the same message with the UNPACKED (proto2-writer) encoding
    val unpacked = Array[Byte](0x0A, 0x0B, 0x0A, 0x09, 0x0A, 0x01, 0x78,
      0x12, 0x04, 0x1A, 0x02, 0x08, 0x03)
    val got2 = TfExample.parse(unpacked)
    assert(got2 != null &&
      got2(0)._2.asInstanceOf[Int64List].values.toSeq == Seq(3L))
    // bytes feature: key "t", value BytesList(["hi"])
    // BytesList=[0A 02 68 69], Feature=[0A 04 ...] (kind 1),
    // entry=[0A 01 74 12 06 0A 04 0A 02 68 69]
    val bytesV = Array[Byte](0x0A, 0x0D, 0x0A, 0x0B, 0x0A, 0x01, 0x74,
      0x12, 0x06, 0x0A, 0x04, 0x0A, 0x02, 0x68, 0x69)
    val got3 = TfExample.parse(bytesV)
    assert(got3 != null && got3(0)._1 == "t")
    assert(new String(got3(0)._2.asInstanceOf[BytesList].values(0),
      "US-ASCII") == "hi")
  }

  test("encoder round-trips all three feature kinds") {
    val features = Seq[(String, TfExample.FeatureValue)](
      ("tokens", Int64List(Array(1L, -5L, 1000000L, 0L))),
      ("text", BytesList(Array("hello".getBytes("UTF-8"),
        Array.emptyByteArray))),
      ("weights", FloatList(Array(1.5f, -0.25f, 0f))))
    val enc = TfExample.synth(features)
    val got = TfExample.parse(enc)
    assert(got != null && got.length == 3)
    assert(got(0)._2.asInstanceOf[Int64List].values.toSeq ==
      Seq(1L, -5L, 1000000L, 0L))
    assert(got(1)._2.asInstanceOf[BytesList].values.map(_.length).toSeq ==
      Seq(5, 0))
    assert(got(2)._2.asInstanceOf[FloatList].values.toSeq ==
      Seq(1.5f, -0.25f, 0f))
    // duplicate keys: last wins (protobuf map semantics)
    val dup = TfExample.synth(Seq(
      ("k", Int64List(Array(1L))), ("k", Int64List(Array(2L)))))
    val gd = TfExample.parse(dup)
    assert(gd.length == 1 &&
      gd(0)._2.asInstanceOf[Int64List].values.toSeq == Seq(2L))
  }

  test("unknown fields skip; damage degrades to null") {
    // prepend an unknown varint field (tag 5<<3|0, value 7) at the
    // Example level: must be skipped
    val base = TfExample.synth(Seq(("a", Int64List(Array(9L)))))
    val withUnknown = Array[Byte](0x28, 0x07) ++ base
    val got = TfExample.parse(withUnknown)
    assert(got != null &&
      got(0)._2.asInstanceOf[Int64List].values.toSeq == Seq(9L))
    // truncations: no-throw is the contract (specific cuts that stay
    // parseable as a shorter message are legal protobuf)
    for (cut <- 1 until base.length)
      TfExample.parse(java.util.Arrays.copyOf(base, cut))
    val bad = Array[Byte](0x0A, 0x7F, 0x01) // declared len > available
    assert(TfExample.parse(bad) == null)
  }
}
