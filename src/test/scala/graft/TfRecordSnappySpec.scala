package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Snappy, TfRecord}

/** TFRecord framing + raw-Snappy conformance. Snappy is pinned BOTH
  * directions against snappy-java; TFRecord's checksum pin is the
  * JDK's independent CRC32C (the framing spec is arithmetic around
  * it).
  */
class TfRecordSnappySpec extends AnyFunSuite {

  private def gen(n: Int, seed: Int): Array[Byte] =
    Array.tabulate(n)(j => ((seed * 13 + j * 37) % 256).toByte)

  test("snappy round-trips and cross-reads with snappy-java") {
    val rnd = new Array[Byte](30000)
    new scala.util.Random(91).nextBytes(rnd)
    val shapes = Seq(
      ("text", ("snappy raw element block " * 1500).getBytes("US-ASCII")),
      ("rand", rnd),
      ("run", Array.fill(70000)(3.toByte)), // >64-len copy splitting
      ("tiny", gen(3, 92)), ("empty", Array.emptyByteArray))
    for ((name, data) <- shapes) {
      val enc = Snappy.encode(data)
      val dec = Snappy.decode(enc)
      assert(dec != null && dec.toSeq == data.toSeq, s"$name self")
      // snappy-java reads ours...
      val sj = org.xerial.snappy.Snappy.uncompress(enc)
      assert(sj.toSeq == data.toSeq, s"$name sj-read")
      // ...and we read snappy-java's
      val sjEnc = org.xerial.snappy.Snappy.compress(data)
      val dec2 = Snappy.decode(sjEnc)
      assert(dec2 != null && dec2.toSeq == data.toSeq, s"$name sj-write")
    }
    // damage: truncations, pre-start copies, length mismatches
    val enc = Snappy.encode(("abcd" * 200).getBytes("US-ASCII"))
    for (cut <- 1 until enc.length)
      assert(Snappy.decode(java.util.Arrays.copyOf(enc, cut)) == null ||
        cut == enc.length, s"cut=$cut")
    assert(Snappy.decode(Array[Byte](4, 1, 0, 0)) == null) // bad offset 0
    assert(Snappy.decode(Array.emptyByteArray) == null)
    assert(Snappy.decode(gen(400, 93), cap = 10) == null ||
      Snappy.decode(gen(400, 93), cap = 10) == null) // cap respected
  }

  test("tfrecord framing round-trips, CRCs verify, gzip transparent") {
    val recs = (0 until 50).map(i => gen(10 + i * 7 % 90, 94 + i))
    val plain = TfRecord.synth(recs)
    val got = TfRecord.records(plain)
    assert(got != null && got.length == 50)
    for ((w, g) <- recs.zip(got)) assert(g.toSeq == w.toSeq)
    // whole-file gzip (.tfrecord.gz)
    val bos = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.GZIPOutputStream(bos)
    z.write(plain); z.close()
    val got2 = TfRecord.records(bos.toByteArray)
    assert(got2 != null && got2.length == 50)
    assert(got2(49).toSeq == recs(49).toSeq)
    // empty records are legal
    val e = TfRecord.records(TfRecord.synth(Seq(Array.emptyByteArray)))
    assert(e != null && e.length == 1 && e(0).isEmpty)
    // any flipped byte breaks a CRC (or the length, caught by bounds)
    for (i <- plain.indices by 7) {
      val bad = plain.clone()
      bad(i) = (bad(i) ^ 0x2B).toByte
      assert(TfRecord.records(bad) == null, s"flip@$i")
    }
    for (cut <- Seq(3, 11, plain.length / 2, plain.length - 2))
      assert(TfRecord.records(
        java.util.Arrays.copyOf(plain, cut)) == null, s"cut=$cut")
  }
}
