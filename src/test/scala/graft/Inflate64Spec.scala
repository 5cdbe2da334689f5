package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Inflate64, Zip}

/** DEFLATE64 (ZIP method 9) conformance.
  *
  * Two independent pins: every STANDARD deflate stream is a valid
  * deflate64 subset, so the JDK Deflater pins stored, fixed, and
  * dynamic block decode; and commons-compress's read-only
  * Deflate64CompressorInputStream pins the 64K-window EXTENSIONS
  * (length code 285's 16 extra bits, distance codes 30/31) by
  * cross-reading the from-scratch encoder's streams.
  */
class Inflate64Spec extends AnyFunSuite {

  private def gen(n: Int, seed: Int): Array[Byte] =
    Array.tabulate(n)(j => ((seed * 13 + j * 37) % 256).toByte)

  private def jdkDeflate(data: Array[Byte], level: Int): Array[Byte] = {
    val d = new java.util.zip.Deflater(level, true)
    try {
      d.setInput(data)
      d.finish()
      val buf = new java.io.ByteArrayOutputStream()
      val tmp = new Array[Byte](8192)
      while (!d.finished()) buf.write(tmp, 0, d.deflate(tmp))
      buf.toByteArray
    } finally d.end()
  }

  private def ccInflate64(b: Array[Byte]): Array[Byte] = {
    val in = new org.apache.commons.compress.compressors.deflate64
      .Deflate64CompressorInputStream(new java.io.ByteArrayInputStream(b))
    try in.readAllBytes() finally in.close()
  }

  test("JDK deflate streams decode as the deflate64 subset") {
    // deflate64's ONE incompatibility with classic deflate is length
    // code 285 (bare 258 vs base-3 + 16 extras), so the subset pin
    // uses shapes whose matches stay well under 258 bytes: distinct
    // 16-byte blocks each repeated once (16-length matches exercise
    // real Huffman match decode), incompressible bytes, and tiny
    // inputs
    val paired = (0 until 200).flatMap { k =>
      val blk = gen(16, 100 + k)
      (blk ++ blk).toSeq
    }.toArray
    // gen() is periodic (linear in j mod 256) and would LZ down to
    // >258-length matches — incompressibility needs a real PRNG
    val rnd = new Array[Byte](5000)
    new scala.util.Random(21).nextBytes(rnd)
    val shapes = Seq(paired, rnd, gen(1, 22), Array.emptyByteArray)
    for (data <- shapes; level <- Seq(0, 1, 9)) { // 0 = stored blocks
      val raw = jdkDeflate(data, level)
      val got = Inflate64.inflate(raw, 0, raw.length, data.length)
      assert(got != null && got.toSeq == data.toSeq, s"level=$level")
    }
  }

  test("64K-window extensions: >258 lengths and >32K distances") {
    // block A recurs 40000 bytes later — beyond deflate's 32K window
    // but inside deflate64's — and the run match is 60000 bytes long,
    // far past the classic 258 ceiling
    val blockA = gen(300, 23)
    val fill = gen(40000, 24)
    val run = Array.fill(60000)(42.toByte)
    val data = blockA ++ fill ++ blockA ++ run
    val ops = Seq.newBuilder[(Int, Int)]
    (blockA ++ fill).foreach(b => ops += ((b & 0xFF, 0)))
    ops += ((300, 40300)) // blockA again: distance code 30 territory
    ops += ((42, 0))
    ops += ((59999, 1)) // overlapping dist-1 copy, length via 16 extras
    val stream = Inflate64.fixedBlock(ops.result())
    // the independent reader and ours agree byte-for-byte
    assert(ccInflate64(stream).toSeq == data.toSeq)
    val got = Inflate64.inflate(stream, 0, stream.length, data.length)
    assert(got != null && got.toSeq == data.toSeq)
    // declared-size mismatches are damage, not padding
    assert(Inflate64.inflate(stream, 0, stream.length, data.length + 1) == null)
    assert(Inflate64.inflate(stream, 0, stream.length, data.length - 1) == null)
  }

  test("greedy encoder round-trips and cross-reads") {
    val shapes = Seq(
      ("enhanced deflate member " * 3000).getBytes("US-ASCII"), // long matches
      gen(70000, 25), gen(17, 26), Array.emptyByteArray)
    for (data <- shapes) {
      val enc = Inflate64.encode(data)
      val got = Inflate64.inflate(enc, 0, enc.length, data.length)
      assert(got != null && got.toSeq == data.toSeq)
      assert(ccInflate64(enc).toSeq == data.toSeq)
    }
  }

  test("damage degrades to null, never throws or half-reads") {
    // short-match data (see the subset-pin note on code 285)
    val data = (0 until 25).flatMap { k =>
      val blk = gen(10, 200 + k)
      (blk ++ blk).toSeq
    }.toArray
    val raw = jdkDeflate(data, 6)
    for (i <- raw.indices by 3) {
      val bad = raw.clone()
      bad(i) = (bad(i) ^ 0x55).toByte
      // no checksum at this layer (the zip walk's CRC-32 is the
      // content net): a flip may decode to other bytes, but must
      // never throw, over-run, or change the declared length
      val got = Inflate64.inflate(bad, 0, bad.length, data.length)
      assert(got == null || got.length == data.length, s"flip@$i")
    }
    for (cut <- 0 until raw.length)
      assert(Inflate64.inflate(raw, 0, cut, data.length) == null, s"cut=$cut")
    // pre-start distance reach is damage (unlike REDUCE, deflate has
    // no zero-window convention)
    val reach = Inflate64.fixedBlock(Seq((65, 0), (5, 3)))
    assert(Inflate64.inflate(reach, 0, reach.length, 6) == null)
  }

  test("zip members with method 9 decode and cross-read") {
    val files = Seq(
      ("e1.bin", ("member nine " * 400).getBytes("US-ASCII"), 9),
      ("e2.bin", gen(800, 27), 9),
      ("s.bin", gen(30, 28), 0))
    val z = Zip.synthZipMethods(files)
    val m = Zip.members(z)
    assert(m != null && m.length == 3)
    for (((name, data, _), i) <- files.zipWithIndex)
      assert(m(i)._1 == name && m(i)._2.toSeq == data.toSeq, name)
    assert(!Zip.unsupportedMethod(z))
    val ch = new org.apache.commons.compress.utils
      .SeekableInMemoryByteChannel(z)
    val zf = org.apache.commons.compress.archivers.zip.ZipFile.builder()
      .setSeekableByteChannel(ch).get()
    try for ((name, data, _) <- files) {
      val e = zf.getEntry(name)
      assert(e != null && zf.canReadEntryData(e), name)
      assert(zf.getInputStream(e).readAllBytes().toSeq == data.toSeq, name)
    } finally zf.close()
  }
}
