package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.LzwZ

/** Unix compress `.Z` conformance: the independent pin is
  * commons-compress's read-only ZCompressorInputStream, which must
  * byte-exactly read this encoder's streams across the whole width
  * range (9-16) — crossing every width change, the 8-code group
  * realignments, and block-mode CLEAR resets. A live `uncompress`
  * (gzip) pin runs when the binary exists.
  */
class LzwZSpec extends AnyFunSuite {

  private def gen(n: Int, seed: Int): Array[Byte] =
    Array.tabulate(n)(j => ((seed * 13 + j * 37) % 256).toByte)

  private def ccDecode(b: Array[Byte]): Array[Byte] = {
    val in = new org.apache.commons.compress.compressors.z
      .ZCompressorInputStream(new java.io.ByteArrayInputStream(b))
    try in.readAllBytes() finally in.close()
  }

  private val shapes: Seq[(String, Array[Byte])] = {
    val rnd = new Array[Byte](30000)
    new scala.util.Random(31).nextBytes(rnd)
    Seq(
      ("text", ("the compressed archive block " * 2000).getBytes("US-ASCII")),
      ("random", rnd), // ~1 new entry/byte: drives widths to the top
      ("run", Array.fill(20000)(7.toByte)), // KwKwK chains
      ("alt", Array.tabulate(8192)(j => (j % 2).toByte)),
      ("tiny", gen(3, 41)), ("one", gen(1, 42)),
      ("empty", Array.emptyByteArray))
  }

  test("round-trips across widths 9-16, pinned by commons-compress") {
    for ((name, data) <- shapes; maxBits <- 9 to 16) {
      val z = LzwZ.encode(data, maxBits)
      assert(LzwZ.isZ(z) || data.isEmpty, name)
      val mine = LzwZ.decode(z)
      assert(mine != null && mine.toSeq == data.toSeq, s"$name/$maxBits self")
      // commons-compress does NOT implement the canonical -b9
      // degeneracy (the 10-bit bump once entry 512 allocates) and
      // throws on genuine compress -b9 streams that gzip reads fine
      // — width 9 is pinned by the live uncompress test instead
      if (maxBits > 9)
        assert(ccDecode(z).toSeq == data.toSeq, s"$name/$maxBits cc")
    }
  }

  test("width-9 streams clear constantly and stay in sync") {
    // 254 free entries per generation at maxBits 9: a 100k mixed
    // payload crosses hundreds of CLEAR resets (and the canonical
    // 10-bit bump windows before each clear)
    val data = (0 until 100).flatMap(k => gen(1000, 50 + k).toSeq).toArray
    val z = LzwZ.encode(data, 9)
    assert(LzwZ.decode(z).toSeq == data.toSeq)
    // cc's -b9 gap, demonstrated: the canonical stream throws there
    intercept[java.io.IOException](ccDecode(z))
  }

  test("damage degrades to null, never throws") {
    assert(LzwZ.decode(Array[Byte](0x1F, 0x00, 0x10)) == null) // magic
    assert(LzwZ.decode(Array[Byte](0x1F, 0x9D.toByte)) == null) // short
    for (bad <- Seq(0x88, 0x91, 0xE0)) // width 8, 17, reserved bit
      assert(LzwZ.decode(Array[Byte](0x1F, 0x9D.toByte, bad.toByte, 1)) ==
        null, bad)
    // first code must be a literal: 9-bit code 300 LSB-first
    val badFirst = Array[Byte](0x1F, 0x9D.toByte, 0x90.toByte,
      (300 & 0xFF).toByte, ((300 >> 8) & 1).toByte)
    assert(LzwZ.decode(badFirst) == null)
    // expansion cap
    val big = LzwZ.encode(Array.fill(100000)(9.toByte), 12)
    assert(LzwZ.decode(big, cap = 1000) == null)
    assert(LzwZ.decode(big, cap = 100000) != null)
    // truncation yields the decodable prefix (the format carries no
    // length or checksum — detection belongs to the layer above)
    val z = LzwZ.encode(gen(5000, 43), 13)
    for (cut <- Seq(3, 10, z.length / 2)) {
      val got = LzwZ.decode(java.util.Arrays.copyOf(z, cut))
      assert(got != null && got.length <= 5000, s"cut=$cut")
    }
  }

  test("live uncompress(1) cross-reads the encoder (gated)") {
    val un = new java.io.File("/usr/bin/uncompress")
    assume(un.exists, "uncompress binary not present")
    val data = ("live uncompress pin " * 500).getBytes("US-ASCII") ++
      gen(4000, 44)
    for (maxBits <- Seq(9, 12, 16)) {
      val dir = java.nio.file.Files.createTempDirectory("lzwz")
      val f = dir.resolve("t.Z")
      java.nio.file.Files.write(f, LzwZ.encode(data, maxBits))
      val p = new ProcessBuilder("/usr/bin/uncompress", "-f",
        f.toString).redirectErrorStream(true).start()
      assert(p.waitFor() == 0, s"uncompress exit maxBits=$maxBits")
      val plain = java.nio.file.Files.readAllBytes(dir.resolve("t"))
      assert(plain.toSeq == data.toSeq, s"maxBits=$maxBits")
      java.nio.file.Files.deleteIfExists(dir.resolve("t"))
      java.nio.file.Files.deleteIfExists(f)
      java.nio.file.Files.deleteIfExists(dir)
    }
  }
}
