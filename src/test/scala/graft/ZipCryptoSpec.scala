package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Multimodal, Zip}

/** Traditional ZipCrypto (APPNOTE 6.1) conformance.
  *
  * The independent pin is Info-ZIP itself: the three golden archives
  * below were produced by `zip -P` (Zip 3.0) and are embedded
  * bit-exact — stored and deflated members, with the general-purpose
  * bit-3 data-descriptor layout Info-ZIP always uses for encrypted
  * entries (check byte = DOS-time high byte, so the member CRC is
  * the real gate). The from-scratch encrypt side round-trips through
  * our decrypt and is structurally cross-checked by commons-compress
  * refusing the entries as encrypted.
  */
class ZipCryptoSpec extends AnyFunSuite with SparkSpec {

  private def hex(s: String): Array[Byte] =
    s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  private def pw(s: String): Array[Byte] = s.getBytes("UTF-8")

  // zip -0 -P graft-key: one STORED member "plain.txt"
  private val GoldStored = hex(
    "504b03040a00090000006210105dbc21e4323a0000002e00000009001c00706c61" +
    "696e2e7478745554090003571a816a571a816a75780b0001040000000004000000" +
    "00a274aab28a1b75178b04451f507d4aed063375924c3c8d15e764a978af31e96f" +
    "7fd8c9775208812a22d7bb7b788c17734c0aee991f302e0e922e504b0708bc21e4" +
    "323a0000002e000000504b01021e030a00090000006210105dbc21e4323a000000" +
    "2e000000090018000000000000000000a48100000000706c61696e2e7478745554" +
    "050003571a816a75780b000104000000000400000000504b050600000000010001" +
    "004f0000008d0000000000")

  // zip -9 -P graft-key on compressible content: one DEFLATED member
  private val GoldDeflated = hex(
    "504b030414000b0008006a10105d19b9c9123f0000007805000008001c00636f6d" +
    "702e7478745554090003671a816a671a816a75780b00010400000000040000" +
    "0000d8d3f02780854134f4e58ad2821c45eb6ee17fd4cdf3d3b4f67089bdf5be74" +
    "49a91e89c8bd189eeee27128f948e0b5d236f079320810974f797af33de04ff650" +
    "4b070819b9c9123f00000078050000504b01021e0314000b0008006a10105d19b9" +
    "c9123f00000078050000080018000000000001000000a48100000000636f6d702e" +
    "7478745554050003671a816a75780b000104000000000400000000504b05060000" +
    "0000010001004e000000910000000000")

  test("Info-ZIP golden archives decrypt (stored and deflated)") {
    val m0 = Zip.members(GoldStored, pw("graft-key"))
    assert(m0 != null && m0.length == 1 && m0(0)._1 == "plain.txt")
    assert(new String(m0(0)._2, "US-ASCII") ==
      "graft zipcrypto known answer vector 0123456789")
    val m8 = Zip.members(GoldDeflated, pw("graft-key"))
    assert(m8 != null && m8.length == 1 && m8(0)._1 == "comp.txt")
    assert(new String(m8(0)._2, "US-ASCII") ==
      "compressible zipcrypto vector line\n" * 40)
  }

  test("wrong or missing passwords quarantine, never misread") {
    for (bad <- Seq("graft-kez", "graft-key ", "", "GRAFT-KEY")) {
      assert(Zip.members(GoldStored, pw(bad)) == null, bad)
      assert(Zip.members(GoldDeflated, pw(bad)) == null, bad)
    }
    // no password: the named encrypted gap, as before
    assert(Zip.members(GoldStored) == null)
    assert(Zip.unsupportedMethod(GoldStored))
    assert(Multimodal.mediaDecodeClass(GoldStored) ==
      ("zip", "unsupported_profile"))
  }

  private def gen(n: Int, seed: Int): Array[Byte] =
    Array.tabulate(n)(j => ((seed * 13 + j * 37) % 256).toByte)

  test("encrypt side round-trips across the whole codec matrix") {
    val key = pw("matrix-key-9")
    val files = (0 to 11).map { i =>
      val method = Seq(0, 1, 2, 3, 4, 5, 6, 8, 9, 12, 93, 95)(i)
      (f"m$method%02d.bin", gen(300 + i * 37, 60 + i), method)
    } :+ (("m14.bin", gen(500, 77), 14))
    val z = Zip.synthZipMethods(files, password = key)
    val m = Zip.members(z, key)
    assert(m != null && m.length == files.length)
    for (((name, data, _), i) <- files.zipWithIndex)
      assert(m(i)._1 == name && m(i)._2.toSeq == data.toSeq, name)
    // passwordless and wrong-password reads quarantine
    assert(Zip.members(z) == null)
    assert(Zip.unsupportedMethod(z))
    assert(Zip.members(z, pw("matrix-key-8")) == null)
    // the independent commons-compress reader sees the entries but
    // refuses the ciphertext — encryption, not damage
    val ch = new org.apache.commons.compress.utils
      .SeekableInMemoryByteChannel(z)
    val zf = org.apache.commons.compress.archivers.zip.ZipFile.builder()
      .setSeekableByteChannel(ch).get()
    try for ((name, _, _) <- files) {
      val e = zf.getEntry(name)
      assert(e != null && !zf.canReadEntryData(e), name)
    } finally zf.close()
    // ciphertext damage is caught by the member CRC
    val bad = z.clone()
    val dataStart = z.indexOfSlice("m00.bin".getBytes("US-ASCII")) + 7
    bad(dataStart + 18) = (bad(dataStart + 18) ^ 0x41).toByte
    assert(Zip.members(bad, key) == null)
  }

  test("the demo encrypted corpus decodes only with its password") {
    import spark.implicits._
    val docs = Seq(0L, 1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L, 9L, 10L, 11L)
      .toDF("doc_id")
    val corpus = Multimodal.demoZipEncShards(spark, docs).collect()
    assert(corpus.length == 12)
    for (mf <- corpus) {
      assert(Zip.members(mf.content) == null)
      val m = Zip.members(mf.content,
        pw(Multimodal.DemoZipPassword))
      assert(m != null && m.length == 2 * (2 + mf.media_id % 3).toInt)
    }
  }
}
