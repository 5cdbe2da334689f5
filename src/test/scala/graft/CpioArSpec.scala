package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Ar, Cpio}

/** cpio + ar shard-walk conformance, pinned BOTH directions against
  * commons-compress (it ships read AND write for each).
  */
class CpioArSpec extends AnyFunSuite {

  private def gen(n: Int, seed: Int): Array[Byte] =
    Array.tabulate(n)(j => ((seed * 13 + j * 37) % 256).toByte)

  private val files = Seq(
    ("0001.txt", gen(40, 71)),
    ("a/very/long/member/path/that/exceeds/short/limits/0001.cls", gen(1, 72)),
    ("0002.txt", gen(257, 73)), // odd length exercises padding
    ("empty.bin", Array.emptyByteArray))

  test("cpio: all four formats round-trip and cross-read") {
    import org.apache.commons.compress.archivers.cpio._
    val ccFormats = Seq(
      "newc" -> CpioConstants.FORMAT_NEW,
      "crc" -> CpioConstants.FORMAT_NEW_CRC,
      "odc" -> CpioConstants.FORMAT_OLD_ASCII,
      "bin_le" -> CpioConstants.FORMAT_OLD_BINARY)
    for ((fmt, ccFmt) <- ccFormats) {
      // ours -> commons-compress
      val z = Cpio.synthCpio(files, fmt)
      assert(Cpio.isCpio(z), fmt)
      val mine = Cpio.members(z)
      assert(mine != null && mine.length == files.length, fmt)
      for (((n, d), i) <- files.zipWithIndex)
        assert(mine(i)._1 == n && mine(i)._2.toSeq == d.toSeq, s"$fmt/$n")
      val cin = new CpioArchiveInputStream(
        new java.io.ByteArrayInputStream(z))
      try {
        for ((n, d) <- files) {
          val e = cin.getNextEntry
          assert(e != null && e.getName == n, s"$fmt/$n cc-read")
          assert(cin.readAllBytes().toSeq == d.toSeq, s"$fmt/$n cc-bytes")
        }
        assert(cin.getNextEntry == null, fmt)
      } finally cin.close()
      // commons-compress -> ours
      val bos = new java.io.ByteArrayOutputStream()
      val cout = new CpioArchiveOutputStream(bos, ccFmt)
      for ((n, d) <- files) {
        val e = new CpioArchiveEntry(ccFmt, n, d.length.toLong)
        if (ccFmt == CpioConstants.FORMAT_NEW_CRC)
          e.setChksum(d.foldLeft(0L)((s, x) => (s + (x & 0xFF)) & 0xFFFFFFFFL))
        cout.putArchiveEntry(e)
        cout.write(d)
        cout.closeArchiveEntry()
      }
      cout.close()
      val got = Cpio.members(bos.toByteArray)
      assert(got != null && got.length == files.length, s"$fmt cc-write")
      for (((n, d), i) <- files.zipWithIndex)
        assert(got(i)._1 == n && got(i)._2.toSeq == d.toSeq,
          s"$fmt/$n cc-write")
    }
  }

  test("cpio: crc checksum and structure verify; damage degrades") {
    val z = Cpio.synthCpio(files, "crc")
    // flip one payload byte: the member checksum must catch it
    val off = z.indexOfSlice(gen(40, 71).take(8).toSeq)
    assert(off > 0)
    val bad = z.clone()
    bad(off + 3) = (bad(off + 3) ^ 0x11).toByte
    assert(Cpio.members(bad) == null)
    // newc has no checksum: the same flip passes (structure intact)
    val zn = Cpio.synthCpio(files, "newc")
    val off2 = zn.indexOfSlice(gen(40, 71).take(8).toSeq)
    val bad2 = zn.clone()
    bad2(off2 + 3) = (bad2(off2 + 3) ^ 0x11).toByte
    assert(Cpio.members(bad2) != null)
    // truncation and header damage quarantine
    for (cut <- Seq(5, 40, z.length / 2, z.length - 9))
      assert(Cpio.members(java.util.Arrays.copyOf(z, cut)) == null, s"$cut")
    val hb = z.clone()
    hb(2) = '9'.toByte // magic corruption
    assert(Cpio.members(hb) == null)
    assert(Cpio.members(gen(80, 74)) == null)
  }

  test("ar: GNU and BSD dialects round-trip and cross-read") {
    import org.apache.commons.compress.archivers.ar._
    for (style <- Seq("gnu", "bsd")) {
      val z = Ar.synthAr(files, style)
      assert(Ar.isAr(z), style)
      val mine = Ar.members(z)
      assert(mine != null && mine.length == files.length, style)
      for (((n, d), i) <- files.zipWithIndex)
        assert(mine(i)._1 == n && mine(i)._2.toSeq == d.toSeq, s"$style/$n")
      // ours -> commons-compress (it reads both dialects)
      val ain = new ArArchiveInputStream(
        new java.io.ByteArrayInputStream(z))
      try {
        for ((n, d) <- files) {
          val e = ain.getNextEntry
          assert(e != null && e.getName == n, s"$style/$n cc-read")
          assert(ain.readAllBytes().toSeq == d.toSeq, s"$style/$n cc-bytes")
        }
        assert(ain.getNextEntry == null, style)
      } finally ain.close()
    }
    // commons-compress -> ours (its write side long-name mode is BSD)
    val bos = new java.io.ByteArrayOutputStream()
    val aout = new ArArchiveOutputStream(bos)
    aout.setLongFileMode(ArArchiveOutputStream.LONGFILE_BSD)
    for ((n, d) <- files) {
      aout.putArchiveEntry(new ArArchiveEntry(n, d.length.toLong))
      aout.write(d)
      aout.closeArchiveEntry()
    }
    aout.close()
    val got = Ar.members(bos.toByteArray)
    assert(got != null && got.length == files.length)
    for (((n, d), i) <- files.zipWithIndex)
      assert(got(i)._1 == n && got(i)._2.toSeq == d.toSeq, s"cc-write/$n")
  }

  test("ar: damage degrades to null, never throws") {
    val z = Ar.synthAr(files, "gnu")
    for (cut <- Seq(4, 30, z.length / 2, z.length - 7))
      assert(Ar.members(java.util.Arrays.copyOf(z, cut)) == null, s"$cut")
    val bad = z.clone()
    bad(8 + 58) = 'X'.toByte // first header terminator
    assert(Ar.members(bad) == null)
    // a GNU /offset reference without a name table
    val noTable = Ar.synthAr(Seq(("short.txt", gen(10, 75))), "gnu")
    val patched = noTable.clone()
    patched(8) = '/'.toByte
    patched(9) = '0'.toByte
    for (i <- 10 until 24) patched(i) = ' '.toByte
    assert(Ar.members(patched) == null)
    assert(Ar.members(gen(100, 76)) == null)
  }
}
