package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Rpm

/** RPM walk conformance: the layers beneath (newc cpio, gzip, xz,
  * zstd) each carry their own independent pins; this spec covers the
  * rpm-specific structure — lead, header index/store, 8-byte
  * signature padding, tag extraction — plus damage classes.
  */
class RpmSpec extends AnyFunSuite {

  private def gen(n: Int, seed: Int): Array[Byte] =
    Array.tabulate(n)(j => ((seed * 13 + j * 37) % 256).toByte)

  private val files = Seq(
    ("./usr/lib/a.so", gen(300, 96)),
    ("./usr/share/doc/readme", gen(45, 97)))

  test("packages round-trip across all three compressors") {
    for (comp <- Seq("gzip", "xz", "zstd")) {
      val b = Rpm.synthRpm("graft-pkg", "3.1", "2", "x86_64", files, comp)
      assert(Rpm.isRpm(b), comp)
      val info = Rpm.read(b)
      assert(info != null, comp)
      assert(info.name == "graft-pkg" && info.version == "3.1", comp)
      assert(info.release == "2" && info.arch == "x86_64", comp)
      assert(info.members.length == 2, comp)
      for (((n, d), i) <- files.zipWithIndex) {
        assert(info.members(i)._1 == n, comp)
        assert(info.members(i)._2.toSeq == d.toSeq, comp)
      }
    }
  }

  test("damage degrades to null at every layer") {
    val b = Rpm.synthRpm("p", "1.0", "1", "noarch", files, "gzip")
    // lead magic
    val m = b.clone(); m(0) = 0x11
    assert(Rpm.read(m) == null && !Rpm.isRpm(m))
    // signature header magic
    val sh = b.clone(); sh(96) = 0x00
    assert(Rpm.read(sh) == null)
    // payload damage: a flipped gzip byte fails the cpio walk
    val pd = b.clone()
    pd(pd.length - 10) = (pd(pd.length - 10) ^ 0x31).toByte
    assert(Rpm.read(pd) == null)
    // truncations
    for (cut <- Seq(10, 95, 100, 200, b.length / 2))
      assert(Rpm.read(java.util.Arrays.copyOf(b, cut)) == null, s"$cut")
    assert(Rpm.read(gen(200, 98)) == null)
    // a main header missing the NAME tag
    val noName = Rpm.synthRpm("", "1.0", "1", "noarch", files, "gzip")
    assert(Rpm.read(noName) == null)
  }
}
