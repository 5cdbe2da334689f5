package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Containers

/** GNU multi-volume tar (`tar -M`) conformance — the tar profile a
  * single shard can't reassemble, closed by the volume-set walk. The
  * independent pin is GNU tar itself, live-gated: real `tar -cM`
  * volume sets read back through [[Containers.tarMultivolume]], and
  * the synthesizer's volumes extract byte-exact through `tar -xM`.
  */
class TarMultivolumeSpec extends AnyFunSuite {

  private def gen(n: Int, seed: Int): Array[Byte] =
    Array.tabulate(n)(j => ((seed * 13 + j * 37) % 256).toByte)

  private val files = Seq(
    ("payload.bin", gen(6000, 81)), // spans 3+ volumes at 2048
    ("0001.txt", gen(700, 82)),
    ("0001.cls", gen(1, 83)),
    ("empty.bin", Array.emptyByteArray))

  test("synth volumes round-trip, with and without labels") {
    for (label <- Seq(null, "graft-set")) {
      val vols = Containers.synthTarMultivolume(files, 2048, label)
      assert(vols.length >= 4, s"label=$label vols=${vols.length}")
      assert(vols.forall(_.length % 512 == 0))
      val got = Containers.tarMultivolume(vols.toSeq)
      assert(got != null && got.length == files.length, s"label=$label")
      for (((n, d), i) <- files.zipWithIndex)
        assert(got(i)._1 == n && got(i)._2.toSeq == d.toSeq, s"$label/$n")
    }
  }

  test("set damage quarantines: order, absence, offsets, checksums") {
    val vols = Containers.synthTarMultivolume(files, 2048, "lbl")
    // dropped and swapped volumes
    assert(Containers.tarMultivolume(vols.toSeq.patch(1, Nil, 1)) == null)
    assert(Containers.tarMultivolume(
      Seq(vols(1), vols(0)) ++ vols.drop(2)) == null)
    // continuation offset forged: find the second volume's M header
    // (after the label block) and bump its offset field
    val bad = vols.map(_.clone())
    val mOff = 512 // label block first, then the continuation header
    assert(bad(1)(mOff + 156) == 'M'.toByte)
    bad(1)(mOff + 370) = '9'.toByte
    assert(Containers.tarMultivolume(bad.toSeq) == null)
    // checksum damage in a continuation header
    val bad2 = vols.map(_.clone())
    bad2(1)(mOff + 4) = (bad2(1)(mOff + 4) ^ 0x21).toByte
    assert(Containers.tarMultivolume(bad2.toSeq) == null)
    // a lone first volume ends mid-member
    assert(Containers.tarMultivolume(Seq(vols(0))) == null)
    // non-block-multiple volume
    assert(Containers.tarMultivolume(
      Seq(java.util.Arrays.copyOf(vols(0), 2047))) == null)
  }

  test("live GNU tar -cM volume sets read back (gated)") {
    val tarBin = new java.io.File("/bin/tar")
    assume(tarBin.exists || new java.io.File("/usr/bin/tar").exists,
      "tar binary not present")
    // GNU refuses volumes below its record size (10 KiB), so the
    // live set uses a 30k payload split across -L 10 volumes
    val liveFiles = Seq(("big.bin", gen(30000, 84)),
      ("small.txt", gen(190, 85)))
    val dir = java.nio.file.Files.createTempDirectory("mvolr")
    try {
      for ((n, d) <- liveFiles)
        java.nio.file.Files.write(dir.resolve(n), d)
      val volFiles = (1 to 8).map(i => dir.resolve(s"v$i.tar").toString)
      val cmd = Seq("tar", "-cM", "-L", "10", "-C", dir.toString) ++
        volFiles.flatMap(v => Seq("-f", v)) ++ liveFiles.map(_._1)
      val p = new ProcessBuilder(cmd: _*).redirectErrorStream(true).start()
      assert(p.waitFor() == 0, new String(p.getInputStream.readAllBytes()))
      val vols = volFiles
        .map(v => java.nio.file.Paths.get(v))
        .filter(java.nio.file.Files.exists(_))
        .map(java.nio.file.Files.readAllBytes(_))
        .filter(_.nonEmpty)
      assert(vols.length >= 3, s"only ${vols.length} volumes")
      val got = Containers.tarMultivolume(vols.map(b => b: Array[Byte]))
      assert(got != null)
      val byName = got.toMap
      for ((n, d) <- liveFiles)
        assert(byName(n).toSeq == d.toSeq, n)
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  test("live GNU tar -xM extracts the synthesizer's volumes (gated)") {
    assume(new java.io.File("/bin/tar").exists ||
      new java.io.File("/usr/bin/tar").exists, "tar binary not present")
    val vols = Containers.synthTarMultivolume(files, 2048)
    val dir = java.nio.file.Files.createTempDirectory("mvolw")
    try {
      val volPaths = vols.zipWithIndex.map { case (v, i) =>
        val pth = dir.resolve(s"v$i.tar")
        java.nio.file.Files.write(pth, v)
        pth.toString
      }
      val outDir = dir.resolve("out")
      java.nio.file.Files.createDirectory(outDir)
      val cmd = Seq("tar", "-xM", "-C", outDir.toString) ++
        volPaths.flatMap(v => Seq("-f", v))
      val p = new ProcessBuilder(cmd: _*).redirectErrorStream(true).start()
      assert(p.waitFor() == 0, new String(p.getInputStream.readAllBytes()))
      for ((n, d) <- files) {
        val got = java.nio.file.Files.readAllBytes(outDir.resolve(n))
        assert(got.toSeq == d.toSeq, n)
      }
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }
}
