package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Ar, Containers, Multimodal}

/** `.deb` package-walk conformance. Live pins against the real
  * toolchain when present: dpkg-deb-built packages walk through
  * [[Multimodal.debPackages]]'s layers, our synthesized packages
  * extract through dpkg-deb, and binutils `ar` lists/extracts
  * [[Ar.synthAr]] archives.
  */
class DebSpec extends AnyFunSuite with SparkSpec {

  private def run(cmd: String*): (Int, String) = {
    val p = new ProcessBuilder(cmd: _*).redirectErrorStream(true).start()
    val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
    (p.waitFor(), out)
  }

  private def rmTree(dir: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
      .foreach(java.nio.file.Files.deleteIfExists(_))
  }

  test("dpkg-deb-built packages walk through every layer (gated)") {
    assume(new java.io.File("/usr/bin/dpkg-deb").exists, "no dpkg-deb")
    val dir = java.nio.file.Files.createTempDirectory("deb")
    try {
      val pkg = dir.resolve("pkgroot")
      java.nio.file.Files.createDirectories(pkg.resolve("DEBIAN"))
      java.nio.file.Files.createDirectories(pkg.resolve("usr/share/g"))
      java.nio.file.Files.writeString(pkg.resolve("DEBIAN/control"),
        "Package: graft-fixture\nVersion: 2.7.1\nArchitecture: all\n" +
        "Maintainer: fixture <f@x.test>\nDescription: fixture\n")
      val payload = Array.tabulate(300)(j => ((j * 37 + 5) % 256).toByte)
      java.nio.file.Files.write(pkg.resolve("usr/share/g/a.bin"), payload)
      // gzip for determinism across dpkg defaults (xz/zstd also walk)
      for (comp <- Seq("gzip", "xz")) {
        val out = dir.resolve(s"p-$comp.deb")
        val (rc, log) = run("dpkg-deb", s"-Z$comp", "-b", pkg.toString,
          out.toString)
        assert(rc == 0, log)
        val b = java.nio.file.Files.readAllBytes(out)
        import spark.implicits._
        val ds = Seq(Multimodal.MediaFile(1L, "package", b)).toDS()
        val got = Multimodal.debPackages(spark, ds).collect()
        assert(got.length == 1, comp)
        val r = got(0)
        assert(r.package_name == "graft-fixture", comp)
        assert(r.version == "2.7.1", comp)
        assert(r.n_files == 1 && r.data_bytes == 300, comp)
        assert(r.byte_sum == payload.map(_ & 0xFF).map(_.toLong).sum, comp)
      }
    } finally rmTree(dir)
  }

  test("our synthesized .deb extracts through dpkg-deb (gated)") {
    assume(new java.io.File("/usr/bin/dpkg-deb").exists, "no dpkg-deb")
    import spark.implicits._
    val docs = Seq(0L, 1L, 2L, 3L).toDF("doc_id") // all 4 compressors
    val corpus = Multimodal.demoDebCorpus(spark, docs).collect()
    val dir = java.nio.file.Files.createTempDirectory("debx")
    try for (mf <- corpus) {
      val f = dir.resolve(s"p${mf.media_id}.deb")
      java.nio.file.Files.write(f, mf.content)
      val (rc, info) = run("dpkg-deb", "-I", f.toString)
      assert(rc == 0, s"id=${mf.media_id}: $info")
      assert(info.contains(s"Package: pkg-${mf.media_id % 20}"))
      val ex = dir.resolve(s"x${mf.media_id}")
      java.nio.file.Files.createDirectory(ex)
      val (rc2, log2) = run("dpkg-deb", "-x", f.toString, ex.toString)
      assert(rc2 == 0, s"id=${mf.media_id}: $log2")
      val f0 = ex.resolve("usr/share/pkg/0000.bin")
      val want = Array.tabulate((20 + mf.media_id % 16).toInt)(j =>
        ((mf.media_id * 19 + j * 11) % 256).toByte)
      assert(java.nio.file.Files.readAllBytes(f0).toSeq == want.toSeq,
        s"id=${mf.media_id}")
    } finally rmTree(dir)
  }

  test("binutils ar lists and extracts synthAr output (gated)") {
    assume(new java.io.File("/usr/bin/ar").exists, "no ar")
    val files = Seq(
      ("short.bin", Array.tabulate(40)(j => (j * 7).toByte)),
      ("a-name-longer-than-sixteen-chars.bin",
        Array.tabulate(33)(j => (j * 13 + 1).toByte)))
    val dir = java.nio.file.Files.createTempDirectory("arx")
    try for (style <- Seq("gnu", "bsd")) {
      val f = dir.resolve(s"t-$style.a")
      java.nio.file.Files.write(f, Ar.synthAr(files, style))
      val (rc, listing) = run("ar", "t", f.toString)
      assert(rc == 0, s"$style: $listing")
      for ((n, _) <- files) assert(listing.contains(n), s"$style/$n")
      for ((n, d) <- files) {
        val p = new ProcessBuilder("ar", "p", f.toString, n).start()
        val got = p.getInputStream.readAllBytes()
        assert(p.waitFor() == 0 && got.toSeq == d.toSeq, s"$style/$n")
      }
    } finally rmTree(dir)
  }

  test("structural: bad packages degrade to the sentinel row") {
    import spark.implicits._
    // an ar that is not a deb (no debian-binary lead)
    val notDeb = Ar.synthAr(Seq(("x.bin", Array[Byte](1, 2, 3))), "gnu")
    // a deb whose data.tar is damaged mid-gzip
    val docs = Seq(0L).toDF("doc_id")
    val good = Multimodal.demoDebCorpus(spark, docs).collect()(0).content
    val bad = good.clone()
    val at = bad.length - 40
    bad(at) = (bad(at) ^ 0x3C).toByte
    val ds = Seq(
      Multimodal.MediaFile(1L, "package", notDeb),
      Multimodal.MediaFile(2L, "package", bad)).toDS()
    val got = Multimodal.debPackages(spark, ds).collect()
      .sortBy(_.deb_id)
    assert(got(0).n_files == -1)
    // the flip lands in the gzip stream or the ar padding; either a
    // sentinel (layer failed) or intact sums (padding) is honest —
    // but it must never half-read
    assert(got(1).n_files == -1 || got(1).byte_sum >= 0)
  }
}
