package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.SevenZip
import org.apache.commons.compress.archivers.sevenz.{SevenZFile, SevenZMethod, SevenZMethodConfiguration, SevenZOutputFile}
import org.apache.commons.compress.utils.SeekableInMemoryByteChannel

/** 7z conformance, pinned BOTH directions against the independent
  * commons-compress implementation on the Spark classpath: its archives
  * (LZMA2/Copy/Deflate/BZip2 and a Delta→LZMA2 chain) read back here
  * byte-exactly, and [[SevenZip.synth7z]]'s four variants read through
  * SevenZFile. Plus forensic classes and damage degradation.
  */
class SevenZipSpec extends AnyFunSuite {

  private val files: Seq[(String, Array[Byte])] = Seq(
    "a.txt" -> "the first file body, short".getBytes("UTF-8"),
    "dir/b.bin" -> Array.tabulate(3000)(i => ((i * 37 + 11) % 256).toByte),
    "empty.txt" -> Array.emptyByteArray,
    "c.dat" -> Array.tabulate(600)(i => ((i * i + 3) % 251).toByte))

  private def ccRead(bytes: Array[Byte]): Seq[(String, Array[Byte])] = {
    val f = SevenZFile.builder()
      .setSeekableByteChannel(new SeekableInMemoryByteChannel(bytes)).get()
    try {
      Iterator.continually(f.getNextEntry).takeWhile(_ != null).map { e =>
        val buf = new Array[Byte](e.getSize.toInt)
        var off = 0
        while (off < buf.length) {
          val n = f.read(buf, off, buf.length - off)
          if (n <= 0) sys.error("short read")
          off += n
        }
        e.getName -> buf
      }.toList
    } finally f.close()
  }

  private def ccWrite(entries: Seq[(String, Array[Byte])],
      methods: Seq[SevenZMethodConfiguration]): Array[Byte] = {
    val ch = new SeekableInMemoryByteChannel()
    val out = new SevenZOutputFile(ch)
    import scala.jdk.CollectionConverters._
    if (methods.nonEmpty) out.setContentMethods(methods.asJava)
    entries.foreach { case (name, data) =>
      val e = out.createArchiveEntry(
        java.nio.file.Files.createTempFile("sz", ".bin").toFile, name)
      out.putArchiveEntry(e)
      out.write(data)
      out.closeArchiveEntry()
    }
    out.finish(); out.close()
    java.util.Arrays.copyOf(ch.array(), ch.size().toInt)
  }

  test("synth7z variants read through commons-compress (write pin)") {
    for (variant <- Seq("copy", "lzma2", "solid", "encoded_header")) {
      val bytes = SevenZip.synth7z(files, variant)
      val got = ccRead(bytes)
      // commons-compress surfaces empty FILES too (kEmptyFile set)
      assert(got.map(_._1) == files.map(_._1), s"$variant names")
      got.zip(files).foreach { case ((_, g), (n, w)) =>
        assert(g.toSeq == w.toSeq, s"$variant content of $n")
      }
    }
  }

  test("commons-compress archives read back here (read pin), all codecs") {
    val nonEmpty = files.filter(_._2.nonEmpty)
    val cases: Seq[(String, Seq[SevenZMethodConfiguration])] = Seq(
      "lzma2" -> Seq(new SevenZMethodConfiguration(SevenZMethod.LZMA2)),
      "copy" -> Seq(new SevenZMethodConfiguration(SevenZMethod.COPY)),
      "deflate" -> Seq(new SevenZMethodConfiguration(SevenZMethod.DEFLATE)),
      "bzip2" -> Seq(new SevenZMethodConfiguration(SevenZMethod.BZIP2)),
      "lzma1" -> Seq(new SevenZMethodConfiguration(SevenZMethod.LZMA)),
      "delta+lzma2" -> Seq(
        new SevenZMethodConfiguration(SevenZMethod.DELTA_FILTER, Integer.valueOf(3)),
        new SevenZMethodConfiguration(SevenZMethod.LZMA2)))
    cases.foreach { case (label, methods) =>
      val bytes = ccWrite(nonEmpty, methods)
      val got = SevenZip.members(bytes)
      assert(got != null, s"$label decode")
      val byName = got.map(e => e.name -> e.data).toMap
      nonEmpty.foreach { case (n, w) =>
        assert(byName.contains(n), s"$label missing $n")
        assert(byName(n).toSeq == w.toSeq, s"$label content of $n")
      }
    }
  }

  test("our members() reads our synth7z exactly, empties and dirs included") {
    for (variant <- Seq("copy", "lzma2", "solid", "encoded_header")) {
      val got = SevenZip.members(SevenZip.synth7z(files, variant))
      assert(got != null, variant)
      assert(got.map(_.name).toSeq == files.map(_._1), s"$variant names")
      got.zip(files).foreach { case (e, (n, w)) =>
        assert(e.data.toSeq == w.toSeq, s"$variant content of $n")
        assert(!e.isDir)
      }
    }
  }

  test("forensic classes: encrypted, corrupt, unsupported codec, not_7z") {
    assert(SevenZip.decodeClass(SevenZip.synthEncrypted7z()) == "encrypted")
    assert(SevenZip.isEncrypted(SevenZip.synthEncrypted7z()))
    assert(SevenZip.decodeClass("garbage".getBytes("UTF-8")) == "not_7z")
    // flip a payload byte: folder CRC must catch it
    val good = SevenZip.synth7z(files, "lzma2")
    val bad = good.clone()
    bad(40) = (bad(40) ^ 0x5A).toByte
    assert(SevenZip.decodeClass(bad) == "corrupt")
    assert(SevenZip.members(bad) == null)
    // BCJ x86 chain from commons-compress: a NAMED gap, not damage
    val bcj = ccWrite(files.filter(_._2.nonEmpty), Seq(
      new SevenZMethodConfiguration(SevenZMethod.BCJ_X86_FILTER),
      new SevenZMethodConfiguration(SevenZMethod.LZMA2)))
    assert(SevenZip.decodeClass(bcj) == "unsupported_profile")
  }

  test("damage never throws: truncations and byte flips degrade") {
    val base = SevenZip.synth7z(files, "solid")
    (1 until base.length by 53).foreach { cut =>
      SevenZip.members(java.util.Arrays.copyOfRange(base, 0, cut))
    }
    val rnd = new scala.util.Random(11)
    (0 until 300).foreach { _ =>
      val mut = base.clone()
      mut(rnd.nextInt(mut.length)) = rnd.nextInt(256).toByte
      SevenZip.members(mut) // must not throw
    }
  }
}
