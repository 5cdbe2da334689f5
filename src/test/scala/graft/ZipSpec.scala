package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Multimodal, Zip}

/** ZIP walk conformance. Unlike tar, the JDK SHIPS a zip
  * implementation, so this is interop-pinned both directions:
  * `java.util.zip.ZipOutputStream` output must read back through our
  * walk, and our synthesizer's output must read back through
  * `java.util.zip.ZipInputStream` — plus the usual
  * corruption-degrades / bomb-cap / profile-gap checks.
  */
class ZipSpec extends AnyFunSuite {

  private def gen(n: Int, seed: Int): Array[Byte] =
    Array.tabulate(n)(j => ((seed * 13 + j * 37) % 256).toByte)

  test("jdk-written archives read back through the walk") {
    val bos = new java.io.ByteArrayOutputStream()
    val zos = new java.util.zip.ZipOutputStream(bos)
    // a directory entry, a deflated file, and a stored file
    zos.putNextEntry(new java.util.zip.ZipEntry("d/"))
    zos.closeEntry()
    zos.putNextEntry(new java.util.zip.ZipEntry("d/a.txt"))
    zos.write(gen(300, 5)); zos.closeEntry()
    val stored = new java.util.zip.ZipEntry("b.bin")
    stored.setMethod(java.util.zip.ZipOutputStream.STORED)
    stored.setSize(40)
    val crc = new java.util.zip.CRC32(); crc.update(gen(40, 7))
    stored.setCrc(crc.getValue)
    zos.putNextEntry(stored)
    zos.write(gen(40, 7)); zos.closeEntry()
    zos.close()
    val b = bos.toByteArray
    assert(Zip.isZip(b))
    val m = Zip.members(b)
    assert(m != null && m.length == 2) // the directory entry is skipped
    assert(m.map(_._1).toSeq == Seq("d/a.txt", "b.bin"))
    assert(m(0)._2.toSeq == gen(300, 5).toSeq)
    assert(m(1)._2.toSeq == gen(40, 7).toSeq)
  }

  test("synthesized archives read back through the jdk") {
    val z = Zip.synthZip(Seq(
      ("x/", Array.empty[Byte], false),
      ("x/0001.txt", gen(200, 9), true),
      ("x/0001.cls", gen(1, 11), false)))
    val zis = new java.util.zip.ZipInputStream(
      new java.io.ByteArrayInputStream(z))
    var names = List.empty[String]
    var bytes = List.empty[Seq[Byte]]
    var e = zis.getNextEntry
    while (e != null) {
      names ::= e.getName
      bytes ::= zis.readAllBytes().toSeq
      e = zis.getNextEntry
    }
    zis.close()
    assert(names.reverse == List("x/", "x/0001.txt", "x/0001.cls"))
    assert(bytes.reverse(1) == gen(200, 9).toSeq)
    assert(bytes.reverse(2) == gen(1, 11).toSeq)
    // and through our own walk
    assert(Zip.members(z).map(_._1).toSeq == Seq("x/0001.txt", "x/0001.cls"))
    // trailing archive comment: tolerated when the EOCD's comment
    // length is consistent, rejected when bytes dangle unexplained
    val commented = z ++ "hi".getBytes("US-ASCII")
    commented(z.length - 2) = 2 // EOCD comment-length field
    assert(Zip.members(commented).map(_._1).toSeq ==
      Seq("x/0001.txt", "x/0001.cls"))
    assert(Zip.members(z ++ Array[Byte](0, 0)) == null)
  }

  test("corruption degrades to null, never half-reads") {
    val z = Zip.synthZip(Seq(("a.txt", gen(120, 3), true),
      ("b.txt", gen(60, 4), false)))
    assert(Zip.members(z) != null)
    // flip bytes through the deflate stream, the stored data, the
    // central directory, and the EOCD: every flip must be caught
    // (CRC-32, signature, or structural check), and a shard with ANY
    // bad member yields null, not the good half
    for (i <- Seq(35, 40, z.length - 30, z.length - 10, z.length / 2))
      {
        val bad = z.clone()
        bad(i) = (bad(i) ^ 0x2A).toByte
        val got = Zip.members(bad)
        assert(got == null ||
          (got.length == 2 && got(0)._2.toSeq == gen(120, 3).toSeq &&
            got(1)._2.toSeq == gen(60, 4).toSeq),
          s"flip at $i half-read or mis-read")
      }
    // truncation: mid-member, mid-central-directory, mid-EOCD
    for (cut <- Seq(10, z.length / 2, z.length - 4))
      assert(Zip.members(java.util.Arrays.copyOf(z, cut)) == null, s"cut=$cut")
    assert(Zip.members(gen(64, 6)) == null)
  }

  test("profile gaps are named, not misread") {
    // an unsupported compression method (PPMd = 98 — every other
    // PKZIP method decodes now): hand-patch the method field in both
    // the local header and the central directory
    val z = Zip.synthZip(Seq(("a.bin", gen(50, 8), false)))
    def leU16(b: Array[Byte], i: Int): Int = (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8)
    // local header method at offset 8; central entry method at cd+10
    z(8) = 98
    var cd = -1
    for (i <- 0 until z.length - 4)
      if (z(i) == 'P' && z(i + 1) == 'K' && z(i + 2) == 1 && z(i + 3) == 2) cd = i
    z(cd + 10) = 98
    assert(Zip.members(z) == null)
    assert(Zip.unsupportedMethod(z))
    assert(!Zip.isZip64(z))
    assert(leU16(z, cd + 28) == 5) // sanity: name length intact
  }

  test("DCL implode decodes the public blast golden vector") {
    // the example stream Mark Adler ships with zlib's blast: coded
    // literals, 1K dictionary, decodes to "AIAIAIAIAIAIA"
    val v = Array[Byte](0x00, 0x04, 0x82.toByte, 0x24, 0x25, 0x8f.toByte,
      0x80.toByte, 0x7f)
    val got = Zip.dclDecodeForTest(v, 13)
    assert(got != null && new String(got, "US-ASCII") == "AIAIAIAIAIAIA")
    // round-trips across dictionary sizes and shapes, end marker
    // included
    val shapes = Seq(
      ("dcl imploded member block " * 300).getBytes("US-ASCII"),
      gen(5000, 55), gen(2, 56), Array.emptyByteArray)
    for (d <- shapes; dictLog <- 4 to 6) {
      val enc = Zip.dclEncodeForTest(d, dictLog)
      val dec = Zip.dclDecodeForTest(enc, d.length)
      assert(dec != null && dec.toSeq == d.toSeq, s"dictLog=$dictLog")
    }
    // malformed headers and truncations degrade
    assert(Zip.dclDecodeForTest(Array[Byte](2, 4, 0), 4) == null)
    assert(Zip.dclDecodeForTest(Array[Byte](0, 7, 0), 4) == null)
    assert(Zip.dclDecodeForTest(v.take(5), 13) == null)
  }

  test("REDUCE hand vectors pin the APPNOTE semantics") {
    // factor 4 (method 5), all follower sets empty: 256 six-bit
    // zeros = 192 zero bytes, then the intermediate stream as plain
    // LSB-first bytes. "AB" + DLE escape (V=0x07: Len=7 -> copy 10,
    // dist = low byte 1 + 1 = 2) must expand to AB repeated 6x.
    val empty = Array.fill(192)(0.toByte)
    val v1 = empty ++ Array[Byte](65, 66, 144.toByte, 7, 1)
    assert(Zip.reduceDecodeForTest(v1, 12, 4) != null)
    assert(new String(Zip.reduceDecodeForTest(v1, 12, 4), "US-ASCII") ==
      "ABABABABABAB")
    // DLE,0 is a literal DLE
    val v2 = empty ++ Array[Byte](144.toByte, 0, 65)
    assert(Zip.reduceDecodeForTest(v2, 2, 4).toSeq ==
      Seq(144.toByte, 65.toByte))
    // a pre-window reach reads zeros (the zero-initialized window
    // every historical unreducer shares): dist 257 via V=0x10,C=0
    val v3 = empty ++ Array[Byte](144.toByte, 0x10, 0)
    assert(Zip.reduceDecodeForTest(v3, 3, 4).toSeq ==
      Seq[Byte](0, 0, 0).toSeq)
    // follower sets drive the probabilistic stage: S(0)={65} (the
    // initial last-char is 0), S(65) empty, S(66)={65,66} — decode
    // flag0+idx0 -> A, raw B, flag0+idx0 -> A
    val bits = new scala.collection.mutable.ArrayBuffer[Int]
    def put(v: Int, k: Int): Unit = for (b <- 0 until k) bits += ((v >> b) & 1)
    for (j <- 255 to 0 by -1) j match {
      case 66 => put(2, 6); put(65, 8); put(66, 8)
      case 0 => put(1, 6); put(65, 8)
      case _ => put(0, 6)
    }
    put(0, 1); put(0, 1) // flag 0, B(1)=1-bit index 0 -> 'A'
    put(66, 8) // raw under empty S(65)
    put(0, 1); put(0, 1) // flag 0, B(2)=1-bit index 0 -> 'A'
    val packed = bits.grouped(8).map(g =>
      g.zipWithIndex.map { case (b, i) => b << i }.sum.toByte).toArray
    assert(new String(Zip.reduceDecodeForTest(packed, 3, 1), "US-ASCII") ==
      "ABA")
    // malformed streams degrade: follower-set size > 32, truncation
    val over = Array.fill(200)(0xFF.toByte)
    assert(Zip.reduceDecodeForTest(over, 4, 1) == null)
    assert(Zip.reduceDecodeForTest(empty, 4, 2) == null)
  }

  test("REDUCE round-trips across all four factors and shapes") {
    val shapes = Seq(
      "repetitive: " + ("the reduced shard block " * 200), // > mask matches
      new String(Array.tabulate(5000)(i => (32 + (i * 17) % 95).toChar)),
      "short", "")
    val withDle = gen(3000, 61) // gen hits 144 bytes too
    for (factor <- 1 to 4) {
      for (s <- shapes) {
        val data = s.getBytes("US-ASCII")
        val enc = Zip.reduceEncode(data, factor)
        val dec = Zip.reduceDecodeForTest(enc, data.length, factor)
        assert(dec != null && dec.toSeq == data.toSeq, s"factor=$factor")
      }
      val enc = Zip.reduceEncode(withDle, factor)
      val dec = Zip.reduceDecodeForTest(enc, withDle.length, factor)
      assert(dec != null && dec.toSeq == withDle.toSeq, s"factor=$factor dle")
      // beyond-window data: matches must respect the factor's window
      val far = gen(300, 62) ++ new Array[Byte](256 << factor) ++ gen(300, 62)
      val encF = Zip.reduceEncode(far, factor)
      val decF = Zip.reduceDecodeForTest(encF, far.length, factor)
      assert(decF != null && decF.toSeq == far.toSeq, s"factor=$factor far")
    }
    // all-identical run: overlapping dist-1 copies + extra length byte
    val run = Array.fill(10000)(7.toByte)
    for (factor <- Seq(1, 4)) {
      val enc = Zip.reduceEncode(run, factor)
      assert(enc.length < 600, s"run under-compressed: ${enc.length}")
      assert(Zip.reduceDecodeForTest(enc, run.length, factor).toSeq ==
        run.toSeq)
    }
  }

  test("codec-matrix methods (shrink/bzip2/lzma/zstd/xz) decode and cross-read") {
    val repetitive = ("the quick brown shard " * 40).getBytes("US-ASCII")
    val files = Seq(
      ("s.bin", gen(70, 41), 0),
      ("d.bin", gen(500, 42), 8),
      ("b.bin", gen(800, 43), 12),
      ("l.bin", gen(900, 46), 14),
      ("z.bin", gen(650, 44), 93),
      ("x.bin", gen(720, 45), 95),
      ("l0.bin", Array.emptyByteArray, 14), // zero-size LZMA member
      ("k.bin", repetitive, 1), // SHRINK: dictionary hits + KwKwK
      // random bytes add ~1 LZW entry each: 10k forces width escapes
      // up to 13 bits; full-table partial clears are pinned below
      ("kw.bin", gen(10000, 47), 1),
      // IMPLODE: odd length = 2-tree raw literals; even = 3-tree
      // coded literals; >4096 selects the 8K dictionary (short
      // distances here; true beyond-4K matches are pinned below)
      ("i2.bin", gen(701, 49), 6),
      ("i3.bin", gen(900, 50), 6),
      ("i8.bin", (("imploded shard block " * 300).getBytes("US-ASCII")
        ++ gen(101, 51)), 6),
      // REDUCE factors 1-4: repetitive (DLE escapes + follower hits)
      // and incompressible (escape-heavy) shapes
      ("r1.bin", ("reduced member " * 60).getBytes("US-ASCII"), 2),
      ("r2.bin", gen(640, 53), 3),
      ("r3.bin", ("follow the set " * 90).getBytes("US-ASCII"), 4),
      ("r4.bin", gen(777, 54), 5),
      ("d10.bin", ("dcl member " * 70).getBytes("US-ASCII"), 10))
    val z = Zip.synthZipMethods(files)
    // our walk decodes every method, CRC-verified
    val m = Zip.members(z)
    assert(m != null && m.length == 17)
    for (((name, data, _), i) <- files.zipWithIndex) {
      assert(m(i)._1 == name)
      assert(m(i)._2.toSeq == data.toSeq, name)
    }
    assert(!Zip.unsupportedMethod(z))
    assert(Multimodal.mediaDecodeClass(z) == ("zip", "ok"))
    // the independent commons-compress reader agrees on every member
    // it can read — it REFUSES method 14 outright
    // (UnsupportedZipFeatureException) and has no unreducer for 2-5,
    // so for LZMA the pin is the write side alone (xz-java produced
    // the raw stream our decoder just read) and for REDUCE it is the
    // APPNOTE hand vectors below. Our walk exceeds the bundled
    // reader on both.
    val ch = new org.apache.commons.compress.utils
      .SeekableInMemoryByteChannel(z)
    val zf = org.apache.commons.compress.archivers.zip.ZipFile.builder()
      .setSeekableByteChannel(ch).get()
    try {
      for ((name, data, method) <- files) {
        val e = zf.getEntry(name)
        assert(e != null, name)
        if (method == 14 || method == 10 || (method >= 2 && method <= 5))
          assert(!zf.canReadEntryData(e), name)
        else {
          assert(zf.canReadEntryData(e), name)
          assert(zf.getInputStream(e).readAllBytes().toSeq == data.toSeq,
            name)
        }
      }
    } finally zf.close()
    // damage inside a bzip2 member quarantines the shard (CRC nets)
    val bad = z.clone()
    val dataStart = z.indexOfSlice("b.bin".getBytes("US-ASCII")) + 5
    bad(dataStart + 20) = (bad(dataStart + 20) ^ 0x33).toByte
    assert(Zip.members(bad) == null)
    // 8K-dict LARGE distances + the bigDict/threeTrees combination:
    // block A (alphabet 128-255) recurs after 5 KB of alphabet-
    // disjoint filler (0-127), so its pairs match only at distance
    // 5217 — beyond the 4K window — and the EVEN total length
    // selects the literal tree alongside the 8K dictionary
    val blockA = Array.tabulate(217)(i => (128 + (i * 73) % 128).toByte)
    val farFill = Array.tabulate(5000)(i => ((i * 31) % 128).toByte)
    val far = blockA ++ farFill ++ blockA
    assert(far.length % 2 == 0 && far.length > 4096)
    val zFar = Zip.synthZipMethods(Seq(("far.bin", far, 6)))
    val mFar = Zip.members(zFar)
    assert(mFar != null && mFar(0)._2.toSeq == far.toSeq)
    val chf = new org.apache.commons.compress.utils
      .SeekableInMemoryByteChannel(zFar)
    val zff = org.apache.commons.compress.archivers.zip.ZipFile.builder()
      .setSeekableByteChannel(chf).get()
    try {
      val e = zff.getEntry("far.bin")
      assert(e != null && zff.canReadEntryData(e))
      assert(zff.getInputStream(e).readAllBytes().toSeq == far.toSeq)
    } finally zff.close()
    // traditionally-ENCRYPTED members (gp bit 0) are a NAMED gap,
    // not damage: flag an entry encrypted in both headers
    val enc = Zip.synthZip(Seq(("e.bin", gen(40, 52), false)))
    enc(6) = 1 // local header flags live at offset 6
    var ecd = -1
    for (i <- 0 until enc.length - 4)
      if (enc(i) == 'P' && enc(i + 1) == 'K' && enc(i + 2) == 1 &&
          enc(i + 3) == 2) ecd = i
    enc(ecd + 8) = 1
    assert(Zip.members(enc) == null)
    assert(Zip.unsupportedMethod(enc))
    assert(Multimodal.mediaDecodeClass(enc) == ("zip", "unsupported_profile"))
    // LZMA1 props: the full lc<=8, lp<=4 range is LEGAL for method 14
    // (the lc+lp<=4 limit is LZMA2-only) — 7-Zip writes e.g. lc=4 —
    // so tuned props must not classify as damage. xz-java can't
    // WRITE lc+lp>4, so pin acceptance at the props layer: a
    // zero-size member decodes under any in-range byte, and an
    // out-of-range byte (>= 225) still rejects
    val rc5 = Array[Byte](0, 0, 0, 0, 0)
    for (props <- Seq((0 * 5 + 2) * 9 + 4, (0 * 5 + 4) * 9 + 8))
      assert(graft.operators.Xz.decodeLzma1(rc5, 0, 5, props, 0) != null,
        s"props=$props")
    assert(graft.operators.Xz.decodeLzma1(rc5, 0, 5, 225, 0) == null)
    // SHRINK with a full 13-bit table: the partial-clear escape is in
    // the stream, and the independent commons-compress unshrinker
    // agrees byte-for-byte across it
    val big = gen(40000, 48)
    val zb = Zip.synthZipMethods(Seq(("big.bin", big, 1)))
    val mb = Zip.members(zb)
    assert(mb != null && mb(0)._2.toSeq == big.toSeq)
    val chb = new org.apache.commons.compress.utils
      .SeekableInMemoryByteChannel(zb)
    val zfb = org.apache.commons.compress.archivers.zip.ZipFile.builder()
      .setSeekableByteChannel(chb).get()
    try {
      val e = zfb.getEntry("big.bin")
      assert(e != null && zfb.canReadEntryData(e))
      assert(zfb.getInputStream(e).readAllBytes().toSeq == big.toSeq)
    } finally zfb.close()
  }

  test("empty members decode (the JDK writes them as real DEFLATE)") {
    // JDK ZipOutputStream emits empty entries as method 8 with a
    // 2-byte empty-block stream — a valid shard shape that must NOT
    // quarantine
    val bos = new java.io.ByteArrayOutputStream()
    val zos = new java.util.zip.ZipOutputStream(bos)
    zos.putNextEntry(new java.util.zip.ZipEntry("empty.cls")); zos.closeEntry()
    zos.putNextEntry(new java.util.zip.ZipEntry("full.txt"))
    zos.write(gen(30, 12)); zos.closeEntry()
    zos.close()
    val m = Zip.members(bos.toByteArray)
    assert(m != null && m.length == 2)
    assert(m(0)._1 == "empty.cls" && m(0)._2.isEmpty)
    assert(m(1)._2.toSeq == gen(30, 12).toSeq)
  }

  test("EOCD-level zip64 sentinels classify as profile gap, not corrupt") {
    val z = Zip.synthZip(Seq(("a.txt", gen(50, 13), true)))
    // forge the EOCD's total-entry-count to the 0xFFFF sentinel (both
    // count fields, to keep the multi-disk consistency check green)
    val eocd = z.length - 22
    z(eocd + 8) = 0xFF.toByte; z(eocd + 9) = 0xFF.toByte
    z(eocd + 10) = 0xFF.toByte; z(eocd + 11) = 0xFF.toByte
    assert(Zip.members(z) == null)
    assert(Zip.isZip64(z)) // named gap — "ship zip64", not "fix the shard"
  }

  test("expansion bomb caps instead of OOMing") {
    // forge the sizes: a member CLAIMING > 2^30 expanded bytes is
    // rejected before allocation (members() budget check)
    val big = Zip.synthZip(Seq(("a.txt", gen(100, 2), true)))
    var cd = -1
    for (i <- 0 until big.length - 4)
      if (big(i) == 'P' && big(i + 1) == 'K' && big(i + 2) == 1 && big(i + 3) == 2) cd = i
    // central usize at cd+24 → 2 GiB
    big(cd + 24) = 0; big(cd + 25) = 0; big(cd + 26) = 0; big(cd + 27) = 0x80.toByte
    assert(Zip.members(big) == null)
  }
  test("zip64: sentinel fields resolve through the 0x0001 extra and ZIP64 EOCD") {
    val files = Seq(
      ("a.txt", Array.tabulate(40)(i => (i * 3).toByte), true),
      ("dir/b.bin", Array.tabulate(9)(i => (i * 11 + 1).toByte), false),
      ("empty.txt", Array.emptyByteArray, true))
    val z = Zip.synthZip(files, forceZip64 = true)
    assert(Zip.isZip64(z))
    val got = Zip.members(z)
    assert(got != null && got.length == 3)
    for (((name, data, _), k) <- files.zipWithIndex) {
      assert(got(k)._1 == name)
      assert(got(k)._2.toSeq == data.toSeq)
    }
    // the JDK's independent reader accepts the same ZIP64 structures
    val tmp = java.io.File.createTempFile("graft-z64", ".zip")
    try {
      java.nio.file.Files.write(tmp.toPath, z)
      val zf = new java.util.zip.ZipFile(tmp)
      try {
        assert(zf.size() == 3)
        for ((name, data, _) <- files) {
          val e = zf.getEntry(name)
          assert(e != null, name)
          assert(zf.getInputStream(e).readAllBytes().toSeq == data.toSeq)
        }
      } finally zf.close()
    } finally tmp.delete()
    // classification: zip64 now DECODES (it is not a profile gap)
    assert(Multimodal.mediaDecodeClass(z) == ("zip", "ok"))
    // damage inside a zip64 member is corrupt, exactly like zip32
    val bad = z.clone()
    val dataStart = 30 + "a.txt".length + 20 // local hdr + name + z64 extra
    bad(dataStart + 2) = (bad(dataStart + 2) ^ 0x2C).toByte
    assert(Zip.members(bad) == null)
    assert(Multimodal.mediaDecodeClass(bad) == ("zip", "corrupt"))
    // a sentinel entry WITHOUT its 0x0001 extra is malformed, not read
    // as a 4 GiB member: truncate the locator so resolution must fail
    val noLoc = z.clone()
    noLoc(noLoc.length - 42) = 'X'.toByte // ZIP64 EOCD record signature
    assert(Zip.members(noLoc) == null)
  }

}
