package graft.operators

/** From-scratch RPM package walk — the other Linux package format
  * distribution drops ship in, composing the already-pinned layers:
  * the 96-byte LEAD (magic `ED AB EE DB`), the SIGNATURE header
  * (rpm header structure, padded to 8), the MAIN header whose index
  * entries carry provenance tags (NAME 1000, VERSION 1001, RELEASE
  * 1002, ARCH 1022, PAYLOADFORMAT 1124, PAYLOADCOMPRESSOR 1125),
  * then the payload: a compressed newc cpio archive, decompressed BY
  * MAGIC (gzip/xz/zstd — the crawl path's sniff, so the declared
  * compressor can lie) into [[Cpio]]. Format reference: the
  * published rpm.org file-format documentation. Null on damage.
  */
object Rpm {

  final case class RpmInfo(name: String, version: String, release: String,
      arch: String, members: Array[(String, Array[Byte])])

  def isRpm(b: Array[Byte]): Boolean =
    b != null && b.length >= 96 && (b(0) & 0xFF) == 0xED &&
      (b(1) & 0xFF) == 0xAB && (b(2) & 0xFF) == 0xEE && (b(3) & 0xFF) == 0xDB

  private def beU32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xFFL) << 24) | ((b(i + 1) & 0xFFL) << 16) |
      ((b(i + 2) & 0xFFL) << 8) | (b(i + 3) & 0xFFL)

  /** Parse one rpm header structure at `off`; returns (tag →
    * (type, dataOff, count), endOffset) or null.
    */
  private def header(b: Array[Byte], off: Int):
      (Map[Long, (Long, Int, Long)], Int) = {
    if (off + 16 > b.length) return null
    if ((b(off) & 0xFF) != 0x8E || (b(off + 1) & 0xFF) != 0xAD ||
        (b(off + 2) & 0xFF) != 0xE8 || (b(off + 3) & 0xFF) != 0x01)
      return null
    val nIndex = beU32(b, off + 8)
    val hSize = beU32(b, off + 12)
    if (nIndex < 0 || nIndex > 65536 || hSize < 0) return null
    val store = off + 16 + nIndex.toInt * 16
    if (store + hSize > b.length) return null
    var m = Map.empty[Long, (Long, Int, Long)]
    var i = 0
    while (i < nIndex) {
      val e = off + 16 + i * 16
      val tag = beU32(b, e)
      val tpe = beU32(b, e + 4)
      val dOff = beU32(b, e + 8)
      val cnt = beU32(b, e + 12)
      if (dOff < 0 || dOff > hSize) return null
      m += (tag -> ((tpe, (store + dOff).toInt, cnt)))
      i += 1
    }
    (m, (store + hSize).toInt)
  }

  private def cString(b: Array[Byte], off: Int): String = {
    var e = off
    while (e < b.length && b(e) != 0) e += 1
    new String(b, off, e - off, java.nio.charset.StandardCharsets.UTF_8)
  }

  /** Walk one package; null on damage at any layer. */
  def read(b: Array[Byte]): RpmInfo = try {
    if (!isRpm(b)) return null
    // lead: fixed 96 bytes; signature header follows, padded to 8
    val sig = header(b, 96)
    if (sig == null) return null
    val mainOff = (sig._2 + 7) / 8 * 8
    val main = header(b, mainOff)
    if (main == null) return null
    val (tags, payloadOff) = main
    def strTag(tag: Long): String = tags.get(tag) match {
      case Some((tpe, o, _)) if tpe == 6 || tpe == 9 => cString(b, o)
      case _ => ""
    }
    val name = strTag(1000)
    val version = strTag(1001)
    if (name.isEmpty || version.isEmpty) return null
    val payload = java.util.Arrays.copyOfRange(b, payloadOff, b.length)
    val plain = Containers.crawlInflate(payload)
    if (plain == null) return null
    val members = Cpio.members(plain)
    if (members == null) return null
    RpmInfo(name, version, strTag(1002), strTag(1022), members)
  } catch {
    case _: IndexOutOfBoundsException => null
    case _: IllegalArgumentException => null
  }

  /** A real minimal package: lead, an empty-but-valid signature
    * header, a main header with the provenance tags, and a newc cpio
    * payload under `compressor` ("gzip"/"xz"/"zstd").
    */
  def synthRpm(name: String, version: String, release: String, arch: String,
      files: Seq[(String, Array[Byte])],
      compressor: String = "gzip"): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def w32(v: Long): Unit = {
      out.write(((v >> 24) & 0xFF).toInt); out.write(((v >> 16) & 0xFF).toInt)
      out.write(((v >> 8) & 0xFF).toInt); out.write((v & 0xFF).toInt)
    }
    // lead
    out.write(0xED); out.write(0xAB); out.write(0xEE); out.write(0xDB)
    out.write(3); out.write(0) // version 3.0
    out.write(0); out.write(0) // type binary
    out.write(0); out.write(1) // archnum
    val nb = s"$name-$version-$release".getBytes(
      java.nio.charset.StandardCharsets.UTF_8)
    val nameField = new Array[Byte](66)
    System.arraycopy(nb, 0, nameField, 0, math.min(nb.length, 65))
    out.write(nameField, 0, 66)
    out.write(0); out.write(1) // osnum
    out.write(0); out.write(5) // signature type: header-style
    out.write(new Array[Byte](16), 0, 16)
    // one rpm header structure from (tag, type, bytes NUL-terminated?)
    def headerBytes(entries: Seq[(Long, Long, Array[Byte])]): Array[Byte] = {
      val h = new java.io.ByteArrayOutputStream()
      val store = new java.io.ByteArrayOutputStream()
      val idx = new java.io.ByteArrayOutputStream()
      def i32(o: java.io.ByteArrayOutputStream, v: Long): Unit = {
        o.write(((v >> 24) & 0xFF).toInt); o.write(((v >> 16) & 0xFF).toInt)
        o.write(((v >> 8) & 0xFF).toInt); o.write((v & 0xFF).toInt)
      }
      entries.foreach { case (tag, tpe, data) =>
        i32(idx, tag); i32(idx, tpe); i32(idx, store.size().toLong)
        i32(idx, 1L)
        store.write(data, 0, data.length)
      }
      h.write(0x8E); h.write(0xAD); h.write(0xE8); h.write(0x01)
      i32(h, 0L)
      i32(h, entries.length.toLong)
      i32(h, store.size().toLong)
      val ib = idx.toByteArray
      h.write(ib, 0, ib.length)
      val sb = store.toByteArray
      h.write(sb, 0, sb.length)
      h.toByteArray
    }
    def cstr(s: String): Array[Byte] =
      s.getBytes(java.nio.charset.StandardCharsets.UTF_8) :+ 0.toByte
    // signature header: one INT32 tag (size, informational)
    val sig = headerBytes(Seq((1000L, 4L,
      Array[Byte](0, 0, 0, 1))))
    out.write(sig, 0, sig.length)
    val pad = (8 - out.size() % 8) % 8
    out.write(new Array[Byte](pad), 0, pad)
    val main = headerBytes(Seq(
      (1000L, 6L, cstr(name)), (1001L, 6L, cstr(version)),
      (1002L, 6L, cstr(release)), (1022L, 6L, cstr(arch)),
      (1124L, 6L, cstr("cpio")), (1125L, 6L, cstr(compressor))))
    out.write(main, 0, main.length)
    val cpio = Cpio.synthCpio(files, "newc")
    val packed = compressor match {
      case "gzip" =>
        val bos = new java.io.ByteArrayOutputStream()
        val z = new java.util.zip.GZIPOutputStream(bos)
        z.write(cpio); z.close()
        bos.toByteArray
      case "xz" =>
        val bos = new java.io.ByteArrayOutputStream()
        val opts = new org.tukaani.xz.LZMA2Options(1)
        opts.setDictSize(1 << 16)
        val z = new org.tukaani.xz.XZOutputStream(bos, opts)
        z.write(cpio); z.close()
        bos.toByteArray
      case "zstd" => com.github.luben.zstd.Zstd.compress(cpio, 3)
      case c => throw new IllegalArgumentException(c)
    }
    out.write(packed, 0, packed.length)
    out.toByteArray
  }
}
