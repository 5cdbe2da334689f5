package graft.operators

/** From-scratch cpio dataset-shard walk — the archive format initrd
  * images, RPM payloads, and old tape dumps ship in. The reference
  * pipeline (etl-pack) has no archive layer; this joins the tar/zip
  * shard family.
  *
  * All four classic on-disk variants decode:
  *  - `newc` (SVR4, magic "070701"): 110-byte ASCII-hex header,
  *    header+name and data each padded to 4 bytes;
  *  - `crc` ("070702"): newc with a 32-bit bytewise data checksum,
  *    VERIFIED per member;
  *  - `odc` (portable ASCII, "070707"): 76-byte octal header, no
  *    padding;
  *  - old BINARY (magic 0o070707 as a 16-bit word, either
  *    endianness): 26-byte header of shorts, 32-bit values split
  *    (high short, low short) in the file's byte order, name and
  *    data padded to 2.
  *
  * The walk ends at the "TRAILER!!!" member like every real reader;
  * hardlinked zero-size duplicates pass through (size 0). Pinned
  * BOTH directions against commons-compress: its
  * CpioArchiveInputStream reads this encoder's output and this walk
  * reads its CpioArchiveOutputStream streams in every format.
  * Degrade-don't-throw: null on any structural damage or checksum
  * mismatch.
  */
object Cpio {

  final case class CpioEntry(name: String, mode: Int, size: Long,
      dataOff: Long, format: String)

  private def ascii(b: Array[Byte], off: Int, len: Int): String =
    new String(b, off, len, java.nio.charset.StandardCharsets.US_ASCII)

  def isCpio(b: Array[Byte]): Boolean =
    b != null && ((b.length >= 6 && {
      val m = ascii(b, 0, 6)
      m == "070701" || m == "070702" || m == "070707"
    }) || (b.length >= 26 && {
      val le = (b(0) & 0xFF) | ((b(1) & 0xFF) << 8)
      val be = ((b(0) & 0xFF) << 8) | (b(1) & 0xFF)
      le == 0x71C7 || be == 0x71C7
    }))

  private def hexField(b: Array[Byte], off: Int): Long = {
    var v = 0L
    var i = 0
    while (i < 8) {
      val c = b(off + i) & 0xFF
      val d =
        if (c >= '0' && c <= '9') c - '0'
        else if (c >= 'a' && c <= 'f') c - 'a' + 10
        else if (c >= 'A' && c <= 'F') c - 'A' + 10
        else return -1L
      v = (v << 4) | d
      i += 1
    }
    v
  }

  private def octField(b: Array[Byte], off: Int, len: Int): Long = {
    var v = 0L
    var i = 0
    while (i < len) {
      val c = b(off + i) & 0xFF
      if (c < '0' || c > '7') return -1L
      v = (v << 3) | (c - '0')
      i += 1
    }
    v
  }

  /** Every entry in on-disk order, or null. Damage anywhere
    * quarantines the whole shard (the tar/zip posture).
    */
  def entries(b: Array[Byte]): Array[CpioEntry] = try {
    if (!isCpio(b)) return null
    val out = scala.collection.mutable.ArrayBuffer.empty[CpioEntry]
    var p = 0L
    def pad(v: Long, a: Int): Long = (v + a - 1) / a * a
    while (true) {
      if (p + 6 > b.length) return null
      val pi = p.toInt
      val magic6 = if (p + 6 <= b.length) ascii(b, pi, 6) else ""
      if (magic6 == "070701" || magic6 == "070702") {
        if (p + 110 > b.length) return null
        val mode = hexField(b, pi + 6 + 8)
        val size = hexField(b, pi + 6 + 8 * 6)
        val nameSize = hexField(b, pi + 6 + 8 * 11)
        val check = hexField(b, pi + 6 + 8 * 12)
        if (mode < 0 || size < 0 || nameSize <= 0 || check < 0) return null
        if (p + 110 + nameSize > b.length) return null
        if (b(pi + 110 + nameSize.toInt - 1) != 0) return null
        val name = ascii(b, pi + 110, nameSize.toInt - 1)
        val dataOff = pad(p + 110 + nameSize, 4)
        if (name == "TRAILER!!!") return out.toArray
        if (dataOff + size > b.length) return null
        if (magic6 == "070702") { // verify the bytewise checksum
          var sum = 0L
          var j = 0L
          while (j < size) {
            sum = (sum + (b((dataOff + j).toInt) & 0xFF)) & 0xFFFFFFFFL
            j += 1
          }
          if (sum != check) return null
        }
        out += CpioEntry(name, mode.toInt, size, dataOff,
          if (magic6 == "070702") "crc" else "newc")
        p = pad(dataOff + size, 4)
      } else if (magic6 == "070707") {
        if (p + 76 > b.length) return null
        val mode = octField(b, pi + 18, 6)
        val nameSize = octField(b, pi + 59, 6)
        val size = octField(b, pi + 65, 11)
        if (mode < 0 || size < 0 || nameSize <= 0) return null
        if (p + 76 + nameSize > b.length) return null
        if (b(pi + 76 + nameSize.toInt - 1) != 0) return null
        val name = ascii(b, pi + 76, nameSize.toInt - 1)
        if (name == "TRAILER!!!") return out.toArray
        val dataOff = p + 76 + nameSize
        if (dataOff + size > b.length) return null
        out += CpioEntry(name, mode.toInt, size, dataOff, "odc")
        p = dataOff + size
      } else {
        // old binary, either endianness, detected per ARCHIVE from
        // the magic word (mixed-endian members are damage)
        if (p + 26 > b.length) return null
        val le = ((b(pi) & 0xFF) | ((b(pi + 1) & 0xFF) << 8)) == 0x71C7
        val be = (((b(pi) & 0xFF) << 8) | (b(pi + 1) & 0xFF)) == 0x71C7
        if (!le && !be) return null
        def sh(off: Int): Int =
          if (le) (b(pi + off) & 0xFF) | ((b(pi + off + 1) & 0xFF) << 8)
          else ((b(pi + off) & 0xFF) << 8) | (b(pi + off + 1) & 0xFF)
        val mode = sh(6)
        val nameSize = sh(20)
        val size = sh(22).toLong * 65536 + sh(24) // (high, low) shorts
        if (nameSize <= 0) return null
        if (p + 26 + nameSize > b.length) return null
        if (b(pi + 26 + nameSize - 1) != 0) return null
        val name = ascii(b, pi + 26, nameSize - 1)
        val dataOff = pad(p + 26 + nameSize, 2)
        if (name == "TRAILER!!!") return out.toArray
        if (dataOff + size > b.length) return null
        out += CpioEntry(name, mode, size, dataOff,
          if (le) "bin_le" else "bin_be")
        p = pad(dataOff + size, 2)
      }
    }
    null // unreachable
  } catch { case _: ArrayIndexOutOfBoundsException => null }

  /** Regular-file members as (name, bytes); directories and other
    * node types are structural. Null when the walk fails.
    */
  def members(b: Array[Byte]): Array[(String, Array[Byte])] = {
    val es = entries(b)
    if (es == null) return null
    es.filter(e => (e.mode & 0xF000) == 0x8000).map { e =>
      (e.name,
        java.util.Arrays.copyOfRange(b, e.dataOff.toInt,
          (e.dataOff + e.size).toInt))
    }
  }

  /** A real cpio archive from (name, bytes) pairs in `format`:
    * "newc", "crc", "odc", or "bin_le". Regular-file mode 0644.
    */
  def synthCpio(files: Seq[(String, Array[Byte])],
      format: String = "newc"): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def padTo(a: Int): Unit = while (out.size() % a != 0) out.write(0)
    def wAscii(s: String): Unit =
      out.write(s.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    def hex8(v: Long): String = f"$v%08x"
    def oct(v: Long, len: Int): String =
      java.lang.Long.toOctalString(v).reverse.padTo(len, '0').reverse
    format match {
      case "newc" | "crc" =>
        val magic = if (format == "crc") "070702" else "070701"
        var ino = 1L
        def member(name: String, mode: Long, data: Array[Byte]): Unit = {
          val check =
            if (format == "crc")
              data.foldLeft(0L)((s, x) => (s + (x & 0xFF)) & 0xFFFFFFFFL)
            else 0L
          wAscii(magic + hex8(ino) + hex8(mode) + hex8(0) + hex8(0) +
            hex8(1) + hex8(0) + hex8(data.length.toLong) + hex8(3) +
            hex8(1) + hex8(0) + hex8(0) + hex8(name.length + 1L) +
            hex8(check))
          wAscii(name)
          out.write(0)
          padTo(4)
          out.write(data)
          padTo(4)
          ino += 1
        }
        files.foreach { case (n, d) => member(n, 0x81A4L, d) } // 0100644
        member("TRAILER!!!", 0, Array.emptyByteArray)
      case "odc" =>
        var ino = 1L
        def member(name: String, mode: Long, data: Array[Byte]): Unit = {
          wAscii("070707" + oct(3, 6) + oct(ino, 6) + oct(mode, 6) +
            oct(0, 6) + oct(0, 6) + oct(1, 6) + oct(0, 6) + oct(0, 11) +
            oct(name.length + 1L, 6) + oct(data.length.toLong, 11))
          wAscii(name)
          out.write(0)
          out.write(data)
          ino += 1
        }
        files.foreach { case (n, d) => member(n, 0x81A4L, d) }
        member("TRAILER!!!", 0, Array.emptyByteArray)
      case "bin_le" =>
        var ino = 1L
        def sh(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
        def member(name: String, mode: Int, data: Array[Byte]): Unit = {
          sh(0x71C7); sh(3); sh(ino.toInt); sh(mode); sh(0); sh(0)
          sh(1); sh(0); sh(0); sh(0) // mtime high, low
          sh(name.length + 1)
          sh(data.length >>> 16); sh(data.length & 0xFFFF)
          wAscii(name)
          out.write(0)
          padTo(2)
          out.write(data)
          padTo(2)
          ino += 1
        }
        files.foreach { case (n, d) => member(n, 0x81A4, d) }
        member("TRAILER!!!", 0, Array.emptyByteArray)
      case f => throw new IllegalArgumentException(s"format $f")
    }
    out.toByteArray
  }
}
