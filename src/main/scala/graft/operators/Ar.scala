package graft.operators

/** From-scratch Unix `ar` archive walk — the outer container of
  * `.deb` packages and static libraries, and the simplest shard
  * format old distribution drops use. Joins the tar/zip/cpio shard
  * family (the reference pipeline has no archive layer).
  *
  * Layout: global magic "!&lt;arch&gt;\n", then 60-byte ASCII member
  * headers (name 16, mtime 12, uid 6, gid 6, mode 8, size 10,
  * terminator "`\n"), data padded to 2 bytes with '\n'. Both
  * long-name dialects decode:
  *  - GNU: names end '/', "//" is the long-name table referenced by
  *    "/<offset>" names (entries '\n'- or '/'-terminated), "/" is
  *    the symbol table (structural, skipped);
  *  - BSD: "#1/<len>" prepends the real name to the data, the
  *    declared size INCLUDING it.
  *
  * Pinned BOTH directions against commons-compress
  * (ArArchiveInput/OutputStream, GNU and BSD longfile modes).
  * Degrade-don't-throw: null on structural damage.
  */
object Ar {

  private val Magic = "!<arch>\n".getBytes(
    java.nio.charset.StandardCharsets.US_ASCII)

  def isAr(b: Array[Byte]): Boolean =
    b != null && b.length >= 8 && {
      var i = 0
      var ok = true
      while (i < 8) { if (b(i) != Magic(i)) ok = false; i += 1 }
      ok
    }

  private def ascii(b: Array[Byte], off: Int, len: Int): String =
    new String(b, off, len, java.nio.charset.StandardCharsets.US_ASCII)

  /** Regular members as (name, bytes) — long names resolved, the GNU
    * symbol table "/" and name table "//" consumed structurally.
    * Null on damage.
    */
  def members(b: Array[Byte]): Array[(String, Array[Byte])] = try {
    if (!isAr(b)) return null
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Array[Byte])]
    var nameTable: Array[Byte] = null
    var p = 8
    while (p < b.length) {
      if (p + 60 > b.length) return null
      if (b(p + 58) != '`' || b(p + 59) != '\n') return null
      val rawName = ascii(b, p, 16).trim
      val sizeStr = ascii(b, p + 48, 10).trim
      if (sizeStr.isEmpty || !sizeStr.forall(_.isDigit)) return null
      val size = sizeStr.toLong
      val dataOff = p + 60
      if (dataOff + size > b.length) return null
      if (rawName == "//") { // GNU long-name table
        nameTable = java.util.Arrays.copyOfRange(b, dataOff,
          (dataOff + size).toInt)
      } else if (rawName == "/" || rawName == "/SYM64/" ||
          rawName == "__.SYMDEF" || rawName.startsWith("__.SYMDEF ")) {
        () // symbol tables: structural
      } else if (rawName.startsWith("#1/")) { // BSD long name
        val nl = rawName.substring(3)
        if (nl.isEmpty || !nl.forall(_.isDigit)) return null
        val nlen = nl.toInt
        if (nlen <= 0 || nlen > size) return null
        // the embedded name may be NUL-padded to its field length
        var end = nlen
        while (end > 0 && b(dataOff + end - 1) == 0) end -= 1
        val name = ascii(b, dataOff, end)
        out += ((name, java.util.Arrays.copyOfRange(b,
          dataOff + nlen, (dataOff + size).toInt)))
      } else if (rawName.length > 1 && rawName.startsWith("/") &&
          rawName.substring(1).forall(_.isDigit)) { // GNU table ref
        if (nameTable == null) return null
        val off = rawName.substring(1).toInt
        if (off < 0 || off >= nameTable.length) return null
        var end = off
        while (end < nameTable.length && nameTable(end) != '\n' &&
            nameTable(end) != 0) end += 1
        var name = ascii(nameTable, off, end - off)
        if (name.endsWith("/")) name = name.dropRight(1)
        if (name.isEmpty) return null
        out += ((name, java.util.Arrays.copyOfRange(b, dataOff,
          (dataOff + size).toInt)))
      } else {
        // short name; GNU terminates with '/'
        val name = if (rawName.endsWith("/")) rawName.dropRight(1) else rawName
        if (name.isEmpty) return null
        out += ((name, java.util.Arrays.copyOfRange(b, dataOff,
          (dataOff + size).toInt)))
      }
      p = (dataOff + size + 1).toInt / 2 * 2 // '\n' pad to even
    }
    out.toArray
  } catch { case _: ArrayIndexOutOfBoundsException => null }

  /** A real ar archive from (name, bytes) pairs; names longer than
    * 15 chars go through the requested dialect ("gnu" `//` table or
    * "bsd" `#1/len`).
    */
  def synthAr(files: Seq[(String, Array[Byte])],
      style: String = "gnu"): Array[Byte] = {
    require(style == "gnu" || style == "bsd", style)
    val out = new java.io.ByteArrayOutputStream()
    out.write(Magic)
    def header(name: String, size: Long): Unit = {
      val h = name.padTo(16, ' ') + "0".padTo(12, ' ') +
        "0".padTo(6, ' ') + "0".padTo(6, ' ') + "100644".padTo(8, ' ') +
        size.toString.padTo(10, ' ') + "`\n"
      out.write(h.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    }
    def padNl(): Unit = if (out.size() % 2 != 0) out.write('\n')
    if (style == "gnu") {
      val longs = files.map(_._1).filter(n => n.length + 1 > 16)
      val table = longs.map(_ + "/\n").mkString
      val offs = longs.zip(longs.scanLeft(0)(_ + _.length + 2)).toMap
      if (table.nonEmpty) {
        header("//", table.length.toLong)
        out.write(table.getBytes(
          java.nio.charset.StandardCharsets.US_ASCII))
        padNl()
      }
      files.foreach { case (n, d) =>
        if (n.length + 1 > 16) header(s"/${offs(n)}", d.length.toLong)
        else header(n + "/", d.length.toLong)
        out.write(d)
        padNl()
      }
    } else {
      files.foreach { case (n, d) =>
        if (n.length > 16 || n.contains(' ')) {
          header(s"#1/${n.length}", n.length.toLong + d.length)
          out.write(n.getBytes(
            java.nio.charset.StandardCharsets.US_ASCII))
          out.write(d)
        } else {
          header(n, d.length.toLong)
          out.write(d)
        }
        padNl()
      }
    }
    out.toByteArray
  }
}
