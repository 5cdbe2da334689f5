package graft.operators

/** From-scratch TFRecord shard reader/writer — the record framing
  * TensorFlow training corpora ship in. Layout per record (the
  * public tensorflow format spec):
  *
  *   uint64 length (LE) | uint32 masked_crc32c(length) (LE)
  *   | data[length] | uint32 masked_crc32c(data) (LE)
  *
  * where masked = rotr(crc, 15) + 0xA282EAD8. Both CRCs VERIFY on
  * read (the JDK's independent CRC32C implementation is the
  * checksum pin); whole-file gzip (the common `.tfrecord.gz` shape)
  * routes through the member-aware gunzip first. Null on any
  * damage — a shard with one bad record is quarantined whole.
  */
object TfRecord {

  private final val MaskDelta = 0xA282EAD8L

  private[graft] def maskedCrc(b: Array[Byte], off: Int, len: Int): Long = {
    val c = new java.util.zip.CRC32C()
    c.update(b, off, len)
    val crc = c.getValue
    (((crc >>> 15) | (crc << 17)) + MaskDelta) & 0xFFFFFFFFL
  }

  private def leU32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xFFL) | ((b(i + 1) & 0xFFL) << 8) |
      ((b(i + 2) & 0xFFL) << 16) | ((b(i + 3) & 0xFFL) << 24)

  private def leU64(b: Array[Byte], i: Int): Long =
    leU32(b, i) | (leU32(b, i + 4) << 32)

  /** Every record's payload, in order; null on damage. Accepts both
    * plain and whole-file-gzipped shards.
    */
  def records(b: Array[Byte]): Array[Array[Byte]] = try {
    if (b == null) return null
    val body =
      if (b.length >= 2 && (b(0) & 0xFF) == 0x1F && (b(1) & 0xFF) == 0x8B) {
        // PLAIN multi-member gunzip — not the crawl path's
        // WARC-member filter, which is the wrong altitude here
        val members = Containers.gzipMembers(b)
        if (members == null) return null
        val bos = new java.io.ByteArrayOutputStream()
        members.foreach(m => bos.write(m, 0, m.length))
        bos.toByteArray
      } else b
    val out = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    var p = 0
    while (p < body.length) {
      if (p + 12 > body.length) return null
      val len = leU64(body, p)
      if (len < 0 || len > body.length - p - 16) return null
      if (leU32(body, p + 8) != maskedCrc(body, p, 8)) return null
      val dataOff = p + 12
      if (leU32(body, dataOff + len.toInt) !=
          maskedCrc(body, dataOff, len.toInt)) return null
      out += java.util.Arrays.copyOfRange(body, dataOff,
        dataOff + len.toInt)
      p = dataOff + len.toInt + 4
    }
    out.toArray
  } catch { case _: ArrayIndexOutOfBoundsException => null }

  /** A real TFRecord stream from payloads (gzip it for `.gz`). */
  def synth(recs: Seq[Array[Byte]]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def w32(v: Long): Unit = {
      out.write((v & 0xFF).toInt); out.write(((v >> 8) & 0xFF).toInt)
      out.write(((v >> 16) & 0xFF).toInt); out.write(((v >> 24) & 0xFF).toInt)
    }
    recs.foreach { r =>
      val lenB = new Array[Byte](8)
      var v = r.length.toLong
      for (i <- 0 until 8) { lenB(i) = (v & 0xFF).toByte; v >>= 8 }
      out.write(lenB, 0, 8)
      w32(maskedCrc(lenB, 0, 8))
      out.write(r, 0, r.length)
      w32(maskedCrc(r, 0, r.length))
    }
    out.toByteArray
  }
}
