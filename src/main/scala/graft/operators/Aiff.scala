package graft.operators

/** From-scratch AIFF / AIFF-C audio decode — the big-endian sibling
  * of WAV that Mac-originated corpora ship in. Joins the audio
  * family (the reference pipeline has no media layer).
  *
  * Layout: IFF "FORM" container with form type "AIFF" or "AIFC";
  * chunks are big-endian with odd sizes padded by one byte. "COMM"
  * carries channels, frame count, bit depth, and the sample rate as
  * an 80-bit IEEE 754 EXTENDED float (sign 1 / exponent 15 /
  * explicit-integer-bit mantissa 64) — the format's famous quirk,
  * parsed exactly. "SSND" holds the frames behind offset/blockSize
  * words. AIFF-C compression types decoded: "NONE" (big-endian PCM),
  * "sowt" (little-endian PCM 16 — the byte-swapped Mac variant),
  * "ulaw"/"ULAW" and "alaw"/"ALAW" (G.711, via the same ITU segment
  * expansion the WAV path uses; G.711 output scales by 4 to the
  * 16-bit range exactly as javax.sound renders it). Anything else is
  * a named profile gap, not damage.
  *
  * Samples return interleaved 16-bit: 8-bit widens (<<8), 24/32-bit
  * keep their top 16 (the WAV path's convention). Pinned BOTH
  * directions against javax.sound: AudioSystem-written AIFF decodes
  * through this walk, and [[synthAiff]] streams read back through
  * AudioSystem.
  */
object Aiff {

  def isAiff(b: Array[Byte]): Boolean =
    b != null && b.length >= 12 &&
      b(0) == 'F' && b(1) == 'O' && b(2) == 'R' && b(3) == 'M' &&
      b(8) == 'A' && b(9) == 'I' && b(10) == 'F' &&
      (b(11) == 'F' || b(11) == 'C')

  private def beU32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xFFL) << 24) | ((b(i + 1) & 0xFFL) << 16) |
      ((b(i + 2) & 0xFFL) << 8) | (b(i + 3) & 0xFFL)

  private def beU16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xFF) << 8) | (b(i + 1) & 0xFF)

  /** The 80-bit extended float's integral value (sample rates are
    * integral in practice); -1 on NaN/infinite/out-of-range.
    */
  private def extended80(b: Array[Byte], i: Int): Long = {
    val se = beU16(b, i)
    val exp = se & 0x7FFF
    val mantHi = beU32(b, i + 2)
    val mantLo = beU32(b, i + 6)
    if (exp == 0 && mantHi == 0 && mantLo == 0) return 0L
    if (exp == 0x7FFF) return -1L // inf/nan
    val mant = (mantHi << 32) | mantLo
    val shift = exp - 16383 - 63
    if (shift > 0 || shift < -63) return -1L
    val v = mant >>> -shift
    if ((se & 0x8000) != 0) -1L else v
  }

  private final case class Comm(channels: Int, frames: Long, bits: Int,
      rate: Long, compression: String)

  private def findChunks(b: Array[Byte]): (Comm, Int, Long) = {
    // returns (COMM, ssndDataOff, ssndDataLen) or null
    val isAifc = b(11) == 'C'
    var comm: Comm = null
    var ssndOff = -1
    var ssndLen = -1L
    var p = 12
    while (p + 8 <= b.length) {
      val id = new String(b, p, 4, java.nio.charset.StandardCharsets.US_ASCII)
      val len = beU32(b, p + 4)
      if (len < 0 || p + 8 + len > b.length) return null
      id match {
        case "COMM" =>
          if (len < 18) return null
          val channels = beU16(b, p + 8)
          val frames = beU32(b, p + 10)
          val bits = beU16(b, p + 14)
          val rate = extended80(b, p + 16)
          val compression =
            if (!isAifc) "NONE"
            else {
              if (len < 22) return null
              new String(b, p + 26, 4,
                java.nio.charset.StandardCharsets.US_ASCII)
            }
          comm = Comm(channels, frames, bits, rate, compression)
        case "SSND" =>
          if (len < 8) return null
          val off = beU32(b, p + 8)
          // blockSize at p+12: alignment hint, not consumed
          if (off < 0 || 8 + off > len) return null
          ssndOff = (p + 16 + off).toInt
          ssndLen = len - 8 - off
        case _ => () // FVER/MARK/INST/annotations: structural
      }
      p += (8 + len + (len & 1)).toInt
    }
    if (comm == null || ssndOff < 0) return null
    (comm, ssndOff, ssndLen)
  }

  /** Interleaved 16-bit samples, or null on damage / an unsupported
    * AIFF-C compression type (callers distinguish via
    * [[unsupportedProfile]]).
    */
  def samples(b: Array[Byte]): Array[Short] = try {
    if (!isAiff(b)) return null
    val fc = findChunks(b)
    if (fc == null) return null
    val (comm, off, len) = fc
    if (comm.channels <= 0 || comm.rate <= 0) return null
    val n = comm.frames * comm.channels
    if (n < 0 || n > 100000000L) return null
    comm.compression match {
      case "NONE" =>
        val bytesPer = (comm.bits + 7) / 8
        if (bytesPer < 1 || bytesPer > 4) return null
        if (n * bytesPer > len) return null
        val out = new Array[Short](n.toInt)
        var j = 0
        while (j < n) {
          val q = off + j * bytesPer
          out(j) = (bytesPer match {
            case 1 => (b(q) << 8).toShort // AIFF 8-bit is SIGNED
            case 2 => ((b(q) << 8) | (b(q + 1) & 0xFF)).toShort
            case _ => ((b(q) << 8) | (b(q + 1) & 0xFF)).toShort // top 16
          })
          j += 1
        }
        out
      case "sowt" => // byte-swapped (little-endian) PCM 16
        if (comm.bits != 16 || n * 2 > len) return null
        val out = new Array[Short](n.toInt)
        var j = 0
        while (j < n) {
          val q = off + j * 2
          out(j) = ((b(q + 1) << 8) | (b(q) & 0xFF)).toShort
          j += 1
        }
        out
      case "ulaw" | "ULAW" | "alaw" | "ALAW" =>
        if (n > len) return null
        val mu = comm.compression.equalsIgnoreCase("ulaw")
        val out = new Array[Short](n.toInt)
        var j = 0
        while (j < n) {
          val c = b(off + j) & 0xFF
          // the same ITU segment expansion (already s16-scaled) the
          // oracled G.711 WAV path uses
          out(j) = (if (mu) Containers.ulawToLinear(c)
            else Containers.alawToLinear(c)).toShort
          j += 1
        }
        out
      case _ => null // fl32/fl64/ima4/…: named profile, not damage
    }
  } catch { case _: ArrayIndexOutOfBoundsException => null }

  /** A structurally-sound AIFF-C naming a compression this decoder
    * doesn't ship — the "ship a profile" classification.
    */
  def unsupportedProfile(b: Array[Byte]): Boolean = try {
    if (!isAiff(b)) return false
    val fc = findChunks(b)
    fc != null && !Set("NONE", "sowt", "ulaw", "ULAW", "alaw", "ALAW")
      .contains(fc._1.compression)
  } catch { case _: ArrayIndexOutOfBoundsException => false }

  /** Parse-level header for [[Containers.parse]] routing. */
  def header(b: Array[Byte]): (Int, Int, Int, Long) = try {
    val fc = findChunks(b)
    if (fc == null) null
    else {
      val c = fc._1
      val ms = if (c.rate > 0) c.frames * 1000L / c.rate else 0L
      (c.rate.toInt, c.channels, c.bits, ms)
    }
  } catch { case _: ArrayIndexOutOfBoundsException => null }

  /** A real AIFF (or AIFF-C for "sowt"/"ulaw"/"alaw") from
    * interleaved 16-bit samples: FORM/COMM/SSND with the sample rate
    * written as a true 80-bit extended float.
    */
  def synthAiff(rate: Int, channels: Int, samples: Array[Short],
      compression: String = "NONE"): Array[Byte] = {
    require(rate > 0 && channels > 0)
    val isAifc = compression != "NONE"
    val frames = samples.length / channels
    val out = new java.io.ByteArrayOutputStream()
    def w32(v: Long): Unit = {
      out.write(((v >> 24) & 0xFF).toInt); out.write(((v >> 16) & 0xFF).toInt)
      out.write(((v >> 8) & 0xFF).toInt); out.write((v & 0xFF).toInt)
    }
    def w16(v: Int): Unit = { out.write((v >> 8) & 0xFF); out.write(v & 0xFF) }
    def wId(s: String): Unit =
      out.write(s.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    val bytesPer = if (compression == "NONE" || compression == "sowt") 2 else 1
    val dataLen = samples.length * bytesPer
    val commLen = if (isAifc) 22 + 2 else 18 // + pstring "" pad
    val fverLen = if (isAifc) 4 else 0
    val formLen = 4 + (if (isAifc) 8 + fverLen else 0) + 8 + commLen +
      8 + 8 + dataLen + (dataLen & 1)
    wId("FORM"); w32(formLen.toLong)
    wId(if (isAifc) "AIFC" else "AIFF")
    if (isAifc) { wId("FVER"); w32(4); w32(0xA2805140L) } // AIFCVersion1
    wId("COMM"); w32(commLen.toLong)
    w16(channels); w32(frames.toLong)
    w16(if (bytesPer == 1) 8 else 16)
    // 80-bit extended: integral rate normalized to an explicit-1 mantissa
    var exp = 16383 + 63
    var mant = rate.toLong
    while ((mant & Long.MinValue) == 0) { mant <<= 1; exp -= 1 }
    w16(exp)
    w32(mant >>> 32); w32(mant & 0xFFFFFFFFL)
    if (isAifc) { wId(compression); w16(0) } // empty pstring, padded
    wId("SSND"); w32((8 + dataLen).toLong)
    w32(0); w32(0) // offset, blockSize
    compression match {
      case "NONE" => samples.foreach(s => w16(s & 0xFFFF))
      case "sowt" => samples.foreach { s =>
        out.write(s & 0xFF); out.write((s >> 8) & 0xFF)
      }
      case "ulaw" | "alaw" =>
        // nearest-codeword compress against the exact expansion
        // tables: decode(encode(x)) is the closest representable
        // level by construction
        val mu = compression == "ulaw"
        val table = Array.tabulate(256)(c =>
          if (mu) Containers.ulawToLinear(c) else Containers.alawToLinear(c))
        samples.foreach { s =>
          var best = 0
          var bestD = Long.MaxValue
          var c = 0
          while (c < 256) {
            val d = math.abs(table(c).toLong - s)
            if (d < bestD) { bestD = d; best = c }
            c += 1
          }
          out.write(best)
        }
      case c => throw new IllegalArgumentException(s"compression $c")
    }
    if ((dataLen & 1) == 1) out.write(0)
    out.toByteArray
  }
}
