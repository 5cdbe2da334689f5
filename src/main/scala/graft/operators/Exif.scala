package graft.operators

/** EXIF metadata: parse and STRIP — the image-side privacy pass a
  * training-data pipeline runs before images become training data.
  *
  * Camera JPEGs carry an APP1 segment with a TIFF-structured block
  * whose GPS sub-IFD holds the capture location — PII that must be
  * found (for audit/geo-analysis) and removed (before training), the
  * exact image-side analogue of the text `text_pii_redact` operator.
  * (Reference scope note: the ETL core `etl.go:12-68` has no media
  * surface; extension frontier.)
  *
  * Implemented from the public EXIF 2.3 / TIFF 6.0 layout: JPEG
  * marker-segment walk to APP1 `Exif\0\0`, both byte orders, IFD
  * entry types SHORT/LONG/ASCII/RATIONAL with the ≤4-byte inline
  * rule, IFD0 tags (Make 0x010F, Model 0x0110, Orientation 0x0112,
  * DateTime 0x0132) and the GPS sub-IFD (pointer 0x8825; LatRef 1,
  * Lat 2, LonRef 3, Lon 4 — coordinates as deg/min/sec RATIONALs).
  * Stripping rebuilds the JPEG byte-exactly minus Exif APP1 segments,
  * so pixels and every other segment survive untouched.
  *
  * Decode posture matches every parser here: degrade-don't-throw
  * (null for damage), per-blob scalar routines for `mapPartitions`
  * ingest. Seconds are surfaced as centi-seconds (num/100 RATIONALs)
  * to stay integer-exact for oracle parity — no float coordinate
  * math on the extraction path.
  */
object Exif {

  /** Extracted fields; missing ones are ""/0 (a camera JPEG without
    * GPS is common and not an error).
    */
  final case class ExifMeta(orientation: Long, dateTime: String,
      make: String, model: String,
      latRef: String, latDeg: Long, latMin: Long, latSecCenti: Long,
      lonRef: String, lonDeg: Long, lonMin: Long, lonSecCenti: Long)

  private def isJpeg(b: Array[Byte]): Boolean =
    b != null && b.length >= 4 && (b(0) & 0xFF) == 0xFF &&
      (b(1) & 0xFF) == 0xD8 && (b(2) & 0xFF) == 0xFF

  private def beU16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xFF) << 8) | (b(i + 1) & 0xFF)

  private val ExifHeader = Array[Byte]('E', 'x', 'i', 'f', 0, 0)

  /** Offset of the payload (past marker + length) of the segment
    * starting at `segStart`, skipping any 0xFF fill prefix.
    */
  private def segPayload(b: Array[Byte], segStart: Int): Int = {
    var m = segStart
    while ((b(m) & 0xFF) == 0xFF) m += 1 // fills, then the marker byte itself
    m + 3 // past marker byte + 2 length bytes
  }

  private def isExifApp1(b: Array[Byte], segStart: Int, segEnd: Int): Boolean = {
    val pay = segPayload(b, segStart)
    pay + 6 <= segEnd && (0 until 6).forall(i => b(pay + i) == ExifHeader(i))
  }

  /** Walk the JPEG's marker segments up to SOS, invoking `f(marker,
    * segStart, segTotal)` per segment (segTotal = marker + length +
    * payload bytes). Returns the SOS offset, b.length when no SOS, or
    * -1 on structural damage.
    */
  private def walkSegments(b: Array[Byte])(f: (Int, Int, Int) => Unit): Int = {
    if (!isJpeg(b)) return -1
    var p = 2
    while (p + 4 <= b.length) {
      if ((b(p) & 0xFF) != 0xFF) return -1
      // JPEG permits runs of 0xFF fill bytes between segments: the
      // marker byte is the first non-FF of the run. The fill bytes are
      // treated as part of the following segment so strip round-trips
      // keep them byte-exact.
      var q = p + 1
      while (q < b.length && (b(q) & 0xFF) == 0xFF) q += 1
      if (q >= b.length) return -1
      val marker = b(q) & 0xFF
      if (marker == 0x00) return -1 // FF00 is entropy stuffing, not a marker
      if (marker == 0xDA) return p // SOS: entropy data follows
      if (marker == 0xD9) return p // EOI before SOS (no scan)
      if (q + 3 > b.length) return -1
      val len = beU16(b, q + 1)
      if (len < 2 || q + 1 + len > b.length) return -1
      f(marker, p, (q + 1 + len) - p)
      p = q + 1 + len
    }
    b.length
  }

  /** Parse the first Exif APP1 segment; null when the JPEG has none
    * or the walk/TIFF block is damaged.
    */
  def fromJpeg(b: Array[Byte]): ExifMeta = try {
    var found: ExifMeta = null
    val sos = walkSegments(b) { (marker, s, total) =>
      if (found == null && marker == 0xE1 && isExifApp1(b, s, s + total))
        found = parseTiff(b, segPayload(b, s) + 6, s + total)
    }
    if (sos < 0) null else found
  } catch { case _: ArrayIndexOutOfBoundsException => null }

  /** Remove every Exif APP1 segment, keeping all other bytes exactly
    * (other APPn, tables, scan data). Identity for non-JPEG input
    * (nothing to strip); null when the segment walk is damaged — a
    * privacy pass must not silently pass bytes it could not verify.
    */
  def stripJpeg(b: Array[Byte]): Array[Byte] = try {
    if (!isJpeg(b)) return b
    val keep = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    val sos = walkSegments(b) { (marker, s, total) =>
      if (!(marker == 0xE1 && isExifApp1(b, s, s + total)))
        keep += ((s, total))
    }
    if (sos < 0) return null
    val out = new java.io.ByteArrayOutputStream(b.length)
    out.write(b, 0, 2) // SOI
    keep.foreach { case (s, total) => out.write(b, s, total) }
    if (sos < b.length) out.write(b, sos, b.length - sos) // SOS + scan + EOI
    out.toByteArray
  } catch { case _: ArrayIndexOutOfBoundsException => null }

  // ---- TIFF block ------------------------------------------------------

  /** One IFD entry's raw values as longs: SHORT/LONG numerics,
    * RATIONAL as num/den pairs flattened, ASCII as null (read
    * separately — strings aren't longs).
    */
  private def parseTiff(b: Array[Byte], t: Int, end: Int): ExifMeta = {
    if (t + 8 > end) return null
    val le = b(t) == 'I'.toByte && b(t + 1) == 'I'.toByte
    val isBe = b(t) == 'M'.toByte && b(t + 1) == 'M'.toByte
    if (!le && !isBe) return null
    def r16(i: Int): Int =
      if (le) ((b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8)) else beU16(b, i)
    def r32(i: Int): Long =
      if (le) ((b(i) & 0xFFL) | ((b(i + 1) & 0xFFL) << 8) |
        ((b(i + 2) & 0xFFL) << 16) | ((b(i + 3) & 0xFFL) << 24))
      else (((b(i) & 0xFFL) << 24) | ((b(i + 1) & 0xFFL) << 16) |
        ((b(i + 2) & 0xFFL) << 8) | (b(i + 3) & 0xFFL))
    if (r16(t + 2) != 42) return null

    // type sizes per TIFF 6.0; 0 = types we don't consume
    def typeSize(tpe: Int): Int = tpe match {
      case 1 | 2 | 7 => 1; case 3 => 2; case 4 => 4; case 5 | 10 => 8
      case _ => 0
    }
    /** (valueOffset, byteCount) honoring the ≤4-byte inline rule. */
    def valueAt(e: Int): (Int, Int) = {
      val sz = typeSize(r16(e + 2))
      val cnt = r32(e + 4)
      if (sz == 0 || cnt < 0 || cnt > 65536) return (-1, 0)
      val total = (sz * cnt).toInt
      if (total <= 4) (e + 8, total)
      else {
        val off = r32(e + 8)
        if (t + off + total > end || off < 8) (-1, 0) else ((t + off).toInt, total)
      }
    }
    def ascii(e: Int): String = {
      val (off, n) = valueAt(e)
      if (off < 0) return ""
      var len = 0
      while (len < n && b(off + len) != 0) len += 1
      new String(b, off, len, java.nio.charset.StandardCharsets.US_ASCII)
    }
    def short(e: Int): Long = { val (off, n) = valueAt(e); if (off < 0 || n < 2) 0L else r16(off).toLong }
    def long_(e: Int): Long = { val (off, n) = valueAt(e); if (off < 0 || n < 4) 0L else r32(off) }
    /** RATIONAL×3 deg/min/sec → (deg, min, sec·100/den) integer-exact. */
    def dms(e: Int): (Long, Long, Long) = {
      val (off, n) = valueAt(e)
      if (off < 0 || n < 24) return (0L, 0L, 0L)
      def rat(i: Int): (Long, Long) = (r32(off + 8 * i), r32(off + 8 * i + 4))
      val (dn, dd) = rat(0); val (mn, md) = rat(1); val (sn, sd) = rat(2)
      if (dd == 0 || md == 0 || sd == 0) return (0L, 0L, 0L)
      (dn / dd, mn / md, sn * 100 / sd)
    }

    /** Map tag → entry offset for one IFD. */
    def entries(ifdOff: Long): Map[Int, Int] = {
      if (ifdOff < 8 || t + ifdOff + 2 > end) return Map.empty
      val base = (t + ifdOff).toInt
      val n = r16(base)
      if (base + 2 + 12 * n + 4 > end) return Map.empty
      (0 until n).map(k => r16(base + 2 + 12 * k) -> (base + 2 + 12 * k)).toMap
    }

    val ifd0 = entries(r32(t + 4))
    if (ifd0.isEmpty) return null
    val gps = ifd0.get(0x8825).map(e => entries(long_(e))).getOrElse(Map.empty)
    val (laD, laM, laS) = gps.get(2).map(dms).getOrElse((0L, 0L, 0L))
    val (loD, loM, loS) = gps.get(4).map(dms).getOrElse((0L, 0L, 0L))
    ExifMeta(
      orientation = ifd0.get(0x0112).map(short).getOrElse(0L),
      dateTime = ifd0.get(0x0132).map(ascii).getOrElse(""),
      make = ifd0.get(0x010F).map(ascii).getOrElse(""),
      model = ifd0.get(0x0110).map(ascii).getOrElse(""),
      latRef = gps.get(1).map(ascii).getOrElse(""),
      latDeg = laD, latMin = laM, latSecCenti = laS,
      lonRef = gps.get(3).map(ascii).getOrElse(""),
      lonDeg = loD, lonMin = loM, lonSecCenti = loS)
  }

  // ---- synthesizer -----------------------------------------------------

  /** A real little-endian EXIF APP1 segment (IFD0 with Make, Model,
    * Orientation, DateTime, and a GPS sub-IFD carrying lat/lon as
    * deg/min/sec·(1,1,1/100) RATIONALs). `dateTime` must be the EXIF
    * "YYYY:MM:DD HH:MM:SS" 19-char form.
    */
  def synthApp1(meta: ExifMeta): Array[Byte] = {
    require(meta.dateTime.length == 19, "EXIF DateTime is 19 chars")
    val make = meta.make.getBytes("US-ASCII") :+ 0.toByte
    val model = meta.model.getBytes("US-ASCII") :+ 0.toByte
    val dt = meta.dateTime.getBytes("US-ASCII") :+ 0.toByte
    require(make.length > 4 && model.length > 4,
      "synth keeps strings external (>4 bytes with NUL) for one layout")
    // layout (TIFF offsets): header 0..8, IFD0 at 8 (5 entries), then
    // make, model, dateTime values, GPS IFD (4 entries), lat + lon
    // rationals
    val ifd0Off = 8
    val ifd0Size = 2 + 5 * 12 + 4
    val makeOff = ifd0Off + ifd0Size
    val modelOff = makeOff + make.length
    val dtOff = modelOff + model.length
    val gpsOff = dtOff + dt.length
    val gpsSize = 2 + 4 * 12 + 4
    val latOff = gpsOff + gpsSize
    val lonOff = latOff + 24
    val tiffLen = lonOff + 24
    val tiff = new Array[Byte](tiffLen)
    def w16(i: Int, v: Int): Unit = {
      tiff(i) = (v & 0xFF).toByte; tiff(i + 1) = ((v >> 8) & 0xFF).toByte
    }
    def w32(i: Int, v: Long): Unit = { w16(i, (v & 0xFFFF).toInt); w16(i + 2, ((v >> 16) & 0xFFFF).toInt) }
    def entry(i: Int, tag: Int, tpe: Int, cnt: Long, valOrOff: Long): Unit = {
      w16(i, tag); w16(i + 2, tpe); w32(i + 4, cnt); w32(i + 8, valOrOff)
    }
    tiff(0) = 'I'; tiff(1) = 'I'; w16(2, 42); w32(4, ifd0Off)
    w16(ifd0Off, 5)
    entry(ifd0Off + 2, 0x010F, 2, make.length, makeOff)
    entry(ifd0Off + 14, 0x0110, 2, model.length, modelOff)
    entry(ifd0Off + 26, 0x0112, 3, 1, meta.orientation) // SHORT inline
    entry(ifd0Off + 38, 0x0132, 2, dt.length, dtOff)
    entry(ifd0Off + 50, 0x8825, 4, 1, gpsOff)
    w32(ifd0Off + 62, 0) // no next IFD
    System.arraycopy(make, 0, tiff, makeOff, make.length)
    System.arraycopy(model, 0, tiff, modelOff, model.length)
    System.arraycopy(dt, 0, tiff, dtOff, dt.length)
    w16(gpsOff, 4)
    def refInline(s: String): Long = // 2-byte ASCII (char + NUL) inline
      if (s.isEmpty) 0L else (s.charAt(0).toLong & 0xFF)
    entry(gpsOff + 2, 1, 2, 2, refInline(meta.latRef))
    entry(gpsOff + 14, 2, 5, 3, latOff)
    entry(gpsOff + 26, 3, 2, 2, refInline(meta.lonRef))
    entry(gpsOff + 38, 4, 5, 3, lonOff)
    w32(gpsOff + 50, 0)
    def dmsAt(off: Int, d: Long, m: Long, sCenti: Long): Unit = {
      w32(off, d); w32(off + 4, 1)
      w32(off + 8, m); w32(off + 12, 1)
      w32(off + 16, sCenti); w32(off + 20, 100)
    }
    dmsAt(latOff, meta.latDeg, meta.latMin, meta.latSecCenti)
    dmsAt(lonOff, meta.lonDeg, meta.lonMin, meta.lonSecCenti)
    val out = new java.io.ByteArrayOutputStream(4 + 6 + tiffLen)
    out.write(0xFF); out.write(0xE1)
    val segLen = 2 + 6 + tiffLen
    out.write((segLen >> 8) & 0xFF); out.write(segLen & 0xFF)
    out.write(ExifHeader, 0, 6)
    out.write(tiff, 0, tiffLen)
    out.toByteArray
  }

  /** Insert an APP1 right after a JPEG's SOI — how cameras place it. */
  def withApp1(jpeg: Array[Byte], app1: Array[Byte]): Array[Byte] = {
    require(isJpeg(jpeg))
    val out = new Array[Byte](jpeg.length + app1.length)
    out(0) = jpeg(0); out(1) = jpeg(1)
    System.arraycopy(app1, 0, out, 2, app1.length)
    System.arraycopy(jpeg, 2, out, 2 + app1.length, jpeg.length - 2)
    out
  }
}
