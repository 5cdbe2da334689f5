package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Containers, Exif}

/** EXIF parse + strip conformance: the synthesizer writes a real
  * TIFF-structured APP1 (IFD0, inline and external values, GPS
  * sub-IFD with RATIONAL coordinates) and extraction must invert it
  * exactly; stripping must remove exactly the Exif APP1 bytes while
  * every other segment — and the decoded pixels — survive untouched.
  */
class ExifSpec extends AnyFunSuite {

  private val meta = Exif.ExifMeta(
    orientation = 6, dateTime = "2024:03:09 14:25:36",
    make = "cam_7", model = "mdl_3",
    latRef = "N", latDeg = 51, latMin = 28, latSecCenti = 3840,
    lonRef = "W", lonDeg = 0, lonMin = 27, lonSecCenti = 4125)

  private def jpeg(seed: Long): Array[Byte] =
    Containers.synthJpegGray(16, 8, (bx, by) => ((seed * 31 + (by * 2 + bx) * 7) % 256).toInt)

  test("planted APP1 round-trips through extraction") {
    val withExif = Exif.withApp1(jpeg(5), Exif.synthApp1(meta))
    assert(Exif.fromJpeg(withExif) == meta)
    // a plain JPEG has no EXIF — null, not an empty struct
    assert(Exif.fromJpeg(jpeg(5)) == null)
    // non-JPEG bytes: no EXIF either
    assert(Exif.fromJpeg("plain text".getBytes("US-ASCII")) == null)
  }

  test("big-endian TIFF blocks parse too") {
    // hand-flip the synthesized block to MM byte order: rewrite the
    // header + IFD scalar fields. Simpler: build a minimal MM block
    // with just Orientation inline.
    val tiff = new Array[Byte](8 + 2 + 12 + 4)
    tiff(0) = 'M'; tiff(1) = 'M'; tiff(3) = 42
    tiff(7) = 8 // IFD0 offset
    tiff(9) = 1 // one entry
    tiff(10) = 0x01; tiff(11) = 0x12 // Orientation
    tiff(13) = 3 // SHORT
    tiff(17) = 1 // count
    tiff(19) = 8 // value: orientation 8 (big-endian u16 at entry+8)
    val seg = new java.io.ByteArrayOutputStream()
    seg.write(0xFF); seg.write(0xE1)
    val len = 2 + 6 + tiff.length
    seg.write(len >> 8); seg.write(len & 0xFF)
    seg.write("Exif".getBytes("US-ASCII")); seg.write(0); seg.write(0)
    seg.write(tiff, 0, tiff.length)
    val e = Exif.fromJpeg(Exif.withApp1(jpeg(9), seg.toByteArray))
    assert(e != null && e.orientation == 8L && e.make == "" && e.latRef == "")
  }

  test("strip removes exactly the APP1 and pixels survive") {
    val plain = jpeg(7)
    val app1 = Exif.synthApp1(meta)
    val withExif = Exif.withApp1(plain, app1)
    // pixels decode identically with and without the APP1 present
    val px = Containers.jpegPixelBytes(plain)
    assert(px != null && Containers.jpegPixelBytes(withExif).toSeq == px.toSeq)
    val stripped = Exif.stripJpeg(withExif)
    assert(stripped != null)
    assert(stripped.toSeq == plain.toSeq) // byte-exact removal
    assert(Exif.fromJpeg(stripped) == null)
    assert(withExif.length - stripped.length == app1.length)
    // idempotent: stripping a clean JPEG changes nothing
    assert(Exif.stripJpeg(plain).toSeq == plain.toSeq)
    // non-JPEG input passes through (nothing to strip)
    val txt = "not an image".getBytes("US-ASCII")
    assert(Exif.stripJpeg(txt) eq txt)
  }

  test("damaged segment walks degrade, never pass unverified bytes") {
    val withExif = Exif.withApp1(jpeg(11), Exif.synthApp1(meta))
    // corrupt the APP1 length so the walk runs past the input
    val bad = withExif.clone()
    bad(2 + 2) = 0x7F.toByte // APP1 length high byte → huge
    assert(Exif.stripJpeg(bad) == null)
    assert(Exif.fromJpeg(bad) == null)
    // truncated TIFF block inside a well-framed APP1: walk is sound,
    // extraction degrades to null, strip still removes the segment
    val app1 = Exif.synthApp1(meta)
    val shortApp1 = java.util.Arrays.copyOf(app1, 16)
    shortApp1(2) = 0; shortApp1(3) = 14 // re-frame the truncated seg
    val framed = Exif.withApp1(jpeg(11), shortApp1)
    assert(Exif.fromJpeg(framed) == null)
    val strippedShort = Exif.stripJpeg(framed)
    assert(strippedShort != null && Exif.fromJpeg(strippedShort) == null)
  }
  test("0xFF fill bytes between segments are tolerated (real camera files)") {
    val withExif = Exif.withApp1(jpeg(13), Exif.synthApp1(meta))
    // insert a run of fill bytes right before the APP1 marker (after SOI)
    val filled = withExif.take(2) ++ Array.fill[Byte](3)(0xFF.toByte) ++
      withExif.drop(2)
    val got = Exif.fromJpeg(filled)
    assert(got != null && got.make == meta.make && got.latDeg == meta.latDeg)
    val stripped = Exif.stripJpeg(filled)
    assert(stripped != null && Exif.fromJpeg(stripped) == null)
    // non-EXIF segments keep their fill prefix byte-exact
    val plain = jpeg(13)
    val plainFilled = plain.take(2) ++ Array.fill[Byte](2)(0xFF.toByte) ++
      plain.drop(2)
    assert(Exif.stripJpeg(plainFilled).toSeq == plainFilled.toSeq)
  }

}
