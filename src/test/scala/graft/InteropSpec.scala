package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Containers

/** Interop pins against the JDK's OWN image codecs (`javax.imageio`):
  * every from-scratch decoder here must read what a standard encoder
  * writes, and every synthesizer must be readable by a standard
  * decoder — otherwise a self-consistent encode/decode pair can hide
  * a convention bug that only real-world files expose (exactly what
  * happened with GIF LZW code-width timing: the TIFF-style "early
  * change" round-tripped internally but failed on every giflib-encoded
  * GIF). ImageIO ships GIF/PNG/BMP/JPEG/TIFF read+write in the bare
  * JDK, so these tests need no fixtures and no network.
  */
class InteropSpec extends AnyFunSuite {

  import java.awt.image.{BufferedImage, IndexColorModel}
  import javax.imageio.ImageIO

  private def writeBytes(img: BufferedImage, format: String): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    assert(ImageIO.write(img, format, out), s"JDK cannot write $format")
    out.toByteArray
  }

  private def readImg(b: Array[Byte]): BufferedImage =
    ImageIO.read(new java.io.ByteArrayInputStream(b))

  /** RGB triple of pixel (x,y) from an ImageIO decode. */
  private def rgbOf(img: BufferedImage, x: Int, y: Int): (Int, Int, Int) = {
    val v = img.getRGB(x, y)
    ((v >> 16) & 0xFF, (v >> 8) & 0xFF, v & 0xFF)
  }

  // deterministic, LZW-hostile index pattern (few repeats → the
  // dictionary grows through every code-width bump and past 4096)
  private def idxPattern(w: Int, h: Int, np: Int)(x: Int, y: Int): Int =
    (x * 7 + y * 13 + x * y + (x * x + 3 * y * y) / 5) % np

  test("gif: a JDK-ImageIO-encoded GIF decodes (standard LZW timing)") {
    val w = 128; val h = 128 // 16384 px: dict passes 512/1024/2048/4096
    val r = Array.tabulate(256)(j => ((j * 41 + 7) % 256).toByte)
    val g = Array.tabulate(256)(j => ((j * 73 + 11) % 256).toByte)
    val b = Array.tabulate(256)(j => ((j * 97 + 13) % 256).toByte)
    val icm = new IndexColorModel(8, 256, r, g, b)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_INDEXED, icm)
    for (y <- 0 until h; x <- 0 until w)
      img.getRaster.setSample(x, y, 0, idxPattern(w, h, 256)(x, y))
    val gif = writeBytes(img, "gif")
    val px = Containers.gifPixelBytes(gif)
    assert(px != null, "decoder rejected a standard-encoder GIF")
    val ref = readImg(gif)
    for (y <- 0 until h; x <- 0 until w) {
      val d = (y * w + x) * 3
      val (rr, gg, bb) = rgbOf(ref, x, y)
      assert((px(d) & 0xFF, px(d + 1) & 0xFF, px(d + 2) & 0xFF) == (rr, gg, bb),
        s"pixel ($x,$y)")
    }
  }

  test("gif: synthGif output is readable by the JDK's standard decoder") {
    val w = 90; val h = 70 // 6300 px: crosses the 512/1024/2048 bumps
    val np = 256
    val pal = Array.tabulate(3 * np) { i =>
      val j = i / 3
      (i % 3) match {
        case 0 => (j * 41 + 7) % 256
        case 1 => (j * 73 + 11) % 256
        case _ => (j * 97 + 13) % 256
      }
    }
    for (interlaced <- Seq(false, true)) {
      val idx = Array.tabulate(w * h)(i => idxPattern(w, h, np)(i % w, i / w))
      val gif = Containers.synthGif(w, h, pal, idx, interlaced)
      val ref = readImg(gif)
      assert(ref != null, s"JDK decoder rejected synthGif interlaced=$interlaced")
      assert(ref.getWidth == w && ref.getHeight == h)
      for (y <- 0 until h; x <- 0 until w) {
        val j = idx(y * w + x)
        assert(rgbOf(ref, x, y) == (pal(3 * j), pal(3 * j + 1), pal(3 * j + 2)),
          s"pixel ($x,$y) interlaced=$interlaced")
      }
    }
  }

  test("gif: dictionary-full CLEAR + reset survives a standard decoder") {
    // enough low-entropy-free pixels to push the dictionary to 4096 and
    // force synthGif's mid-stream CLEAR; the JDK decoder must resync
    val w = 200; val h = 160 // 32000 px
    val np = 256
    val pal = Array.tabulate(3 * np)(i => (i * 37 + 5) % 256)
    val idx = Array.tabulate(w * h)(i => idxPattern(w, h, np)(i % w, i / w))
    val gif = Containers.synthGif(w, h, pal, idx)
    // also require the internal decoder to agree with the JDK decoder
    val mine = Containers.gifPixelBytes(gif)
    val ref = readImg(gif)
    assert(mine != null && ref != null)
    for (y <- 0 until h; x <- 0 until w) {
      val d = (y * w + x) * 3
      assert(rgbOf(ref, x, y) ==
        (mine(d) & 0xFF, mine(d + 1) & 0xFF, mine(d + 2) & 0xFF),
        s"pixel ($x,$y)")
    }
  }

  test("png: JDK-encoded PNG decodes; synthPng is JDK-readable") {
    val w = 40; val h = 30
    val img = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, ((x * 7 + y) % 256 << 16) | ((y * 11 + x) % 256 << 8) |
        (x * y % 256))
    val png = writeBytes(img, "png")
    val px = Containers.pngPixelBytes(png)
    assert(px != null, "decoder rejected a standard-encoder PNG")
    for (y <- 0 until h; x <- 0 until w) {
      val d = (y * w + x) * 3
      assert(rgbOf(img, x, y) ==
        (px(d) & 0xFF, px(d + 1) & 0xFF, px(d + 2) & 0xFF), s"pixel ($x,$y)")
    }
    // reverse: all five filter types through a standard decoder
    val samples = Array.tabulate(w * h * 3)(i => ((i * 31 + 7) % 256).toByte)
    val mine = Containers.synthPng(w, h, samples, row => row % 5)
    val ref = readImg(mine)
    assert(ref != null)
    for (y <- 0 until h; x <- 0 until w) {
      val d = (y * w + x) * 3
      assert(rgbOf(ref, x, y) ==
        (samples(d) & 0xFF, samples(d + 1) & 0xFF, samples(d + 2) & 0xFF),
        s"pixel ($x,$y)")
    }
  }

  /** ImageIO TIFF write with an explicit compression type. */
  private def writeTiff(img: BufferedImage, compression: String): Array[Byte] = {
    val writer = ImageIO.getImageWritersByFormatName("tiff").next()
    val param = writer.getDefaultWriteParam
    param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionType(compression)
    val baos = new java.io.ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(baos)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
    ios.close(); writer.dispose()
    baos.toByteArray
  }

  test("tiff: JDK-encoded LZW/Deflate/PackBits strips decode") {
    val w = 100; val h = 80 // large enough to cross LZW width bumps
    val img = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, (idxPattern(w, h, 256)(x, y) << 16) |
        ((x * 3 + y * 5) % 256 << 8) | ((x + y * y) % 256))
    val supported = {
      val writer = ImageIO.getImageWritersByFormatName("tiff").next()
      val types = writer.getDefaultWriteParam.getCompressionTypes.toSeq
      writer.dispose()
      Seq("LZW", "Deflate", "ZLib", "PackBits").filter(types.contains)
    }
    assert(supported.contains("LZW"), s"JDK TIFF writer types: $supported")
    for (ctype <- supported) {
      val tiff = writeTiff(img, ctype)
      val px = Containers.tiffPixelBytes(tiff)
      assert(px != null, s"decoder rejected a JDK $ctype TIFF")
      for (y <- 0 until h; x <- 0 until w) {
        val d = (y * w + x) * 3
        assert(rgbOf(img, x, y) ==
          (px(d) & 0xFF, px(d + 1) & 0xFF, px(d + 2) & 0xFF),
          s"$ctype pixel ($x,$y)")
      }
    }
  }

  test("tiff: JDK-written TILED files decode; tiled synth is JDK-readable") {
    val w = 70; val h = 50 // 16-px tiles: ragged 5×4 grid
    val img = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, (idxPattern(w, h, 256)(x, y) << 16) |
        ((x * 5 + y * 3) % 256 << 8) | ((x + 2 * y) % 256))
    val writer = ImageIO.getImageWritersByFormatName("tiff").next()
    val param = writer.getDefaultWriteParam
    param.setTilingMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    param.setTiling(16, 16, 0, 0)
    param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionType("LZW")
    val baos = new java.io.ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(baos)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
    ios.close(); writer.dispose()
    val px = Containers.tiffPixelBytes(baos.toByteArray)
    assert(px != null, "decoder rejected a JDK tiled LZW TIFF")
    for (y <- 0 until h; x <- 0 until w) {
      val d = (y * w + x) * 3
      assert(rgbOf(img, x, y) ==
        (px(d) & 0xFF, px(d + 1) & 0xFF, px(d + 2) & 0xFF), s"tile ($x,$y)")
    }
    // reverse: our tiled+PackBits synth through the JDK decoder
    val samples = Array.tabulate(w * h * 3)(i =>
      (idxPattern(w, h, 256)((i / 3) % w, (i / 3) / w) + i % 3).toByte)
    val mine = Containers.synthTiff(w, h, 3, samples,
      compression = 32773, tileSize = 16)
    val ref = readImg(mine)
    assert(ref != null, "JDK decoder rejected a tiled synth")
    for (y <- 0 until h; x <- 0 until w) {
      val d = (y * w + x) * 3
      assert(rgbOf(ref, x, y) ==
        (samples(d) & 0xFF, samples(d + 1) & 0xFF, samples(d + 2) & 0xFF),
        s"rt ($x,$y)")
    }
  }

  test("tiff: JDK palette TIFF decodes; WhiteIsZero/palette synths JDK-readable") {
    val w = 60; val h = 40
    // JDK → us: an indexed-color TIFF (Photometric 3 + ColorMap)
    val r = Array.tabulate(256)(j => ((j * 41 + 7) % 256).toByte)
    val g = Array.tabulate(256)(j => ((j * 73 + 11) % 256).toByte)
    val b = Array.tabulate(256)(j => ((j * 97 + 13) % 256).toByte)
    val icm = new IndexColorModel(8, 256, r, g, b)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_INDEXED, icm)
    for (y <- 0 until h; x <- 0 until w)
      img.getRaster.setSample(x, y, 0, idxPattern(w, h, 256)(x, y))
    val tiff = writeBytes(img, "tiff")
    val px = Containers.tiffPixelBytes(tiff)
    assert(px != null, "decoder rejected a JDK palette TIFF")
    val ref = readImg(tiff)
    for (y <- 0 until h; x <- 0 until w) {
      val d = (y * w + x) * 3
      assert(rgbOf(ref, x, y) ==
        (px(d) & 0xFF, px(d + 1) & 0xFF, px(d + 2) & 0xFF), s"pal ($x,$y)")
    }
    // us → JDK: WhiteIsZero must invert under a standard decoder
    val gray = Array.tabulate(w * h)(i => ((i * 31 + 7) % 256).toByte)
    val wiz = Containers.synthTiff(w, h, 1, gray, compression = 5,
      photometric = 0)
    val refW = readImg(wiz)
    assert(refW != null, "JDK decoder rejected a WhiteIsZero synth")
    for (y <- 0 until h; x <- 0 until w) {
      // compare RASTER samples: the JDK maps MinIsWhite to an exact
      // 255-v raster but getRGB then applies a gray→sRGB transfer
      val inv = 255 - (gray(y * w + x) & 0xFF)
      assert(refW.getRaster.getSample(x, y, 0) == inv, s"wiz ($x,$y)")
    }
    // us → JDK: palette entries resolve identically. 16-bit entries
    // use the 8→16 replication convention (c·257 = c<<8|c) real
    // writers emit — the JDK folds by v·255/65535, we by v>>8, and
    // only replicated entries agree under both
    val cmap = Array.tabulate(3 * 256) { i =>
      val j = i % 256
      val c = (i / 256) match {
        case 0 => (j * 41 + 7) % 256
        case 1 => (j * 73 + 11) % 256
        case _ => (j * 97 + 13) % 256
      }
      c * 257
    }
    val pal = Containers.synthTiff(w, h, 1, gray, compression = 8,
      photometric = 3, colorMap = cmap)
    val refP = readImg(pal)
    assert(refP != null, "JDK decoder rejected a palette synth")
    for (y <- 0 until h; x <- 0 until w) {
      val j = gray(y * w + x) & 0xFF
      assert(rgbOf(refP, x, y) ==
        ((j * 41 + 7) % 256, (j * 73 + 11) % 256, (j * 97 + 13) % 256),
        s"pal-rt ($x,$y)")
    }
  }

  test("tiff: synthTiff compressed+predictor output is JDK-readable") {
    val w = 90; val h = 60
    val samples = Array.tabulate(w * h * 3)(i =>
      (idxPattern(w, h, 256)((i / 3) % w, (i / 3) / w) + i % 3).toByte)
    for ((comp, pred) <- Seq((5, 1), (5, 2), (8, 1), (8, 2), (32773, 1))) {
      val tiff = Containers.synthTiff(w, h, 3, samples,
        rowsPerStrip = 17, compression = comp, predictor = pred)
      val ref = readImg(tiff)
      assert(ref != null, s"JDK decoder rejected synthTiff comp=$comp pred=$pred")
      for (y <- 0 until h; x <- 0 until w) {
        val d = (y * w + x) * 3
        assert(rgbOf(ref, x, y) ==
          (samples(d) & 0xFF, samples(d + 1) & 0xFF, samples(d + 2) & 0xFF),
          s"comp=$comp pred=$pred pixel ($x,$y)")
      }
    }
  }

  test("jpeg: synthJpegYccCoefs 4:2:0 stream is readable by the JDK decoder") {
    // uniform chroma across the whole image: libjpeg's "fancy"
    // triangle upsampling of a constant plane equals nearest, so the
    // only cross-decoder deltas are fixed-point IDCT/color rounding
    val w = 48; val h = 32 // 3×2 MCUs
    val q = Array.fill(64)(8)
    val yGrid = Array.tabulate(6 * 4)(b => (17 * b + 23) % 256)
    val jpeg = Containers.synthJpegYccCoefs(w, h, q,
      (comp, bx, by) => {
        val c = new Array[Int](64)
        c(0) = (comp match {
          case 0 => yGrid(by * 6 + bx)
          case 1 => 128 - 23
          case _ => 128 + 46
        }) - 128
        c
      },
      sampling = Seq((2, 2), (1, 1), (1, 1)))
    val ref = readImg(jpeg)
    assert(ref != null, "JDK decoder rejected a synthesized 4:2:0 stream")
    assert(ref.getWidth == w && ref.getHeight == h)
    val mine = Containers.jpegPixelBytes(jpeg)
    assert(mine != null)
    var maxDiff = 0
    for (y <- 0 until h; x <- 0 until w) {
      val d = (y * w + x) * 3
      val (r, g, b) = rgbOf(ref, x, y)
      maxDiff = math.max(maxDiff, math.abs(r - (mine(d) & 0xFF)))
      maxDiff = math.max(maxDiff, math.abs(g - (mine(d + 1) & 0xFF)))
      maxDiff = math.max(maxDiff, math.abs(b - (mine(d + 2) & 0xFF)))
    }
    // ±2 covers fixed-point vs double IDCT and color-table rounding;
    // a sampling/MCU-walk desync would blow far past this
    assert(maxDiff <= 2, s"max per-channel delta $maxDiff vs JDK decoder")
  }

  test("jpeg: a JDK-ImageIO-encoded color JPEG decodes within tolerance") {
    // smooth gradients: chroma varies ≤1/px, so nearest-vs-fancy
    // upsampling stays small; both decoders read the SAME lossy file
    val w = 64; val h = 48
    val img = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, ((60 + 2 * x) << 16) | ((40 + 2 * y) << 8) | 120)
    val jpeg = writeBytes(img, "jpeg")
    val px = Containers.jpegPixelBytes(jpeg)
    assert(px != null, "decoder rejected a JDK-encoded color JPEG " +
      "(JDK writers emit 4:2:0 by default)")
    val ref = readImg(jpeg)
    var maxDiff = 0; var sumDiff = 0L
    for (y <- 0 until h; x <- 0 until w) {
      val d = (y * w + x) * 3
      val (r, g, b) = rgbOf(ref, x, y)
      val dr = math.abs(r - (px(d) & 0xFF))
      val dg = math.abs(g - (px(d + 1) & 0xFF))
      val db = math.abs(b - (px(d + 2) & 0xFF))
      maxDiff = math.max(maxDiff, math.max(dr, math.max(dg, db)))
      sumDiff += dr + dg + db
    }
    val meanDiff = sumDiff.toDouble / (w * h * 3)
    assert(maxDiff <= 12 && meanDiff <= 2.0,
      s"vs JDK decode of the same file: max=$maxDiff mean=$meanDiff")
  }

  test("png: synthPngAdam7 interlaced output is readable by the JDK decoder") {
    val w = 21; val h = 13 // non-multiples of 8: ragged passes
    val samples = Array.tabulate(w * h * 3)(i => ((i * 31 + 7) % 256).toByte)
    val png = Containers.synthPngAdam7(w, h, 2, samples, _ % 5)
    val ref = readImg(png)
    assert(ref != null, "JDK decoder rejected an Adam7 synth")
    for (y <- 0 until h; x <- 0 until w) {
      val d = (y * w + x) * 3
      assert(rgbOf(ref, x, y) ==
        (samples(d) & 0xFF, samples(d + 1) & 0xFF, samples(d + 2) & 0xFF),
        s"pixel ($x,$y)")
    }
  }

  test("png: JDK palette and 16-bit-gray PNGs decode; synths are JDK-readable") {
    // JDK-written 8-bit palette PNG (TYPE_BYTE_INDEXED) → our decoder
    val w = 33; val h = 21
    val r = Array.tabulate(256)(j => ((j * 41 + 7) % 256).toByte)
    val g = Array.tabulate(256)(j => ((j * 73 + 11) % 256).toByte)
    val b = Array.tabulate(256)(j => ((j * 97 + 13) % 256).toByte)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_INDEXED,
      new IndexColorModel(8, 256, r, g, b))
    for (y <- 0 until h; x <- 0 until w)
      img.getRaster.setSample(x, y, 0, (x * 7 + y * 13) % 256)
    val png = writeBytes(img, "png")
    val px = Containers.pngPixelBytes(png)
    assert(px != null, "decoder rejected a JDK palette PNG")
    for (y <- 0 until h; x <- 0 until w) {
      val d = (y * w + x) * 3
      assert(rgbOf(img, x, y) ==
        (px(d) & 0xFF, px(d + 1) & 0xFF, px(d + 2) & 0xFF), s"pal ($x,$y)")
    }
    // our palette synth at sub-byte depth → JDK decoder
    val pal4 = Array.tabulate(3 * 16)(i => (i * 31 + 5) % 256)
    val idx4 = Array.tabulate(w * h)(i => (i * 11 + 2) % 16)
    val mine4 = Containers.synthPngPal(w, h, 4, pal4, idx4, _ % 5)
    val ref4 = readImg(mine4)
    assert(ref4 != null, "JDK decoder rejected a depth-4 palette synth")
    for (y <- 0 until h; x <- 0 until w) {
      val j = idx4(y * w + x)
      assert(rgbOf(ref4, x, y) ==
        (pal4(3 * j), pal4(3 * j + 1), pal4(3 * j + 2)), s"pal4 ($x,$y)")
    }
    // JDK-written 16-bit gray (TYPE_USHORT_GRAY) → our decoder reads
    // the high byte of each big-endian sample
    val img16 = new BufferedImage(w, h, BufferedImage.TYPE_USHORT_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      img16.getRaster.setSample(x, y, 0, ((x * 257 + y * 1031) * 97) % 65536)
    val png16 = writeBytes(img16, "png")
    val px16 = Containers.pngPixelBytes(png16)
    assert(px16 != null, "decoder rejected a JDK 16-bit gray PNG")
    for (y <- 0 until h; x <- 0 until w) {
      val expect = img16.getRaster.getSample(x, y, 0) >> 8
      assert((px16((y * w + x) * 3) & 0xFF) == expect, s"16-bit ($x,$y)")
    }
    // our 16-bit synth → JDK decoder returns the full 16-bit samples
    val hi = Array.tabulate(w * h)(i => ((i * 13 + 1) % 256).toByte)
    val lo = Array.tabulate(w * h)(i => ((i * 91 + 7) % 256).toByte)
    val mine16 = Containers.synthPngGray16(w, h, hi, lo, _ % 5)
    val ref16 = readImg(mine16)
    assert(ref16 != null && ref16.getType == BufferedImage.TYPE_USHORT_GRAY)
    for (y <- 0 until h; x <- 0 until w) {
      val p = y * w + x
      assert(ref16.getRaster.getSample(x, y, 0) ==
        ((hi(p) & 0xFF) << 8 | (lo(p) & 0xFF)), s"16rt ($x,$y)")
    }
  }

  test("jpeg: JDK-encoded PROGRESSIVE streams decode (gray and color)") {
    // the JDK JPEG writer emits real multi-scan progressive streams
    // (spectral selection + successive approximation) — the profile
    // ~1/5 of real web JPEGs use
    def writeProgressive(img: BufferedImage): Array[Byte] = {
      val writer = ImageIO.getImageWritersByFormatName("jpeg").next()
      val param = writer.getDefaultWriteParam
      param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
      val baos = new java.io.ByteArrayOutputStream()
      val ios = ImageIO.createImageOutputStream(baos)
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
      ios.close(); writer.dispose()
      baos.toByteArray
    }
    def sofMarker(b: Array[Byte]): Int = {
      var off = 2
      while (true) {
        val m = b(off + 1) & 0xFF
        if (m >= 0xC0 && m <= 0xCF && m != 0xC4 && m != 0xC8 && m != 0xCC)
          return m
        off += 2 + (((b(off + 2) & 0xFF) << 8) | (b(off + 3) & 0xFF))
      }
      -1
    }
    val w = 64; val h = 48
    // grayscale
    val gimg = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      gimg.getRaster.setSample(x, y, 0, (40 + 2 * x + y) % 256)
    val gjpg = writeProgressive(gimg)
    assert(sofMarker(gjpg) == 0xC2, "JDK did not write progressive")
    val gpx = Containers.jpegPixelBytes(gjpg)
    assert(gpx != null, "decoder rejected a JDK progressive gray JPEG")
    val gref = readImg(gjpg)
    var gmax = 0
    for (y <- 0 until h; x <- 0 until w) {
      // compare RASTER samples: getRGB on TYPE_BYTE_GRAY applies a
      // linear-gray→sRGB gamma map, which is display conversion, not
      // what the JPEG stream encodes
      val r = gref.getRaster.getSample(x, y, 0)
      gmax = math.max(gmax, math.abs(r - (gpx((y * w + x) * 3) & 0xFF)))
    }
    assert(gmax <= 2, s"gray progressive: max delta $gmax vs JDK decoder")
    // color (the writer subsamples + interleaves the DC scan)
    val cimg = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w)
      cimg.setRGB(x, y, ((60 + 2 * x) << 16) | ((40 + 2 * y) << 8) | 120)
    val cjpg = writeProgressive(cimg)
    assert(sofMarker(cjpg) == 0xC2)
    val cpx = Containers.jpegPixelBytes(cjpg)
    assert(cpx != null, "decoder rejected a JDK progressive color JPEG")
    val cref = readImg(cjpg)
    var cmax = 0; var csum = 0L
    for (y <- 0 until h; x <- 0 until w) {
      val d = (y * w + x) * 3
      val (r, g, bb) = rgbOf(cref, x, y)
      val dr = math.abs(r - (cpx(d) & 0xFF))
      val dg = math.abs(g - (cpx(d + 1) & 0xFF))
      val db = math.abs(bb - (cpx(d + 2) & 0xFF))
      cmax = math.max(cmax, math.max(dr, math.max(dg, db)))
      csum += dr + dg + db
    }
    val cmean = csum.toDouble / (w * h * 3)
    assert(cmax <= 12 && cmean <= 2.0,
      s"color progressive: max=$cmax mean=$cmean vs JDK decoder")
  }

  test("bmp: JDK-encoded BMP decodes; synthBmp24 is JDK-readable") {
    val w = 37; val h = 23 // odd width: row padding in play
    val img = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, ((x * 5 + y * 3) % 256 << 16) |
        ((x + y * 7) % 256 << 8) | ((x * 11 + y) % 256))
    val bmp = writeBytes(img, "bmp")
    val px = Containers.bmpPixelBytes(bmp) // B,G,R order
    assert(px != null, "decoder rejected a standard-encoder BMP")
    for (y <- 0 until h; x <- 0 until w) {
      val d = (y * w + x) * 3
      val (r, g, b) = rgbOf(img, x, y)
      assert((px(d + 2) & 0xFF, px(d + 1) & 0xFF, px(d) & 0xFF) == (r, g, b),
        s"pixel ($x,$y)")
    }
    val pixels = Array.tabulate(w * h * 3)(i => ((i * 13 + 5) % 256).toByte)
    val ref = readImg(Containers.synthBmp24(w, h, pixels)) // B,G,R input
    assert(ref != null)
    for (y <- 0 until h; x <- 0 until w) {
      val d = (y * w + x) * 3
      assert(rgbOf(ref, x, y) ==
        (pixels(d + 2) & 0xFF, pixels(d + 1) & 0xFF, pixels(d) & 0xFF),
        s"pixel ($x,$y)")
    }
  }
  test("gif: synthGifAnim frames are readable by the JDK's decoder") {
    import Containers.GifFrame
    val gct = Array.tabulate(3 * 16) { t =>
      val j = t / 3
      (t % 3) match {
        case 0 => (j * 41 + 7) % 256
        case 1 => (j * 73 + 11) % 256
        case _ => (j * 97 + 13) % 256
      }
    }
    val gif = Containers.synthGifAnim(16, 16, gct, 3, Seq(
      GifFrame(0, 0, 16, 16, Array.tabulate(256)(i => (i * 7 + i / 16) % 16)),
      GifFrame(8, 0, 8, 8,
        Array.tabulate(64)(i => (i * 5 + 1) % 16), transparentIdx = 7),
      GifFrame(0, 8, 8, 8,
        Array.tabulate(64)(i => (i * 3 + 2) % 16), disposal = 2)))
    val iis = ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(gif))
    val reader = ImageIO.getImageReaders(iis).next()
    reader.setInput(iis)
    assert(reader.getNumImages(true) == 3, "JDK sees all three frames")
    // frame 0 raster must match the index generator through the GCT
    val f0 = reader.read(0)
    assert(f0.getWidth == 16 && f0.getHeight == 16)
    for (y <- 0 until 16; x <- 0 until 16) {
      val j = (((y * 16 + x) * 7) + (y * 16 + x) / 16) % 16
      assert(rgbOf(f0, x, y) ==
        ((gct(3 * j), gct(3 * j + 1), gct(3 * j + 2))), s"frame0 ($x,$y)")
    }
    // frame 1 is its own 8x8 rect; a non-transparent index resolves
    val f1 = reader.read(1)
    assert(f1.getWidth == 8 && f1.getHeight == 8)
    val j1 = 1 // local i=0 -> (0*5+1)%16
    assert(rgbOf(f1, 0, 0) == ((gct(3 * j1), gct(3 * j1 + 1), gct(3 * j1 + 2))))
    reader.dispose(); iis.close()
  }
}
