package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Webp

/** VP8L decoder conformance against REAL libwebp output: the
  * embedded fixtures were produced by libwebp's lossless encoder
  * (`WebPEncodeLosslessRGB`, libwebp.so.7.1.5) over deterministic
  * pixel formulas this spec regenerates — so every assertion pins the
  * from-scratch decoder byte-for-byte against the reference
  * implementation, across the shapes that encoder actually emits
  * (transform stacks, color cache, meta-prefix groups, LZ77 with 2-D
  * distances, code-length-coded Huffman trees). The lossy fixture
  * pins the named-profile-gap contract. Synth round-trips pin the
  * write side the corpus generators use.
  */
class WebpSpec extends AnyFunSuite {

  private val noise8B64: String =
      "UklGRioAAABXRUJQVlA4TB0AAAAvB8ABAM1kRP8DRNo2Jjb/dELPbmDy5yAmgGXHDQA="

  private val gradient32B64: String =
      "UklGRjoAAABXRUJQVlA4TC0AAAAvH8AHAAmASNoffIWI/qcuBAJJCPsDz1CIAe9/FHgICQjR/9eyMggREwDW3hsA"

  private val tiled48B64: String =
      "UklGRlAAAABXRUJQVlA4TEQAAAAvL8ALAM1kRP9jE6UY8P5HQW3bNox235Mz83WmTB0QEpApzQyRgrQNGM0VV3U7hIK0DZhOwHUh" +
      "Q49i0gyMlxPH7/s7HQ=="

  private val palette16B64: String =
      "UklGRjoAAABXRUJQVlA4TC0AAAAvD8ADAB8gEEjaH3qN+RcQFPk/2vwHXySAMNtokpOc5P2OIaL/MelL+zR/kw8A"

  private val stripes64B64: String =
      "UklGRkAAAABXRUJQVlA4TDMAAAAvP8AFABcgEEhim35EsWDyDzDc2ASyyUnyX5TzH2ujgSDbZpKXPGoJIvqf8fHz+Ph5fBwA"

  private val rand24B64: String =
      "UklGRsgEAABXRUJQVlA4TLwEAAAvF8ADAAXEAAAIJrZt27Zt2y3btm3btm3btm37DgUAABD/////////////nwIAAIj/////////" +
      "////r/+xIWpyBMG6Rue2g+E3JuVmSf6LCP3zyA1wLzqRxurYQdPiuLODqda3vGin1vofmvUUndsKmb3yMMy9ikaIyAWXwxSK6D4V" +
      "8Sh9J0vlwWHQ9wglPiV/+24OIi0aqKjLKQCrrkZODosCaCcEezV9jJ6QxKm9EOlYi2AHa6tWwn7ARQtQyTDSfmesLusJldsqHpvg" +
      "su/kMXihhSG3a5Gw4i60vnDNcBjd/Rti9ZMl2cVfykJNF0c30MCeOlwxqvYYpSNhPbeSSnKWH5RBUJrxlsmGSNoh/H3OVr3zLoe7" +
      "9b878J9GXbX6xSAGfEejmbMVuOBL9nMrlCRNrCadLz6Q9rTi4BwHXAkgR3dtMTzUAemJjxROCusyc8g6vR4XhiAzZ/c4v9PIpitl" +
      "Sb1/0Debxt6VhUd3stYKFZIqYTxZmNiBWqS1Jj3+d6Z/LmyDAyD4Fr63JfAJWzaO4PkK2qHz90lULS5NHnFTZDIeGCJjl+Fi29Zs" +
      "DZKYZAF8RjkJ79AGhC8hRTow4DRKKBENxmDVyw2Rf3c23l+M2e9EQKoMT9pGLhywL3wYbUU5kFapY1pzy8mFHA6i1SsQnZ97RfV2" +
      "8mlhgQk6arfhkZJLILaZzugopLJN91m/eTMb5gcKt07WvlgiZDE/EyaobM9aWQJqx6OEPlhCUZTQ9CDje7H/1d/YdtVkxPiReP9O" +
      "fH2AN4lteJE0NY9OuDjsMiwnU5wk899a9DB6qjQ+MeXBCW0mOGIf8wnmcDNf7JyXsyIUwZ90HQXYUrulld33n368jFmYKJyPmGUM" +
      "Hu47RE6hWmdhI181Er9vToaJ59z/y4+jTxepUXgLAYvrdsB9fvLFiMbMDgBmPOQfztGU96exvPhkp2mtW8zKs3vy9GDOS+IDLvzL" +
      "5TFouTmwquei7Yr1iuXnErmOtcW3MDPTVgGtdvzQPqzUYIa+wmAneI3RSdDDTXyaVJUZVqTmfWldhShNj5rNh1LKS+Oqxsh5Z2E7" +
      "SfPDuTBpEDf2WwVu8WbW9uqCBTJduemkZ318GGg73ObKANoylOCO512Vl1eyizuIZg8edC21XWC+R1Cq9NTgPM80fNfvgap8SWeJ" +
      "h2eUoZMJ/jQBQmVpW79L/EVNmsAFq0LKBhoHnEaKTeH///+9z70gmKzEFaMTe/wDrDCi/57zu7nDyQZDI6TUMAkBD/ccfMPVwhd9" +
      "ehu7AVk3/5OncizhaE1wdAE074tqETdxKv4dOQE9wpymCbfaHLkQZl5nYKa/oOgvR7aF9PKOBs0hkTLHzgr1aTtl9kHHXdaMkCWb" +
      "XCByKsyBXCqA0Wmx3rJaejKJ8rOgceK83qJ4gu6cYmAMejjonXVucWXLmShq3CumTgq3EVm0EW3hJgzeZ6eYDogIKjULmM9l6lRR" +
      "gVPaXG0SmWtcYJdTf5GzfimfJPkh9GuO1DBCeuDv39BryN3gAqihGLOyhjsBL8rEQXoWD2XIiYtzyPoKDDXdxEpys9UoNfmEsYMS" +
      "T6noKmQlwMukS+qXOVTeVpCTSh23ooxmpquRElCr+yg="

  private val photo128B64: String =
      "UklGRnYMAABXRUJQVlA4TGoMAAAvf8ATAAmgQATyx25H9D/1FkBC+D9ejuh/6sG3bdu2Gsm2JSCjC5Jd3KP//9fZazzNovstpaAL" +
      "QwPmO8XYtl23DYC/EAgwONz+q2MJG0wIn2IkSYpka3fWj977/FN/6VaC9+KYQpIbSY4kid1jQkcRnvmCn+fzvfv1z+3q7fRj8/X+" +
      "eL86ni9e/vQ4vx0+rs/HY6/X/96v/96u9j829+P1/Pz+vNvub7fL2+3Lx8fmvLo8vP+cdu839+vb7fHyertcvdyuH6f1y/F5e1yd" +
      "f17+Pl5v757PN7vty+dy97oeN4fLan39OD/8WC6f26/t7vi/9fnH+4/Xv+fr8/nDZfe4+9ienl/82n89eN/uXa3fV24/N5xe+vt7" +
      "s/u82l1uTm8fl5vL5/H+97I+Plztzhenm4vT74279/Xyud6sX10/f6+Xn/bWh/ft96fXh8+f08Xh9fLdw+3z4vzz9v7xuXuwebk6" +
      "c/Jx/bq43Dm+v98uq8P37f3rafle7R7ufG28rV6P+6277cfL5o8Lx9XhcX27/1xsz+fL9ePDsX47Lh5fNg8X59f1/Xa1vlzs/7z+" +
      "+F5tT9fr+WV3e7n99f76z+XjZbXc7BYvt+MfKMoYRTWNVhmCBDEqFCijDCpDBSANhZChgArEoGIKCRKDCkGauaJAEqNQTIGkmUpi" +
      "9MOkKXgrgKIMlRGmLsogaN8JlZEgiQH1GrxBTNeflrC7HBX/K6PQvv+oDCFUg4AESWKqMZIYSSiYalQAkgCFgFCBJcXSSEDFIEGQ" +
      "gELSGAmQnRSDLqBiKKMYlSnEIAmSoDEqJAgSgwfUM7gQFG6CNKza3Q6kae6koYAKKIMQahIxaQnSGJ9SAqZpMFCJoUKQoKVB0DRW" +
      "oT82tF+g8MmoxigkQX0ZD2GBajDPA2JarzJGBcRIIEFpTUMXwUuG1qAAFELxcjmgAKGAoALoT8YohBhBVMZIqKk7gXmCKVOYB4RQ" +
      "YoSoAEEailVDKEYFQLHUbzYbKj5Uw9K+PySBCsT266kCAuBN8gGtshlCGhkVxCi0ux2UfyWBJAhAARRlcyckSUNAKEMFCQjFSLHK" +
      "KBgKoZqpDCGEprWd9oMgVDLzGyysdTbv3aEsiUnEKCBIEiCIHgKgbCBBECpGKKTtbkcMBagGkjS1EUKCaSuxaY/GYNosCqBihNJM" +
      "KqvGVCOgEKNCQhmJqTZtR6YCCn3wikIgpjIUKLTvACQN+y8khMcM4qpiaAsSGxUVIy0NBV4uh4BU/qMYiamLCoakGAmKkQRUDJQE" +
      "EkN/GBRQGZrXpAyoRggqhhAk7ed4f1ATPAqWxpskmCYuFBBUMKhi8FqGbBWXuRirbAQUTGdqOuRFTLvbQbE/L6oxKqb1QgWmGgoS" +
      "hHmjBwUJypjK1EYZJKYCVEBiKGQVsTQoxHQ1+lIAciKJgSpGoYBCg2LIk4CngLBmfLqdxFSDroxqJkmQJIaAyu5yTPMASENov6wF" +
      "UIagUBpWmoT23REgFEJAAUIIgQqQfM4kAWVA1chQEX4RIFPpCIlRAaOA5B6oezEomqaPqRgqDdJoanFQlUGTRi+3Y4yKzcWDCmKo" +
      "RkghBADVXA/SIKNC+w4gRqFMZQ8gAUWMTJ0gVGxaY3edc+SoM0y1aD8CQUMhjZakAYVLfiZUY+RLjVJRG4qpIba7HFO9qlgi9uU8" +
      "TIUmCfCltgSVQZCkQUhDkEaQUPZtQGGuAti3gb6DOHESBBVA0qDSsBSjntvDNBK4lKz4lyQJMZJYGpm241AIBVMItbsdxNK0uLHv" +
      "AKGM4VNC0NRGQ1CGGqoM0qA0BApIMRLKkKmLwQhFGRLKKKC+DdCqmuqQTyZBksbImyAfkFyND/3OLZCkEYKm2ryvE0ahkEFlVMD/" +
      "/gNUYKoNprI/wwjFvtSS6UxNh1yxtO/P/mOiGkKMCqhgKFNTWSBGQY68kZAE0poEJA/shzcUv/ODfzTVkMCoEoNikhj6Y6QEmM4v" +
      "0svtGIQKkIRJo+lMIqCrWcXSCP1hkEZLKHOJQtLmeQBN65WGJQFlBJIoY/K3vnKXmPIiAZiKD2KbDXHJj9rxEyQB6josQSgDpZGM" +
      "QhQCBJomGLvbr4ZMBQ5CUQYUoQCJoZAmTdJgqpdiqsSsGiRtX8vEKIQkkKaRQFEIANQvQj/GTrLXwhh5kMTgUygbVIPklkIQTEVb" +
      "5m8rgsrQtMasmo+O7C5HkaaRBKYC1RgVEwpMa2tMGxoUaqQhiPn7mZgylUGJwZfzABCkApBgpy0Q5FFiyKe2vOR1qK2pX6AyUGhq" +
      "gwIF81YyCqZjDAkKAV5ux+As3OE75i+Q3P83lcQoJm1XW+iK77ujIIjpyvbuYGfgDl+QgFYk92MkQLJW/KR8zx3zRodCOSd3+GFU" +
      "Y7wf0EfiXWUQ+LY7CspQnJ87Vnkf7wXcoFi6KjZUjO+4I01zWA67Izu1O8ZPj0bytgPHrl8g7iqZKUDFd9xRprGdoTtWu9qO3t4I" +
      "1prd0ZDj3PEHEkLZtzEUx7gjO6k7fEko19qYuv1QBgkqWBo5zh3z59godIbuePnuU+/WoUu2K6f+544ylaFj3JGmsSLGp6bzdMdm" +
      "WKju+yXDuQg5zh0Blc7XHVvFG9e5FCRA3nxxhzQJytHuiJEzc8dDDIG6Yiug2PbFHRXEkL+7o9Y0lcIYnJs7LrTv4jWM0IaysBHK" +
      "/wqoDBB/c0ea62UaiXNzx7uphtyI3WlvHQz1nArvfXGHAg67I2Z3CNKZueMxoK0p7PjqDodA/hFlTFqFxBQOukMQUIhzc8d7Jnfs" +
      "dMAd3Xxxx1wPUIyRJLHvAFSDBGfmjkdmd+ym8i+zO3wJ6gdA3n1xB77Ud0MSiqGYwvm5YwticFOH3eG643KHYtIUKM7KHQ9M7njL" +
      "ce7oBLYdkTtIisE5ueNeX91xNX5zlDscHJE7nJ073oAg8Ka7XPJXd/hLjBC/HZc7VGfkjifN7vjMna5zxY2OcUe/xiaEJ/v+ljuc" +
      "mTsexUguSRI/+cGx7mjlFHOuxV9yh/Nxx6Ni5J7ZHZtid+x0q2Pd4ZlVUPGfg7nDebnjYSi859vu6A9IfDiUO5yZO1ZjE9zkWhca" +
      "9jPHusOXL+6wmdcO5g7n447HRnjTEu6wckfilaVDucMZueMDQgVc8ivfdkcrKi6cQc3l7pzc8SghvOd2+JR+8W13+EUs2TucO5yJ" +
      "O160zQWmcp3r6botkDv47q+5w5m444nJHRuWyh3c/SV3OLU7HoawZwnSCqHflH9ZJnfoh31Izr7kDufiDrnQ7I6fY5ncoadBae9w" +
      "7vD/yB2BGPQbcw0JVr2Y7x3OxB2ftTNl3GXR3MEdvOSiY4fuHU7qjpfgXcOuanc7fnKrJXMH18IVksUhd8ip3fHM4rmDaxh0ywE6" +
      "OHDvcEJ33Ic0uhzVJesYN1k+d7Bo4y/3Did1x6bYrc4hdziNOx7Aky5s1DXVyjY6Qe7Ql7EpIwd/uXc4iTueAlrlQ7d2ktyhJ6CV" +
      "Z3+7d1jaHW+TmB7a3h03zfQjdzpR7uBWK3jv8L3DSdxxkxPmDn4ldDTKYnYHpqK9sDseGflANe5yI+zyDwfd4dvSuYOthoOD9w6n" +
      "cMdNbsTSf3K63ME3KHh18N5hSXe8AUnaTrfERv/yd3d0bbncoRvyE0sI5+Z7h4Xd8cZaq8zu+E+d1b3Dcu74BOk1G/7njmudOnfo" +
      "KzHr0SBZd/DeYSF3PIXwni3Y6jvusC2slssd/Gpn0DEnX+8dFnPHamAd+pnj3eEqKGxYOFrOHRa2HX538H13PLGYOzr2JXdY1B0C" +
      "QvVtdzwG6o07XRnFP/VNd/RlwXuHtkic+bDQu4MyeAZ4rkHCFTf5rjv6BlB7S7rDAR3KHb7pjqfau2Ndw+60SO5gYeVNH5ZyR2sW" +
      "Xh3IHb7rjmegrsFdlnFH5TBy0cW5ueOtnlmzWO4wfop+WvDewR089bTIu4PHDK51hcKlbfU7C+UOvlrOHa4Q1Bm5+O67g4cQu+xq" +
      "XGbJ3MGvBOnRIu7whaThgazsfXEHBegod9y3L+7YsmOh3MH3qCvAUgyqDpZxh5s06DgffePdwaMgb+BFO1bFtoXfLJo7+K7FgvcO" +
      "Dr737uBBwFNoDTb5xSlyB0/OLeSOvo1NDeeOfnfwDKMNRa2G4AS5gy9GL6gzJ/vcYRF3jJeOfnfwFNBLMHRjp8kdbLIksLecOzo6" +
      "zh2vqEcNS7Lll06TO/iiEHDMhwXc4TZJY9W+Y98dvEogm2nkJ6fLHRzZSt72JXcQ"

  private val lossy32B64: String =
      "UklGRpAAAABXRUJQVlA4IIQAAACQBACdASogACAAPoU0lEelIqIhMAwAoBCJal9qTLYh9QAH5JeHHAPez4C6beAA/v7U0nNz54u1" +
      "uRCaZyENqIPl5pLoK8Pn3c/PB/V7f8ajYZ3y46kGG723B1tn5Q7v/4vHP/73etMqvk6DXBE2YyAQ6G3dbXZkfYHWP4MmGpTQ4ijA" +
      "AAA="

  private def b64(s: String): Array[Byte] =
    java.util.Base64.getDecoder.decode(s)

  // ---- pixel formula regenerators (mirror tools that built fixtures)

  private def noisePx(w: Int, h: Int): Array[Byte] =
    Array.tabulate(w * h * 3)(i => ((i * 7 + 13) % 256).toByte)

  private def gradientPx(w: Int, h: Int): Array[Byte] = {
    val out = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val i = (y * w + x) * 3
      out(i) = ((x * 8) % 256).toByte
      out(i + 1) = ((y * 8) % 256).toByte
      out(i + 2) = (((x + y) * 4) % 256).toByte
    }
    out
  }

  private def tiledPx(w: Int, h: Int): Array[Byte] = {
    val out = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val i = (y * w + x) * 3
      val tx = x % 8; val ty = y % 8
      out(i) = ((tx * 31 + 7) % 256).toByte
      out(i + 1) = ((ty * 53 + 11) % 256).toByte
      out(i + 2) = (((tx + ty) * 17 + 3) % 256).toByte
    }
    out
  }

  private def palettePx(w: Int, h: Int): Array[Byte] = {
    val cols = Array((255, 0, 0), (0, 255, 0), (0, 0, 255), (255, 255, 0))
    val out = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val i = (y * w + x) * 3
      val c = cols((x / 4 + y / 4) % 4)
      out(i) = c._1.toByte; out(i + 1) = c._2.toByte; out(i + 2) = c._3.toByte
    }
    out
  }

  private def stripesPx(w: Int, h: Int): Array[Byte] = {
    val cols = Array((10, 200, 30), (200, 10, 30), (30, 10, 200))
    val out = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val i = (y * w + x) * 3
      val c = cols((y / 3) % 3)
      out(i) = c._1.toByte; out(i + 1) = c._2.toByte; out(i + 2) = c._3.toByte
    }
    out
  }

  /** The 31-bit LCG the fixture builder used. */
  private def lcgBytes(n: Int, seed: Long): Array[Byte] = {
    var s = seed & 0x7FFFFFFFL
    Array.fill(n) {
      s = (s * 1103515245L + 12345L) & 0x7FFFFFFFL
      ((s >> 7) & 0xFF).toByte
    }
  }

  private def photoPx(w: Int, h: Int, seed: Long): Array[Byte] = {
    val noise = lcgBytes(w * h * 3, seed)
    val out = new Array[Byte](w * h * 3)
    var i = 0
    for (y <- 0 until h; x <- 0 until w) {
      out(i) = (((x * 3 + y * 2) % 256 + (noise(i) & 15)) % 256).toByte
      out(i + 1) = (((x * 2 + y * 5) % 256 + (noise(i + 1) & 15)) % 256).toByte
      out(i + 2) = (((x + y) % 256 + (noise(i + 2) & 15)) % 256).toByte
      i += 3
    }
    out
  }

  private def check(name: String, b64s: String, w: Int, h: Int,
      want: Array[Byte]): Unit = {
    val webp = b64(b64s)
    assert(Webp.probe(webp) == ("vp8l", w, h), s"$name probe")
    val got = Webp.pixelBytes(webp)
    assert(got != null, s"$name decode returned null")
    assert(java.util.Arrays.equals(got, want), s"$name pixels differ")
  }

  test("decodes real libwebp output byte-exactly across shapes") {
    check("noise8", noise8B64, 8, 8, noisePx(8, 8))
    check("gradient32", gradient32B64, 32, 32, gradientPx(32, 32))
    check("tiled48", tiled48B64, 48, 48, tiledPx(48, 48))
    check("palette16", palette16B64, 16, 16, palettePx(16, 16))
    check("stripes64", stripes64B64, 64, 24, stripesPx(64, 24))
    check("rand24", rand24B64, 24, 16, lcgBytes(24 * 16 * 3, 42))
    check("photo128", photo128B64, 128, 80, photoPx(128, 80, 7))
  }

  test("lossy VP8 is a named profile gap with real dimensions") {
    val webp = b64(lossy32B64)
    assert(Webp.isWebp(webp))
    assert(Webp.probe(webp) == ("vp8", 32, 32))
    assert(Webp.pixelBytes(webp) == null)
  }

  test("synth literal frames round-trip") {
    for ((w, h, seed) <- Seq((1, 1, 3L), (7, 5, 9L), (16, 16, 77L))) {
      val px = lcgBytes(w * h * 3, seed)
      val webp = Webp.synthVp8lLiteral(w, h, px)
      assert(Webp.probe(webp) == ("vp8l", w, h))
      assert(java.util.Arrays.equals(Webp.pixelBytes(webp), px))
    }
  }

  test("synth two-color (simple codes) round-trips") {
    val w = 13; val h = 9
    val webp = Webp.synthVp8lTwoColor(w, h, (200, 30, 99), (10, 250, 1),
      (x, y) => (x + y) % 2 == 0)
    val got = Webp.pixelBytes(webp)
    assert(got != null)
    for (y <- 0 until h; x <- 0 until w) {
      val i = (y * w + x) * 3
      val second = (x + y) % 2 == 0
      val want = if (second) (10, 250, 1) else (200, 30, 99)
      assert((got(i) & 0xFF, got(i + 1) & 0xFF, got(i + 2) & 0xFF) == want,
        s"($x,$y)")
    }
  }

  test("synth row-copy (2-D distance code) round-trips") {
    val w = 11; val h = 6
    val row = lcgBytes(w * 3, 5L)
    val webp = Webp.synthVp8lRowCopy(w, h, row)
    val got = Webp.pixelBytes(webp)
    assert(got != null)
    for (y <- 0 until h)
      assert(java.util.Arrays.equals(
        java.util.Arrays.copyOfRange(got, y * w * 3, (y + 1) * w * 3), row),
        s"row $y")
  }

  test("synth subtract-green transform round-trips") {
    val w = 9; val h = 4
    val px = lcgBytes(w * h * 3, 21L)
    val webp = Webp.synthVp8lSubtractGreen(w, h, px)
    assert(java.util.Arrays.equals(Webp.pixelBytes(webp), px))
  }

  test("corruption degrades to null, never throws") {
    val good = b64(tiled48B64)
    for (cut <- Seq(4, 11, 20, good.length - 1))
      assert(Webp.pixelBytes(java.util.Arrays.copyOf(good, cut)) == null,
        s"cut=$cut")
    for (i <- Seq(12, 20, 25, 30, good.length - 3)) {
      val bad = good.clone()
      bad(i) = (bad(i) ^ 0x55).toByte
      Webp.pixelBytes(bad) // may decode to wrong pixels; must not throw
    }
    assert(Webp.pixelBytes(Array.fill[Byte](40)(7)) == null)
    assert(!Webp.isWebp(Array.fill[Byte](8)(0)))
  }
  test("alpha planes: raw + all three filters + lossless compression round-trip") {
    val w = 13; val h = 9
    val alpha = Array.tabulate(w * h)(i => ((i * 37 + 11) % 256).toByte)
    val frame = graft.operators.Vp8.synthVp8Frame(w, h, 15,
      (_, _) => 2, (_, _) => 0, (_, _) => 0)
    for (method <- 0 to 3; compressed <- Seq(false, true)) {
      val still = Webp.synthAlphaStill(w, h, alpha, method, compressed, frame)
      val got = Webp.alpha(still)
      assert(got != null, s"method=$method compressed=$compressed")
      assert(got.toSeq == alpha.toSeq, s"method=$method compressed=$compressed")
      // the lossy pixels underneath still decode
      assert(Webp.yuv(still) != null)
      assert(graft.operators.Multimodal.mediaDecodeClass(still) == ("webp", "ok"))
    }
    // no ALPH chunk → null, not garbage
    assert(Webp.alpha(Webp.synthVp8Lossy(frame)) == null)
    // damage degrades
    val bad = Webp.synthAlphaStill(w, h, alpha, 3, compressed = true, frame)
    assert(Webp.alpha(bad.take(bad.length / 2)) == null)
  }

  test("animation composes frames with blend, dispose, and background") {
    val cw = 24; val ch = 16
    def solid(w: Int, h: Int, r: Int, g: Int, b: Int): Array[Byte] =
      Array.tabulate(w * h * 3)(i => (i % 3 match {
        case 0 => r; case 1 => g; case _ => b }).toByte)
    val bg = 0xFF102030 // ARGB
    val f0 = Webp.AnimFrame(0, 0, 12, 8, solid(12, 8, 200, 10, 10),
      noBlend = false, dispose = false)
    val f1 = Webp.AnimFrame(8, 4, 12, 8, solid(12, 8, 10, 200, 10),
      noBlend = true, dispose = true)
    val f2 = Webp.AnimFrame(4, 2, 10, 6, solid(10, 6, 10, 10, 200),
      noBlend = false, dispose = false)
    val anim = Webp.synthWebpAnim(cw, ch, bg, 0, Seq(f0, f1, f2))
    assert(Webp.probe(anim)._1 == "vp8x-anim")
    val got = Webp.webpAnimate(anim)
    assert(got != null)
    val (gw, gh, n, rgb) = got
    assert(gw == cw && gh == ch && n == 3)
    // expected: bg, painted by f0, f1's rect disposed back to bg, f2 on top
    def in(f: Webp.AnimFrame, x: Int, y: Int): Boolean =
      x >= f.x && x < f.x + f.w && y >= f.y && y < f.y + f.h
    for (y <- 0 until ch; x <- 0 until cw) {
      val want: (Int, Int, Int) =
        if (in(f2, x, y)) (10, 10, 200)
        else if (in(f1, x, y)) (0x10, 0x20, 0x30)
        else if (in(f0, x, y)) (200, 10, 10)
        else (0x10, 0x20, 0x30)
      val i = (y * cw + x) * 3
      assert(((rgb(i) & 0xFF), (rgb(i + 1) & 0xFF), (rgb(i + 2) & 0xFF)) == want,
        s"($x,$y)")
    }
    // a trailing dispose must NOT erase the last frame from the canvas
    val anim2 = Webp.synthWebpAnim(cw, ch, bg, 0,
      Seq(f0.copy(dispose = true)))
    val got2 = Webp.webpAnimate(anim2)
    assert(got2 != null && (got2._4(0) & 0xFF) == 200)
    // classification: a composable animation decodes
    assert(graft.operators.Multimodal.mediaDecodeClass(anim) == ("webp", "ok"))
    // the frameless anim stub stays the named gap
    assert(graft.operators.Multimodal.mediaDecodeClass(
      Webp.synthVp8xAnimStub(32, 32)) == ("webp", "unsupported_profile"))
    // damage degrades, never throws
    for (cut <- Seq(13, 40, anim.length / 2, anim.length - 3))
      Webp.webpAnimate(anim.take(cut))
  }

  test("animation composes LOSSY keyframe sub-frames with ALPH blending") {
    import graft.operators.Vp8
    def clamp(v: Int): Int = math.max(0, math.min(255, v))
    // independent closed-form replay of the single-MB DC reconstruction
    // and the pinned BT.601 conversion (the same algebra the driver
    // oracle uses — derived here, not read back from the decoder)
    def frameRgb(qIdx: Int, ly: Int, lu: Int, lv: Int): (Int, Int, Int) = {
      val ry = (((ly * Vp8.y2dcQuant(qIdx) + 3) >> 3) + 4) >> 3
      val yv = clamp(128 + ry)
      val uv = clamp(128 + ((lu * Vp8.uvdcQuant(qIdx) + 4) >> 3))
      val vv = clamp(128 + ((lv * Vp8.uvdcQuant(qIdx) + 4) >> 3))
      val c = yv - 16; val d = uv - 128; val e = vv - 128
      (clamp((298 * c + 409 * e + 128) >> 8),
        clamp((298 * c - 100 * d - 208 * e + 128) >> 8),
        clamp((298 * c + 516 * d + 128) >> 8))
    }
    for (id <- Seq(0L, 1L, 7L, 23L, 38L)) {
      val qIdx = (20 + id % 40).toInt
      val a1 = (30 + (id * 29) % 196).toInt
      val bgC = (((id * 13) % 256).toInt, ((id * 17) % 256).toInt,
        ((id * 19) % 256).toInt)
      val f0C = (((id * 5) % 256).toInt, ((id * 7) % 256).toInt,
        ((id * 11) % 256).toInt)
      val f1C = frameRgb(qIdx, ((id * 3) % 25 - 12).toInt,
        ((id * 7) % 13 - 6).toInt, ((id * 11) % 13 - 6).toInt)
      val f2C = frameRgb(qIdx, ((id * 5 + 7) % 25 - 12).toInt,
        ((id * 13 + 1) % 13 - 6).toInt, ((id * 17 + 2) % 13 - 6).toInt)
      def blend(s: Int, d: Int): Int = (s * a1 + d * (255 - a1)) / 255
      val f0rgb = Array.tabulate(12 * 8 * 3)(i => (i % 3 match {
        case 0 => f0C._1; case 1 => f0C._2; case _ => f0C._3 }).toByte)
      def lossy(w: Int, h: Int, ly: Int, lu: Int, lv: Int): Array[Byte] =
        Vp8.synthVp8Frame(w, h, qIdx, (_, _) => ly, (_, _) => lu, (_, _) => lv)
      val alph = Webp.synthAlphPayload(12, 8, Array.fill(12 * 8)(a1.toByte),
        (id % 4).toInt, compressed = id % 2 == 1)
      val bg = 0xFF000000 | (bgC._1 << 16) | (bgC._2 << 8) | bgC._3
      val (f2x, f2y) = (2 * (id % 5).toInt, 2 * (id % 3).toInt)
      val anim = Webp.synthWebpAnim(24, 16, bg, 0, Seq(
        Webp.AnimFrame(0, 0, 12, 8, f0rgb, noBlend = false, dispose = false),
        Webp.AnimFrame(8, 4, 12, 8, null, noBlend = false, dispose = false,
          vp8 = lossy(12, 8, ((id * 3) % 25 - 12).toInt,
            ((id * 7) % 13 - 6).toInt, ((id * 11) % 13 - 6).toInt),
          alph = alph),
        Webp.AnimFrame(f2x, f2y, 10, 6, null, noBlend = true, dispose = true,
          vp8 = lossy(10, 6, ((id * 5 + 7) % 25 - 12).toInt,
            ((id * 13 + 1) % 13 - 6).toInt, ((id * 17 + 2) % 13 - 6).toInt))))
      val got = Webp.webpAnimate(anim)
      assert(got != null, s"id=$id animate")
      val (gw, gh, n, rgb) = got
      assert(gw == 24 && gh == 16 && n == 3, s"id=$id shape")
      for (y <- 0 until 16; x <- 0 until 24) {
        val in2 = x >= f2x && x < f2x + 10 && y >= f2y && y < f2y + 6
        val in1 = x >= 8 && x < 20 && y >= 4 && y < 12
        val in0 = x < 12 && y < 8
        val dst = if (in0) f0C else bgC
        val want =
          if (in2) f2C
          else if (in1) (blend(f1C._1, dst._1), blend(f1C._2, dst._2),
            blend(f1C._3, dst._3))
          else if (in0) f0C
          else bgC
        val i = (y * 24 + x) * 3
        assert(((rgb(i) & 0xFF), (rgb(i + 1) & 0xFF), (rgb(i + 2) & 0xFF))
          == want, s"id=$id ($x,$y)")
      }
      assert(graft.operators.Multimodal.mediaDecodeClass(anim) == ("webp", "ok"))
    }
    // an animation carrying a lossy INTERFRAME stays the named gap
    val inter = Webp.synthVp8xAnimInter(40, 30)
    assert(Webp.webpAnimate(inter) == null)
    assert(Webp.probe(inter)._1 == "vp8x-anim")
    assert(graft.operators.Multimodal.mediaDecodeClass(inter)
      == ("webp", "unsupported_profile"))
  }

}
