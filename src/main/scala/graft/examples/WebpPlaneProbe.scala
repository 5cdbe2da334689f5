package graft.examples

import graft.operators.Webp

/** Dev tool: write 120 probe frames (one per VP8L plane code) to the
  * directory in arg 0. A sibling script decodes them with libwebp and
  * prints the reference (dx, dy) per code — the ground truth the
  * [[Webp.DistMap]] constant is pinned against (see WebpSpec).
  */
object WebpPlaneProbe {
  def main(args: Array[String]): Unit = {
    val dir = new java.io.File(if (args.nonEmpty) args(0) else "/tmp/planeprobe")
    dir.mkdirs()
    for (code <- 1 to 120) {
      val webp = Webp.synthPlaneProbe(40, 9, code)
      val f = new java.io.FileOutputStream(new java.io.File(dir, f"code_$code%03d.webp"))
      try f.write(webp) finally f.close()
    }
    println(s"wrote 120 probes to $dir")
  }
}
