package graft.tools

import java.awt.image.BufferedImage
import java.io.File
import javax.imageio.ImageIO

/** One-shot fixture generator for the x6 compressed-media battery
  * (round-20, VERDICT r19 item 5): writes a PLANTED-pixel PNG and JPEG
  * under fixtures/media_compressed/ via javax.imageio — the committed
  * binaries are the fixture; this tool documents their derivation and
  * regenerates them byte-identically on the same JDK.
  *
  *  - png4x2.png: 4×2, pixel (x,y) = RGB(40x+10, 40y+20, 20x+10y+30).
  *    PNG is lossless, so ANY compliant decoder recovers exactly this
  *    raster: the analytic oracle values are the planted mean
  *    (ΣRGB = 1400 over 24 bytes → (1400/24)/255) and the md5 of the
  *    planted top-down RGB byte stream — both printed below.
  *  - jpg16x16.jpg: 16×16 smooth gradient RGB(8x+60, 8y+60, 120)
  *    (gentle low-frequency content — JPEG's DCT keeps it stable).
  *    JPEG is lossy and its DECODED raster is decoder-dependent, so the
  *    oracle values for it are HARVESTED from the committed engine
  *    decode (QDump x6_compressed_media twice, byte-identity), per the
  *    m2Goldens discipline.
  *
  * Usage: runMain graft.tools.GenCompressedMedia [outDir]
  */
object GenCompressedMedia {
  def main(args: Array[String]): Unit = {
    val outDir = new File(
      if (args.nonEmpty) args(0) else "/root/repo/fixtures/media_compressed")
    outDir.mkdirs()

    // planted PNG
    val (pw, ph) = (4, 2)
    val png = new BufferedImage(pw, ph, BufferedImage.TYPE_INT_RGB)
    val raster = new Array[Byte](pw * ph * 3)
    for (y <- 0 until ph; x <- 0 until pw) {
      val (r, g, b) = (40 * x + 10, 40 * y + 20, 20 * x + 10 * y + 30)
      png.setRGB(x, y, (r << 16) | (g << 8) | b)
      val o = (y * pw + x) * 3
      raster(o) = r.toByte; raster(o + 1) = g.toByte; raster(o + 2) = b.toByte
    }
    require(ImageIO.write(png, "png", new File(outDir, "png4x2.png")))
    val sum = raster.foldLeft(0L)((a, v) => a + (v & 0xff))
    val md = java.security.MessageDigest.getInstance("MD5").digest(raster)
    println(s"png4x2.png planted raster: sum=$sum n=${raster.length} " +
      f"mean=${(sum.toDouble / raster.length) / 255.0}%.17g " +
      s"md5=${md.map("%02x".format(_)).mkString}")

    // planted JPEG (decoded goldens harvested separately — see scaladoc)
    val (jw, jh) = (16, 16)
    val jpg = new BufferedImage(jw, jh, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until jh; x <- 0 until jw)
      jpg.setRGB(x, y, ((8 * x + 60) << 16) | ((8 * y + 60) << 8) | 120)
    require(ImageIO.write(jpg, "jpg", new File(outDir, "jpg16x16.jpg")))
    println(s"wrote ${outDir.getAbsolutePath}: png4x2.png, jpg16x16.jpg")
  }
}
