package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal

/** Full pixel decode through the JDK's bundled codecs (javax.imageio):
  * the decode is the real inflate/LZW/DCT work, so these specs check
  * pixel-exact round-trips for the lossless formats, tolerance for JPEG,
  * and clean rejection of non-image bytes.
  */
class ImagePixelSpec extends SparkSpec {

  test("PNG and BMP round-trips are pixel-exact (closed-form means)") {
    // negative ids included: Scala % is sign-preserving, so the gradient
    // builder must floorMod its channel bases or the packed sign bits
    // bleed across channels and the closed form breaks
    def m(x: Long, n: Long): Double = java.lang.Math.floorMod(x, n).toDouble
    Seq(0L, 1L, 7L, 189L, 500L, 12345L, -1L, -5L, -12345L).foreach { id =>
      Seq("png", "bmp").foreach { fmt =>
        val s = Multimodal.decodePixels(Multimodal.encodeGradient(id, fmt))
          .getOrElse(fail(s"decode failed: id=$id fmt=$fmt"))
        assert(s.width === 64 && s.height === 48)
        assert(s.meanR === m(id, 190) + 31.5, s"mean_r id=$id fmt=$fmt")
        assert(s.meanG === m(id * 7, 200) + 23.5, s"mean_g id=$id fmt=$fmt")
        assert(s.meanB === m(id * 13, 256), s"mean_b id=$id fmt=$fmt")
      }
    }
  }

  test("GIF (LZW) round-trip is exact for a palette-sized image") {
    // a solid color stays within GIF's 256-color palette, so the LZW
    // round-trip must be lossless
    val img = new java.awt.image.BufferedImage(
      32, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until 16).foreach(y => (0 until 32).foreach(x =>
      img.setRGB(x, y, (120 << 16) | (7 << 8) | 200)))
    val baos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "gif", baos))
    val s = Multimodal.decodePixels(baos.toByteArray).get
    assert((s.width, s.height) === ((32, 16)))
    assert((s.meanR, s.meanG, s.meanB) === ((120.0, 7.0, 200.0)))
  }

  test("JPEG (DCT) decode lands within lossy tolerance of the source") {
    val baos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(
      Multimodal.gradientImage(42L), "jpg", baos))
    val s = Multimodal.decodePixels(baos.toByteArray).get
    assert(s.width === 64 && s.height === 48)
    assert(math.abs(s.meanR - ((42 % 190) + 31.5)) < 3.0, s"mean_r ${s.meanR}")
    assert(math.abs(s.meanG - ((42 * 7 % 200) + 23.5)) < 3.0, s"mean_g ${s.meanG}")
    assert(math.abs(s.meanB - (42 * 13 % 256)) < 3.0, s"mean_b ${s.meanB}")
  }

  test("non-image and truncated bytes decode to None, never throw") {
    assert(Multimodal.decodePixels("not an image".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.decodePixels(Array.emptyByteArray).isEmpty)
    val png = Multimodal.encodeGradient(3L, "png")
    assert(Multimodal.decodePixels(png.take(20)).isEmpty,
      "truncated PNG must be rejected, not mis-decoded")
  }

  test("q99 distributed round-trip matches the closed form (sf0.001)") {
    val out = Multimodal.pixelRoundtrip(spark,
        Tables.documents(spark, "/root/testdata/sf0.001"))
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val id = r.getLong(0)
      assert(r.getString(1) === (if (id % 2 == 0) "png" else "bmp"))
      assert(r.getLong(2) === 64 && r.getLong(3) === 48)
      assert(r.getDouble(4) === (id % 190) + 31.5)
      assert(r.getDouble(5) === ((id * 7) % 200) + 23.5)
      assert(r.getDouble(6) === ((id * 13) % 256).toDouble)
    }
  }
}
