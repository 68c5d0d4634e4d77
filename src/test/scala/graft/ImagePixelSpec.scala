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

  /** Closed-form dHash computed straight from cellValue — the codec-free
    * twin the codec path must reproduce bit for bit.
    */
  private def directHash(id: Long): (Long, Long) = {
    var hi = 0L; var lo = 0L
    for (r <- 0 until 8; x <- 0 until 8)
      if (Multimodal.cellValue(id, x + 1, r) > Multimodal.cellValue(id, x, r)) {
        val bit = (r % 4) * 8 + x
        if (r < 4) hi |= 1L << bit else lo |= 1L << bit
      }
    (hi, lo)
  }

  test("imagePhash: codec round trip reproduces the closed-form hash; " +
      "halves stay in 32-bit range") {
    import spark.implicits._
    val ids = Seq(0L, 1L, 2L, 3L, 4L, 17L, 100L, 12345L)
    val out = Multimodal.imagePhash(spark, ids.toDF("doc_id")).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    ids.foreach { id =>
      assert(out(id) === directHash(id),
        s"codec path diverged from cell closed form for $id")
      assert(out(id)._1 >= 0L && out(id)._1 < (1L << 32)
        && out(id)._2 >= 0L && out(id)._2 < (1L << 32))
    }
  }

  test("phashNearDups: within-group Hamming <= 2, banding equals brute " +
      "force, threshold-3 cap enforced") {
    import spark.implicits._
    val n = 200L
    val docs = (0L until n).toDF("doc_id")
    val pairs = Multimodal.phashNearDups(spark, docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // every group of 4 closes all 6 pairs (single last-column flips
    // move at most one comparison each -> pairwise <= 2)
    val within = pairs.filter { case (a, b, _) => a / 4 == b / 4 }
    assert(within.length >= (n / 4 * 6 - 6).toInt,
      s"groups must pair up, got ${within.length}")
    assert(pairs.forall(_._3 <= 3))
    assert(within.forall(_._3 <= 2), "one-cell flips move <= 2 bits")
    // banding completeness: brute force over the same signatures
    val hashes = (0L until n).map(id => id -> directHash(id))
    val brute = for {
      (a, (ha, la)) <- hashes; (b, (hb, lb)) <- hashes if a < b
      d = java.lang.Long.bitCount(ha ^ hb) + java.lang.Long.bitCount(la ^ lb)
      if d <= 3
    } yield (a, b, d.toLong)
    assert(pairs.toSet === brute.toSet,
      "4x16 banding must be COMPLETE at Hamming <= 3")
    // the guard: a threshold past the pigeonhole guarantee is refused
    intercept[IllegalArgumentException] {
      Multimodal.phashNearDups(spark, docs, maxHamming = 4)
    }
  }

  test("phash/audio band joins plan as equi-joins — no nested loop, " +
      "no cartesian product") {
    import spark.implicits._
    val docs = (0L until 64L).toDF("doc_id")
    Seq(Multimodal.phashNearDups(spark, docs),
      graft.operators.AudioWav.audioNearDups(spark, docs)).foreach { df =>
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin")
        && !plan.contains("CartesianProduct"),
        s"band join degraded to a pairwise scan:\n$plan")
      assert(plan.contains("bkey"),
        "candidate join must key on the band bucket")
    }
  }
}
