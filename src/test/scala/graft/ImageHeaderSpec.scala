package graft

import graft.operators.{ImageHeaders, Multimodal, MediaRecord}
import graft.operators.ImageHeaders.ImageMeta

/** Real image-container header parsing (round-5): fixtures here are
  * genuine file bytes — a real 1x1 RGBA PNG (the canonical minimal PNG),
  * real GIF87a/89a headers, and JPEG streams with Exif APP1 segments,
  * progressive SOF2, and FF fill bytes — the shapes a production corpus
  * actually contains.
  */
class ImageHeaderSpec extends SparkSpec {

  private def hexBytes(s: String): Array[Byte] =
    s.replaceAll("\\s", "").grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  // A complete real PNG file: 1x1, 8-bit RGBA (colour type 6) — signature,
  // IHDR with true CRC, one IDAT, IEND. Decodable by any PNG reader.
  private val realPng = hexBytes(
    "89504E470D0A1A0A0000000D4948445200000001000000010806000000" +
    "1F15C4890000000A49444154789C63000100000500010D0A2DB4" +
    "0000000049454E44AE426082")

  test("real PNG: signature + IHDR parse (1x1 RGBA, bit depth 8)") {
    assert(ImageHeaders.decode(realPng) ===
      Some(ImageMeta("png", 1, 1, 8, 4)))
    // grayscale and palette color types map channels per the spec
    assert(ImageHeaders.decode(ImageHeaders.buildPng(640, 480, colorType = 0)) ===
      Some(ImageMeta("png", 640, 480, 8, 1)))
    assert(ImageHeaders.decode(ImageHeaders.buildPng(13, 7, colorType = 2, depth = 16)) ===
      Some(ImageMeta("png", 13, 7, 16, 3)))
    assert(ImageHeaders.decode(ImageHeaders.buildPng(2, 3, colorType = 3)) ===
      Some(ImageMeta("png", 2, 3, 8, 1)))
    assert(ImageHeaders.decode(ImageHeaders.buildPng(5, 5, colorType = 4)) ===
      Some(ImageMeta("png", 5, 5, 8, 2)))
  }

  test("GIF87a and GIF89a: LE dims, color-resolution bits") {
    // real GIF89a screen descriptor: 3x5, packed 0xF7 -> 8-bit resolution
    val gif89 = "GIF89a".getBytes("US-ASCII") ++
      hexBytes("0300" + "0500" + "F7" + "0000" + "3B")
    assert(ImageHeaders.decode(gif89) === Some(ImageMeta("gif", 3, 5, 8, 3)))
    // GIF87a with packed 0x22 -> color resolution ((0x22>>4)&7)+1 = 3
    val gif87 = "GIF87a".getBytes("US-ASCII") ++
      hexBytes("1001" + "FF00" + "22" + "0000" + "3B")
    assert(ImageHeaders.decode(gif87) === Some(ImageMeta("gif", 272, 255, 3, 3)))
  }

  test("JPEG: marker scan past APP segments, fill bytes, progressive SOF2") {
    // baseline JFIF: SOI, APP0 (16 bytes), SOF0 352x288 3-component
    val jfif = hexBytes("FFD8" +
      "FFE000104A46494600010101006000600000" +
      "FFC0" + "0011" + "08" + "0120" + "0160" + "03" +
      "011100" + "021101" + "031101")
    assert(ImageHeaders.decode(jfif) === Some(ImageMeta("jpeg", 352, 288, 8, 3)))
    // Exif APP1 then progressive SOF2, single component, FF fill bytes
    // before the SOF marker (T.81 allows any number of FF fills)
    val exifProgressive = hexBytes("FFD8" +
      "FFE1" + "000A" + "457869660000" + "AABB" +   // APP1 len 10: Exif\0\0 + 2
      "FFFF" +                                      // fill bytes
      "FFC2" + "000B" + "0C" + "4000" + "2000" + "01" + "011100")
    assert(ImageHeaders.decode(exifProgressive) ===
      Some(ImageMeta("jpeg", 8192, 16384, 12, 1)))
    // no SOF before scan data: undecodable
    assert(ImageHeaders.decode(hexBytes("FFD8FFDA0002")) === None)
    // truncated segment length: undecodable, no crash
    assert(ImageHeaders.decode(hexBytes("FFD8FFE1FF")) === None)
  }

  test("non-image payloads are rejected, not misparsed") {
    assert(ImageHeaders.decode("plain text payload".getBytes("UTF-8")) === None)
    assert(ImageHeaders.decode(Array.empty[Byte]) === None)
    assert(ImageHeaders.decode(hexBytes("89504E47")) === None) // sig prefix only
    // PNG signature but a non-IHDR first chunk
    assert(ImageHeaders.decode(hexBytes(
      "89504E470D0A1A0A0000000D71717171000000010000000108060000001F15C489")) === None)
  }

  test("buildForDoc roundtrip matches the q98 oracle formulas") {
    (0L until 300L).foreach { id =>
      val meta = ImageHeaders.decode(ImageHeaders.buildForDoc(id))
        .getOrElse(fail(s"doc $id did not parse"))
      val v3 = ((id / 3) % 3).toInt
      assert(meta.width === 1 + (id % 2000).toInt, s"doc $id")
      assert(meta.height === 1 + ((id * 7) % 1500).toInt, s"doc $id")
      val (ef, ec) = (id % 3) match {
        case 0 => ("png", Seq(1, 3, 4)(v3))
        case 1 => ("gif", 3)
        case _ => ("jpeg", if (v3 == 0) 1 else 3)
      }
      assert(meta.format === ef, s"doc $id")
      assert(meta.channels === ec, s"doc $id")
      assert(meta.bitDepth === 8, s"doc $id")
    }
  }

  // ---- animated GIF frame walker (q160, the video-modality analog) ----

  test("gifFrames: doc-built video matches the container's closed forms") {
    for (id <- Seq(0L, 1L, 6L, 13L, 999L, 123456L)) {
      val frames = ImageHeaders.gifFrames(ImageHeaders.buildVideoForDoc(id))
        .getOrElse(fail(s"walker rejected its own build for doc $id"))
      val nf = (1 + id % 7).toInt
      val sub = (10 + id % 20).toInt
      assert(frames.size === nf, s"doc $id")
      frames.zipWithIndex.foreach { case (f, i) =>
        assert(f.frameOrd === i)
        assert(f.left === ((id + 17L * i) % 100).toInt, s"doc $id frame $i")
        assert(f.top === ((id * 5 + 11L * i) % 100).toInt)
        assert(f.width === (1 + (id + i) % 64).toInt)
        assert(f.height === (1 + (id * 7 + 3L * i) % 48).toInt)
        assert(f.delayCs === (2 + (id + i) % 30).toInt)
        assert(f.descOffset === 13 + i * (21 + sub) + 8, s"doc $id frame $i")
      }
    }
  }

  test("gifFrames: full grammar — GCT, comment between GCE and image, " +
      "local color table, multi-sub-block chains") {
    def le(v: Int) = Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
    val b = scala.collection.mutable.ArrayBuffer.empty[Byte]
    b ++= "GIF89a".getBytes("US-ASCII")
    b ++= le(64); b ++= le(32)
    b += 0xF1.toByte // GCT present, size bits 001 -> 3*2^2 = 12 bytes
    b += 0.toByte; b += 0.toByte
    b ++= Array.fill[Byte](12)(0xAA.toByte) // the global color table
    // application extension (NETSCAPE loop) — sub-block chain of 11 + 3
    b ++= Array(0x21.toByte, 0xFF.toByte, 11.toByte)
    b ++= "NETSCAPE2.0".getBytes("US-ASCII")
    b ++= Array(3.toByte, 1.toByte, 0.toByte, 0.toByte, 0.toByte)
    // GCE with delay 25cs, then a COMMENT before the image descriptor —
    // the pending delay must survive the comment (spec: GCE applies to
    // the next graphic rendering block)
    b ++= Array(0x21.toByte, 0xF9.toByte, 4.toByte, 0.toByte)
    b ++= le(25); b ++= Array(0.toByte, 0.toByte)
    b ++= Array(0x21.toByte, 0xFE.toByte, 5.toByte)
    b ++= "hello".getBytes("US-ASCII"); b += 0.toByte
    // image descriptor WITH a local color table (size bits 010 -> 24 bytes)
    val desc1 = b.length
    b += 0x2C.toByte; b ++= le(4); b ++= le(2); b ++= le(10); b ++= le(20)
    b += 0x82.toByte
    b ++= Array.fill[Byte](24)(0xBB.toByte)
    b += 8.toByte // LZW min code size
    b ++= Array(3.toByte, 1.toByte, 2.toByte, 3.toByte) // sub-block of 3
    b ++= Array(2.toByte, 9.toByte, 9.toByte)           // sub-block of 2
    b += 0.toByte                                       // chain terminator
    // second frame: no GCE at all -> delay 0
    val desc2 = b.length
    b += 0x2C.toByte; b ++= le(0); b ++= le(0); b ++= le(64); b ++= le(32)
    b += 0x00.toByte
    b += 8.toByte; b ++= Array(1.toByte, 7.toByte); b += 0.toByte
    b += 0x3B.toByte
    val frames = ImageHeaders.gifFrames(b.toArray).getOrElse(fail("rejected"))
    assert(frames.size === 2)
    assert(frames(0) === ImageHeaders.GifFrame(0, 4, 2, 10, 20, 25, desc1))
    assert(frames(1) === ImageHeaders.GifFrame(1, 0, 0, 64, 32, 0, desc2))
  }

  test("gifFrames: truncation, desync and missing trailer all reject") {
    val good = ImageHeaders.buildVideoForDoc(42L)
    assert(ImageHeaders.gifFrames(good.dropRight(5)) === None) // truncated
    assert(ImageHeaders.gifFrames(good.dropRight(1)) === None) // no trailer
    val desync = good.clone()
    desync(13) = 0x7E.toByte // unknown block introducer
    assert(ImageHeaders.gifFrames(desync) === None)
    assert(ImageHeaders.gifFrames("not a gif".getBytes("UTF-8")) === None)
  }

  test("gifFrameSample keeps every 2nd frame with consistent n_frames") {
    import spark.implicits._
    val docs = Seq(5L, 6L, 20L).toDF("doc_id")
    val out = Multimodal.gifFrameSample(docs, stride = 2).collect()
    // nf = 1 + id%7: doc 5 -> 6 frames (3 kept), doc 6 -> 7 (4), doc 20 -> 7 (4)
    val byDoc = out.groupBy(_.getLong(0))
    assert(byDoc(5L).length === 3 && byDoc(5L).forall(_.getInt(1) == 6))
    assert(byDoc(6L).length === 4 && byDoc(6L).forall(_.getInt(1) == 7))
    assert(out.forall(r => r.getInt(2) % 2 == 0)) // only even frame_ords
  }

  test("extractFeatures uses real dims for real images, fallback otherwise") {
    import spark.implicits._
    val media = Seq(
      MediaRecord(1L, "image", realPng),
      MediaRecord(2L, "image", ImageHeaders.buildGif(320, 200)),
      MediaRecord(3L, "image", "not an image".getBytes("UTF-8"))).toDS()
    val out = Multimodal.extractFeatures(media).collect()
      .map(f => f.doc_id -> ((f.width, f.height, f.channels))).toMap
    assert(out(1L) === ((1, 1, 4)))
    assert(out(2L) === ((320, 200, 3)))
    val n = "not an image".getBytes("UTF-8").length
    assert(out(3L) === ((64 + n % 577, 64 + (n * 31) % 421, 3)))
  }
}
