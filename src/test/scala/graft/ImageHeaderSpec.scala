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
