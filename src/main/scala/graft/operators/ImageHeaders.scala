package graft.operators

import java.util.zip.CRC32

/** REAL image container header parsing from raw bytes — pure JVM, no codec
  * jars: format detection by magic number plus width / height / bit-depth /
  * channel extraction for PNG (IHDR), GIF (logical screen descriptor) and
  * JPEG (marker scan to the first SOFn frame header). This replaces the
  * round-4 `fakeDecode` stub as the decode step of the multimodal pipeline:
  * full pixel decode still needs a codec, but container metadata — what a
  * curation pipeline filters on (dimensions, aspect, bit depth, component
  * count) — is genuinely parsed here.
  *
  * Formats follow the public specs: PNG (RFC 2083 §4.1.1: 8-byte
  * signature, IHDR first chunk, big-endian dims, bit depth + color type),
  * GIF87a/89a (LE uint16 dims at offset 6, color-resolution bits in the
  * packed byte), JPEG/JFIF (ITU T.81 §B: FF-marker segments scanned until
  * a start-of-frame SOF0–SOF15 excluding DHT/JPG/DAC, whose payload is
  * precision, height, width, component count).
  */
object ImageHeaders {

  /** Parsed container metadata; `bitDepth` is bits per sample/channel. */
  final case class ImageMeta(
      format: String, width: Int, height: Int, bitDepth: Int, channels: Int)

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xFF
  private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def be32(b: Array[Byte], i: Int): Int =
    (u8(b, i) << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)

  private val PngSig: Array[Int] =
    Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A)

  /** Detect + parse; None when the payload is not a recognized image. */
  def decode(b: Array[Byte]): Option[ImageMeta] =
    if (isPng(b)) parsePng(b)
    else if (isGif(b)) parseGif(b)
    else if (isJpeg(b)) parseJpeg(b)
    else None

  private def isPng(b: Array[Byte]): Boolean =
    b.length >= 8 && (0 until 8).forall(i => u8(b, i) == PngSig(i))

  private def isGif(b: Array[Byte]): Boolean =
    b.length >= 6 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
      b(3) == '8' && (b(4) == '7' || b(4) == '9') && b(5) == 'a'

  private def isJpeg(b: Array[Byte]): Boolean =
    b.length >= 4 && u8(b, 0) == 0xFF && u8(b, 1) == 0xD8

  /** PNG: signature, then the IHDR chunk (required first): 4-byte length,
    * "IHDR", width/height as big-endian uint32, bit depth, color type.
    */
  private def parsePng(b: Array[Byte]): Option[ImageMeta] = {
    if (b.length < 26) return None
    if (!(b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R')) return None
    val w = be32(b, 16)
    val h = be32(b, 20)
    if (w <= 0 || h <= 0) return None
    val depth = u8(b, 24)
    val channels = u8(b, 25) match {
      case 0 => 1 // grayscale
      case 2 => 3 // truecolor
      case 3 => 1 // palette index
      case 4 => 2 // gray + alpha
      case 6 => 4 // RGBA
      case _ => return None
    }
    Some(ImageMeta("png", w, h, depth, channels))
  }

  /** GIF: "GIF87a"/"GIF89a", LE uint16 logical-screen dims, packed byte
    * whose bits 4-6 are color-resolution-1 (bits per primary). Pixel data
    * is palettized RGB, so channels = 3.
    */
  private def parseGif(b: Array[Byte]): Option[ImageMeta] = {
    if (b.length < 11) return None
    val w = le16(b, 6)
    val h = le16(b, 8)
    if (w <= 0 || h <= 0) return None
    val depth = ((u8(b, 10) >> 4) & 0x7) + 1
    Some(ImageMeta("gif", w, h, depth, 3))
  }

  /** JPEG: scan FF-prefixed marker segments from after SOI, skipping each
    * by its 2-byte big-endian length (which includes itself), until a
    * start-of-frame marker C0–CF excluding C4 (DHT), C8 (JPG) and CC
    * (DAC). SOF payload: precision byte, height, width (BE uint16),
    * component count. Handles FF fill bytes and standalone RST/TEM
    * markers per T.81 §B.1.1.2.
    */
  private def parseJpeg(b: Array[Byte]): Option[ImageMeta] = {
    var i = 2
    while (i + 1 < b.length) {
      if (u8(b, i) != 0xFF) return None // desynchronized
      var j = i + 1
      while (j < b.length && u8(b, j) == 0xFF) j += 1 // fill bytes
      if (j >= b.length) return None
      val marker = u8(b, j)
      if (marker == 0xD9 || marker == 0xDA) return None // EOI / SOS before SOF
      if (marker == 0x01 || (marker >= 0xD0 && marker <= 0xD8)) {
        i = j + 1 // standalone marker, no length field
      } else {
        if (j + 2 >= b.length) return None
        val segLen = be16(b, j + 1)
        if (segLen < 2) return None
        val isSof = marker >= 0xC0 && marker <= 0xCF &&
          marker != 0xC4 && marker != 0xC8 && marker != 0xCC
        if (isSof) {
          if (j + 8 >= b.length || segLen < 8) return None
          val depth = u8(b, j + 3)
          val h = be16(b, j + 4)
          val w = be16(b, j + 6)
          val channels = u8(b, j + 8)
          if (w <= 0 || h <= 0) return None
          return Some(ImageMeta("jpeg", w, h, depth, channels))
        }
        i = j + 1 + segLen
      }
    }
    None
  }

  // ---------------------------------------------------------------------
  // Synthetic-but-conformant builders: REAL headers (correct magics,
  // chunk layout, CRCs for PNG) with doc-derived dimensions, so the
  // decode path is exercised end-to-end on bytes any external parser
  // would also accept. Dimension formulas are mirrored byte-for-byte by
  // the q98 DuckDB oracle, which re-builds the hex and parses it back
  // with substring arithmetic.
  // ---------------------------------------------------------------------

  private def be32Bytes(v: Int): Array[Byte] =
    Array(((v >> 24) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
      ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
  private def be16Bytes(v: Int): Array[Byte] =
    Array(((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
  private def le16Bytes(v: Int): Array[Byte] =
    Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)

  private def pngChunk(tag: String, data: Array[Byte]): Array[Byte] = {
    val crc = new CRC32
    val tagBytes = tag.getBytes("US-ASCII")
    crc.update(tagBytes)
    crc.update(data)
    be32Bytes(data.length) ++ tagBytes ++ data ++ be32Bytes(crc.getValue.toInt)
  }

  /** A real (parser-valid) PNG: signature + IHDR with true CRC + IEND. */
  def buildPng(w: Int, h: Int, colorType: Int, depth: Int = 8): Array[Byte] = {
    val ihdr = be32Bytes(w) ++ be32Bytes(h) ++
      Array(depth.toByte, colorType.toByte, 0.toByte, 0.toByte, 0.toByte)
    PngSig.map(_.toByte) ++ pngChunk("IHDR", ihdr) ++ pngChunk("IEND", Array.empty)
  }

  /** A real GIF89a header: screen descriptor (packed 0xF7 = global table,
    * 8-bit color resolution) + trailer.
    */
  def buildGif(w: Int, h: Int): Array[Byte] =
    "GIF89a".getBytes("US-ASCII") ++ le16Bytes(w) ++ le16Bytes(h) ++
      Array(0xF7.toByte, 0x00.toByte, 0x00.toByte, 0x3B.toByte)

  /** A real JPEG prefix: SOI, an APP1 (Exif) segment of `pad` extra bytes
    * — so the SOF offset VARIES and the marker scan is exercised — then
    * SOF0 (baseline) or SOF2 (progressive) with `ncomp` components, EOI.
    */
  def buildJpeg(w: Int, h: Int, ncomp: Int, pad: Int,
      progressive: Boolean): Array[Byte] = {
    val app1Body = "Exif".getBytes("US-ASCII") ++
      Array[Byte](0, 0) ++ Array.fill[Byte](pad)(0)
    val sofMarker: Byte = if (progressive) 0xC2.toByte else 0xC0.toByte
    val sofBody = Array(8.toByte) ++ be16Bytes(h) ++ be16Bytes(w) ++
      Array(ncomp.toByte) ++
      (1 to ncomp).flatMap(c => Array(c.toByte, 0x11.toByte, 0.toByte))
    Array(0xFF.toByte, 0xD8.toByte,                      // SOI
      0xFF.toByte, 0xE1.toByte) ++ be16Bytes(app1Body.length + 2) ++ app1Body ++
      Array(0xFF.toByte, sofMarker) ++ be16Bytes(sofBody.length + 2) ++ sofBody ++
      Array(0xFF.toByte, 0xD9.toByte)                    // EOI
  }

  // ---------------------------------------------------------------------
  // Animated GIF — the video-modality analog. A multi-frame GIF is the one
  // real "video" container this environment can both build and parse with
  // zero codec jars: per-frame geometry, timing (delay in centiseconds)
  // and byte offsets all live in the container structure, which is what a
  // frame-sampling curation pass actually reads (it never inflates LZW
  // pixel data to decide which frames to keep). Spec: GIF89a §§18–26
  // (logical screen descriptor, graphic control extension, image
  // descriptor, data sub-block chains).
  // ---------------------------------------------------------------------

  /** One frame's container metadata; `descOffset` = byte offset of the
    * 0x2C image-descriptor introducer inside the payload.
    */
  final case class GifFrame(frameOrd: Int, left: Int, top: Int,
      width: Int, height: Int, delayCs: Int, descOffset: Int)

  /** Walk every block of a GIF stream and return its frames in order, or
    * None when the bytes are not a well-formed GIF (bad magic, truncation
    * mid-structure, an unknown block introducer — desync). Handles the
    * full grammar, not just [[buildAnimatedGif]]'s output: global and
    * local color tables are skipped by their descriptor-declared sizes,
    * extensions (graphic control 0xF9, comment 0xFE, application 0xFF,
    * plain text 0x01) have their sub-block chains walked generically, and
    * a graphic-control delay applies to exactly the next image descriptor
    * (per spec) — so a comment between the GCE and its image must not
    * clear the pending delay.
    */
  def gifFrames(b: Array[Byte]): Option[Seq[GifFrame]] = {
    if (!isGif(b) || b.length < 13) return None
    var i = 13
    // global color table: flag bit 7, size 3 * 2^((packed & 7) + 1)
    if ((u8(b, 10) & 0x80) != 0) i += 3 * (1 << ((u8(b, 10) & 0x7) + 1))
    var pendingDelay = 0
    val frames = scala.collection.mutable.ArrayBuffer.empty[GifFrame]

    // walk a sub-block chain starting at `j`; returns the index after the
    // 0-byte terminator, or -1 on truncation
    def skipSubBlocks(start: Int): Int = {
      var j = start
      while (j < b.length && u8(b, j) != 0) j += 1 + u8(b, j)
      if (j >= b.length) -1 else j + 1
    }

    while (i < b.length) {
      u8(b, i) match {
        case 0x3B => // trailer
          return Some(frames.toSeq)
        case 0x21 => // extension: label byte, then sub-blocks
          if (i + 1 >= b.length) return None
          val label = u8(b, i + 1)
          if (label == 0xF9 && i + 5 < b.length && u8(b, i + 2) >= 4)
            pendingDelay = le16(b, i + 4) // GCE: size, packed, delay lo/hi
          val next = skipSubBlocks(i + 2)
          if (next < 0) return None
          i = next
        case 0x2C => // image descriptor
          if (i + 9 >= b.length) return None
          val left = le16(b, i + 1)
          val top = le16(b, i + 3)
          val w = le16(b, i + 5)
          val h = le16(b, i + 7)
          val packed = u8(b, i + 9)
          var j = i + 10
          if ((packed & 0x80) != 0) j += 3 * (1 << ((packed & 0x7) + 1))
          j += 1 // LZW minimum code size byte
          if (j > b.length) return None
          val next = skipSubBlocks(j)
          if (next < 0) return None
          frames += GifFrame(frames.length, left, top, w, h, pendingDelay, i)
          pendingDelay = 0
          i = next
        case _ => return None // unknown introducer — desynchronized
      }
    }
    None // ran off the end without a trailer
  }

  /** A real multi-frame GIF89a: no global color table (packed 0x70), per
    * frame a graphic control extension (8 bytes: delay in centiseconds),
    * an image descriptor (10 bytes), the LZW minimum-code-size byte, and
    * ONE data sub-block of exactly `subBlock` deterministic bytes + the
    * 0x00 chain terminator — so each frame occupies 21 + subBlock bytes
    * and descriptor offsets have a closed form the q160 oracle replays.
    */
  def buildAnimatedGif(canvasW: Int, canvasH: Int,
      frames: Seq[(Int, Int, Int, Int, Int)], subBlock: Int): Array[Byte] = {
    val head = "GIF89a".getBytes("US-ASCII") ++
      le16Bytes(canvasW) ++ le16Bytes(canvasH) ++
      Array(0x70.toByte, 0x00.toByte, 0x00.toByte)
    val body = frames.flatMap { case (left, top, w, h, delayCs) =>
      Array(0x21.toByte, 0xF9.toByte, 0x04.toByte, 0x04.toByte) ++ // GCE
        le16Bytes(delayCs) ++ Array(0x00.toByte, 0x00.toByte) ++
        Array(0x2C.toByte) ++ le16Bytes(left) ++ le16Bytes(top) ++ // descriptor
        le16Bytes(w) ++ le16Bytes(h) ++ Array(0x00.toByte) ++
        Array(0x08.toByte, subBlock.toByte) ++                     // LZW + size
        Array.tabulate[Byte](subBlock)(k => (k % 251).toByte) ++
        Array(0x00.toByte)                                         // terminator
    }
    head ++ body ++ Array(0x3B.toByte)
  }

  /** Doc-derived synthetic "video": 1–7 frames whose geometry, timing and
    * sub-block size all derive from doc_id — descriptor offsets are
    * 13 + f·(21+S) + 8 with S = 10 + doc_id % 20. Mirrored arithmetically
    * by the q160 oracle (the oracle computes what the container MUST
    * contain; the engine side re-parses it from the actual bytes, so a
    * walker bug breaks the hash match).
    */
  def buildVideoForDoc(docId: Long): Array[Byte] = {
    val nf = (1 + docId % 7).toInt
    val sub = (10 + docId % 20).toInt
    val frames = (0 until nf).map { f =>
      (((docId + 17L * f) % 100).toInt, ((docId * 5 + 11L * f) % 100).toInt,
        (1 + (docId + f) % 64).toInt, (1 + (docId * 7 + 3L * f) % 48).toInt,
        (2 + (docId + f) % 30).toInt)
    }
    buildAnimatedGif((1 + docId % 640).toInt, (1 + docId * 3 % 480).toInt,
      frames, sub)
  }

  /** Doc-derived synthetic image: format cycles png/gif/jpeg by doc_id % 3,
    * dims and variants derive from doc_id. Mirrored by the q98 oracle.
    */
  def buildForDoc(docId: Long): Array[Byte] = {
    val w = (1 + docId % 2000).toInt
    val h = (1 + (docId * 7) % 1500).toInt
    val v3 = ((docId / 3) % 3).toInt
    (docId % 3) match {
      case 0 => buildPng(w, h, colorType = Seq(0, 2, 6)(v3))
      case 1 => buildGif(w, h)
      case _ => buildJpeg(w, h,
        ncomp = if (v3 == 0) 1 else 3,
        pad = (docId % 40).toInt,
        progressive = (docId / 3) % 2 == 1)
    }
  }
}
