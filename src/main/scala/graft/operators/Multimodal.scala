package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** A media payload: opaque bytes + typed metadata. In a real pipeline the
  * bytes are image/audio/video; here they come from the documents table
  * (no media columns in the test data) — the Spark-side plumbing (schema,
  * encoders, partition-wise batch processing) is real either way.
  */
final case class MediaRecord(
    doc_id: Long,
    media_type: String,
    payload: Array[Byte])

final case class MediaFeatures(
    doc_id: Long,
    media_type: String,
    byte_len: Long,
    width: Int,
    height: Int,
    channels: Int,
    brightness: Double)

/** Multimodal-column operators: treat media as `binary` columns with typed
  * metadata, process partition-wise (the Scala analog of `mapInPandas`
  * batch UDFs — one iterator per partition, arbitrary native calls inside).
  *
  * Decode comes in two real layers:
  *   - container-HEADER parsing ([[ImageHeaders]]: PNG/GIF/JPEG magic +
  *     dimension/bit-depth/channel extraction from raw bytes, pure JVM) —
  *     the cheap metadata pass a pipeline runs on every payload;
  *   - FULL pixel decode via the JDK's bundled image codecs
  *     (`javax.imageio`, java.desktop module: PNG deflate+unfilter, GIF
  *     LZW, JPEG DCT, BMP — no external jars), exposed as
  *     [[decodePixels]] and driven end-to-end by [[pixelRoundtrip]]
  *     (q99). Audio gets the same two real layers in [[AudioWav]]: a
  *     RIFF/WAVE chunk walker + full PCM sample decode (q100) — WAV
  *     needs no codec jars, so that path is complete real work, not a
  *     stand-in. COMPRESSED audio (MP3/AAC) and video codecs genuinely
  *     aren't in this environment; for those the header/byte-stats path
  *     below is the honest stand-in.
  *
  * Payloads that are not a recognized image fall back to deterministic
  * byte-derived pseudo-dimensions so non-media payloads (e.g. the
  * text-bytes stand-ins in the test data) still flow through the same
  * typed pipeline.
  */
object Multimodal {

  /** Documents → media records: payload = UTF-8 bytes standing in for real
    * media bytes; media_type derived deterministically for fan-out tests.
    */
  def toMedia(documents: DataFrame): Dataset[MediaRecord] = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select(
        col("doc_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("media_type"),
        encode(col("text"), "UTF-8").as("payload"))
      .as[MediaRecord]
  }

  /** Decode: REAL header parse first ([[ImageHeaders.decode]] — PNG/GIF/
    * JPEG dims, bit depth, channels from the actual bytes); unrecognized
    * payloads get deterministic byte-derived pseudo-dimensions instead
    * (the test corpus' text-bytes payloads take this path — real media
    * never collides with it because the magic check runs first).
    * Partition-wise (`mapPartitions`): amortizes any per-codec setup cost
    * once per partition, exactly like a batch Pandas UDF would.
    */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      // per-partition codec-table init would go here
      it.map { r =>
        val (w, h, c) = ImageHeaders.decode(r.payload) match {
          case Some(m) => (m.width, m.height, m.channels)
          case None => byteStatsFallback(r.payload)
        }
        MediaFeatures(r.doc_id, r.media_type, r.payload.length.toLong, w, h, c,
          meanByte(r.payload))
      }
    }
  }

  /** Fallback for non-image payloads: deterministic pseudo-dimensions
    * derived from the byte length, so arbitrary binary still flows
    * through the typed pipeline with stable, cross-engine-checkable
    * values.
    */
  private def byteStatsFallback(payload: Array[Byte]): (Int, Int, Int) = {
    val n = payload.length
    (64 + (n % 577), 64 + ((n * 31) % 421), 3)
  }

  /** Mean payload byte ("brightness" on raw frames). Floor quantization,
    * not rint: rint is half-even while SQL engines round half-away —
    * floor(x*10000)/10000 is the same float ops everywhere, keeping the
    * feature cross-engine verifiable.
    */
  private def meanByte(payload: Array[Byte]): Double = {
    val n = payload.length
    var sum = 0L
    var i = 0
    while (i < n) { sum += (payload(i) & 0xFF); i += 1 }
    if (n == 0) 0.0 else math.floor(sum.toDouble / n * 10000) / 10000
  }

  /** q98 pipeline: doc-derived REAL image headers (PNG/GIF/JPEG built by
    * [[ImageHeaders.buildForDoc]]) parsed back by the real decoder. The
    * oracle mirrors both sides in SQL: it re-builds the header hex and
    * re-extracts every field with byte (hex-substring) arithmetic.
    */
  /** Deterministic binary-payload fixture for q210: 64 bytes built from
    * doc_id arithmetic as a HEX string (so the SQL oracle can build the
    * identical payload with printf), then unhex'd to real BinaryType on
    * the engine side. Docs share a FAMILY whose generator fixes the
    * 8-byte blocking prefix (the family's base-256 digits — NOT a
    * mod-256 fold, which would alias families ≡ mod 256 and merge their
    * blocks) and the bulk pattern; three family-relative positions past
    * byte 16 mutate per doc — near-duplicates within a family,
    * unrelated across families.
    *
    * `nFamilies` SCALES WITH THE CORPUS (callers pass ~n/20): a fixed
    * family count would grow every block linearly with the corpus and
    * send the verification join quadratic — exactly the failure the
    * scale probe exists to catch (it did: 49× wall at 10× docs before
    * this knob). Real containers behave like the scaled fixture: more
    * images means more distinct headers, not fatter header classes.
    */
  def binaryFixtureHex(id: org.apache.spark.sql.Column,
      nFamilies: Long): org.apache.spark.sql.Column = {
    val h = ((id % 2147483648L) * 2654435761L) % 2147483647L
    val fam = h % nFamilies
    // Column./ is DOUBLE division — the numerators are exact multiples
    // of the divisor (or the divisor is a power of two), so each double
    // quotient is the exact integer DuckDB's `//` produces
    val v = ((h - h % nFamilies) / nFamilies).cast("long")
    concat_ws("",
      transform(sequence(lit(0), lit(63)), j => {
        val digitDiv = when(j % 4 === 0, 1L).when(j % 4 === 1, 256L)
          .when(j % 4 === 2, 65536L).otherwise(lit(16777216L))
        val digit = ((fam / digitDiv).cast("long") % 256 + j * 17L) % 256
        val bulk = (fam * 31L + j * 17L) % 256
        val base = when(j < 8, digit).otherwise(bulk)
        val mut = when(
          j === lit(16L) + v % 7 || j === lit(32L) + v % 11
            || j === lit(48L) + v % 13, v % 5 + 1L).otherwise(lit(0L))
        lpad(lower(hex((base + mut) % 256)), 2, "0")
      }))
  }

  /** Binary near-duplicate detection over opaque payloads (q210): the
    * multimodal analog of text shingle dedup — re-encoded or slightly-
    * edited media shares its byte-value DISTRIBUTION even when offsets
    * shift, so candidate pairs are verified on exact 256-bin byte
    * histograms (the native codegen [[graft.functions.ByteHistogram]]
    * expression — one linear pass per row, BinaryType in, array<long>
    * out). Blocking is a header-prefix equi-join (first `prefixBytes`
    * bytes as hex): format containers put their magic + layout words
    * first, so same-container variants collide and the pair space is
    * block-bounded, never corpus². Similarity is cos² in EXACT integers
    * — cos2_6 = ⌊dot²·10⁶/(‖a‖²‖b‖²)⌋ — so no sqrt and no float sum
    * anywhere; pairs at or above `minCos2Micro` survive.
    *
    * Scale shape: histograms and norms are row-local; one equi-join on
    * the prefix key; per-pair work is a 256-long zip — bounded by block
    * sizes exactly like the text dedup family.
    */
  def binaryNearDup(spark: SparkSession, docs: DataFrame,
      prefixBytes: Int = 8,
      minCos2Micro: Long = 900000L): DataFrame = {
    // family count rides the corpus (~20 docs/family) so block sizes —
    // and with them the pair-join cost — stay CONSTANT as data grows
    val nFamilies = math.max(25L, docs.count() / 20L)
    val hexed = docs.select(col("doc_id"),
      binaryFixtureHex(col("doc_id"), nFamilies).as("hx"))
    val withHist = hexed
      .withColumn("payload", unhex(col("hx")))
      .withColumn("hist",
        graft.functions.TextHashFunctions.byteHistogram(spark, col("payload")))
      .withColumn("norm2", aggregate(col("hist"), lit(0L),
        (a, x) => a + x * x))
      .withColumn("block", substring(col("hx"), 1, prefixBytes * 2))
      .select(col("doc_id"), col("block"), col("hist"), col("norm2"))
    val a = withHist.select(col("doc_id").as("doc_a"), col("block"),
      col("hist").as("ha"), col("norm2").as("na"))
    val b = withHist.select(col("doc_id").as("doc_b"), col("block"),
      col("hist").as("hb"), col("norm2").as("nb"))
    a.join(b, Seq("block"))
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("dot", aggregate(
        zip_with(col("ha"), col("hb"), (x, y) => x * y), lit(0L),
        (acc, x) => acc + x))
      .withColumn("cos2_6", expr("dot * dot * 1000000 div (na * nb)"))
      .filter(col("cos2_6") >= minCos2Micro)
      .select(col("doc_a"), col("doc_b"), col("dot"),
        (col("cos2_6").cast("double") / 1e6).as("cos2"))
  }

  def imageHeaderQuery(spark: SparkSession, documents: DataFrame): DataFrame = {
    import spark.implicits._
    val parsed = documents.select(col("doc_id")).as[Long].mapPartitions { it =>
      it.map { docId =>
        val meta = ImageHeaders.decode(ImageHeaders.buildForDoc(docId))
          .getOrElse(sys.error(s"built header failed to parse for doc $docId"))
        (docId, meta.format, meta.width.toLong, meta.height.toLong,
          meta.bitDepth.toLong, meta.channels.toLong)
      }
    }
    parsed.toDF("doc_id", "format", "width", "height", "bit_depth", "channels")
      .orderBy(col("doc_id"))
  }

  /** Per-image raster summary from a full pixel decode. */
  final case class RasterStats(width: Int, height: Int,
      meanR: Double, meanG: Double, meanB: Double)

  /** FULL pixel decode of any JDK-supported image payload (PNG/GIF/JPEG/
    * BMP via `javax.imageio` — the real inflate/LZW/DCT work, not header
    * peeking) to per-channel raster means; None when the bytes are not a
    * decodable image. Pure JVM, executor-safe, no external jars.
    */
  def decodePixels(bytes: Array[Byte]): Option[RasterStats] = {
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case _: Exception => null }
    if (img == null) None
    else {
      val w = img.getWidth
      val h = img.getHeight
      var sr = 0L; var sg = 0L; var sb = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val p = img.getRGB(x, y)
          sr += (p >> 16) & 0xFF; sg += (p >> 8) & 0xFF; sb += p & 0xFF
          x += 1
        }
        y += 1
      }
      val n = w.toLong * h
      Some(RasterStats(w, h, sr.toDouble / n, sg.toDouble / n, sb.toDouble / n))
    }
  }

  /** Deterministic 64×48 RGB gradient for `doc_id`: r = base_r + x,
    * g = base_g + y, b constant — every channel mean has a closed form
    * from the id alone (base_r + 31.5, base_g + 23.5, base_b), which is
    * what lets a SQL oracle check a real codec round-trip without being
    * able to run the codec.
    */
  private[graft] def gradientImage(id: Long): java.awt.image.BufferedImage = {
    val w = 64; val h = 48
    // floorMod: Scala % keeps the dividend's sign, so a negative doc_id
    // would pack negative channel bases whose sign bits bleed into the
    // neighboring channels — the closed-form means only hold for bases
    // in [0, 255]
    val baseR = java.lang.Math.floorMod(id, 190L).toInt
    val baseG = java.lang.Math.floorMod(id * 7, 200L).toInt
    val b = java.lang.Math.floorMod(id * 13, 256L).toInt
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, ((baseR + x) << 16) | ((baseG + y) << 8) | b)
        x += 1
      }
      y += 1
    }
    img
  }

  /** Encode the doc gradient through a real JDK codec. */
  private[graft] def encodeGradient(id: Long, fmt: String): Array[Byte] = {
    val baos = new java.io.ByteArrayOutputStream()
    require(javax.imageio.ImageIO.write(gradientImage(id), fmt, baos),
      s"no ImageIO writer for $fmt")
    baos.toByteArray
  }

  /** q99 pipeline: per document, build the deterministic gradient, encode
    * it through a REAL codec (PNG — deflate — for even ids, BMP for odd;
    * both lossless, both bundled with the JDK), then [[decodePixels]] the
    * bytes back and measure per-channel means. The oracle recomputes the
    * closed-form means from doc_id, so one wrong pixel anywhere in
    * encode→decode fails the hash match. The raster sums are exact
    * integers and 64×48·(base+31.5) divides back exactly in IEEE, so the
    * means are engine-exact doubles, no rounding needed. Partition-wise
    * like every codec pass here; JPEG stays out of the ORACLE path only
    * because it is lossy (its decode is spec-covered with tolerance).
    */
  def pixelRoundtrip(spark: SparkSession, documents: DataFrame): DataFrame = {
    import spark.implicits._
    documents.select(col("doc_id")).as[Long].mapPartitions { it =>
      it.map { id =>
        val fmt = if (id % 2 == 0) "png" else "bmp"
        val s = decodePixels(encodeGradient(id, fmt)).getOrElse(
          sys.error(s"round-trip decode failed for doc $id ($fmt)"))
        (id, fmt, s.width.toLong, s.height.toLong, s.meanR, s.meanG, s.meanB)
      }
    }.toDF("doc_id", "format", "width", "height", "mean_r", "mean_g", "mean_b")
      .orderBy(col("doc_id"))
  }

  /** Fixed-size frame sampling from a binary column — pure expressions:
    * every `stride` bytes take a `frameLen`-byte slice (video frame-sample
    * analog; on real video this is keyframe extraction inside the codec).
    */
  def frameSample(media: DataFrame, frameLen: Int = 16, maxFrames: Int = 4): DataFrame =
    media.withColumn("frames",
      transform(
        sequence(lit(0), least(
          floor(octet_length(col("payload")).cast("long") / frameLen).cast("long") - 1,
          lit(maxFrames.toLong - 1))),
        i => substring(col("payload"), (i * frameLen + 1).cast("int"), lit(frameLen))))

  /** One sampled frame of an animated-GIF payload (q160). */
  final case class SampledFrame(doc_id: Long, n_frames: Int, frame_ord: Int,
      x_off: Int, y_off: Int, width: Int, height: Int, delay_cs: Int,
      desc_offset: Int)

  /** q160 pipeline — video-frame sampling from REAL container bytes: per
    * document build the deterministic multi-frame GIF
    * ([[ImageHeaders.buildVideoForDoc]]), walk every block of it with the
    * real [[ImageHeaders.gifFrames]] parser, and keep every `stride`-th
    * frame's geometry/timing/offset. This is what video curation actually
    * does at scale: the sampler reads container structure (frame count,
    * per-frame byte ranges) and only the KEPT frames' payload bytes ever
    * leave the scan — here the kept metadata rows are the output.
    *
    * Scale shape: one `mapPartitions` pass, row-local, no shuffle; the
    * codec-ish work (block walking) is O(payload bytes) per row. The
    * oracle computes each field's closed form from doc_id, so any walker
    * mis-step (a mis-skipped color table, an off-by-one sub-block chain)
    * desynchronizes the parse and fails the hash match.
    */
  def gifFrameSample(documents: DataFrame, stride: Int = 2): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select(col("doc_id")).as[Long].mapPartitions { it =>
      it.flatMap { id =>
        val frames = ImageHeaders.gifFrames(ImageHeaders.buildVideoForDoc(id))
          .getOrElse(sys.error(s"built GIF failed to parse for doc $id"))
        frames.iterator.filter(_.frameOrd % stride == 0).map(f =>
          SampledFrame(id, frames.size, f.frameOrd, f.left, f.top,
            f.width, f.height, f.delayCs, f.descOffset))
      }
    }.toDF()
  }

  /** End-to-end multimodal feature pipeline as a query. */
  def featureQuery(spark: SparkSession, documents: DataFrame): DataFrame =
    extractFeatures(toMedia(documents)).toDF()
      .select(col("doc_id"), col("media_type"), col("byte_len"),
        col("width").cast("long").as("width"),
        col("height").cast("long").as("height"),
        col("brightness"))
      .orderBy(col("doc_id"))

  /** Deterministic CELL image for the perceptual-hash pipeline (q270):
    * 72×64 grayscale, tiled as a 9×8 grid of 8×8 CONSTANT cells — the
    * fixture trick that makes a real-codec dHash oracle-checkable:
    * average-pooling a constant cell returns the cell value EXACTLY, so
    * a SQL engine that cannot run a codec can still replay the
    * downsampled grid (and therefore every hash bit) from id arithmetic.
    * Base cells derive from the doc's GROUP (id div 4) so each group of
    * 4 docs shares a pattern; members 1–3 flip one LAST-COLUMN cell each
    * (row 2·m, value 255 > any base cell's 0..199) — a last-column flip
    * perturbs exactly one horizontal comparison, so within-group
    * Hamming ≤ 2 while cross-group hashes differ in ~32 bits.
    */
  private[graft] def cellValue(id: Long, cx: Int, cy: Int): Int = {
    val gid = id / 4
    val m = (id % 4).toInt
    if (m != 0 && cx == 8 && cy == 2 * m) 255
    // the mix needs a NONLINEAR step (w·w mod p): any affine map has a
    // CONSTANT consecutive-cell difference mod p, so the comparison-bit
    // sequence is quasi-periodic (three-distance structure) and distinct
    // groups collide hash-wide — measured: 1293 zero-distance cross-group
    // pairs at 500 docs affine, zero with the square
    else {
      val w = (gid * 8191L + cy * 73L + cx) % 2147483647L * 2654435761L %
        2147483647L
      (w * w % 2147483647L % 200L).toInt
    }
  }

  private[graft] def cellImage(id: Long): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(
      72, 64, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var cy = 0
    while (cy < 8) {
      var cx = 0
      while (cx < 9) {
        val v = cellValue(id, cx, cy)
        val rgb = (v << 16) | (v << 8) | v
        var y = cy * 8
        while (y < cy * 8 + 8) {
          var x = cx * 8
          while (x < cx * 8 + 8) { img.setRGB(x, y, rgb); x += 1 }
          y += 1
        }
        cx += 1
      }
      cy += 1
    }
    img
  }

  /** Per-document 64-bit dHash through a REAL codec round trip (q270):
    * build the cell image, encode PNG (even ids) / BMP (odd — both
    * lossless JDK codecs), decode the BYTES back with ImageIO,
    * average-pool the red channel over the 9×8 cell grid (exact: sum of
    * 64 equal pixels div 64), then the standard difference hash — bit
    * (x, y) = 1 iff cell(x+1, y) > cell(x, y), 8 comparisons × 8 rows.
    * The 64 bits pack as two NONNEGATIVE 32-bit halves (rows 0–3 → hi,
    * 4–7 → lo) so every downstream xor/bit_count/band extraction stays
    * in portable BIGINT range (a single 64-bit pack would put bit 63 in
    * the sign). Row-local, partition-wise; one wrong pixel anywhere in
    * encode→decode→pool flips a hash bit and fails the oracle.
    */
  def imagePhash(spark: SparkSession, documents: DataFrame): DataFrame = {
    import spark.implicits._
    documents.select(col("doc_id")).as[Long].mapPartitions { it =>
      it.map { id =>
        val fmt = if (id % 2 == 0) "png" else "bmp"
        val baos = new java.io.ByteArrayOutputStream()
        require(javax.imageio.ImageIO.write(cellImage(id), fmt, baos),
          s"no ImageIO writer for $fmt")
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(baos.toByteArray))
        require(img != null && img.getWidth == 72 && img.getHeight == 64,
          s"phash round-trip decode failed for doc $id ($fmt)")
        val grid = Array.ofDim[Int](8, 9)
        var cy = 0
        while (cy < 8) {
          var cx = 0
          while (cx < 9) {
            var s = 0L
            var y = cy * 8
            while (y < cy * 8 + 8) {
              var x = cx * 8
              while (x < cx * 8 + 8) {
                s += (img.getRGB(x, y) >> 16) & 0xFF; x += 1
              }
              y += 1
            }
            grid(cy)(cx) = (s / 64L).toInt
            cx += 1
          }
          cy += 1
        }
        var hi = 0L; var lo = 0L
        var r = 0
        while (r < 8) {
          var x = 0
          while (x < 8) {
            if (grid(r)(x + 1) > grid(r)(x)) {
              val bit = (r % 4) * 8 + x
              if (r < 4) hi |= 1L << bit else lo |= 1L << bit
            }
            x += 1
          }
          r += 1
        }
        (id, hi, lo)
      }
    }.toDF("doc_id", "phash_hi", "phash_lo")
  }

  /** Image near-dup pairs by perceptual-hash Hamming distance (q270):
    * the multimodal face of the simhash dedup family — [[imagePhash]]
    * signatures, 4×16-bit BAND bucketing, exact Hamming verification of
    * candidates only. With maxHamming ≤ 3 the banding is COMPLETE by
    * pigeonhole (≤ 3 differing bits cannot touch all 4 bands), so the
    * banded join returns EXACTLY the brute-force pair set — the oracle
    * checks that claim by running the full quadratic comparison, which
    * only the fixture-scale SQL side can afford. Verification is
    * bit_count(hi⊕hi') + bit_count(lo⊕lo'), codegen'd.
    *
    * Scale: band signatures explode ×4, bucket equi-join rides hash
    * collisions (near-dup density, never corpus²), candidate dedup on
    * the id pair — the minhashLshPairs shape, image-typed.
    */
  def phashNearDups(spark: SparkSession, documents: DataFrame,
      maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3, "4x16 banding is only complete to Hamming 3")
    val sigs = imagePhash(spark, documents).localCheckpoint(true)
    val bands = sigs.select(col("doc_id"), col("phash_hi"), col("phash_lo"),
      explode(array(
        concat(lit("b0:"), expr("phash_hi div 65536")),
        concat(lit("b1:"), expr("phash_hi % 65536")),
        concat(lit("b2:"), expr("phash_lo div 65536")),
        concat(lit("b3:"), expr("phash_lo % 65536")))).as("bkey"))
    val cand = bands.as("a")
      .join(bands.as("b"), col("a.bkey") === col("b.bkey")
        && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.phash_hi").as("hi_a"), col("a.phash_lo").as("lo_a"),
        col("b.phash_hi").as("hi_b"), col("b.phash_lo").as("lo_b"))
      .distinct()
    cand
      .withColumn("hamming",
        expr("bit_count(hi_a ^ hi_b) + bit_count(lo_a ^ lo_b)")
          .cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
  }
}
