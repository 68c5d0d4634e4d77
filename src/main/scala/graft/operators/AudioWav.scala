package graft.operators

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** REAL WAV (RIFF/WAVE) PCM codec — the audio leg of the multimodal
  * pipeline, written from the public container spec the same way
  * [[ImageHeaders]] implements RFC 2083 / GIF89a / ITU T.81: a byte-level
  * builder and an INDEPENDENT chunk-walking decoder, so a parsing mistake
  * on either side (endianness, chunk padding, offset arithmetic) breaks
  * the round-trip instead of cancelling out.
  *
  * WAV is the one mainstream audio container that needs no codec jars —
  * PCM samples are raw little-endian integers after the chunk headers —
  * which makes it the honest counterpart to the image path: the decode
  * below is the complete real work for PCM audio, not a stand-in.
  * (Compressed audio — MP3/AAC/Opus — would need codec libraries this
  * environment genuinely lacks; those remain out, documented at
  * [[Multimodal]].)
  *
  * Decoder contract (RIFF1991 / WAVEFORMAT):
  *   - bytes 0–3 "RIFF", 4–7 chunk size (LE), 8–11 "WAVE";
  *   - then a chunk walk: 4-byte id + 4-byte LE size + payload, with the
  *     spec's ODD-SIZE PAD BYTE honored (chunks align to even offsets —
  *     the classic interop bug is skipping exactly this);
  *   - `fmt ` must carry audioFormat 1 (integer PCM), 1–2 channels, and
  *     8 or 16 bits per sample; anything else → None (no guessing);
  *   - `data` holds interleaved frames: 16-bit signed LE or 8-bit
  *     UNSIGNED (excess-128 — the other classic interop bug), truncated
  *     data → None;
  *   - unknown chunks (`LIST`, `JUNK`, …) are skipped by size, per spec.
  */
object AudioWav {

  /** Decoded summary: counts from the header, stats from the SAMPLES —
    * per-channel means and an all-channel RMS — so header-only parsing
    * cannot fake a pass.
    */
  final case class WavStats(sampleRate: Int, channels: Int,
      bitsPerSample: Int, nFrames: Long, meanL: Double, meanR: Double,
      rms: Double)

  // ---- builder (deterministic doc-derived fixture, mirrors
  //      ImageHeaders.buildForDoc) ----

  private def m(x: Long, n: Long): Long = java.lang.Math.floorMod(x, n)

  private[graft] val Rates = Array(8000, 16000, 22050, 44100)

  /** Doc-derived PCM parameters: every field is closed-form arithmetic
    * on `docId`, so a SQL oracle can recompute the decoder's output
    * without running the decoder (the q100 contract — like q99's
    * gradient, one wrong parsed byte anywhere fails the hash).
    *
    * Channel L is the ramp `base + i*step`; channel R (stereo) is its
    * negation, so mean_r = −mean_l and the RMS matches mono. Amplitudes
    * stay within int16 by construction (|base| ≤ 2000, step ≤ 7,
    * frames ≤ 767 → |sample| ≤ 7369).
    */
  private[graft] def paramsFor(docId: Long): (Int, Int, Int, Long, Long) = {
    val rate = Rates(m(docId, 4).toInt)
    val channels = 1 + m(docId, 2).toInt
    val n = 256 + m(docId * 31, 512)
    val base = m(docId * 17, 4001) - 2000
    val step = 1 + m(docId, 7)
    (rate, channels, n.toInt, base, step)
  }

  /** Real WAV bytes for `docId` — 16-bit PCM; ids divisible by 3 get a
    * deliberately ODD-sized `LIST` chunk before `data` so the decoder's
    * pad-byte handling is exercised on live data, not just in specs.
    */
  private[graft] def buildForDoc(docId: Long): Array[Byte] = {
    val (rate, channels, n, base, step) = paramsFor(docId)
    val withJunk = m(docId, 3) == 0
    val junkPayload = 5 // odd on purpose: forces a pad byte
    val dataBytes = n * channels * 2
    val junkBytes = if (withJunk) 8 + junkPayload + 1 else 0
    val riffSize = 4 + (8 + 16) + junkBytes + (8 + dataBytes)
    val buf = ByteBuffer.allocate(8 + riffSize).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(riffSize)
      .put("WAVE".getBytes("US-ASCII"))
    // fmt chunk: PCM, LE fields per WAVEFORMAT
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(channels.toShort).putInt(rate)
      .putInt(rate * channels * 2).putShort((channels * 2).toShort)
      .putShort(16)
    if (withJunk) {
      buf.put("LIST".getBytes("US-ASCII")).putInt(junkPayload)
      var i = 0
      while (i < junkPayload) { buf.put(0x6A.toByte); i += 1 }
      buf.put(0.toByte) // the spec's odd-size pad byte
    }
    buf.put("data".getBytes("US-ASCII")).putInt(dataBytes)
    var i = 0
    while (i < n) {
      val s = (base + i * step).toShort
      buf.putShort(s)
      if (channels == 2) buf.putShort((-s).toShort)
      i += 1
    }
    buf.array()
  }

  // ---- the real decoder ----

  private def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8)

  private def i32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8) |
      ((b(o + 2) & 0xFF) << 16) | ((b(o + 3) & 0xFF) << 24)

  private def tag(b: Array[Byte], o: Int): String =
    new String(b, o, 4, "US-ASCII")

  /** Parse WAV bytes to [[WavStats]]; None on anything that is not
    * well-formed integer-PCM WAV (wrong magic, non-PCM format, >2
    * channels, odd bit depths, truncated chunks or data).
    */
  def decode(bytes: Array[Byte]): Option[WavStats] = {
    if (bytes.length < 12 || tag(bytes, 0) != "RIFF" ||
      tag(bytes, 8) != "WAVE") return None
    var fmt: Option[(Int, Int, Int)] = None // (channels, rate, bits)
    var off = 12
    while (off + 8 <= bytes.length) {
      val id = tag(bytes, off)
      val size = i32(bytes, off + 4)
      val payload = off + 8
      if (size < 0 || payload + size > bytes.length) return None
      id match {
        case "fmt " =>
          if (size < 16) return None
          val audioFormat = u16(bytes, payload)
          val channels = u16(bytes, payload + 2)
          val rate = i32(bytes, payload + 4)
          val bits = u16(bytes, payload + 14)
          if (audioFormat != 1 || channels < 1 || channels > 2 ||
            (bits != 8 && bits != 16) || rate <= 0) return None
          fmt = Some((channels, rate, bits))
        case "data" =>
          val (channels, rate, bits) = fmt.getOrElse(return None)
          val bytesPerSample = bits / 8
          val frameBytes = channels * bytesPerSample
          if (size % frameBytes != 0) return None
          val nFrames = size / frameBytes
          if (nFrames == 0) return None
          var sumL = 0L; var sumR = 0L; var sumSq = 0L
          var f = 0
          while (f < nFrames) {
            var c = 0
            while (c < channels) {
              val o = payload + (f * channels + c) * bytesPerSample
              // 16-bit is signed LE; 8-bit is UNSIGNED excess-128
              val s =
                if (bits == 16) u16(bytes, o).toShort.toInt
                else (bytes(o) & 0xFF) - 128
              if (c == 0) sumL += s else sumR += s
              sumSq += s.toLong * s
              c += 1
            }
            f += 1
          }
          val meanL = sumL.toDouble / nFrames
          val meanR = if (channels == 2) sumR.toDouble / nFrames else meanL
          val rms = math.sqrt(sumSq.toDouble / (nFrames * channels))
          return Some(WavStats(rate, channels, bits, nFrames, meanL, meanR, rms))
        case _ => () // LIST/JUNK/…: skip by size, per spec
      }
      // chunks align to even offsets: odd sizes carry one pad byte
      off = payload + size + (size & 1)
    }
    None
  }

  /** Channel-L PCM samples parsed from real WAV bytes — the same chunk
    * walk as [[decode]] (fmt gate, unknown-chunk skips, odd-size pad
    * bytes) but materializing the first channel's samples for frame-level
    * feature extraction. Kept separate from [[decode]] on purpose: the
    * stats decoder never allocates per-sample storage (the right shape
    * for whole-file QC), this one does (the right shape for windowed
    * features), and each is independently spec-checked.
    */
  private[graft] def samplesL(bytes: Array[Byte]): Option[Array[Int]] = {
    if (bytes.length < 12 || tag(bytes, 0) != "RIFF" ||
      tag(bytes, 8) != "WAVE") return None
    var fmt: Option[(Int, Int)] = None // (channels, bits)
    var off = 12
    while (off + 8 <= bytes.length) {
      val id = tag(bytes, off)
      val size = i32(bytes, off + 4)
      val payload = off + 8
      if (size < 0 || payload + size > bytes.length) return None
      id match {
        case "fmt " =>
          if (size < 16) return None
          val audioFormat = u16(bytes, payload)
          val channels = u16(bytes, payload + 2)
          val bits = u16(bytes, payload + 14)
          if (audioFormat != 1 || channels < 1 || channels > 2 ||
            (bits != 8 && bits != 16)) return None
          fmt = Some((channels, bits))
        case "data" =>
          val (channels, bits) = fmt.getOrElse(return None)
          val bytesPerSample = bits / 8
          val frameBytes = channels * bytesPerSample
          if (size % frameBytes != 0) return None
          val nFrames = size / frameBytes
          val out = new Array[Int](nFrames)
          var f = 0
          while (f < nFrames) {
            val o = payload + f * frameBytes
            out(f) =
              if (bits == 16) u16(bytes, o).toShort.toInt
              else (bytes(o) & 0xFF) - 128
            f += 1
          }
          return Some(out)
        case _ => ()
      }
      off = payload + size + (size & 1)
    }
    None
  }

  /** q165 pipeline — frame-level audio features, the VAD/segmentation
    * front-end every speech-data pipeline runs before anything expensive:
    * per document the doc-derived WAV is built, its channel-L samples
    * parsed back from the real bytes, split into fixed `win`-sample
    * windows, and each window scored with exact-integer aggregates —
    * sample sum, zero-crossing count (adjacent sign flips INSIDE the
    * window), RMS energy (exact BIGINT sum of squares, one IEEE sqrt,
    * floor-quantized at 1e-4) and a silence verdict (rms < threshold).
    * Row-local `mapPartitions`, zero shuffles; the oracle recomputes every
    * window from the ramp's closed forms, so a mis-parsed byte or an
    * off-by-one window boundary fails the hash.
    */
  def frameFeatures(spark: SparkSession, documents: DataFrame,
      win: Int = 64, silenceRms: Double = 500.0): DataFrame = {
    import spark.implicits._
    documents.select(col("doc_id")).as[Long].mapPartitions { it =>
      it.flatMap { id =>
        val s = samplesL(buildForDoc(id)).getOrElse(
          sys.error(s"frame-feature parse failed for doc $id"))
        s.indices.grouped(win).zipWithIndex.map { case (ix, w) =>
          var sum = 0L; var sumSq = 0L; var zc = 0L
          ix.foreach { i =>
            val v = s(i).toLong
            sum += v; sumSq += v * v
            if (i > ix.head && ((s(i) >= 0) != (s(i - 1) >= 0))) zc += 1
          }
          val rms = math.floor(
            math.sqrt(sumSq.toDouble / ix.size) * 10000) / 10000
          (id, w.toLong, ix.size.toLong, sum, zc, rms, rms < silenceRms)
        }
      }
    }.toDF("doc_id", "win_ord", "n_samples", "sum_l", "zc", "rms",
      "is_silence")
  }

  /** q100 pipeline: per document, build the doc-derived WAV through the
    * byte-level writer, decode it with the REAL chunk walker, and emit
    * header fields + sample statistics. The oracle recomputes everything
    * from `doc_id` closed forms (ramp mean and a cubic sum-of-squares
    * identity), so a single mis-parsed byte — wrong endianness, a missed
    * pad byte, signed/unsigned confusion — fails the hash match.
    * Same `mapPartitions` per-partition codec shape as the image path.
    */
  def audioRoundtrip(spark: SparkSession, documents: DataFrame): DataFrame = {
    import spark.implicits._
    documents.select(col("doc_id")).as[Long].mapPartitions { it =>
      it.map { id =>
        val s = decode(buildForDoc(id)).getOrElse(
          sys.error(s"audio round-trip decode failed for doc $id"))
        (id, s.sampleRate.toLong, s.channels.toLong, s.nFrames,
          math.floor(s.nFrames * 1000000.0 / s.sampleRate) / 1000.0,
          s.meanL, s.meanR, math.floor(s.rms * 10000) / 10000)
      }
    }.toDF("doc_id", "sample_rate", "channels", "n_frames", "duration_ms",
      "mean_l", "mean_r", "rms")
      .orderBy(col("doc_id"))
  }

  /** Per-frame amplitude for the fingerprint fixture (q271) — the audio
    * twin of Multimodal.cellValue: FRAME-CONSTANT PCM (65 frames × 64
    * samples), amplitude from the same NONLINEAR w² mix (an affine mix's
    * constant consecutive-frame difference makes energy-delta bits
    * quasi-periodic — the q270 lesson, documented there). Groups of 4
    * docs share a pattern; members 1–3 spike frame 16·m to 6000 (above
    * the 0..3999 base range), perturbing at most the two adjacent
    * energy comparisons — within-group Hamming ≤ 4, cross-group ~32.
    */
  private[graft] def ampFor(id: Long, f: Int): Int = {
    val gid = id / 4
    val mm = (id % 4).toInt
    if (mm != 0 && f == 16 * mm) 6000
    else {
      val w = (gid * 8191L + f * 127L + 5L) % 2147483647L * 2654435761L %
        2147483647L
      (w * w % 2147483647L % 4000L).toInt
    }
  }

  /** Minimal mono 16-bit WAV with frame-constant amplitudes — real RIFF
    * bytes for the fingerprint round trip.
    */
  private[graft] def buildFingerprintWav(id: Long): Array[Byte] = {
    val frames = 65; val win = 64
    val dataBytes = frames * win * 2
    val riffSize = 4 + (8 + 16) + (8 + dataBytes)
    val buf = ByteBuffer.allocate(8 + riffSize)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(riffSize)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(16000)
      .putInt(16000 * 2).putShort(2).putShort(16)
    buf.put("data".getBytes("US-ASCII")).putInt(dataBytes)
    var f = 0
    while (f < frames) {
      val a = ampFor(id, f).toShort
      var i = 0
      while (i < win) { buf.putShort(a); i += 1 }
      f += 1
    }
    buf.array()
  }

  /** 64-bit energy-delta audio fingerprint through the REAL chunk walker
    * (q271) — the time-domain cousin of spectral fingerprints
    * (Chromaprint-style delta coding without the FFT the oracle can't
    * replay): build the doc WAV, parse the bytes back with [[samplesL]],
    * sum-of-squares energy per 64-sample frame (exact BIGINT), bit b =
    * energy(b+1) > energy(b) over 65 frames, packed as two nonnegative
    * 32-bit halves (the q270 convention). One mis-parsed byte, wrong
    * frame boundary, or sign error flips a bit and fails the oracle.
    */
  def audioFingerprint(spark: SparkSession, documents: DataFrame)
      : DataFrame = {
    import spark.implicits._
    documents.select(col("doc_id")).as[Long].mapPartitions { it =>
      it.map { id =>
        val s = samplesL(buildFingerprintWav(id)).getOrElse(
          sys.error(s"fingerprint parse failed for doc $id"))
        require(s.length == 65 * 64, s"bad sample count for doc $id")
        val e = Array.tabulate(65) { f =>
          var sq = 0L
          var i = f * 64
          while (i < f * 64 + 64) { val v = s(i).toLong; sq += v * v; i += 1 }
          sq
        }
        var hi = 0L; var lo = 0L
        var b = 0
        while (b < 64) {
          if (e(b + 1) > e(b)) {
            if (b < 32) hi |= 1L << b else lo |= 1L << (b - 32)
          }
          b += 1
        }
        (id, hi, lo)
      }
    }.toDF("doc_id", "fp_hi", "fp_lo")
  }

  /** Audio near-dup pairs by fingerprint Hamming distance (q271) —
    * [[audioFingerprint]] signatures under 8×8-bit band bucketing +
    * exact bit_count verification. Eight bands are COMPLETE to
    * Hamming 7 by pigeonhole (≤ 7 differing bits cannot touch all 8
    * bands); the default threshold 6 covers the fixture's ≤ 4
    * within-group distance with margin, and the guard refuses
    * thresholds past the guarantee. Same scale shape as the image
    * path: signatures localCheckpointed, band join rides near-dup
    * density, candidates dedup on the id pair.
    */
  def audioNearDups(spark: SparkSession, documents: DataFrame,
      maxHamming: Int = 6): DataFrame = {
    import org.apache.spark.sql.functions.{array, concat, explode, lit}
    require(maxHamming <= 7, "8x8 banding is only complete to Hamming 7")
    val sigs = audioFingerprint(spark, documents).localCheckpoint(true)
    val bandCols = (0 until 8).map { i =>
      val half = if (i < 4) "fp_hi" else "fp_lo"
      val shift = 1L << ((i % 4) * 8)
      concat(lit(s"a$i:"),
        org.apache.spark.sql.functions.expr(s"$half div $shift % 256"))
    }
    val bands = sigs.select(col("doc_id"), col("fp_hi"), col("fp_lo"),
      explode(array(bandCols: _*)).as("bkey"))
    bands.as("a")
      .join(bands.as("b"), col("a.bkey") === col("b.bkey")
        && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.fp_hi").as("hi_a"), col("a.fp_lo").as("lo_a"),
        col("b.fp_hi").as("hi_b"), col("b.fp_lo").as("lo_b"))
      .distinct()
      .withColumn("hamming",
        org.apache.spark.sql.functions
          .expr("bit_count(hi_a ^ hi_b) + bit_count(lo_a ^ lo_b)")
          .cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
  }
}
