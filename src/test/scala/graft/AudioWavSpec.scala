package graft

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.functions._

import graft.operators.AudioWav

/** The real WAV/PCM codec: chunk-walk correctness (pad bytes, unknown
  * chunks), sample arithmetic (16-bit signed LE, 8-bit excess-128),
  * stereo interleave, rejection of malformed containers, and the q100
  * distributed round-trip against the closed forms.
  */
class AudioWavSpec extends SparkSpec {

  private def m(x: Long, n: Long): Long = java.lang.Math.floorMod(x, n)

  test("round-trip matches closed forms, including the odd-junk-chunk ids") {
    // id 6 hits the odd-sized LIST chunk (6 % 3 == 0) AND stereo; id -7
    // exercises floorMod on the parameter side
    Seq(0L, 1L, 5L, 6L, 123L, 1000L, -7L).foreach { id =>
      val s = AudioWav.decode(AudioWav.buildForDoc(id))
        .getOrElse(fail(s"decode failed for id=$id"))
      val n = 256 + m(id * 31, 512)
      val base = m(id * 17, 4001) - 2000
      val step = 1 + m(id, 7)
      assert(s.sampleRate === AudioWav.Rates(m(id, 4).toInt))
      assert(s.channels === 1 + m(id, 2).toInt)
      assert(s.nFrames === n)
      val meanL = base + step * (n - 1) / 2.0
      assert(s.meanL === meanL, s"mean_l id=$id")
      assert(s.meanR === (if (s.channels == 2) -meanL else meanL), s"mean_r id=$id")
      val sumsq = n * base * base + 2 * base * step * (n * (n - 1) / 2) +
        step * step * ((n - 1) * n * (2 * n - 1) / 6)
      assert(s.rms === math.sqrt(sumsq.toDouble / n), s"rms id=$id")
    }
  }

  test("8-bit PCM decodes as unsigned excess-128") {
    // hand-built mono 8-bit WAV: samples 0x00, 0x80, 0xFF → -128, 0, 127
    val data = Array[Byte](0x00, 0x80.toByte, 0xFF.toByte)
    val buf = ByteBuffer.allocate(8 + 4 + 24 + 8 + 4).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(4 + 24 + 8 + 4)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(8000).putInt(8000).putShort(1).putShort(8)
      .put("data".getBytes("US-ASCII")).putInt(3).put(data).put(0.toByte)
    val s = AudioWav.decode(buf.array()).getOrElse(fail("8-bit decode failed"))
    assert(s.bitsPerSample === 8 && s.nFrames === 3)
    assert(s.meanL === (-128 + 0 + 127) / 3.0)
    assert(s.rms === math.sqrt((128.0 * 128 + 0 + 127.0 * 127) / 3))
  }

  test("malformed containers are rejected, never mis-parsed") {
    val good = AudioWav.buildForDoc(42L)
    assert(AudioWav.decode(Array.empty[Byte]).isEmpty, "empty")
    assert(AudioWav.decode("RIFFxxxxWEBP".getBytes).isEmpty, "wrong form type")
    assert(AudioWav.decode(good.take(40)).isEmpty, "truncated mid-chunk")
    // data chunk truncated: shrink the array but keep headers intact
    assert(AudioWav.decode(good.take(good.length - 1)).isEmpty, "truncated data")
    // non-PCM audioFormat (offset 20 = fmt payload start, LE u16)
    val nonPcm = good.clone(); nonPcm(20) = 3
    assert(AudioWav.decode(nonPcm).isEmpty, "float format must be rejected")
    // 3 channels
    val tooMany = good.clone(); tooMany(22) = 3
    assert(AudioWav.decode(tooMany).isEmpty, "3 channels must be rejected")
  }

  test("unknown chunks are skipped by size; a missed pad byte would desync") {
    // id 6 carries the odd LIST chunk before data: successful decode
    // proves the walker honored the pad byte (off-by-one lands inside
    // 'data'+garbage and fails one of the guards)
    val bytes = AudioWav.buildForDoc(6L)
    assert(new String(bytes, 36, 4, "US-ASCII") === "LIST",
      "fixture must carry the junk chunk")
    assert(AudioWav.decode(bytes).nonEmpty)
  }

  test("q100 distributed round-trip equals the SQL closed forms (sample)") {
    import spark.implicits._
    val docs = Seq(0L, 1L, 2L, 3L, 6L, 99L, 12345L).toDF("doc_id")
    val out = graft.operators.AudioWav.audioRoundtrip(spark, docs).collect()
    assert(out.length === 7)
    out.foreach { r =>
      val id = r.getLong(0)
      val n = 256 + m(id * 31, 512)
      assert(r.getLong(3) === n)
      val base = m(id * 17, 4001) - 2000
      val step = 1 + m(id, 7)
      assert(r.getDouble(5) === base + step * (n - 1) / 2.0)
    }
  }

  test("frameFeatures equals a direct ramp recomputation per window") {
    import spark.implicits._
    val ids = (0L to 20L) :+ 999L
    val out = graft.operators.AudioWav
      .frameFeatures(spark, ids.toDF("doc_id"), win = 64)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5),
          r.getBoolean(6)))).toMap
    ids.foreach { id =>
      val n = (256 + m(id * 31, 512)).toInt
      val base = m(id * 17, 4001) - 2000
      val step = 1 + m(id, 7)
      val s = (0 until n).map(i => base + i * step)
      s.indices.grouped(64).zipWithIndex.foreach { case (ix, w) =>
        val vs = ix.map(s)
        val zc = ix.tail.count(i => (s(i) >= 0) != (s(i - 1) >= 0))
        val rms = math.floor(math.sqrt(
          vs.map(v => v * v).sum.toDouble / ix.size) * 10000) / 10000
        assert(out((id, w.toLong)) ===
          ((ix.size.toLong, vs.sum, zc.toLong, rms, rms < 500.0)),
          s"doc $id window $w")
      }
    }
  }

  test("frameFeatures: one zero crossing exactly where the ramp flips") {
    import spark.implicits._
    // any id with base < 0 crosses zero once at i = ceil(-base/step)
    val id = (0L to 200L).find(i => m(i * 17, 4001) - 2000 < -100).get
    val base = m(id * 17, 4001) - 2000
    val step = 1 + m(id, 7)
    val cross = ((-base + step - 1) / step).toInt // first i with s >= 0
    val rows = graft.operators.AudioWav
      .frameFeatures(spark, Seq(id).toDF("doc_id"), win = 64).collect()
    val zcs = rows.map(r => r.getLong(1).toInt -> r.getLong(4)).toMap
    val expectWin = cross / 64
    zcs.foreach { case (w, zc) =>
      // a crossing at a window boundary (i % 64 == 0) pairs with the
      // previous window's last sample and is counted in NEITHER window
      val expected =
        if (w == expectWin && cross % 64 != 0) 1L else 0L
      assert(zc === expected, s"window $w (cross=$cross)")
    }
  }

  /** Codec-free fingerprint twin straight from ampFor — what the real
    * RIFF round trip must reproduce bit for bit.
    */
  private def directFp(id: Long): (Long, Long) = {
    var hi = 0L; var lo = 0L
    for (b <- 0 until 64)
      if (AudioWav.ampFor(id, b + 1) > AudioWav.ampFor(id, b)) {
        if (b < 32) hi |= 1L << b else lo |= 1L << (b - 32)
      }
    (hi, lo)
  }

  test("audioFingerprint: RIFF round trip reproduces the closed-form " +
      "bits; halves in 32-bit range") {
    import spark.implicits._
    val ids = Seq(0L, 1L, 2L, 3L, 4L, 17L, 100L, 54321L)
    val out = AudioWav.audioFingerprint(spark, ids.toDF("doc_id"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    ids.foreach { id =>
      assert(out(id) === directFp(id),
        s"decode path diverged from amp closed form for $id")
      assert(out(id)._1 >= 0L && out(id)._1 < (1L << 32)
        && out(id)._2 >= 0L && out(id)._2 < (1L << 32))
    }
  }

  test("audioNearDups: within-group Hamming <= 4, 8-band join equals " +
      "brute force, guard past the pigeonhole limit") {
    import spark.implicits._
    val n = 200L
    val docs = (0L until n).toDF("doc_id")
    val pairs = AudioWav.audioNearDups(spark, docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val within = pairs.filter { case (a, b, _) => a / 4 == b / 4 }
    assert(within.length === (n / 4 * 6).toInt,
      "a spiked frame moves <= 2 bits, so every group pair is <= 4")
    assert(within.forall(_._3 <= 4))
    val hashes = (0L until n).map(id => id -> directFp(id))
    val brute = for {
      (a, (ha, la)) <- hashes; (b, (hb, lb)) <- hashes if a < b
      d = java.lang.Long.bitCount(ha ^ hb) + java.lang.Long.bitCount(la ^ lb)
      if d <= 6
    } yield (a, b, d.toLong)
    assert(pairs.toSet === brute.toSet,
      "8x8 banding must be COMPLETE at Hamming <= 6")
    intercept[IllegalArgumentException] {
      AudioWav.audioNearDups(spark, docs, maxHamming = 8)
    }
  }
}
