package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.EventStreams
import graft.streaming.EventStreams.{UserEvent, UserProfile}

/** Streaming transformations replayed from a file source in micro-batches
  * must agree with the same transformation applied in batch mode.
  */
class EventStreamsSpec extends SparkSpec {
  import spark.implicits._

  // 4 time-ranged files → 4 micro-batches in event-time order (the
  // watermark contract assumes bounded disorder; randomly ordered replay
  // would legitimately drop most events as late)
  private lazy val eventsDir: String = {
    val dir = tmpDir("events-stream")
    Tables.events(spark, "/root/testdata/sf0.001")
      .repartitionByRange(4, col("ts"))
      .sortWithinPartitions(col("ts"))
      .write.mode("overwrite").parquet(dir)
    // FileStreamSource batches by file mtime: make mtimes ascend with the
    // time ranges so replay order is deterministic and event-time ordered
    val parts = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("part-")).sortBy(_.getName)
    parts.zipWithIndex.foreach { case (f, i) =>
      f.setLastModified(System.currentTimeMillis() - (parts.length - i) * 60000L)
    }
    dir
  }

  private def streamEvents: DataFrame =
    spark.readStream
      .schema(Tables.events(spark, "/root/testdata/sf0.001").schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(eventsDir)

  private def runToMemory(df: DataFrame, name: String, mode: String): DataFrame = {
    val q = df.writeStream
      .queryName(name)
      .format("memory")
      .outputMode(mode)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    spark.table(name)
  }

  test("watermarked tumbling window agg: streaming == batch") {
    val batch = EventStreams.hourlyCounts(
      spark.read.parquet(eventsDir))
      .collect().map(r => (r.getTimestamp(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    val streamed = runToMemory(
      EventStreams.hourlyCounts(streamEvents), "hourly", "complete")
      .collect().map(r => (r.getTimestamp(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(streamed === batch)
    assert(batch.nonEmpty)
  }

  test("session windows: append emits exactly the watermark-closed batch sessions") {
    val batch = EventStreams.sessionCounts(spark.read.parquet(eventsDir))
      .collect().map(r => ((r.getTimestamp(0), r.getLong(2)), (r.getTimestamp(1), r.getLong(3)))).toMap
    val streamed = runToMemory(
      EventStreams.sessionCounts(streamEvents), "sessions", "append")
      .collect().map(r => ((r.getTimestamp(0), r.getLong(2)), (r.getTimestamp(1), r.getLong(3)))).toMap

    // every emitted session is exactly a batch session
    streamed.foreach { case (k, v) => assert(batch.get(k).contains(v), s"$k") }

    // coverage: sessions closed before the last-advanced watermark
    // (max event time of files 1–3, minus the 2h watermark) must have been
    // emitted; later sessions legitimately stay open at end of stream
    val files = new java.io.File(eventsDir).listFiles()
      .filter(_.getName.startsWith("part-")).map(_.getPath).sorted
    val first3Max = spark.read.parquet(files.dropRight(1): _*)
      .agg(max($"ts")).collect().head.getTimestamp(0)
    val wm = new java.sql.Timestamp(first3Max.getTime - 2 * 3600 * 1000 - 1000)
    val mustEmit = batch.filter { case (_, (end, _)) => end.before(wm) }
    mustEmit.foreach { case (k, v) => assert(streamed.get(k).contains(v), s"missing $k") }
    assert(mustEmit.nonEmpty && streamed.nonEmpty)
  }

  test("flatMapGroupsWithState user profiles converge to batch aggregates") {
    val typed = streamEvents
      .select($"user_id", $"ts", $"event_type", $"value").as[UserEvent]
    val out = runToMemory(
      EventStreams.userProfiles(typed).toDF(), "profiles", "append")
    // last emitted profile per user = final state
    val finalProfiles = out
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"user_id").orderBy($"n_events".desc)))
      .filter($"rn" === 1)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), math.round(r.getDouble(2) * 100)))).toMap

    val batch = spark.read.parquet(eventsDir)
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n"), sum($"value").as("tv"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), math.round(r.getDouble(2) * 100)))).toMap
    assert(finalProfiles === batch)
  }

  test("cusumMonitor: trigger-split series equals one-shot, recurrence " +
      "matches an independent fold, alarms on both sides") {
    import EventStreams.{BucketCount, CusumAlert}
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    // the q223 'up' series: 10/day x10 then 100/day x10; baseline from
    // the full series (mu 55, k 5.5, h 275 in millionths)
    val series = (1L to 20L).map(b =>
      BucketCount("up", b, if (b <= 10) 10L else 100L))
    val base = Map("up" -> (55000000L, 5500000L, 275000000L))
    def run(chunks: Seq[Seq[BucketCount]], name: String): Seq[CusumAlert] = {
      val mem = MemoryStream[BucketCount]
      val q = EventStreams.cusumMonitor(mem.toDS(), base).toDF()
        .writeStream.queryName(name).format("memory")
        .outputMode("append").start()
      try {
        chunks.foreach { c => mem.addData(c: _*); q.processAllAvailable() }
      } finally q.stop()
      spark.table(name).as[CusumAlert].collect().sortBy(_.bucket).toSeq
    }
    val oneShot = run(Seq(series), "cusum_a")
    val split = run(Seq(series.take(7), series.slice(7, 13),
      series.drop(13)), "cusum_b")
    assert(oneShot === split, "state must carry across triggers")
    // independent fold of the same integer recurrence
    var (sp, sn) = (0L, 0L)
    val expected = series.map { bc =>
      sp = math.max(0L, sp + bc.n * 1000000L - 55000000L - 5500000L)
      sn = math.max(0L, sn + 55000000L - bc.n * 1000000L - 5500000L)
      CusumAlert("up", bc.bucket, sp, sn, sp > 275000000L || sn > 275000000L)
    }
    assert(oneShot === expected)
    // S- trips on bucket 7 (low half vs global mean), S+ on bucket 17
    assert(oneShot.filter(_.alarm).map(_.bucket).min === 7L)
    assert(oneShot.find(_.bucket == 17L).get.sp6 > 275000000L)
    // a bucket arriving in a LATER trigger at-or-before the last folded
    // one must not be refolded (order-sensitive recurrence): it comes
    // back flagged with the -1 sentinel, and the in-order rows are
    // bit-identical to the uncorrupted one-shot run
    val late = run(Seq(series.take(10),
      series.slice(10, 20) :+ BucketCount("up", 5L, 999L)), "cusum_c")
    assert(late.count(_.sp6 == -1L) === 1)
    assert(late.find(a => a.bucket == 5L && a.sp6 == -1L).get.sn6 === -1L)
    assert(late.filter(_.sp6 >= 0L) === oneShot)
  }

  test("sprtMonitor: trigger-split equals one-shot, decision is sticky " +
      "at the crossing value, late buckets flagged") {
    import EventStreams.{TrialCount, SprtVerdict}
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    // 10 successes/bucket: +2876820/bucket -> crosses A6 on bucket 2,
    // then the verdict must FREEZE (llr stays at the crossing value)
    val series = (1L to 5L).map(b => TrialCount("p", b, 10L, 10L)) ++
      (1L to 5L).map(b => TrialCount("n", b, 10L, 0L))
    def run(chunks: Seq[Seq[TrialCount]], name: String): Seq[SprtVerdict] = {
      val mem = MemoryStream[TrialCount]
      val q = EventStreams.sprtMonitor(mem.toDS()).toDF()
        .writeStream.queryName(name).format("memory")
        .outputMode("append").start()
      try {
        chunks.foreach { c => mem.addData(c: _*); q.processAllAvailable() }
      } finally q.stop()
      spark.table(name).as[SprtVerdict].collect()
        .sortBy(v => (v.key, v.bucket)).toSeq
    }
    val oneShot = run(Seq(series), "sprt_a")
    val split = run(Seq(series.take(3), series.slice(3, 8),
      series.drop(8)), "sprt_b")
    assert(oneShot === split, "state must carry across triggers")
    val p = oneShot.filter(_.key == "p")
    assert(p.map(_.decision) ===
      Seq("continue", "accept_h1", "accept_h1", "accept_h1", "accept_h1"))
    // frozen at the crossing value: 2 buckets of 10*287682
    assert(p.drop(1).forall(_.llr6 === 2L * 10L * 287682L))
    val n = oneShot.filter(_.key == "n")
    assert(n.map(_.decision) ===
      Seq("continue", "accept_h0", "accept_h0", "accept_h0", "accept_h0"))
    assert(n.drop(1).forall(_.llr6 === 2L * 10L * -154151L))
    // late bucket: flagged with the sentinel, in-order rows unchanged
    val late = run(Seq(series.take(5),
      series.drop(5) :+ TrialCount("p", 2L, 99L, 99L)), "sprt_c")
    assert(late.count(_.decision == "late") === 1)
    assert(late.find(_.decision == "late").get.llr6 === Long.MinValue)
    assert(late.filter(_.decision != "late") === oneShot)
  }

  test("ewmaMonitor: trigger-split equals one-shot, per-bucket values " +
      "equal the BATCH ewmaTrend operator, late buckets flagged") {
    import EventStreams.{BucketCount, EwmaPoint}
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    // all counts >= 1 so the batch daily census has exactly one row
    // per stream bucket (the batch operator folds days PRESENT; gap
    // handling belongs to whoever pre-buckets the feed)
    val series = Seq(5L, 9L, 2L, 2L, 14L, 1L, 7L).zipWithIndex
      .map { case (n, i) => BucketCount("k", i + 1L, n) }
    def run(chunks: Seq[Seq[BucketCount]], name: String): Seq[EwmaPoint] = {
      val mem = MemoryStream[BucketCount]
      val q = EventStreams.ewmaMonitor(mem.toDS()).toDF()
        .writeStream.queryName(name).format("memory")
        .outputMode("append").start()
      try {
        chunks.foreach { c => mem.addData(c: _*); q.processAllAvailable() }
      } finally q.stop()
      spark.table(name).as[EwmaPoint].collect().sortBy(_.bucket).toSeq
    }
    val oneShot = run(Seq(series), "ew_a")
    val split = run(Seq(series.take(2), series.slice(2, 5),
      series.drop(5)), "ew_b")
    assert(oneShot === split, "state must carry across triggers")
    // the stream must emit EXACTLY the batch operator's ewma6 values:
    // replay the same counts as daily events through ewmaTrend
    val ev = series.flatMap(bc => (1L to bc.n).map(_ =>
      ("k", java.sql.Timestamp.valueOf(
        f"2024-03-${bc.bucket}%02d 12:00:00"))))
      .toDF("event_type", "ts")
    val batch = graft.operators.TemporalJoins
      .ewmaTrend(ev, "event_type", "ts")
      .orderBy($"day").collect().map(_.getAs[Long]("ewma6")).toSeq
    assert(oneShot.map(_.ewma6) === batch,
      "stream must emit exactly the batch operator's ewma6 per bucket")
    val late = run(Seq(series, Seq(BucketCount("k", 3L, 99L))), "ew_c")
    assert(late.count(_.ewma6 == -1L) === 1)
    assert(late.filter(_.ewma6 >= 0L) === oneShot)
  }

  test("pageHinkleyMonitor: trigger-split equals one-shot, recurrence " +
      "matches an independent batch fold, level shift alarms, late " +
      "buckets flagged") {
    import EventStreams.{BucketCount, PhAlert}
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    // the q258/q223 shape: 10 buckets of 10/day then 10 of 100/day —
    // the running-mean excursion must cross lambda=50 shortly after the
    // shift with NO baseline supplied (the Page-Hinkley selling point)
    val series = (1L to 20L).map(b =>
      BucketCount("up", b, if (b <= 10) 10L else 100L))
    def run(chunks: Seq[Seq[BucketCount]], name: String): Seq[PhAlert] = {
      val mem = MemoryStream[BucketCount]
      val q = EventStreams.pageHinkleyMonitor(mem.toDS()).toDF()
        .writeStream.queryName(name).format("memory")
        .outputMode("append").start()
      try {
        chunks.foreach { c => mem.addData(c: _*); q.processAllAvailable() }
      } finally q.stop()
      spark.table(name).as[PhAlert].collect().sortBy(_.bucket).toSeq
    }
    val oneShot = run(Seq(series), "ph_a")
    val split = run(Seq(series.take(7), series.slice(7, 13),
      series.drop(13)), "ph_b")
    assert(oneShot === split, "state must carry across triggers")
    // independent fold of the exact batch recurrence (q258's integers)
    var (t, cum, m6, minm6) = (0L, 0L, 0L, Long.MaxValue)
    val expected = series.map { bc =>
      t += 1; cum += bc.n
      m6 += bc.n * 1000000L - cum * 1000000L / t
      minm6 = math.min(minm6, m6)
      PhAlert("up", bc.bucket, m6 - minm6, (m6 - minm6) > 50000000L)
    }
    assert(oneShot === expected)
    // flat prefix never alarms; the shift must
    assert(oneShot.take(10).forall(!_.alarm))
    assert(oneShot.exists(_.alarm), "level shift x10 must trip lambda=50")
    // late bucket: flagged with the -1 sentinel, in-order rows unchanged
    val late = run(Seq(series.take(10),
      series.drop(10) :+ BucketCount("up", 4L, 999L)), "ph_c")
    assert(late.count(_.exc6 == -1L) === 1)
    assert(late.filter(_.exc6 >= 0L) === oneShot)
  }

  test("bradleyTerryMonitor: per-epoch refit over the cumulative census, " +
      "trigger-split equals one-shot, final epoch equals batch, replayed " +
      "epoch flagged not double-counted") {
    import EventStreams.{BtGame, BtStanding}
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    // two-epoch drift: epoch 1 favors model 2 (beats 0 and 1 in 8/10),
    // epoch 2 flips — model 0 sweeps both rivals 9/10 — so the
    // cumulative leaderboard must rank 2 first after epoch 1 and 0
    // first after epoch 2
    def games(ep: Long, a: Long, b: Long, aWins: Int, n: Int): Seq[BtGame] =
      (0 until n).map(g =>
        BtGame("arena", ep, a, b, if (g < aWins) a else b))
    val ep1 = games(1L, 2L, 0L, 8, 10) ++ games(1L, 2L, 1L, 8, 10) ++
      games(1L, 0L, 1L, 5, 10)
    val ep2 = games(2L, 0L, 2L, 9, 10) ++ games(2L, 0L, 1L, 9, 10) ++
      games(2L, 1L, 2L, 5, 10)
    def run(chunks: Seq[Seq[BtGame]], name: String): Seq[BtStanding] = {
      val mem = MemoryStream[BtGame]
      val q = EventStreams.bradleyTerryMonitor(mem.toDS()).toDF()
        .writeStream.queryName(name).format("memory")
        .outputMode("append").start()
      try {
        chunks.foreach { c => mem.addData(c: _*); q.processAllAvailable() }
      } finally q.stop()
      spark.table(name).as[BtStanding].collect()
        .sortBy(s => (s.epoch, s.rank, s.model)).toSeq
    }
    val oneShot = run(Seq(ep1, ep2), "bt_a")
    // one leaderboard row per model per epoch
    assert(oneShot.count(_.epoch == 1L) === 3)
    assert(oneShot.count(_.epoch == 2L) === 3)
    // drift visible: 2 tops epoch 1, 0 tops the cumulative epoch 2
    assert(oneShot.find(s => s.epoch == 1L && s.rank == 1L).get.model === 2L)
    assert(oneShot.find(s => s.epoch == 2L && s.rank == 1L).get.model === 0L)
    // census accumulates: epoch-2 games column counts BOTH epochs
    assert(oneShot.filter(_.epoch == 2L).map(_.games).sum === 120L)
    // state carries across trigger boundaries (epochs in separate
    // triggers ≡ both in one)
    val split = run(Seq(ep1 ++ ep2), "bt_b")
    assert(oneShot === split, "state must carry across triggers")
    // final epoch ≡ the batch operator on the full game log (the shared
    // btMmFit makes this bit-exact: strength6 = round(strength·1e6))
    val batch = graft.operators.EvalOps.bradleyTerry(
      (ep1 ++ ep2).toDF().select($"model_a", $"model_b", $"winner"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), math.round(r.getDouble(4) * 1e6))).toSeq
    val streamFinal = oneShot.filter(_.epoch == 2L)
      .map(s => (s.rank, s.model, s.games, s.wins, s.strength6))
    assert(streamFinal === batch)
    // replayed epoch: flagged with the sentinel row, never refolded —
    // the in-order rows are bit-identical to the clean run
    val replay = run(Seq(ep1, ep2, ep1), "bt_c")
    val flagged = replay.filter(_.strength6 == Long.MinValue)
    assert(flagged.map(s => (s.epoch, s.rank, s.model, s.games)) ===
      Seq((1L, -1L, -1L, 30L)))
    assert(replay.filterNot(_.strength6 == Long.MinValue) === oneShot)
  }

  test("misra-gries heavy hitters: bounded state, MG guarantees, carryover") {
    import EventStreams.{MgEvent, HeavyHitter}
    // skewed synthetic stream: user 42 owns ~40% of 'view' traffic; the
    // 'click' type is uniform (no qualifying heavy hitter required)
    val dir = tmpDir("mg-stream")
    val rows = (0 until 900).map { i =>
      if (i % 5 < 2) MgEvent("view", 42L)
      else MgEvent(if (i % 2 == 0) "view" else "click", (i % 37).toLong)
    }
    rows.grouped(300).zipWithIndex.foreach { case (chunk, b) =>
      chunk.toDS().repartition(1).write.parquet(s"$dir/b$b")
    }
    val files = (0 until 3).map(b => s"$dir/b$b")
    // deterministic 3-batch replay via ascending mtimes
    files.zipWithIndex.foreach { case (f, i) =>
      new java.io.File(f).listFiles().foreach(
        _.setLastModified(System.currentTimeMillis() - (3 - i) * 60000L))
    }
    val stream = spark.readStream
      .schema(rows.toDS().schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$dir/b*")
      .as[MgEvent]
    val out = runToMemory(
      EventStreams.heavyHitters(stream, k = 4).toDF(), "mg", "append")
      .as[HeavyHitter].collect()
    // final snapshot per type = rows at the max n_processed
    val finalSnap = out.groupBy(_.event_type).map { case (et, rs) =>
      et -> rs.filter(_.n_processed == rs.map(_.n_processed).max)
    }
    val trueCounts = rows.groupBy(e => (e.event_type, e.user_id))
      .view.mapValues(_.size.toLong).toMap
    val nByType = rows.groupBy(_.event_type)
      .view.mapValues(_.size.toLong).toMap
    finalSnap.foreach { case (et, hh) =>
      assert(hh.length <= 4, s"$et state exceeded k")
      assert(hh.head.n_processed === nByType(et), s"$et carryover broke")
      hh.foreach { h =>
        val t = trueCounts((et, h.user_id))
        assert(h.count_lb <= t, s"counter above true count: $h")
        assert(h.count_lb >= t - nByType(et) / 5,
          s"counter below the MG floor: $h vs true $t")
      }
    }
    // the MG guarantee: any item with true freq > n/(k+1) must survive —
    // user 42 has ~53% of 'view' traffic
    val viewHh = finalSnap("view").map(_.user_id).toSet
    assert(trueCounts(("view", 42L)) > nByType("view") / 5)
    assert(viewHh.contains(42L), s"dominant user evicted: $viewHh")
  }

  test("stream-stream interval join (click attribution): streaming == batch") {
    val batchEvents = spark.read.parquet(eventsDir)
    def split(df: org.apache.spark.sql.DataFrame) = (
      df.filter($"event_type" === "purchase"),
      df.filter($"event_type" === "click"))
    val (bp, bc) = split(batchEvents)
    val batch = EventStreams.clickAttribution(bp, bc)
      .select("purchase_id", "click_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val (sp, sc) = split(streamEvents)
    val streamed = runToMemory(
      EventStreams.clickAttribution(sp, sc), "attribution", "append")
      .select("purchase_id", "click_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(batch.nonEmpty)
    assert(streamed === batch)
  }
}

class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  test("streaming dedup drops within-watermark duplicates") {
    val dir = tmpDir("dup-events")
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
      .orderBy($"ts").limit(200)
    // duplicate every event, replay both copies
    ev.union(ev).repartitionByRange(2, col("ts")).sortWithinPartitions(col("ts"))
      .write.mode("overwrite").parquet(dir)
    val q = graft.streaming.EventStreams.dedupEvents(
      spark.readStream.schema(ev.schema).parquet(dir))
      .writeStream.queryName("dedup").format("memory").outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "stream did not drain in time")
    val out = spark.table("dedup")
    assert(out.count() === 200)
    assert(out.select("event_id").distinct().count() === 200)
  }
}
