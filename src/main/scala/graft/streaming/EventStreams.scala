package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event-stream analytics as Structured Streaming transformations. Each
  * takes an unbounded (or bounded) events DataFrame with columns
  * (event_id, ts, user_id, event_type, value) and works identically in
  * batch mode — the tests replay the same frames both ways.
  *
  * Streaming posture (SURVEY.md §2.9): the reference itself has no
  * event-time windows (T3/T4 absent) — these are the engine's extension
  * surface for stream analytics, with proper watermarks so state is
  * bounded at 100 TB/day event volumes.
  */
object EventStreams {

  /** Tumbling event-time window counts with a watermark bounding state:
    * late events beyond the watermark are dropped, closed windows are
    * emitted finally (append mode capable).
    */
  def hourlyCounts(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 2).as("total_value"))
      .select(col("window.start").as("hour_ts"), col("event_type"),
        col("cnt"), col("total_value"))

  /** Native session windows: gap-based grouping per user. */
  def sessionCounts(events: DataFrame, gap: String = "30 minutes",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("session_value"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"), col("session_value"))

  /** Streaming exact dedup by event id with bounded state: duplicates
    * arriving within the watermark window are dropped, state for old ids
    * is evicted as the watermark advances (at-least-once source → effective
    * exactly-once delivery downstream).
    */
  def dedupEvents(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-stream interval join: each purchase joined to the clicks of
    * the same user in the preceding `window`. Both sides carry watermarks
    * so the join state is bounded — Spark retains click state only for
    * the interval horizon and purchase state for the watermark delay;
    * at 100 TB/day the state store holds one horizon's worth of keys,
    * not the stream's history.
    */
  def clickAttribution(purchases: DataFrame, clicks: DataFrame,
      window: String = "30 minutes",
      watermark: String = "1 hour"): DataFrame = {
    val p = purchases.withWatermark("ts", watermark)
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts").as("p_ts"), col("value").as("purchase_value"))
    val c = clicks.withWatermark("ts", watermark)
      .select(col("user_id").as("c_user_id"), col("event_id").as("click_id"),
        col("ts").as("c_ts"))
    p.join(c,
      col("user_id") === col("c_user_id") &&
        col("c_ts") <= col("p_ts") &&
        col("c_ts") >= col("p_ts") - expr(s"INTERVAL $window"))
      .select(col("user_id"), col("purchase_id"), col("click_id"),
        col("p_ts"), col("c_ts"), col("purchase_value"))
  }

  final case class UserEvent(user_id: Long, ts: Timestamp, event_type: String, value: Double)
  final case class UserProfile(
      user_id: Long,
      n_events: Long,
      total_value: Double,
      last_event: String,
      last_ts: Timestamp)

  final case class MgEvent(event_type: String, user_id: Long)
  final case class MgState(n: Long, keys: Seq[Long], counts: Seq[Long])
  final case class HeavyHitter(event_type: String, user_id: Long,
      count_lb: Long, n_processed: Long)

  /** Streaming Misra-Gries heavy hitters (k-counter frequent-items
    * sketch) per event type: the UNBOUNDED-cardinality complement of the
    * batch heavy-hitter report — a windowless stream over billions of
    * distinct users cannot keep exact per-user counts, but k counters
    * per group guarantee every item with true frequency > n/(k+1)
    * survives, with counter ≤ true count ≤ counter + n/(k+1). State is
    * EXACTLY k (key, count) pairs per group — independent of stream
    * length and user cardinality, the property that makes it safe at
    * 100 TB/day where the per-user-profile state shape would OOM the
    * state store.
    *
    * Each micro-batch folds its group's events into the carried
    * counters (hit: +1; room: insert; full: decrement-all, drop zeros)
    * and emits the post-batch snapshot. The group iterator is folded
    * DIRECTLY — never buffered: any fold order yields a valid MG
    * sketch (the error bound is order-free), and materializing the
    * iterator (`toSeq`) would make per-trigger heap O(group batch
    * size), cutting against the bounded-state rationale exactly when
    * one event type dominates a micro-batch. The resulting sketch can
    * differ across partition-race orders run-to-run; tests pin
    * determinism by asserting the order-free MG guarantees (count
    * bounds, survivor floor), not exact counter values.
    */
  def heavyHitters(events: Dataset[MgEvent], k: Int = 8): Dataset[HeavyHitter] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.event_type)
      .flatMapGroupsWithState[MgState, HeavyHitter](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (et: String, it: Iterator[MgEvent], state: GroupState[MgState]) =>
          val st = state.getOption.getOrElse(MgState(0L, Nil, Nil))
          var n = st.n
          val counters = scala.collection.mutable.LinkedHashMap(
            st.keys.zip(st.counts): _*)
          it.foreach { e =>
            n += 1
            if (counters.contains(e.user_id)) counters(e.user_id) += 1
            else if (counters.size < k) counters(e.user_id) = 1L
            else counters.keys.toSeq.foreach { ky =>
              val c = counters(ky) - 1
              if (c <= 0) counters.remove(ky) else counters(ky) = c
            }
          }
          state.update(MgState(n, counters.keys.toSeq,
            counters.values.toSeq))
          counters.toSeq.map { case (u, c) => HeavyHitter(et, u, c, n) }
            .iterator
      }
  }

  /** Custom keyed state via flatMapGroupsWithState: a running per-user
    * profile (count, total, last event), emitted on every update —
    * the engine's `mapGroupsWithState` surface for semantics windows can't
    * express. State is per-key and O(1); a processing-time timeout evicts
    * idle users so state can't grow unboundedly.
    */
  def userProfiles(events: Dataset[UserEvent]): Dataset[UserProfile] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[UserProfile, UserProfile](
        OutputMode.Append(), GroupStateTimeout.ProcessingTimeTimeout()) {
        (userId: Long, it: Iterator[UserEvent], state: GroupState[UserProfile]) =>
          if (state.hasTimedOut) {
            // evict idle state WITHOUT re-emitting: the profile was already
            // emitted when it was last updated — a second copy would
            // double-count in append-mode sinks
            state.remove()
            Iterator.empty
          } else {
            val evs = it.toSeq.sortBy(e => (e.ts.getTime, e.event_type))
            if (evs.isEmpty) Iterator.empty
            else {
              val prev = state.getOption.getOrElse(
                UserProfile(userId, 0L, 0.0, "", new Timestamp(0)))
              val next = evs.foldLeft(prev) { (p, e) =>
                UserProfile(userId, p.n_events + 1, p.total_value + e.value,
                  e.event_type, e.ts)
              }
              state.update(next)
              state.setTimeoutDuration("1 hour")
              Iterator(next)
            }
          }
      }
  }

  final case class BucketCount(key: String, bucket: Long, n: Long)
  final case class CusumState(sp: Long, sn: Long,
      lastBucket: Long = Long.MinValue)
  final case class CusumAlert(key: String, bucket: Long, sp6: Long,
      sn6: Long, alarm: Boolean)

  /** Streaming two-sided CUSUM monitor — the continuously-running face
    * of [[graft.operators.TemporalJoins.cusum]] (q223): per-key (S⁺, S⁻)
    * accumulators carried across micro-batches in keyed state, fed
    * pre-bucketed counts (key, bucket, n) and a FIXED per-key baseline
    * (μ₆, k₆, h₆ from a historical batch run — a self-updating mean
    * would let a slow drift recalibrate itself invisible, the classic
    * monitoring mistake). Emits one row per processed bucket with the
    * exact post-bucket accumulators and the alarm flag; the integer
    * recurrence is IDENTICAL to the batch operator's, so a series split
    * across any trigger boundaries produces the same S values the batch
    * fold produces on the whole series (the spec's equivalence check).
    *
    * State is three BIGINTs per key: (S⁺, S⁻) plus the last bucket
    * folded. The group's batch is folded in bucket order: unlike the MG
    * sketch the recurrence is order-SENSITIVE, and a trigger's
    * buckets-per-key are bounded by the trigger window (days per
    * trigger), so the in-memory sort is bounded by calendar, not volume.
    * A bucket arriving in a LATER trigger that sorts at or before the
    * last folded bucket cannot be folded without corrupting the
    * recurrence — it is dropped and reported as a non-alarm row with
    * sp6 = sn6 = -1 (the sentinel is impossible for a real accumulator,
    * which is ≥ 0), so late data is visible to the sink instead of
    * silently skewing S⁺/S⁻. Deliver buckets in order (e.g. watermarked
    * upstream aggregation) for exact batch equivalence.
    */
  def cusumMonitor(counts: Dataset[BucketCount],
      baseline: Map[String, (Long, Long, Long)]): Dataset[CusumAlert] = {
    val spark = counts.sparkSession
    import spark.implicits._
    counts.groupByKey(_.key)
      .flatMapGroupsWithState[CusumState, CusumAlert](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: String, it: Iterator[BucketCount], state: GroupState[CusumState]) =>
          val (mu6, k6, h6) = baseline.getOrElse(key, (0L, 0L, Long.MaxValue))
          var st = state.getOption.getOrElse(CusumState(0L, 0L))
          val out = it.toSeq.sortBy(_.bucket).map { bc =>
            if (bc.bucket <= st.lastBucket)
              // late arrival: already folded past this bucket — folding it
              // now would corrupt the order-sensitive recurrence. Flag it.
              CusumAlert(key, bc.bucket, -1L, -1L, alarm = false)
            else {
              val sp = math.max(0L, st.sp + bc.n * 1000000L - mu6 - k6)
              val sn = math.max(0L, st.sn + mu6 - bc.n * 1000000L - k6)
              st = CusumState(sp, sn, bc.bucket)
              CusumAlert(key, bc.bucket, sp, sn, sp > h6 || sn > h6)
            }
          }
          state.update(st)
          out.iterator
      }
  }

  final case class TrialCount(key: String, bucket: Long, trials: Long,
      successes: Long)
  final case class SprtState(llr6: Long, decided: String,
      lastBucket: Long = Long.MinValue)
  final case class SprtVerdict(key: String, bucket: Long, llr6: Long,
      decision: String)

  /** Streaming Wald SPRT — the continuously-running face of
    * [[graft.operators.Inference.sprt]] (q302): per-key cumulative LLR
    * carried across micro-batches in keyed state, fed pre-bucketed
    * (key, bucket, trials, successes) counts. Constants default to the
    * q302 frozen ×10⁶ literals (p0 = 0.3 vs p1 = 0.4, α = β = 0.05).
    *
    * The decision is STICKY — Wald's test ENDS at the first boundary
    * crossing; buckets after a decision re-emit the decided verdict
    * with the accumulator frozen at its crossing value (continuing to
    * accumulate would resurrect exactly the p-value-peeking mistake
    * the sequential test exists to prevent). A restart replays to the
    * same decision because the fold is the same integer recurrence.
    * Late buckets (at or before the last folded one) are flagged with
    * the impossible llr6 = Long.MinValue sentinel and decision 'late'
    * — visible, never silently folded out of order (the
    * [[cusumMonitor]] contract).
    */
  def sprtMonitor(counts: Dataset[TrialCount],
      l1: Long = 287682L, l0: Long = -154151L,
      a6: Long = 2944438L, b6: Long = -2944439L): Dataset[SprtVerdict] = {
    val spark = counts.sparkSession
    import spark.implicits._
    counts.groupByKey(_.key)
      .flatMapGroupsWithState[SprtState, SprtVerdict](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: String, it: Iterator[TrialCount], state: GroupState[SprtState]) =>
          var st = state.getOption.getOrElse(SprtState(0L, ""))
          val out = it.toSeq.sortBy(_.bucket).map { tc =>
            if (tc.bucket <= st.lastBucket)
              SprtVerdict(key, tc.bucket, Long.MinValue, "late")
            else if (st.decided.nonEmpty) {
              st = st.copy(lastBucket = tc.bucket)
              SprtVerdict(key, tc.bucket, st.llr6, st.decided)
            } else {
              val llr = st.llr6 + tc.successes * l1 +
                (tc.trials - tc.successes) * l0
              val dec = if (llr >= a6) "accept_h1"
                else if (llr <= b6) "accept_h0" else "continue"
              st = SprtState(llr, if (dec == "continue") "" else dec,
                tc.bucket)
              SprtVerdict(key, tc.bucket, llr, dec)
            }
          }
          state.update(st)
          out.iterator
      }
  }

  final case class PhState(t: Long, cum: Long, m6: Long, minm6: Long,
      lastBucket: Long = Long.MinValue)
  final case class PhAlert(key: String, bucket: Long, exc6: Long,
      alarm: Boolean)

  /** Streaming Page–Hinkley monitor — the continuously-running face of
    * [[graft.operators.TemporalJoins.pageHinkley]] (q258), completing
    * the drift-monitor trio beside [[cusumMonitor]] (fixed baseline) and
    * [[sprtMonitor]] (sequential decision): Page–Hinkley needs NO
    * baseline — it tracks the excursion of the cumulative deviation
    * from the RUNNING mean, the right monitor when no stable history
    * exists yet. Per-key state is four BIGINTs (t, Σx, M₆, min M₆);
    * fed pre-bucketed (key, bucket, n) counts it folds the EXACT batch
    * recurrence — x̄₆ = cum·10⁶ div t, M₆ += n·10⁶ − x̄₆ − δ₆,
    * exc₆ = M₆ − min M₆ — so a series split across any trigger
    * boundaries produces bit-identically the batch excursions (the
    * cusumMonitor equivalence contract). Emits one row per folded
    * bucket with the post-bucket excursion and the alarm (exc₆ > λ₆);
    * the alarm is NOT sticky (Page–Hinkley is a monitor, not a
    * sequential decision — [[sprtMonitor]] owns stickiness). Late
    * buckets (at or before the last folded one) return flagged with
    * the impossible exc₆ = −1 sentinel, never silently refolded.
    */
  def pageHinkleyMonitor(counts: Dataset[BucketCount],
      delta6: Long = 0L, lambda6: Long = 50000000L): Dataset[PhAlert] = {
    val spark = counts.sparkSession
    import spark.implicits._
    counts.groupByKey(_.key)
      .flatMapGroupsWithState[PhState, PhAlert](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: String, it: Iterator[BucketCount], state: GroupState[PhState]) =>
          // minm6 starts at the SENTINEL MaxValue: the batch window min
          // includes the current row, so after the first bucket the min
          // IS m6 itself (exc = 0 at t = 1, exactly as the batch fold)
          var st = state.getOption.getOrElse(
            PhState(0L, 0L, 0L, Long.MaxValue))
          val out = it.toSeq.sortBy(_.bucket).map { bc =>
            if (bc.bucket <= st.lastBucket)
              PhAlert(key, bc.bucket, -1L, alarm = false)
            else {
              val t = st.t + 1
              val cum = st.cum + bc.n
              val xbar6 = cum * 1000000L / t
              val m6 = st.m6 + bc.n * 1000000L - xbar6 - delta6
              val minm6 = math.min(st.minm6, m6)
              st = PhState(t, cum, m6, minm6, bc.bucket)
              PhAlert(key, bc.bucket, m6 - minm6, (m6 - minm6) > lambda6)
            }
          }
          state.update(st)
          out.iterator
      }
  }

  final case class EwmaState(s6: Long, started: Boolean,
      lastBucket: Long = Long.MinValue)
  final case class EwmaPoint(key: String, bucket: Long, n: Long,
      ewma6: Long)

  /** Streaming dyadic EWMA — the continuously-running face of
    * [[graft.operators.TemporalJoins.ewmaTrend]] (q201), the LEVEL
    * tracker beside the detector monitors ([[cusumMonitor]] detects
    * shifts, [[pageHinkleyMonitor]] detects drift; this IS the smoothed
    * level dashboards plot): per-key one BIGINT of state folding the
    * exact q201 recurrence — s₁ = n₁·10⁶, sₜ = (nₜ·10⁶ + sₜ₋₁) div 2
    * (α = ½ dyadic halving, bit-identical in any engine) — so a series
    * split across any trigger boundaries emits exactly the batch
    * operator's ewma₆ per bucket (the spec asserts the equivalence
    * against [[graft.operators.TemporalJoins.ewmaTrend]] itself). Late
    * buckets return flagged with the impossible ewma₆ = −1 sentinel
    * (counts are nonnegative), never refolded.
    */
  def ewmaMonitor(counts: Dataset[BucketCount]): Dataset[EwmaPoint] = {
    val spark = counts.sparkSession
    import spark.implicits._
    counts.groupByKey(_.key)
      .flatMapGroupsWithState[EwmaState, EwmaPoint](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: String, it: Iterator[BucketCount], state: GroupState[EwmaState]) =>
          var st = state.getOption.getOrElse(EwmaState(0L, started = false))
          val out = it.toSeq.sortBy(_.bucket).map { bc =>
            if (bc.bucket <= st.lastBucket)
              EwmaPoint(key, bc.bucket, bc.n, -1L)
            else {
              val s6 = if (!st.started) bc.n * 1000000L
                else (bc.n * 1000000L + st.s6) / 2L
              st = EwmaState(s6, started = true, bc.bucket)
              EwmaPoint(key, bc.bucket, bc.n, s6)
            }
          }
          state.update(st)
          out.iterator
      }
  }

  final case class BtGame(key: String, epoch: Long, model_a: Long,
      model_b: Long, winner: Long)
  final case class BtCensus(lastEpoch: Long, pi: Seq[Long], pj: Seq[Long],
      pn: Seq[Long], wm: Seq[Long], wn: Seq[Long])
  final case class BtStanding(key: String, epoch: Long, rank: Long,
      model: Long, games: Long, wins: Long, strength6: Long)

  /** Streaming Bradley–Terry leaderboard — the continuously-running face
    * of [[graft.operators.EvalOps.bradleyTerry]] (q169): the CUMULATIVE
    * pair census (symmetric nᵢⱼ matrix + per-model win counts) carried
    * across micro-batches in keyed state, refit per epoch with the SAME
    * integer MM recurrence ([[graft.operators.EvalOps.btMmFit]] — the
    * exact code the batch operator runs), emitting the post-epoch
    * leaderboard: one (rank, model, games, wins, strength6) row per
    * model per folded epoch. A leaderboard that only ever refits from
    * scratch over all history re-reads the full game log every update;
    * this face reads each game once and keeps only the census.
    *
    * State is the m² pair counts + m win counts per key — LEADERBOARD-
    * sized (50 models ≈ 2.5k longs), independent of stream length. The
    * group's batch iterator is folded DIRECTLY into per-epoch census
    * increments (never buffered: census accumulation is order-free
    * within an epoch), so per-trigger heap is O(epochs·m²), not O(games).
    * The MM refit is O(iters·m²) per epoch, executor-side on the census.
    *
    * Epochs are CLOSED once folded (the [[cusumMonitor]] contract — the
    * emitted leaderboard for an epoch must never silently change): a
    * game arriving at or before the last folded epoch is not folded;
    * each late (epoch, key) group returns one flagged sentinel row
    * (rank = −1, model = −1, games = dropped-game count, strength6 =
    * Long.MinValue) so late data is visible to the sink. Deliver each
    * epoch wholly within one trigger (e.g. file-per-epoch landing, the
    * annIngest posture) for exact batch equivalence; a replayed epoch
    * is a no-op on the census — the replay comes back flagged instead
    * of double-counting (the spec pins exactly this).
    */
  def bradleyTerryMonitor(games: Dataset[BtGame], iters: Int = 10)
      : Dataset[BtStanding] = {
    val spark = games.sparkSession
    import spark.implicits._
    games.groupByKey(_.key)
      .flatMapGroupsWithState[BtCensus, BtStanding](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: String, it: Iterator[BtGame], state: GroupState[BtCensus]) =>
          val st = state.getOption.getOrElse(
            BtCensus(Long.MinValue, Nil, Nil, Nil, Nil, Nil))
          val pairs = scala.collection.mutable.LinkedHashMap(
            st.pi.lazyZip(st.pj).lazyZip(st.pn)
              .map((i, j, n) => (i, j) -> n).toSeq: _*)
          val wins = scala.collection.mutable.LinkedHashMap(
            st.wm.zip(st.wn): _*)
          // fold the iterator directly into per-epoch increments
          val epPairs = scala.collection.mutable.Map
            .empty[Long, scala.collection.mutable.Map[(Long, Long), Long]]
          val epWins = scala.collection.mutable.Map
            .empty[Long, scala.collection.mutable.Map[Long, Long]]
          val late = scala.collection.mutable.LinkedHashMap.empty[Long, Long]
          var lastEpoch = st.lastEpoch
          it.foreach { g =>
            if (g.epoch <= lastEpoch)
              late(g.epoch) = late.getOrElse(g.epoch, 0L) + 1L
            else {
              val p = epPairs.getOrElseUpdate(g.epoch,
                scala.collection.mutable.Map.empty)
              p((g.model_a, g.model_b)) =
                p.getOrElse((g.model_a, g.model_b), 0L) + 1L
              p((g.model_b, g.model_a)) =
                p.getOrElse((g.model_b, g.model_a), 0L) + 1L
              val w = epWins.getOrElseUpdate(g.epoch,
                scala.collection.mutable.Map.empty)
              w(g.winner) = w.getOrElse(g.winner, 0L) + 1L
            }
          }
          val out = scala.collection.mutable.ArrayBuffer.empty[BtStanding]
          epPairs.keys.toSeq.sorted.foreach { ep =>
            epPairs(ep).foreach { case (k, n) =>
              pairs(k) = pairs.getOrElse(k, 0L) + n
            }
            epWins(ep).foreach { case (mdl, w) =>
              wins(mdl) = wins.getOrElse(mdl, 0L) + w
            }
            lastEpoch = ep
            val edges = pairs.toSeq.map { case ((i, j), n) => (i, j, n) }
            out ++= graft.operators.EvalOps
              .btMmFit(edges, wins.toMap, iters)
              .map { case (r, mdl, g, w, s6) =>
                BtStanding(key, ep, r, mdl, g, w, s6)
              }
          }
          late.foreach { case (ep, n) =>
            out += BtStanding(key, ep, -1L, -1L, n, 0L, Long.MinValue)
          }
          val (pi, pj, pn) = pairs.toSeq
            .map { case ((i, j), n) => (i, j, n) }.unzip3
          state.update(BtCensus(lastEpoch, pi, pj, pn,
            wins.keys.toSeq, wins.values.toSeq))
          out.iterator
      }
  }
}
