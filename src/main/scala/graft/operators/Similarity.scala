package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** Similarity search over embedding columns (`Array[Float]`).
  *
  * Brute-force cosine top-k is the exact baseline (queries broadcast,
  * corpus streams, one ranking window). The LSH-bucketed variant is the
  * scale path: random-hyperplane signatures turn the all-pairs problem
  * into an equi-join on bucket ids, so a 100 TB corpus only compares
  * vectors that collide in a probed bucket.
  *
  * The cosine kernel is the native codegen'd
  * [[graft.functions.CosineSimilarity]] expression — one allocation-free
  * fused loop per pair (dot + both norms), vs the `zip_with`+`aggregate`
  * composition which leaves whole-stage codegen and allocates per pair.
  */
object Similarity {

  /** Embeddings as (vec_id, v: array<double>). */
  def asDouble(emb: DataFrame, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame =
    emb.select(col(idCol).as("vec_id"),
      transform(col(vecCol), x => x.cast("double")).as("v"))

  /** Embeddings with precomputed L2 norm (for norm-composable variants). */
  def withNorm(emb: DataFrame, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame =
    asDouble(emb, idCol, vecCol)
      .withColumn("norm", sqrt(aggregate(col("v"), lit(0.0), (a, x) => a + x * x)))

  /** Built-in-composed cosine (kept as the no-extensions fallback and for
    * plan comparison in tests; the hot paths use the native expression).
    */
  def cosine(a: Column, b: Column, normA: Column, normB: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x) /
      (normA * normB)

  /** Deterministic ±1 random-projection sketch (Achlioptas-style sign
    * projection): out[j] = Σᵢ v[i]·sign(h(i,j)) with a multiplicative
    * hash, shrinking embeddings to `outDim` dims while approximately
    * preserving distances (Johnson–Lindenstrauss) — the cheap prefilter
    * before exact cosine on the survivors, and a 48× storage cut at
    * out=16 over 768-dim floats. Stateless and partitioning-independent:
    * the "matrix" is a formula, never materialized or broadcast. Row-
    * local per vector (scales with splits). Round 12 promoted the HOF
    * composition (which left whole-stage codegen and allocated two
    * intermediate arrays per (row, dim)) to the native
    * [[graft.functions.SignProject]] expression — same kernel-promotion
    * path as jl_embed/cosine_sim; the spec pins bit-equality against
    * the retained HOF reference below.
    */
  def signProject(emb: DataFrame, outDim: Int = 16): DataFrame = {
    val e = asDouble(emb)
    e.withColumn("proj", graft.functions.GraftFunctions.signProject(
      emb.sparkSession, col("v"), outDim))
  }

  /** The pre-promotion HOF formulation of [[signProject]], kept ONLY as
    * the spec's bit-equality reference for the native kernel.
    */
  private[graft] def signProjectHof(emb: DataFrame, outDim: Int = 16)
      : DataFrame = {
    val e = asDouble(emb)
    // sign = popcount parity of a linear index mix — multiplicative-mod
    // parities are structurally correlated across j (measured r > 0.9 on
    // neighboring columns); popcount parity is balanced and uncorrelated
    // (0/120 column pairs above |r| = 0.4), and bit_count is exact-integer
    // replicable in the DuckDB oracle
    val signs = (j: Column) => transform(sequence(lit(1), size(col("v"))), i =>
      when(bit_count(i.cast("long") * 2654435761L + j * 2246822519L) % 2 === 0,
        lit(1.0)).otherwise(lit(-1.0)))
    val proj = transform(sequence(lit(0), lit(outDim - 1)), j =>
      aggregate(zip_with(col("v"), signs(j.cast("long")), (x, s) => x * s),
        lit(0.0), (a, x) => a + x))
    e.withColumn("proj", proj)
  }

  /** Exact top-k neighbors for each query vector (brute force). */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val spark = corpus.sparkSession
    val c = asDouble(corpus)
    val q = asDouble(queries).select(col("vec_id").as("q_id"), col("v").as("qv"))
    val scored = c.join(broadcast(q), col("vec_id") =!= col("q_id"))
      .withColumn("cos_sim",
        round(GraftFunctions.cosineSim(spark, col("qv"), col("v")), 4))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("cos_sim").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("vec_id").as("neighbor_id"),
        col("rank").cast("long").as("rank"), col("cos_sim"))
  }

  /** Hard-negative mining: for each query vector, the top-k most similar
    * corpus vectors carrying a DIFFERENT label — the contrastive-training
    * data-prep step (the best impostors make the best negatives).
    *
    * Two regimes, identical output (both are exact, so the dispatch is a
    * pure plan decision — results never depend on which path ran):
    *
    *   - queries fit the broadcast threshold → broadcast-queries/
    *     streaming-corpus non-equi join (same shape as [[bruteForceTopK]])
    *     with the label-mismatch predicate fused into the join so
    *     same-label rows never reach scoring;
    *   - queries BEYOND broadcast size → the broadcast non-equi join
    *     would degrade to a BroadcastNestedLoopJoin (or OOM the driver);
    *     instead the IVF candidate generator of [[ivfTopKExact]] runs in
    *     front of the exact rerank — every join is an equi-join on cell
    *     or q_id, and the triangle-inequality bound guarantees the
    *     candidate set contains every true top-k impostor (see
    *     [[hardNegativesIvf]] for the label-aware exactness argument).
    *
    * The regime test mirrors Spark's own broadcast decision: the query
    * plan's Catalyst size estimate vs `spark.sql.autoBroadcastJoinThreshold`
    * (override with `broadcastThresholdBytes` ≥ 0 to pin a path — 0 forces
    * the IVF path, Long.MaxValue forces broadcast).
    */
  def hardNegatives(corpus: DataFrame, queries: DataFrame, k: Int,
      nlist: Int = 16, nProbe: Int = 4,
      broadcastThresholdBytes: Long = -1L): DataFrame = {
    val spark = corpus.sparkSession
    // sessionState.conf pre-parses the threshold (JavaUtils.byteStringAsBytes
    // rejects the standard "-1" = broadcast-disabled setting with a
    // NumberFormatException; Spark's own conf layer handles the sign)
    val thresh: BigInt =
      if (broadcastThresholdBytes >= 0) BigInt(broadcastThresholdBytes)
      else BigInt(spark.sessionState.conf.autoBroadcastJoinThreshold)
    val qBytes = queries.queryExecution.optimizedPlan.stats.sizeInBytes
    if (thresh > 0 && qBytes <= thresh)
      hardNegativesBroadcast(corpus, queries, k)
    else hardNegativesIvf(corpus, queries, k, nlist, nProbe)
  }

  /** Small-query regime: broadcast non-equi join (docs on [[hardNegatives]]). */
  private def hardNegativesBroadcast(corpus: DataFrame, queries: DataFrame,
      k: Int): DataFrame = {
    val spark = corpus.sparkSession
    val c = prepLabeled(corpus)
    val q = prepLabeled(queries).select(col("vec_id").as("q_id"),
      col("label").as("q_label"), col("v").as("qv"))
    val scored = c.join(broadcast(q),
        col("vec_id") =!= col("q_id") && col("label") =!= col("q_label"))
      .withColumn("cos_sim",
        round(GraftFunctions.cosineSim(spark, col("qv"), col("v")), 4))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("cos_sim").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("q_label"), col("vec_id").as("neighbor_id"),
        col("label").as("neg_label"), col("rank").cast("long").as("rank"),
        col("cos_sim"))
  }

  /** (vec_id, label, v: array<double>) projection shared by both regimes. */
  private def prepLabeled(e: DataFrame): DataFrame =
    e.select(col("vec_id"), col("label"),
      transform(col("embedding"), x => x.cast("double")).as("v"))

  /** Large-query regime: [[ivfTopKExact]]'s two-phase candidate generator
    * with the label-mismatch predicate kept inside BOTH candidate joins,
    * so same-label rows never reach scoring in either phase.
    *
    * Label-aware exactness argument (extends the [[ivfTopKExact]] proof):
    * phase 1 ranks the DIFFERENT-label members of each query's `nProbe`
    * nearest cells; its kth-best score is a floor ≤ the true kth-best
    * impostor score (a subset's kth best never exceeds the full set's).
    * Any true top-k impostor x in cell c satisfies, by the spherical
    * triangle inequality, bound(c) = cos(max(0, θ(q,c) − radius(c))) ≥
    * cos(q,x) ≥ true-kth ≥ floor, so phase 2 re-probes c and scores x.
    * The final ranking therefore sees every true top-k impostor and
    * equals the broadcast path bit-for-bit (same 4dp rounding, same
    * vec_id tie-break). Fewer than k impostors in the probed cells →
    * floor −2.0 → every cell probed (graceful brute-force degradation,
    * never a wrong answer). Assumes nonzero vector norms, which
    * [[trainCentroids]] already requires of its sample.
    *
    * Shape at scale: centroids ride the plan as literals (assignment and
    * query-probing are row-local argmax — no join at all), and the only
    * joins are equi-joins on `cell` (corpus × candidate cells, the IVF
    * cost model: work ∝ probed-cell sizes) and on `q_id` (re-attaching
    * query vectors; an equi shuffle join that Spark may freely hash-join
    * — never a nested loop). No BroadcastNestedLoopJoin anywhere in the
    * plan regardless of query-set size (asserted by HardNegativesSpec).
    */
  private[graft] def hardNegativesIvf(corpus: DataFrame, queries: DataFrame,
      k: Int, nlist: Int = 16, nProbe: Int = 4, iters: Int = 3): DataFrame = {
    val centArr = trainCentroids(corpus, nlist, iters)
    // unit centroids => cos(v, c) = dot(v, c) / |v|
    val vnormOf = (v: Column) =>
      sqrt(aggregate(v, lit(0.0), (a, x) => a + x * x))
    def simsTo(v: Column, n: Column): Column =
      array(centArr.map { case (_, cv) =>
        aggregate(zip_with(v, typedLit(cv.toSeq), (x, c) => x * c),
          lit(0.0), (a, x) => a + x) / n
      }: _*)

    // cell assignment: row-local argmax over the literal centroid array;
    // array_position takes the FIRST maximal entry = lowest cent_id
    // tie-break, matching ivfTopKExact's strict-> scan. Deliberately NOT
    // cached: the plan consumes it three times (cell radii, phase 1,
    // phase 2), but pinning the full corpus WITH its vectors is exactly
    // what a 100 TB run cannot do, while re-running a row-local argmax
    // scan is bandwidth-bound and cheap — recompute-over-cache is the
    // at-scale shape, and it leaves no session-lifetime storage pin.
    val assigned = prepLabeled(corpus)
      .withColumn("sims", simsTo(col("v"), vnormOf(col("v"))))
      .withColumn("cell",
        (array_position(col("sims"), array_max(col("sims"))) - 1).cast("int"))
      .withColumn("csim", array_max(col("sims")))
      .select(col("vec_id"), col("label"), col("v"), col("cell"), col("csim"))

    val q = prepLabeled(queries).select(col("vec_id").as("q_id"),
      col("label").as("q_label"), col("v").as("qv"))
    // query→cell sims via posexplode of the literal argmax array — no join
    val qcell = q.select(col("q_id"),
      posexplode(simsTo(col("qv"), vnormOf(col("qv")))).as(Seq("cell", "qsim")))

    // queries beyond broadcast size: q joins stay shuffle equi-joins
    ivfExactRank(assigned, q, qcell, k, nProbe,
      col("vec_id") =!= col("q_id") && col("label") =!= col("q_label"),
      broadcastQueries = false)
      .select(col("q_id"), col("q_label"), col("vec_id").as("neighbor_id"),
        col("label").as("neg_label"), col("rank").cast("long").as("rank"),
        col("cos_sim"))
  }

  // ---- shared IVF exact-rerank skeleton ----
  //
  // The exactness-critical constants live HERE, once: a tweak to any of
  // them (say a wider fp slack) changes both "exact" paths together, so
  // ivfTopKExact and hardNegativesIvf can never silently diverge from
  // each other — both carry a bit-for-bit-equals-brute-force contract.

  /** Angular slack added to each cell radius: absorbs fp error in the
    * assignment-side cosine so a member sitting exactly on the radius
    * still passes the phase-2 bound.
    */
  private val RadiusSlackRad = 1e-3

  /** Score slack subtracted from the phase-1 floor in the phase-2 bound
    * comparison: absorbs the 4dp output rounding of `cos_sim`.
    */
  private val FloorSlack = 1e-4

  /** Floor when a query found fewer than k candidates in its probed
    * cells: below any cosine, so EVERY cell passes the bound and the
    * path degrades gracefully to brute force — never a wrong answer.
    */
  private val NoFloor = -2.0

  /** Exactness-preserving candidate generation + rerank shared by
    * [[ivfTopKExact]] and [[hardNegativesIvf]] (the callers differ only
    * in cell-assignment form, query prep, pair predicate, and whether
    * the query side is broadcastable):
    *
    *   1. rank `pairFilter`-eligible members of each query's `nProbe`
    *      nearest cells; the kth best score is a floor `s_q` on the true
    *      kth score;
    *   2. by the spherical triangle inequality, a cell with centroid
    *      angle θ(q,c) and angular radius r (max member↔centroid angle)
    *      can hold a candidate only if cos(max(0, θ−r)) ≥ s_q — rerank
    *      the members of every cell passing that bound.
    *
    * Inputs: `assigned` = (vec_id, v, cell, csim, passthrough…) with
    * csim the UNROUNDED member↔own-centroid cosine; `q` = (q_id, qv,
    * passthrough…); `qcell` = (q_id, cell, qsim) with qsim the unrounded
    * query↔centroid cosine for EVERY cell. Returns the ranked pairs
    * (all of assigned's and q's columns plus cos_sim, rank ≤ k) with the
    * 4dp rounding and (cos_sim desc, vec_id) tie-break both exact paths
    * share.
    */
  private[graft] def ivfExactRank(assigned: DataFrame, q: DataFrame,
      qcell: DataFrame, k: Int, nProbe: Int, pairFilter: Column,
      broadcastQueries: Boolean): DataFrame = {
    val spark = assigned.sparkSession
    val qj = if (broadcastQueries) broadcast(q) else q
    val candCells = ivfCandidateCells(assigned, q, qcell, k, nProbe,
      pairFilter, broadcastQueries)
    val wRank = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("cos_sim").desc, col("vec_id"))
    val scored = assigned.join(candCells, Seq("cell"))
      .join(qj, Seq("q_id"))
      .filter(pairFilter)
      .withColumn("cos_sim",
        round(GraftFunctions.cosineSim(spark, col("qv"), col("v")), 4))
    scored.withColumn("rank", row_number().over(wRank))
      .filter(col("rank") <= k)
  }

  /** The exactness-proven (query, cell) candidate set [[ivfExactRank]]
    * scores — extracted (pure code motion) so [[VectorIndex]] can
    * MEASURE pruning power (scored fraction of the corpus) with the
    * exact production bound rather than a diverging replica.
    */
  private[graft] def ivfCandidateCells(assigned: DataFrame, q: DataFrame,
      qcell: DataFrame, k: Int, nProbe: Int, pairFilter: Column,
      broadcastQueries: Boolean): DataFrame = {
    val spark = assigned.sparkSession
    val qj = if (broadcastQueries) broadcast(q) else q

    // per-cell angular radius, slack for fp + the 4dp output rounding
    val cellStats = assigned.groupBy(col("cell"))
      .agg(min(col("csim")).as("minc"))
      .select(col("cell"),
        (acos(greatest(least(col("minc"), lit(1.0)), lit(-1.0)))
          + lit(RadiusSlackRad)).as("rang"))

    // phase 1: kth-best eligible score within the nProbe nearest cells
    val wProbe = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("qsim").desc, col("cell"))
    val probes = qcell.withColumn("prn", row_number().over(wProbe))
      .filter(col("prn") <= nProbe).select(col("q_id"), col("cell"))
    val wRank = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("cos_sim").desc, col("vec_id"))
    val phase1 = assigned.join(probes, Seq("cell"))
      .join(qj, Seq("q_id"))
      .filter(pairFilter)
      .withColumn("cos_sim",
        round(GraftFunctions.cosineSim(spark, col("qv"), col("v")), 4))
      .withColumn("rank", row_number().over(wRank))
    val floor = phase1.groupBy(col("q_id"))
      .agg(max(when(col("rank") === k, col("cos_sim"))).as("kth"))
      .select(col("q_id"), coalesce(col("kth"), lit(NoFloor)).as("floor"))
    val floorJ = if (broadcastQueries) broadcast(floor) else floor

    // phase 2: every cell whose angular bound can beat the floor
    qcell.join(broadcast(cellStats), Seq("cell"))
      .join(floorJ, Seq("q_id"), "left")
      .withColumn("theta", acos(greatest(least(col("qsim"), lit(1.0)), lit(-1.0))))
      .withColumn("bound", cos(greatest(col("theta") - col("rang"), lit(0.0))))
      .filter(col("bound") >= coalesce(col("floor"), lit(NoFloor)) - lit(FloorSlack))
      .select(col("q_id"), col("cell"))
  }

  /** Deterministic pseudo-random hyperplanes: element (i,j) is ±1 from a
    * splitmix-style integer mix — reproducible across runs and engines,
    * no RNG state.
    */
  private def planeSign(plane: Int, dim: Int): Double = {
    var z = (plane.toLong * 1024 + dim) + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    if (((z ^ (z >>> 31)) & 1L) == 0L) 1.0 else -1.0
  }

  /** The hyperplane sign matrix, exposed so correctness oracles can
    * replicate bucket assignment exactly (the signs are pure integer
    * mixing — engine-independent constants).
    */
  def planes(nBits: Int, dim: Int = 64): Seq[Seq[Double]] =
    (0 until nBits).map(p => (0 until dim).map(j => planeSign(p, j)))

  /** Random-hyperplane LSH bucket id (nBits-bit signature) per vector. */
  def withLshBucket(e: DataFrame, nBits: Int = 12, dim: Int = 64): DataFrame = {
    val bucket = (0 until nBits).map { p =>
      val plane = array((0 until dim).map(j => lit(planeSign(p, j))): _*)
      val dot = aggregate(zip_with(col("v"), plane, (x, r) => x * r),
        lit(0.0), (a, x) => a + x)
      when(dot > 0, lit(1L << p)).otherwise(0L)
    }.reduce(_ + _)
    e.withColumn("bucket", bucket)
  }

  /** Approximate top-k with multi-probe: candidates come from the query's
    * own LSH bucket plus every bucket at Hamming distance 1 (flip each
    * signature bit) — the standard multi-probe trick that buys recall
    * without growing buckets. Still an equi-join on bucket id: work stays
    * proportional to probed-bucket sizes, never all-pairs, and at 100 TB
    * the bucket id doubles as the repartition key so each probe is a
    * co-located lookup. Recall/cost dial: nBits down or probe radius up.
    */
  /** IVF (inverted-file) ANN: the corpus is partitioned into `nlist`
    * coarse cells — centroids here are the `nlist` lowest-id corpus
    * vectors, a deterministic stand-in for trained k-means centroids (the
    * index mechanics — cell assignment, probing, in-cell exact ranking —
    * are identical; a trainer would only move the centroid positions).
    * Every corpus vector is assigned to its nearest centroid via a
    * broadcast of the (tiny) centroid set; a query probes its `nProbe`
    * nearest cells and ranks ONLY those cells' members exactly.
    *
    * Scale path: the assignment is one broadcast-join pass over the
    * corpus, the cell id becomes the partition key, and query cost is
    * proportional to probed-cell sizes — never the full corpus. Sims are
    * rounded to 4dp BEFORE the argmin/ranking windows with id tie-breaks,
    * making cell assignment and results deterministic across engines.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int, nlist: Int = 16,
      nProbe: Int = 4): DataFrame = {
    val spark = corpus.sparkSession
    val c = asDouble(corpus)
    val cents = asDouble(corpus).filter(col("vec_id") < nlist)
      .select(col("vec_id").as("cent_id"), col("v").as("cv"))
    val wAssign = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id")).orderBy(col("csim").desc, col("cent_id"))
    val assigned = c.crossJoin(broadcast(cents))
      .withColumn("csim", round(GraftFunctions.cosineSim(spark, col("v"), col("cv")), 4))
      .withColumn("arn", row_number().over(wAssign))
      .filter(col("arn") === 1)
      .select(col("vec_id"), col("v"), col("cent_id").as("cell"))
    val wProbe = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("qsim").desc, col("cent_id"))
    val qprobes = asDouble(queries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
      .crossJoin(broadcast(cents))
      .withColumn("qsim", round(GraftFunctions.cosineSim(spark, col("qv"), col("cv")), 4))
      .withColumn("prn", row_number().over(wProbe))
      .filter(col("prn") <= nProbe)
      .select(col("q_id"), col("qv"), col("cent_id").as("cell"))
    val scored = assigned.join(qprobes, Seq("cell"))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("cos_sim", round(GraftFunctions.cosineSim(spark, col("qv"), col("v")), 4))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("cos_sim").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("vec_id").as("neighbor_id"),
        col("rank").cast("long").as("rank"), col("cos_sim"))
  }

  /** Deterministic Lloyd-trained IVF centroids on a BOUNDED sample.
    *
    * One distributed top-N pass draws `nlist`×64 unit-normalized vectors
    * in deterministic hash order (the Faiss recipe — IVF coarse quantizers
    * train on a fixed-size sample, not the corpus), then Lloyd runs
    * locally over that ≤512 KB sample: init = the sample's `nlist`
    * lowest-id vectors, `iters` rounds of argmax-dot assignment + mean +
    * renormalize. Training cost is therefore ~constant in corpus size —
    * one scan, zero per-iteration jobs — and the result is broadcast to
    * the (distributed) assignment pass. Centroid quality only affects how
    * much `ivfTopKExact`'s phase-2 bound prunes — never which rows it
    * returns. Returns unit-norm centroid rows (cent_id, cv).
    */
  private[graft] def trainCentroids(corpus: DataFrame, nlist: Int,
      iters: Int = 3): Array[(Int, Array[Double])] = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val sample: Array[(Long, Array[Double])] = asDouble(corpus)
      .withColumn("n", sqrt(aggregate(col("v"), lit(0.0), (a, x) => a + x * x)))
      .filter(col("n") > 0)
      .select(col("vec_id"), transform(col("v"), x => x / col("n")).as("u"))
      .orderBy(xxhash64(col("vec_id")), col("vec_id"))
      .limit(nlist * 64)
      .as[(Long, Array[Double])].collect()
    require(sample.nonEmpty, "cannot train centroids on an empty corpus")

    var cents: Array[Array[Double]] =
      sample.sortBy(_._1).take(nlist).map(_._2.clone())
    val dim = cents(0).length
    var it = 0
    while (it < iters) {
      val sums = Array.fill(cents.length)(new Array[Double](dim))
      val counts = new Array[Long](cents.length)
      sample.foreach { case (_, u) =>
        var best = 0; var bestDot = Double.NegativeInfinity; var c = 0
        while (c < cents.length) {
          val cv = cents(c); var dot = 0.0; var i = 0
          while (i < u.length) { dot += u(i) * cv(i); i += 1 }
          if (dot > bestDot) { bestDot = dot; best = c }
          c += 1
        }
        var i = 0
        while (i < dim) { sums(best)(i) += u(i); i += 1 }
        counts(best) += 1
      }
      val next = cents.map(_.clone()) // empty cells keep their centroid
      next.indices.foreach { c =>
        if (counts(c) > 0) {
          var i = 0
          while (i < dim) { next(c)(i) = sums(c)(i) / counts(c); i += 1 }
        }
        val n = math.sqrt(next(c).map(x => x * x).sum)
        if (n > 0) next(c).indices.foreach(i => next(c)(i) /= n)
      }
      cents = next
      it += 1
    }
    cents.zipWithIndex.map { case (v, i) => (i, v) }
  }

  /** IVF with trained centroids AND an exactness guarantee — the scale
    * path that still hash-matches brute force. Two probe phases:
    *
    *   1. rank the members of each query's `nProbe` nearest cells; the
    *      kth best score there is a floor `s_q` on the true kth score;
    *   2. by the spherical triangle inequality, a cell with centroid
    *      angle θ(q,c) and angular radius r (max member↔centroid angle)
    *      can hold a candidate only if cos(max(0, θ−r)) ≥ s_q — rank the
    *      members of every cell passing that bound.
    *
    * Phase-2's candidate set provably contains every true top-k member,
    * so the result equals `bruteForceTopK` exactly (same 4dp rounding,
    * same id tie-break) while scoring only the probed fraction of the
    * corpus. Worst case (tiny corpus, flat geometry) probes everything
    * and degrades to brute force — never below it. Training is Lloyd on
    * unit vectors with deterministic init (no RNG), so plans and results
    * are reproducible across runs and engines.
    */
  /** Cell assignment = per-row argmax over the broadcast centroid set —
    * ONE narrow pass, no shuffle. (A crossJoin + row_number formulation
    * blows the corpus up nlist× and shuffle-sorts it per query; at 100 TB
    * that's the difference between a scan and a 16×-corpus exchange.)
    * Ties keep the lowest cent_id, matching the window tie-break the
    * approximate ivfTopK uses. Assignment is on UNROUNDED similarity; it
    * doubles as the radius input, so the geometry stays consistent.
    * Shared by [[ivfTopKExact]] and [[VectorIndex]] (the persistent,
    * incrementally-maintained variant) so assignment can never drift.
    * Input `c` must be (vec_id, v: array<double>); returns
    * (vec_id, v, cell, csim), NOT cached — callers decide.
    */
  private[graft] def assignCells(c: DataFrame,
      centArr: Array[(Int, Array[Double])]): DataFrame = {
    val spark = c.sparkSession
    import spark.implicits._
    val bcCents = spark.sparkContext.broadcast(centArr.map(_._2))
    c.as[(Long, Array[Double])].mapPartitions { it =>
      val cs = bcCents.value
      val cNorms = cs.map { cv =>
        var s = 0.0; var i = 0
        while (i < cv.length) { s += cv(i) * cv(i); i += 1 }
        math.sqrt(s)
      }
      it.map { case (id, v) =>
        var nv = 0.0; var i = 0
        while (i < v.length) { nv += v(i) * v(i); i += 1 }
        val vn = math.sqrt(nv)
        var best = 0; var bestSim = Double.NegativeInfinity; var ci = 0
        while (ci < cs.length) {
          val cv = cs(ci); var dot = 0.0; var j = 0
          while (j < v.length) { dot += v(j) * cv(j); j += 1 }
          val sim = dot / (vn * cNorms(ci))
          if (sim > bestSim) { bestSim = sim; best = ci }
          ci += 1
        }
        (id, v, best, bestSim)
      }
    }.toDF("vec_id", "v", "cell", "csim")
  }

  def ivfTopKExact(corpus: DataFrame, queries: DataFrame, k: Int,
      nlist: Int = 16, nProbe: Int = 4, iters: Int = 3): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val centArr = trainCentroids(corpus, nlist, iters)
    val cents = centArr.toSeq.toDF("cent_id", "cv")
    val c = asDouble(corpus)

    val assigned = assignCells(c, centArr).cache()

    val q = asDouble(queries).select(col("vec_id").as("q_id"), col("v").as("qv"))
    val qcell = q.crossJoin(broadcast(cents))
      .withColumn("qsim", GraftFunctions.cosineSim(spark, col("qv"), col("cv")))
      .select(col("q_id"), col("cent_id").as("cell"), col("qsim"))

    // query batches are broadcast-sized here; the beyond-broadcast regime
    // is hardNegativesIvf's shuffle-equi-join parameterization
    ivfExactRank(assigned, q, qcell, k, nProbe,
      col("vec_id") =!= col("q_id"), broadcastQueries = true)
      .select(col("q_id"), col("vec_id").as("neighbor_id"),
        col("rank").cast("long").as("rank"), col("cos_sim"))
  }

  /** Symmetric int8 quantization per embedding — the training-pipeline
    * storage-shrink step (4× smaller than f32): scale = max|x|/127, codes
    * = floor(x/scale + 0.5) (explicit half-up on IEEE doubles — identical
    * in any engine, no decimal/banker's-rounding divergence), plus the
    * reconstruction MSE so a pipeline can gate on quantization loss.
    * Row-local arithmetic only: embarrassingly parallel at any scale.
    */
  def quantizeInt8(emb: DataFrame): DataFrame = {
    val e = asDouble(emb)
    val maxabs = aggregate(col("v"), lit(0.0), (a, x) => greatest(a, abs(x)))
    e.withColumn("scale", maxabs / 127)
      .filter(col("scale") > 0)
      .withColumn("codes",
        transform(col("v"), x => floor(x / col("scale") + 0.5).cast("long")))
      .withColumn("code_sum",
        aggregate(col("codes"), lit(0L), (a, x) => a + x))
      .withColumn("mse",
        aggregate(zip_with(col("v"), col("codes"),
            (x, c) => (x - c * col("scale")) * (x - c * col("scale"))),
          lit(0.0), (a, x) => a + x) / size(col("v")))
      .select(col("vec_id"), round(col("scale"), 6).as("scale_r"),
        col("code_sum"), round(col("mse"), 6).as("mse_r"))
  }

  /** Per-label centroid outliers — the embedding-space label-QC pass: for
    * every label, the `k` member vectors LEAST cosine-similar to their
    * label's mean vector (suspected mislabels / noise a pipeline routes
    * to review or drops). Returns (label, vec_id, rank, cos_c) with rank 1
    * = most anomalous.
    *
    * Shape at scale: the centroid is a per-(label, dim) average —
    * posexplode fans each vector to dim rows ONCE, one shuffle keyed by
    * (label, dim), then dim-sized arrays fold back per label; the result
    * is |labels| rows, broadcast back for the scoring pass (row-local
    * cosine + one label-keyed ranking window). Nothing ever pairs
    * vectors with each other.
    */
  def labelOutliers(emb: DataFrame, k: Int = 5, labelCol: String = "label"): DataFrame = {
    val spark = emb.sparkSession
    val e = emb.select(col("vec_id"), col(labelCol).as("label"),
      transform(col("embedding"), x => x.cast("double")).as("v"))
    val cent = e.select(col("label"), posexplode(col("v")).as(Seq("i", "x")))
      .groupBy(col("label"), col("i")).agg(avg(col("x")).as("m"))
      .groupBy(col("label"))
      .agg(transform(array_sort(collect_list(struct(col("i"), col("m")))),
        p => p.getField("m")).as("cv"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("label")).orderBy(col("cos_c"), col("vec_id"))
    e.join(broadcast(cent), Seq("label"))
      .withColumn("cos_c", round(GraftFunctions.cosineSim(spark, col("v"), col("cv")), 4))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("label").cast("long").as("label"), col("vec_id"),
        col("rank").cast("long").as("rank"), col("cos_c"))
  }

  /** Full-corpus distributed k-means clustering (Lloyd) — corpus
    * organization for cluster-balanced curation (SemDeDup-style pruning,
    * density-aware mixing), not an ANN accelerator like the
    * sample-bounded [[trainCentroids]]. Every iteration touches the
    * whole corpus, which IS the at-scale recipe:
    *
    *   - assignment is ONE narrow pass — the k×d centroid matrix rides
    *     the plan as literals (k·d ≈ KBs), each row computes its argmin
    *     locally, nothing shuffles;
    *   - the update is posexplode to (cluster, dim) keys, where map-side
    *     partial aggregation collapses each partition to ≤ k·d partial
    *     sums before the ONE equi-shuffle — shuffle volume is
    *     O(partitions·k·d), independent of row count;
    *   - the k×d means come back to the driver (tiny), empty cells keep
    *     their previous centroid.
    *
    * Fully deterministic and oracle-replicable: init is the `k` vectors
    * with the lowest md5(vec_id) (an engine-neutral deterministic
    * shuffle), distances are squared L2 over double-cast values, and
    * argmin ties break toward the lowest cluster id (array_position
    * returns the FIRST minimal entry).
    */
  private def distTo(cv: Array[Double]): Column =
    aggregate(zip_with(col("v"), typedLit(cv.toSeq), (a, b) => (a - b) * (a - b)),
      lit(0.0), (acc, x) => acc + x)

  private def argminCents(cents: Array[Array[Double]]): Column = {
    val dists = array(cents.map(distTo): _*)
    (array_position(dists, array_min(dists)) - 1).cast("long")
  }

  /** Lloyd training shared by [[kmeansClusters]] and
    * [[silhouetteSimplified]]: deterministic md5-order seeds, `iters`
    * assign/recenter rounds, centroids collected per round (bounded by
    * k — the documented collect pattern).
    */
  private def lloydCentroids(e: DataFrame, k: Int,
      iters: Int): Array[Array[Double]] = {
    var cents: Array[Array[Double]] = e
      .orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
      .limit(k)
      .collect().map(_.getSeq[Double](1).toArray)
    require(cents.length == k, s"corpus smaller than k=$k")
    var it = 0
    while (it < iters) {
      val upd = e.withColumn("cluster", argminCents(cents))
        .select(col("cluster"), posexplode(col("v")).as(Seq("i", "x")))
        .groupBy(col("cluster"), col("i")).agg(avg(col("x")).as("m"))
        .groupBy(col("cluster"))
        .agg(transform(array_sort(collect_list(struct(col("i"), col("m")))),
          p => p.getField("m")).as("cv"))
        .collect().map(r => r.getLong(0).toInt -> r.getSeq[Double](1).toArray)
        .toMap
      cents = cents.indices.map(c => upd.getOrElse(c, cents(c))).toArray
      it += 1
    }
    cents
  }

  def kmeansClusters(emb: DataFrame, k: Int = 8, iters: Int = 3): DataFrame = {
    val e = asDouble(emb)
    e.select(col("vec_id"), argminCents(lloydCentroids(e, k, iters)).as("cluster"))
  }

  /** Simplified silhouette sweep over candidate k (q249) — the
    * k-selection read behind every [[kmeansClusters]]/IVF-nlist choice:
    * per vector, a = distance to its OWN centroid and b = distance to
    * the nearest OTHER centroid, s = (b − a)/max(a, b) (Hruschka et
    * al.'s simplified silhouette — the classic silhouette's all-pairs
    * within-cluster distances can never run at corpus scale; the
    * centroid surrogate is row-local against k broadcast literals).
    * Higher mean s = tighter, better-separated clustering; sweep the
    * candidate list and pick the max.
    *
    * Per-row s quantizes to floored millionths BEFORE aggregation (the
    * dimEnergy discipline) and the mean is one integer division, so the
    * report replays exactly in the oracle (distance folds are
    * fixed-order IEEE sums — the q89 Lloyd-replay precedent).
    * Degenerate a = b = 0 (a vector ON a duplicated centroid) reports
    * s = 0. Cost: |ks| trainings + one row-local pass each; the report
    * is |ks| rows.
    *
    * Scan discipline: the double-cast projection is materialized ONCE
    * (eager localCheckpoint) and shared by every training iteration and
    * scoring pass across the whole k sweep — |ks|·(iters+2) passes read
    * the checkpointed blocks instead of re-scanning the source and
    * re-deriving the cast each time (at 100 TB that is the difference
    * between one corpus read and ~a dozen). The |ks|-row report is
    * itself eagerly checkpointed so the big intermediate can be
    * released before returning (the trainBpe release pattern —
    * localCheckpoint blocks are not cacheManager-visible, so the RDD
    * ids are diffed and unpersisted directly).
    */
  def silhouetteSimplified(emb: DataFrame, ks: Seq[Int] = Seq(2, 4, 8),
      iters: Int = 3): DataFrame = {
    require(ks.nonEmpty && ks.forall(_ >= 2), "silhouette needs k >= 2")
    val sc = emb.sparkSession.sparkContext
    val before = sc.getPersistentRDDs.keySet.toSet
    val e = asDouble(emb).localCheckpoint(eager = true)
    val eIds = sc.getPersistentRDDs.keySet.toSet -- before
    try {
      // round-13 (guide §2.6): the |ks| trainings are independent and the
      // source is already checkpointed, so they run as OVERLAPPED driver
      // threads instead of |ks| serialized Lloyd loops — each training is
      // still deterministic on its own, so the report is unchanged; the
      // wall time drops from the sum of the sweeps to roughly the slowest
      // one (locally ~2×; on a cluster the later sweeps back-fill the
      // earlier ones' straggler tails)
      val pool = java.util.concurrent.Executors.newFixedThreadPool(ks.length)
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.fromExecutorService(pool)
      val perK = ks.map { k =>
        scala.concurrent.Future {
          val cents = lloydCentroids(e, k, iters)
          val dists = array_sort(array(cents.map(distTo): _*))
          val a = sqrt(element_at(dists, 1))
          val b = sqrt(element_at(dists, 2))
          val s6 = when(greatest(a, b) > 0,
            floor((b - a) / greatest(a, b) * 1000000d)).otherwise(0L)
          e.select(s6.as("s6"))
            .agg(count(lit(1)).as("n_vecs"), sum(col("s6")).as("ssum"))
            .select(lit(k.toLong).as("k"), col("n_vecs"),
              (expr("ssum div n_vecs").cast("double") / 1e6).as("silhouette"))
        }
      }
      val rows =
        try perK.map(f => scala.concurrent.Await.result(
          f, scala.concurrent.duration.Duration.Inf))
        finally pool.shutdown()
      rows.reduce(_ unionByName _).localCheckpoint(eager = true)
    } finally {
      eIds.foreach(id =>
        sc.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = false)))
    }
  }

  /** Cluster-balanced sampling: a deterministic fixed-size sample per
    * [[kmeansClusters]] cell. The diversity-preserving subsampling step
    * (SemDeDup/D4 pipelines): a uniform corpus sample reproduces the
    * corpus's mode collapse — dominant clusters dominate the sample —
    * while `perCluster` rows from EVERY cell keeps rare modes (rare
    * languages, rare formats, tail topics) represented in the curated
    * set. Within a cell the pick order is the md5 hash of the id — an
    * unbiased, seed-free shuffle every engine replays ([[CorpusOps
    * .fixedSample]]'s rule, here keyed by learned cluster rather than a
    * categorical column).
    *
    * Shape at scale: assignment inherits [[kmeansClusters]]'s narrow
    * broadcast-literal argmin (no shuffle); the sample is one
    * `row_number ≤ perCluster` window on (cluster, md5) — planned as
    * WindowGroupLimit, so each partition retains at most `perCluster`
    * rows per cluster before any exchange and per-partition state is
    * bounded. k cells × perCluster rows out, whatever the corpus size.
    */
  def clusterSample(emb: DataFrame, perCluster: Int, k: Int = 8,
      iters: Int = 3): DataFrame = {
    val assigned = kmeansClusters(emb, k, iters)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cluster"))
      .orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
    assigned.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= perCluster)
      .select(col("vec_id"), col("cluster"),
        col("rn").cast("long").as("cluster_rank"))
  }

  /** Dimension-energy curve (Matryoshka truncation diagnostic, Kusupati
    * et al. 2022): for each cutoff k, the corpus-average fraction of a
    * vector's squared L2 norm contained in its FIRST k dimensions. MRL-
    * trained embeddings front-load information — avg energy near 1 at
    * small k means the corpus can be stored/searched at k dims (8× less
    * ANN memory at k=8 on d=64) with little recall loss; a flat curve
    * says truncation would destroy geometry. Read this before choosing
    * the [[signProject]]/[[pqTopK]] compression operating point.
    *
    * Exactness: the per-vector fraction is quantized to 1e-6 BEFORE
    * aggregation and averaged with integer floor-division, so the
    * output is engine-portable integer arithmetic (no float-summation
    * order anywhere). Row-local per (vector, cutoff) — one narrow pass,
    * no shuffle beyond the |cutoffs|-row rollup.
    */
  def dimEnergy(emb: DataFrame,
      cutoffs: Seq[Int] = Seq(4, 8, 16, 32, 64)): DataFrame = {
    val e = asDouble(emb)
    val tot = aggregate(col("v"), lit(0.0), (a, x) => a + x * x)
    val head = aggregate(slice(col("v"), lit(1), col("cutoff")),
      lit(0.0), (a, x) => a + x * x)
    e.select(col("v"), explode(typedLit(cutoffs)).as("cutoff"))
      .withColumn("q6", floor(
        when(tot === 0.0, lit(0.0)).otherwise(head / tot) * 1000000L)
        .cast("long"))
      .groupBy(col("cutoff"))
      .agg(count(lit(1)).cast("long").as("n_vecs"), sum(col("q6")).as("sq"))
      .withColumn("avg_energy",
        expr("sq div n_vecs").cast("double") / 1e6)
      .select(col("cutoff"), col("n_vecs"), col("avg_energy"))
  }

  /** Contrastive TRIPLET mining: for each query vector, its hardest
    * positive (nearest SAME-label neighbor, self excluded) and hardest
    * negative (nearest DIFFERENT-label — [[hardNegatives]]' top-1), plus
    * the margin between them. The triplet-loss data-prep step: margin ≤ 0
    * rows are the active triplets (the impostor currently beats the
    * positive — exactly the pairs a metric-learning pass should see),
    * and the margin distribution is the standard embedding-quality
    * audit before committing a corpus to contrastive training.
    *
    * One broadcast-queries pass scores both sides: the corpus streams
    * once, each (query, row) pair lands in the `same`-label or
    * `diff`-label partition of a single window, and `row_number = 1` per
    * side picks the two champions — planned as WindowGroupLimit with
    * per-partition state of 1 row per (query, side). Never corpus²; for
    * query sets beyond broadcast size the IVF candidate front-end of
    * [[hardNegativesIvf]] composes in front, same as [[hardNegatives]].
    */
  def tripletMine(corpus: DataFrame, queries: DataFrame): DataFrame = {
    val spark = corpus.sparkSession
    val c = prepLabeled(corpus)
    val q = prepLabeled(queries).select(col("vec_id").as("q_id"),
      col("label").as("q_label"), col("v").as("qv"))
    val scored = c.join(broadcast(q), col("vec_id") =!= col("q_id"))
      .withColumn("same", (col("label") === col("q_label")).cast("int"))
      .withColumn("cos_sim",
        round(GraftFunctions.cosineSim(spark, col("qv"), col("v")), 4))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id"), col("same"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
    val champs = scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
    champs.groupBy(col("q_id"), col("q_label"))
      .agg(
        max(when(col("same") === 1, col("vec_id"))).as("pos_id"),
        max(when(col("same") === 1, col("cos_sim"))).as("pos_sim"),
        max(when(col("same") === 0, col("vec_id"))).as("neg_id"),
        max(when(col("same") === 0, col("cos_sim"))).as("neg_sim"))
      .withColumn("margin",
        round(col("pos_sim") - col("neg_sim"), 4))
      .select(col("q_id"), col("q_label"), col("pos_id"), col("pos_sim"),
        col("neg_id"), col("neg_sim"), col("margin"))
  }

  /** Margin-based bitext mining (Artetxe & Schwenk 2019 — the
    * LASER/CCMatrix parallel-corpus step): for every source-language
    * document, score every other-language candidate by RATIO MARGIN —
    * cosine normalized by the mean cosine of each endpoint's k-nearest
    * cross-lingual neighborhood — and emit the best candidate when its
    * margin clears 1.0 (i.e. the link is stronger than its endpoints'
    * typical neighborhoods, the signature of a genuine translation pair
    * rather than a hub vector that is "close to everything").
    *
    * Engine-portable exactness: cosines are quantized ONCE to integer
    * ten-thousandths (`round(cos·10⁴)` as BIGINT); ranking, neighborhood
    * sums, and the margin test `best·(cnt_f+cnt_b) ≥ Σfwd+Σbwd` are then
    * pure integer arithmetic — no double ever enters an order-by or a
    * sum, so DuckDB replays the mining bit-for-bit. The reported margin
    * divides exact longs in double space and floor-quantizes at 1e-4.
    *
    * Shape: one |src|×|tgt| broadcast scoring pass builds a SKINNY
    * (src, tgt, isim) table — vectors are dropped before any shuffle —
    * which is locally checkpointed once and fed to both direction
    * windows (partitioned by src resp. tgt — parallel, never global).
    * The dense scoring pass is the same broadcast shape as
    * [[hardNegatives]]' small-query regime; beyond broadcast size the
    * [[hardNegativesIvf]] IVF candidate front-end composes in front
    * unchanged (candidates ∪ exact rerank), since the margin only ever
    * consults each endpoint's top-k neighborhood.
    */
  def bitextMine(docs: DataFrame, embs: DataFrame, srcLang: String = "en",
      k: Int = 4): DataFrame = {
    val spark = docs.sparkSession
    val e = docs.select(col("doc_id"), col("lang"))
      .join(embs.select(col("vec_id").as("doc_id"), col("embedding")),
        Seq("doc_id"))
      .select(col("doc_id"), col("lang"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
    val src = e.filter(col("lang") === srcLang)
      .select(col("doc_id").as("src_id"), col("v").as("sv"))
    val tgt = e.filter(col("lang") =!= srcLang)
      .select(col("doc_id").as("tgt_id"), col("v").as("tv"))
    val scoredPairs = tgt.join(broadcast(src))
      .select(col("src_id"), col("tgt_id"),
        round(GraftFunctions.cosineSim(spark, col("sv"), col("tv"))
          * 10000).cast("long").as("isim"))
    PlanCapture.record("q141_bitext_margin (pre-checkpoint)", scoredPairs)
    val pairs = scoredPairs.localCheckpoint()
    val wf = org.apache.spark.sql.expressions.Window
      .partitionBy(col("src_id")).orderBy(col("isim").desc, col("tgt_id"))
    val wb = org.apache.spark.sql.expressions.Window
      .partitionBy(col("tgt_id")).orderBy(col("isim").desc, col("src_id"))
    val fwd = pairs.withColumn("rf", row_number().over(wf))
      .filter(col("rf") <= k)
      .groupBy(col("src_id"))
      .agg(sum(col("isim")).as("sum_fwd"), count(lit(1)).as("cnt_f"),
        max(when(col("rf") === 1, col("tgt_id"))).as("tgt_id"),
        max(when(col("rf") === 1, col("isim"))).as("best_isim"))
    val bwd = pairs.withColumn("rb", row_number().over(wb))
      .filter(col("rb") <= k)
      .groupBy(col("tgt_id"))
      .agg(sum(col("isim")).as("sum_bwd"), count(lit(1)).as("cnt_b"))
    fwd.join(bwd, Seq("tgt_id"))
      .filter(col("best_isim") > 0 &&
        col("best_isim") * (col("cnt_f") + col("cnt_b"))
          >= col("sum_fwd") + col("sum_bwd"))
      .select(col("src_id"), col("tgt_id"),
        (col("best_isim") / lit(10000.0)).as("cos_sim"),
        (floor(col("best_isim") * (col("cnt_f") + col("cnt_b"))
          * lit(10000.0) / (col("sum_fwd") + col("sum_bwd")))
          .cast("double") / 1e4).as("margin"))
  }

  /** k-NN label-agreement audit (the label-noise detector behind
    * confident-learning / deep-kNN data cleaning): for each sampled
    * vector, the fraction of its k nearest neighbors (cosine) that share
    * its label. Agreement ≈ 1 means the label is consistent with the
    * embedding geometry; agreement ≤ 1/4 flags the row as a `suspect` —
    * a probable mislabel, an outlier, or a cluster-boundary case — the
    * audit queue a labeling pipeline reviews before training. Complements
    * [[labelOutliers]] (centroid distance: global shape) with local
    * neighborhood evidence.
    *
    * Same engine-portable contract as [[bitextMine]]: cosines quantized
    * to integer 1e-4 before the ranking window, so neighbor sets are
    * deterministic in any engine; the agreement ratio divides exact
    * longs. Sampling is the stateless id-hash (vec_id mod sampleMod).
    * Shape: one broadcast-queries scoring pass, per-query ranking window
    * cut at k (WindowGroupLimit); beyond broadcast size the
    * [[hardNegativesIvf]] candidate front-end composes in front, since
    * only each query's top-k neighborhood is ever consulted.
    */
  def labelAgreement(embs: DataFrame, k: Int = 8,
      sampleMod: Int = 10): DataFrame = {
    val spark = embs.sparkSession
    val c = prepLabeled(embs)
    val q = c.filter(pmod(col("vec_id"), lit(sampleMod)) === 0)
      .select(col("vec_id").as("q_id"), col("label").as("q_label"),
        col("v").as("qv"))
    val scored = c.join(broadcast(q), col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("q_label"), col("vec_id"), col("label"),
        round(GraftFunctions.cosineSim(spark, col("qv"), col("v")) * 10000)
          .cast("long").as("isim"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("isim").desc, col("vec_id"))
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .groupBy(col("q_id"), col("q_label"))
      .agg(count(lit(1)).as("kk"),
        sum(when(col("label") === col("q_label"), 1L).otherwise(0L))
          .as("n_same"))
      .select(col("q_id"), col("q_label").cast("long").as("q_label"),
        col("n_same"),
        (floor(col("n_same") * 10000L / col("kk")).cast("double") / 1e4)
          .as("agreement"),
        (col("n_same") * 4 <= col("kk")).as("suspect"))
  }

  /** RAG context assembly — the retrieval step's LAST mile: for each
    * query, rank candidate documents by dense cosine and greedily pack
    * the ranked list into a fixed token budget (the context window),
    * emitting the kept docs with their rank, token cost, and running
    * total. This is what actually ships to the prompt builder: not a
    * top-k list but a budget-feasible prefix of one.
    *
    * Determinism/portability: the [[bitextMine]] contract — cosines
    * quantized to integer 1e-4 before ranking, token counts exact longs,
    * the greedy cut `cum ≤ budget` pure integer arithmetic.
    *
    * Shape: broadcast-queries scoring, then rank and running token sum
    * as two windows over ONE (query)-partitioned exchange. Zero-token
    * docs are excluded up front, which makes `rank ≤ budget` a PROVABLE
    * pre-cut (every kept doc costs ≥ 1 token), so the running-sum window
    * state is budget-bounded per query — WindowGroupLimit shape, never
    * corpus-deep. Beyond broadcast-size query sets the IVF candidate
    * front-end composes in front, as everywhere in this file.
    */
  def contextAssemble(docs: DataFrame, embs: DataFrame, nQueries: Int = 8,
      budget: Long = 256): DataFrame = {
    val spark = docs.sparkSession
    val v = embs.select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("v"))
    val q = v.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    val toks = docs.select(col("doc_id").as("vec_id"),
      size(TextAnalysis.wsTokens(col("text"))).cast("long").as("n_tokens"))
    val scored = v.join(broadcast(q), col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        round(GraftFunctions.cosineSim(spark, col("qv"), col("v")) * 10000)
          .cast("long").as("isim"))
      .join(toks, Seq("vec_id"))
      .filter(col("n_tokens") > 0)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("isim").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= budget)
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .filter(col("cum_tokens") <= budget)
      .select(col("q_id"), col("rank"), col("vec_id").as("doc_id"),
        (col("isim") / lit(10000.0)).as("cos_sim"),
        col("n_tokens"), col("cum_tokens"))
  }

  /** Maximal Marginal Relevance (Carbonell & Goldstein 1998) — DIVERSIFIED
    * retrieval: k selection rounds per query, each picking the candidate
    * maximizing λ·sim(query, d) − (1−λ)·max_{s∈selected} sim(d, s). The
    * first pick is pure relevance; every later pick is penalized by its
    * redundancy against what the context already holds — the standard
    * fix for retrieval lists that are k near-copies of the same passage,
    * and the natural upgrade to [[contextAssemble]]'s relevance-only
    * packing.
    *
    * λ is fixed at 1/2 so the WHOLE selection argmax is integer
    * arithmetic on 1e-4-quantized cosines: score ∝ rel − maxPenalty,
    * ties on vec_id — deterministic in any engine, and a k-step unrolled
    * SQL oracle replays every round exactly.
    *
    * Shape per round: the penalty join touches candidates × selected
    * where selected ≤ k·\|queries\| rows (broadcast side), one
    * per-(query, candidate) max, one per-query argmax window — k bounded
    * rounds, each O(candidates). Selected rows are localCheckpointed per
    * round, so the plan is O(1) in k (the [[kMeans]]/pageRank loop
    * discipline). Beyond broadcast-size query sets the IVF candidate
    * front-end composes in front.
    */
  def mmrSelect(embs: DataFrame, nQueries: Int = 4, k: Int = 3): DataFrame = {
    val spark = embs.sparkSession
    val v = embs.select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("dv"))
    val q = v.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("dv").as("qv"))
    val cand = v.join(broadcast(q), col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"), col("dv"),
        round(GraftFunctions.cosineSim(spark, col("qv"), col("dv")) * 10000)
          .cast("long").as("rel"))
      .localCheckpoint()
    var selected: DataFrame = null
    (1 to k).foreach { step =>
      val scoredStep =
        if (selected == null) cand.withColumn("pen", lit(0L))
        else {
          val sel = broadcast(selected
            .select(col("q_id"), col("vec_id").as("s_id"),
              col("dv").as("sv")))
          cand.join(sel, Seq("q_id"))
            .filter(col("vec_id") =!= col("s_id"))
            .withColumn("dd",
              round(GraftFunctions.cosineSim(spark, col("dv"), col("sv"))
                * 10000).cast("long"))
            .groupBy(col("q_id"), col("vec_id"), col("dv"), col("rel"))
            .agg(max(col("dd")).as("pen"), count(lit(1)).as("nj"))
            // already-selected ids pair with only |selected|−1 rows (the
            // self pair is filtered) — requiring a full join count
            // excludes them from re-selection
            .filter(col("nj") === (step - 1)).drop("nj")
        }
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("q_id"))
        .orderBy((col("rel") - col("pen")).desc, col("vec_id"))
      val winner = scoredStep
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("q_id"), col("vec_id"), col("dv"), col("rel"),
          col("pen"), lit(step.toLong).as("step"))
        .localCheckpoint()
      selected = if (selected == null) winner else selected.union(winner)
    }
    selected.select(col("q_id"), col("step"), col("vec_id").as("doc_id"),
      (col("rel") / lit(10000.0)).as("relevance"),
      (col("pen") / lit(10000.0)).as("redundancy"),
      ((col("rel") - col("pen")).cast("double") / lit(20000.0)).as("mmr"))
  }

  /** Semantic source map — pairwise cosine between per-source embedding
    * CENTROIDS: the semantic counterpart of [[graft.operators.CorpusOps
    * .sourceAffinity]]'s lexical matrix (two sources can share no
    * vocabulary yet embed identically, and vice versa; disagreement
    * between the two maps is itself a data-quality signal). Feeds the
    * same mixture-design questions: which sources are near-redundant,
    * which one covers space nothing else does.
    *
    * Engine-portable: each embedding component is floor-quantized to an
    * integer MILLIONTH row-locally, so per-source component sums are
    * exact BIGINTs no shuffle order can change; cosine is scale-
    * invariant, so the sums themselves are the centroid vectors —
    * no division ever happens before the similarity. One posexplode agg
    * to \|sources\|·dims cells, arrays rebuilt pos-sorted, a \|sources\|²/2
    * pair join of tiny rows.
    */
  def sourceCentroidMap(docs: DataFrame, embs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    val joined = docs.select(col("doc_id"), col("source"))
      .join(embs.select(col("vec_id").as("doc_id"), col("embedding")),
        Seq("doc_id"))
    val sums = joined
      .select(col("source"), posexplode(col("embedding"))
        .as(Seq("pos", "v")))
      .select(col("source"), col("pos"),
        floor(col("v").cast("double") * 1000000L).as("iv"))
      .groupBy(col("source"), col("pos")).agg(sum(col("iv")).as("s"))
    val centroids = sums.groupBy(col("source"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("s")))),
        x => x.getField("s").cast("double")).as("cv"))
    val counts = joined.groupBy(col("source")).agg(count(lit(1)).as("n"))
    val c = centroids.join(counts, Seq("source"))
    val a = c.select(col("source").as("source_a"), col("cv").as("va"),
      col("n").as("n_a"))
    val b = c.select(col("source").as("source_b"), col("cv").as("vb"),
      col("n").as("n_b"))
    a.join(b, col("source_a") < col("source_b"))
      .select(col("source_a"), col("source_b"), col("n_a"), col("n_b"),
        round(GraftFunctions.cosineSim(spark, col("va"), col("vb")), 4)
          .as("cos_sim"))
  }

  /** Product-quantization ANN (ADC + exact rerank): vectors are cut into
    * `m` subspaces, each encoded as the id of its nearest codebook entry
    * (`ksub` per subspace) — compressing a d-dim float vector to m bytes
    * (32× at d=64, m=8). Queries score the whole corpus through the code
    * table (asymmetric distance: Σ over subspaces of ‖sub_j(q) −
    * cb[j][code_j(v)]‖², one `m`-term lookup sum per vector, no
    * full-width arithmetic), shortlist `oversample`×k candidates, and an
    * exact cosine rerank of the shortlist produces the final top-k.
    *
    * Codebooks here are the subvectors of the `ksub` lowest-id corpus
    * vectors — the same deterministic, oracle-replicable stand-in
    * [[ivfTopK]] uses: a k-means trainer (the bounded-sample Lloyd of
    * [[trainCentroids]], run per subspace) would only move codebook
    * positions, tightening ADC estimates and letting `oversample` shrink;
    * the encode/LUT/rerank mechanics — what runs at 100 TB — are
    * identical. Distances are 6dp-rounded before every argmin/ranking
    * with id tie-breaks, so codes and shortlists are deterministic across
    * engines.
    *
    * Shape at scale: encoding is one broadcast-LUT pass over the corpus
    * (row-local argmin per subspace); ADC explodes each corpus row to `m`
    * code rows and equi-joins the broadcast per-query LUT (|q|·m·ksub
    * rows), then folds back — shuffle volume is m×corpus CODE rows
    * (bytes, not vectors); rerank touches oversample·k rows per query.
    * The full-width corpus is read once for encoding and once for the
    * shortlist join — never pairwise.
    */
  def pqTopK(corpus: DataFrame, queries: DataFrame, k: Int, m: Int = 16,
      ksub: Int = 16, oversample: Int = 8): DataFrame = {
    // codebook: (j, cid, cbv) — subspace j of deterministic corpus rows
    val cu = asDouble(corpus)
      .select(col("vec_id"), unitOf(col("v")).as("u"))
    val cb = cu.filter(col("vec_id") < ksub)
      .select(col("vec_id").cast("int").as("cid"), subspacesOf(col("u"), m).as("s"))
      .select(col("cid"), col("s.j").as("j"), col("s.cbv").as("cbv"))
    pqWithCodebook(corpus, queries, cb, k, m, oversample)
  }

  /** Unit-normalize an array column (callers guarantee nonzero norm). */
  private def unitOf(v: Column): Column = {
    val n = sqrt(aggregate(v, lit(0.0), (a, x) => a + x * x))
    transform(v, x => x / n)
  }

  /** Explode an array column into its `m` equal subspaces as
    * struct(j, cbv) rows.
    */
  private def subspacesOf(vc: Column, m: Int): Column =
    explode(transform(sequence(lit(0), lit(m - 1)),
      j => struct(j.as("j"), slice(vc, j * size(vc) / m + 1,
        size(vc) / m).as("cbv"))))

  /** Shared PQ machinery: encode the corpus against `cb` (j, cid, cbv),
    * ADC-score via a broadcast per-query LUT, shortlist, exact rerank.
    * Codes and LUTs live on UNIT vectors: on the unit sphere ‖a−b‖² =
    * 2 − 2·cos(a,b), so ADC-by-L2 ranks exactly like cosine — encoding
    * raw vectors would let norm variance leak into the shortlist (it
    * measurably halves recall on the test corpus).
    */
  private def pqWithCodebook(corpus: DataFrame, queries: DataFrame,
      cb: DataFrame, k: Int, m: Int, oversample: Int): DataFrame = {
    val spark = corpus.sparkSession
    val c = asDouble(corpus)
    val cu = c.select(col("vec_id"), col("v"), unitOf(col("v")).as("u"))
    val subs = subspacesOf(col("u"), m)
    // encode: per (vector, subspace), nearest codebook entry
    val d2 = (a: Column, b: Column) =>
      round(aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
        lit(0.0), (acc, x) => acc + x), 6)
    val wEnc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id"), col("j")).orderBy(col("d2"), col("cid"))
    val enc = cu.select(col("vec_id"), subs.as("s"))
      .select(col("vec_id"), col("s.j").as("j"), col("s.cbv").as("sv"))
      .join(broadcast(cb), Seq("j"))
      .withColumn("d2", d2(col("sv"), col("cbv")))
      .withColumn("ern", row_number().over(wEnc))
      .filter(col("ern") === 1)
      .select(col("vec_id"), col("j"), col("cid"))
    // per-query LUT: distance from each query subvector to each codebook entry
    val q = asDouble(queries).select(col("vec_id").as("q_id"), col("v").as("qv"))
    val qsubs = q.select(col("q_id"), subspacesOf(unitOf(col("qv")), m).as("s"))
      .select(col("q_id"), col("s.j").as("j"), col("s.cbv").as("qsv"))
    val lut = qsubs.join(cb, Seq("j"))
      .select(col("q_id"), col("j"), col("cid"), d2(col("qsv"), col("cbv")).as("d"))
    // ADC score + shortlist
    val wShort = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("adc"), col("vec_id"))
    val short = enc.join(broadcast(lut), Seq("j", "cid"))
      .groupBy(col("q_id"), col("vec_id"))
      .agg(round(sum(col("d")), 6).as("adc"))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("srn", row_number().over(wShort))
      .filter(col("srn") <= oversample * k)
      .select(col("q_id"), col("vec_id"))
    // exact rerank of the shortlist
    val wRank = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("cos_sim").desc, col("vec_id"))
    short.join(c, Seq("vec_id")).join(broadcast(q), Seq("q_id"))
      .withColumn("cos_sim", round(GraftFunctions.cosineSim(spark, col("qv"), col("v")), 4))
      .withColumn("rank", row_number().over(wRank))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("vec_id").as("neighbor_id"),
        col("rank").cast("long").as("rank"), col("cos_sim"))
  }

  /** Per-subspace Lloyd-trained PQ codebooks on a bounded sample — the
    * Faiss recipe applied independently to each of the `m` subspaces:
    * draw `ksub`×64 unit-normalized vectors in deterministic hash order
    * (one distributed top-N pass, like [[trainCentroids]]), slice them
    * into subvectors, and run `iters` rounds of L2 Lloyd per subspace
    * locally (init = the sample's `ksub` lowest-id subvectors; empty
    * cells keep their centroid). Training cost is ~constant in corpus
    * size; the result ships to [[pqTopKTrained]] as a broadcastable
    * (j, cid, cbv) relation.
    */
  private[graft] def trainCodebooks(corpus: DataFrame, m: Int, ksub: Int,
      iters: Int = 5): Array[(Int, Int, Array[Double])] = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val sample: Array[(Long, Array[Double])] = asDouble(corpus)
      .withColumn("n", sqrt(aggregate(col("v"), lit(0.0), (a, x) => a + x * x)))
      .filter(col("n") > 0)
      .select(col("vec_id"), transform(col("v"), x => x / col("n")).as("u"))
      .orderBy(xxhash64(col("vec_id")), col("vec_id"))
      .limit(ksub * 64)
      .as[(Long, Array[Double])].collect()
    require(sample.nonEmpty, "cannot train codebooks on an empty corpus")
    val dim = sample(0)._2.length
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val sub = dim / m

    (0 until m).toArray.flatMap { j =>
      val svs = sample.sortBy(_._1).map(_._2.slice(j * sub, (j + 1) * sub))
      var cents = svs.take(ksub).map(_.clone())
      var it = 0
      while (it < iters) {
        val sums = Array.fill(cents.length)(new Array[Double](sub))
        val counts = new Array[Long](cents.length)
        svs.foreach { sv =>
          var best = 0; var bestD = Double.PositiveInfinity; var c = 0
          while (c < cents.length) {
            val cv = cents(c); var d = 0.0; var i = 0
            while (i < sub) { val t = sv(i) - cv(i); d += t * t; i += 1 }
            if (d < bestD) { bestD = d; best = c }
            c += 1
          }
          var i = 0
          while (i < sub) { sums(best)(i) += sv(i); i += 1 }
          counts(best) += 1
        }
        cents = cents.zipWithIndex.map { case (cv, c) =>
          if (counts(c) == 0) cv.clone()
          else Array.tabulate(sub)(i => sums(c)(i) / counts(c))
        }
        it += 1
      }
      cents.zipWithIndex.map { case (cv, cid) => (j, cid, cv) }
    }
  }

  /** [[pqTopK]] with trained codebooks: identical encode/ADC/rerank
    * mechanics, codebook entries moved by per-subspace Lloyd — tighter
    * ADC estimates, so the same `oversample` buys more recall (or a
    * smaller one the same recall). Not oracle-replicable (codebooks are
    * data-derived), so correctness rides the spec: recall vs brute force
    * and rerank exactness.
    */
  def pqTopKTrained(corpus: DataFrame, queries: DataFrame, k: Int,
      m: Int = 16, ksub: Int = 16, oversample: Int = 8,
      iters: Int = 5): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val cb = trainCodebooks(corpus, m, ksub, iters).toSeq.toDF("j", "cid", "cbv")
    pqWithCodebook(corpus, queries, cb, k, m, oversample)
  }

  /** Hybrid retrieval: reciprocal-rank fusion (RRF, Cormack et al.) of a
    * lexical BM25 ranking and a dense cosine ranking for the same query
    * set — the standard RAG / retrieval-training recipe (dense recall ∪
    * lexical precision beats either side alone, and RRF needs no score
    * calibration because it only consumes RANKS).
    *
    * Queries are documents: the lexical side uses the query doc's token
    * SET as the BM25 query (every scoring pair meets on a token
    * equi-join — no all-pairs text comparison), the dense side its
    * embedding (broadcast non-equi join, [[bruteForceTopK]] shape).
    * Each side keeps only its top-`perSideCut` per query — written as a
    * `row_number <= cut` filter that Spark rewrites to WindowGroupLimit,
    * so per-partition state is bounded by the cut, not the corpus — then
    * a full-outer equi-join on (q_id, doc_id) fuses:
    * score = Σ sides 1/(rrfK + rank), absent side contributing 0.
    *
    * Determinism for the cross-engine oracle: BM25 floored at 1e-3 and
    * cosine rounded at 1e-4 BEFORE ranking (ties broken by doc_id), and
    * the fused score floored at 1e-6 — ranks are integers, so
    * 1/(rrfK+rank) sums are bit-identical in any IEEE-754 engine.
    *
    * 100 TB shape: one corpus tokenization feeds both tf and df; the
    * probe side is pruned by a broadcast semi-join on the query term set
    * BEFORE the tf aggregation (only tokens some query mentions ever
    * shuffle); stats/df/query frames are broadcast; the only wide ops are
    * the two bounded ranking windows and the (|queries|·cut)-row fusion
    * join.
    */
  def hybridRetrieve(docs: DataFrame, embeddings: DataFrame,
      queryIds: Seq[Long], k: Int = 10, rrfK: Int = 60,
      perSideCut: Int = 1000, k1: Double = 1.2, b: Double = 0.75,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(queryIds.nonEmpty && k > 0 && perSideCut >= k)
    val spark = docs.sparkSession
    import org.apache.spark.sql.expressions.Window

    // ---- lexical side: multi-query BM25 through one token equi-join ----
    val toks = docs
      .select(col(idCol).as("doc_id"), TextAnalysis.wsTokens(col(textCol)).as("w"))
      .select(col("doc_id"), size(col("w")).cast("double").as("dl"),
        explode(col("w")).as("token"))
    val qTerms = toks.filter(col("doc_id").isin(queryIds: _*))
      .select(col("doc_id").as("q_id"), col("token")).distinct()
    val stats = docs.agg(
      count(lit(1)).cast("double").as("n_docs"),
      avg(size(TextAnalysis.wsTokens(col(textCol))).cast("double")).as("avgdl"))
    // df is computed over ALL docs containing a query term (query docs
    // included) — self-exclusion happens after, so idf is corpus-true
    val tf = toks
      .join(broadcast(qTerms.select("token").distinct()), Seq("token"), "left_semi")
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).cast("double").as("tf"), max(col("dl")).as("dl"))
    val dfTab = tf.groupBy(col("token")).agg(count(lit(1)).cast("double").as("df"))
    val lexScored = tf
      .join(broadcast(qTerms), Seq("token"))
      .filter(col("doc_id") =!= col("q_id"))
      .join(broadcast(dfTab), Seq("token"))
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log((col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0)))
      .withColumn("contrib",
        col("idf") * col("tf") * lit(k1 + 1) /
          (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / col("avgdl"))))
      .groupBy(col("q_id"), col("doc_id"))
      .agg((floor(sum(col("contrib")) * 1000) / 1000).as("lex_score"))
    val wLex = Window.partitionBy(col("q_id"))
      .orderBy(col("lex_score").desc, col("doc_id"))
    val lexRank = lexScored
      .withColumn("lex_rank", row_number().over(wLex))
      .filter(col("lex_rank") <= perSideCut)
      .select(col("q_id"), col("doc_id"), col("lex_rank").cast("long").as("lex_rank"))

    // ---- dense side: broadcast query vectors, exact cosine ----
    val c = asDouble(embeddings)
    val qv = asDouble(embeddings).filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    val denseScored = c.join(broadcast(qv), col("vec_id") =!= col("q_id"))
      .withColumn("cos_sim",
        round(GraftFunctions.cosineSim(spark, col("qv"), col("v")), 4))
    val wDense = Window.partitionBy(col("q_id"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
    val denseRank = denseScored
      .withColumn("dense_rank", row_number().over(wDense))
      .filter(col("dense_rank") <= perSideCut)
      .select(col("q_id"), col("vec_id").as("doc_id"),
        col("dense_rank").cast("long").as("dense_rank"))

    // ---- RRF fusion over the union of both candidate lists ----
    val fused = lexRank.join(denseRank, Seq("q_id", "doc_id"), "full_outer")
      .withColumn("rrf_score",
        floor((coalesce(lit(1.0) / (lit(rrfK) + col("lex_rank")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(rrfK) + col("dense_rank")), lit(0.0))) * 1e6) / 1e6)
    val wFused = Window.partitionBy(col("q_id"))
      .orderBy(col("rrf_score").desc, col("doc_id"))
    fused.withColumn("rank", row_number().over(wFused))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("doc_id"), col("lex_rank"), col("dense_rank"),
        col("rrf_score"), col("rank").cast("long").as("rank"))
  }

  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int, nBits: Int = 8): DataFrame = {
    val spark = corpus.sparkSession
    val c = withLshBucket(asDouble(corpus), nBits)
    val probes = (0 until nBits).map(i => col("bucket").bitwiseXOR(1L << i))
    val q = withLshBucket(asDouble(queries), nBits)
      .select(col("vec_id").as("q_id"), col("v").as("qv"),
        explode(array(col("bucket") +: probes: _*)).as("bucket"))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("vec_id") =!= col("q_id"))
      .dropDuplicates("q_id", "vec_id")
      .withColumn("cos_sim",
        round(GraftFunctions.cosineSim(spark, col("qv"), col("v")), 4))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("cos_sim").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("vec_id").as("neighbor_id"),
        col("rank").cast("long").as("rank"), col("cos_sim"))
  }

  /** Per-label centroid drift against the corpus centroid (q274) — the
    * embedding-space mix audit: a label (source, task, language) whose
    * centroid points away from the corpus centroid contributes a
    * different REGION of embedding space, the geometric cousin of
    * [[CorpusOps.sourceKl]]'s token-distribution read; run it between
    * snapshot versions and it becomes embedding-drift monitoring for a
    * re-embedded corpus.
    *
    * Exactness: components quantize per row FIRST (q6 = ⌊x·10⁶⌋ — float
    * → double is exact, one deterministic floor), so the per-(label,
    * dim) sums are pure BIGINT and the global centroid is their sum —
    * cosine is scale-invariant, so SUMS stand in for means and no
    * division happens at all until the final cos. dot/norms accumulate
    * in DECIMAL(38,0) (cl ≤ n·10⁶, squares ≤ n²·10¹² — exact to
    * n ≈ 10¹²); cos6 = ⌊dot/(√na·√nb)·10⁶⌋ with two correctly-rounded
    * IEEE sqrts both engines replay. Zero-norm labels (all-zero
    * vectors) report NULL.
    *
    * Scale: one posexplode aggregation to (label, dim) — dims·|labels|
    * rows — then report-sized arithmetic; raw vectors are scanned once.
    */
  def centroidDrift(emb: DataFrame): DataFrame = {
    val comp = prepLabeled(emb)
      .select(col("label"), posexplode(col("v")).as(Seq("dim", "x")))
      .withColumn("q6", floor(col("x") * 1000000L).cast("long"))
    val byLabel = comp.groupBy(col("label"), col("dim"))
      .agg(sum(col("q6")).as("cl"), count(lit(1)).as("nv"))
    val global = byLabel.groupBy(col("dim")).agg(sum(col("cl")).as("cg"))
    byLabel.join(global, "dim")
      .groupBy(col("label"))
      .agg(max(col("nv")).as("n_vecs"),
        sum(expr("CAST(cl AS DECIMAL(38,0)) * cg")).as("_dot"),
        sum(expr("CAST(cl AS DECIMAL(38,0)) * cl")).as("_na"),
        sum(expr("CAST(cg AS DECIMAL(38,0)) * cg")).as("_nb"))
      .withColumn("_cos6", when(col("_na") > 0 && col("_nb") > 0,
        floor(col("_dot").cast("double")
          / (sqrt(col("_na").cast("double"))
            * sqrt(col("_nb").cast("double"))) * 1e6).cast("long")))
      .select(col("label"), col("n_vecs"),
        (col("_cos6").cast("double") / 1e6).as("cos_to_global"),
        when(col("_cos6").isNotNull, col("_cos6") < 980000L)
          .as("drifted"))
  }
}
