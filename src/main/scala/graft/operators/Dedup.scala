package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for LLM-data pipelines: exact, n-gram Jaccard,
  * MinHash+LSH, SimHash. All expressed as DataFrame plans so Catalyst/AQE
  * handle distribution; the LSH variants exist precisely so that 100 TB
  * corpora never pay an all-pairs O(n²) comparison — candidate generation
  * is an equi-join on band/bucket keys (shuffle on a small key space),
  * and only candidates pay the exact-similarity verification.
  */
object Dedup {

  /** Exact dedup by content: one survivor (min id) per distinct text. */
  def exact(df: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    df.groupBy(col(textCol))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("copies"))
      .select(col("keep_id"), col("copies"))

  /** Distinct hashed word n-gram shingles per document as (id, hash) rows.
    * Shingles are carried as xxhash64 longs, not strings: joins shuffle
    * fixed 8-byte keys instead of ~20-byte text (64-bit collisions are
    * negligible at corpus scale).
    */
  def shingles(df: DataFrame, n: Int, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    shingleArrays(df, n, idCol, textCol)
      .select(col("doc_id"), explode(col("sh")).as("s"))

  /** Per-document sorted distinct hashed-shingle ARRAY, built entirely
    * row-locally (tokenize → hash each token once → combine n consecutive
    * token hashes into the shingle hash → distinct → sort, all inside one
    * projection). No explode, no shuffle: the shingle set of a document
    * never leaves its row, so this scales with input splits and the
    * downstream set algebra (intersection sizes, minhash signatures) is
    * array arithmetic instead of joins.
    *
    * Hashing token-hash TUPLES instead of concatenated n-gram strings
    * preserves set identity (two shingles collide iff their token
    * sequences match, modulo 64-bit collisions — the same assumption
    * string hashing already makes). The kernel is the native codegen'd
    * [[graft.functions.ShingleHashes]] expression: one linear pass per
    * row, opaque to Catalyst constraint substitution (a higher-order
    * composition here gets its lambda tree duplicated into inferred
    * not-null filters and degrades to O(tokens²) per row — measured 10×
    * on the n=8 decontamination query). Documents shorter than n words
    * contribute one whole-document shingle.
    */
  def shingleArrays(df: DataFrame, n: Int, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    df.select(col(idCol).as("doc_id"),
      graft.functions.TextHashFunctions
        .shingleHashes(df.sparkSession, col(textCol), n).as("sh"))

  /** Sorted-neighborhood dedup (q187): the database-record-linkage
    * alternative to LSH — sort the corpus by a blocking key (here the
    * document's first 3 words: near-identical docs share it and sort
    * adjacent), then compare only records within a fixed WINDOW of the
    * sort order, exact-verifying each candidate. Complements MinHash/
    * SimHash: no hash family, recall rides the key design, and the
    * candidate count is exactly N·(window−1) by construction.
    *
    * The global sort rank is built WITHOUT a total-order window (the
    * SinglePartition killer): deterministic prefix buckets (first 2 key
    * chars — a prefix bucket order composes with the in-bucket order to
    * the true global key order) carry per-bucket row_numbers, and a
    * |buckets|-row offset table lifts them to global ranks — the q58
    * distributed-prefix-sum shape. Production swaps the prefix buckets
    * for repartitionByRange's sampled boundaries; prefix buckets keep
    * the oracle exact. Window pairs that CROSS bucket boundaries are
    * caught because adjacency is on the global rank, not the bucket —
    * spec-pinned. Candidates then verify by exact trigram Jaccard
    * (q26's convention, whole-doc shingle under 3 words), so the output
    * contains no false positives at any window size.
    */
  def sortedNeighborhoodPairs(df: DataFrame, window: Int = 5,
      threshold: Double = 0.8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = filter(split(col("text"), " "), x => x =!= lit(""))
    val keyed = df.select(col("doc_id"), toks.as("_w"))
      .withColumn("bkey", concat_ws(" ", slice(col("_w"), 1, 3)))
    val bucketed = keyed.withColumn("rng", substring(col("bkey"), 1, 2))
    val wLocal = Window.partitionBy(col("rng"))
      .orderBy(col("bkey"), col("doc_id"))
    val local = bucketed
      .withColumn("lrk", row_number().over(wLocal).cast("long"))
    val wOff = Window.partitionBy(lit(1)).orderBy(col("rng"))
    val offsets = local.groupBy(col("rng")).agg(count(lit(1)).as("cnt"))
      .withColumn("offset", sum(col("cnt")).over(wOff) - col("cnt"))
    val ranked = local.join(offsets.select(col("rng"), col("offset")), Seq("rng"))
      .select(col("doc_id"), (col("offset") + col("lrk")).as("rk"))
    val cands = ranked
      .select(col("doc_id").as("doc_a"),
        explode(sequence(col("rk") + 1, col("rk") + (window - 1))).as("nrk"))
      .join(ranked.select(col("doc_id").as("doc_b"), col("rk").as("nrk")),
        Seq("nrk"))
      .select(least(col("doc_a"), col("doc_b")).as("doc_a"),
        greatest(col("doc_a"), col("doc_b")).as("doc_b"))
    val grams = keyed.select(col("doc_id"),
        explode(when(size(col("_w")) >= 3,
          graft.operators.TextAnalysis.wordNgrams(col("_w"), 3))
          .otherwise(array(concat_ws(" ", col("_w"))))).as("s"))
      .distinct()
    val sizes = grams.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val pc = cands
      .join(grams.select(col("doc_id").as("doc_a"), col("s")), Seq("doc_a"))
      .join(grams.select(col("doc_id").as("doc_b"), col("s")),
        Seq("doc_b", "s"))
      .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("c"))
    val j = floor(col("c") * lit(1.0) /
      (col("na") + col("nb") - col("c")) * 10000) / 10000
    pc.join(sizes.select(col("doc_id").as("doc_a"), col("n").as("na")), Seq("doc_a"))
      .join(sizes.select(col("doc_id").as("doc_b"), col("n").as("nb")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"), j.as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Exact-Jaccard verification of candidate pairs against the per-doc
    * shingle arrays: |A∩B| via array_intersect, |A∪B| from sizes. Cost is
    * O(candidates), never all-pairs.
    */
  private def verifyJaccard(cands: DataFrame, docs: DataFrame,
      threshold: Double): DataFrame =
    cands
      .join(docs.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), "doc_a")
      .join(docs.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), "doc_b")
      .withColumn("common", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard", TextAnalysis.quant4(col("common").cast("double")
        / (size(col("sh_a")) + size(col("sh_b")) - col("common"))))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))

  /** Exact pairwise n-gram Jaccard ≥ t without the all-pairs join, via
    * AllPairs/PPJoin prefix filtering: with shingle arrays sorted by a
    * global order, any pair with J ≥ t — hence overlap α ≥ ⌈t·max(|A|,|B|)⌉
    * — shares its smallest common element within the first |x|−⌈t·|x|⌉+1
    * elements of BOTH arrays (the smallest common element has ≥ α−1 common
    * elements after it). So indexing only that prefix (~(1−t)·|x| rows) is
    * a complete candidate generator; candidates then get exact array
    * verification. Work = prefix-collision pairs, not corpus².
    */
  def ngramJaccardPairs(df: DataFrame, n: Int = 3, threshold: Double = 0.8,
      dfOrderedPrefixes: Boolean = true): DataFrame = {
    // persist the shingle index: it feeds candidate generation (both join
    // sides) and verification (both sides) — materializing once replaces 4
    // recomputations, and the cache boundary also pins Catalyst's inferred
    // not-null constraints ABOVE it (otherwise constraint propagation
    // substitutes the whole shingle expression into a pre-repartition
    // filter and re-evaluates it per row on the unsplit scan; measured 8×
    // on the local corpus). At 100 TB this is the operator's working set —
    // exactly what you'd persist or checkpoint before a multi-pass join.
    //
    // dfOrderedPrefixes: re-sort every array ascending by (global document
    // frequency, hash) instead of plain hash order. Any SHARED total order
    // keeps the prefix-filter argument valid, and putting the rarest
    // shingles first makes prefix collisions — hence candidate pairs —
    // scale with rare-shingle co-occurrence instead of template reuse.
    // Costs one df aggregation + join + per-doc re-sort over the span
    // table; measured 2× faster END TO END even at sf0.1 (0.75 s vs
    // 1.5 s warm — collision reduction beats the extra shuffles), so it
    // is the default. Output is identical either way (exact verification
    // unchanged; TextHashesSpec pins equality on toy + real corpora).
    val base = shingleArrays(df, n)
    val arrays =
      if (!dfOrderedPrefixes) base
      else {
        val ex = base.select(col("doc_id"), explode(col("sh")).as("s"))
        val dfreq = ex.groupBy(col("s")).agg(count(lit(1)).as("df"))
        ex.join(dfreq, Seq("s"))
          .groupBy(col("doc_id"))
          .agg(transform(array_sort(collect_list(struct(col("df"), col("s")))),
            x => x.getField("s")).as("sh"))
      }
    val docs = arrays.withColumn("n_sh", size(col("sh")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // ceil(t*n) with a float-safety epsilon: an over-rounded ceil would
    // SHORTEN the prefix and silently drop true pairs
    val prefLen = (col("n_sh") - ceil(col("n_sh") * threshold - 1e-9) + 1).cast("int")
    val pref = docs.select(col("doc_id"), col("n_sh"),
      explode(slice(col("sh"), lit(1), prefLen)).as("s"))
    val cands = pref.as("a").join(pref.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id")
          // length filter: J ≥ t forces t·|A| ≤ |B| ≤ |A|/t (epsilon-slack)
          && col("a.n_sh") * threshold <= col("b.n_sh") + 1e-9
          && col("b.n_sh") * threshold <= col("a.n_sh") + 1e-9)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    val out = verifyJaccard(cands, docs, threshold)
    // materialize the (small) pair list eagerly, then release the shingle
    // index pin — the returned frame is lazy, so without the checkpoint
    // there is no later point where unpersist would be safe, and repeated
    // calls in a long session would accumulate pinned blocks
    PlanCapture.record("q26_dedup_jaccard (pre-checkpoint)", out)
    try out.localCheckpoint(true) finally docs.unpersist(blocking = false)
  }

  /** Directional shingle containment (q214): C(A→B) = |A∩B|/|A| ≥ t —
    * the asymmetric complement of [[ngramJaccardPairs]]: a short doc
    * embedded verbatim in a much longer one has containment ≈ 1 while
    * its Jaccard is tiny (the union is dominated by the container), so
    * symmetric dedup never sees it. This is the shingle-level cousin of
    * the q88 exact-substring pass: q88 excises literal byte spans;
    * containment catches embed-with-edits.
    *
    * Prefix filtering adapts: C ≥ t forces |A∩B| ≥ ⌈t·|A|⌉, so A's
    * smallest shared shingle sits inside its first |A|−⌈t·|A|⌉+1
    * elements (pigeonhole over the shared hash order) — but B gives no
    * such bound (it may be arbitrarily larger), so candidates join A's
    * prefix against B's FULL shingle index, and there is no length
    * filter. Exact array-intersect verification on candidates only.
    * Cost rides Σ_s prefixA(s)·df(s); on template-heavy corpora cap hot
    * shingles df-style (the q161 winnow join's knob) before the probe.
    */
  def containmentPairs(df: DataFrame, n: Int = 3,
      threshold: Double = 0.9): DataFrame = {
    val docs = shingleArrays(df, n).withColumn("n_sh", size(col("sh")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val prefLen =
      (col("n_sh") - ceil(col("n_sh") * threshold - 1e-9) + 1).cast("int")
    val prefA = docs.select(col("doc_id").as("doc_a"),
      explode(slice(col("sh"), lit(1), prefLen)).as("s"))
    val allB = docs.select(col("doc_id").as("doc_b"),
      explode(col("sh")).as("s"))
    val cands = prefA.join(allB, Seq("s"))
      .filter(col("doc_a") =!= col("doc_b"))
      .select(col("doc_a"), col("doc_b")).distinct()
    val out = cands
      .join(docs.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")),
        "doc_a")
      .join(docs.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")),
        "doc_b")
      .withColumn("common", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("containment",
        TextAnalysis.quant4(col("common").cast("double")
          / size(col("sh_a"))))
      .filter(col("containment") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("containment"))
    // same pin-release discipline as the Jaccard path
    try out.localCheckpoint(eager = true)
    finally docs.unpersist(blocking = false)
  }

  /** Near-duplicate CLUSTERS from the exact pair graph: connected
    * components by iterative min-label propagation (each round, every doc
    * adopts the smallest label among itself and its neighbors — converges
    * in ≤ graph-diameter rounds, and near-dup components are shallow by
    * construction). This is the step that turns pairwise similarity into
    * dedup survivors: keep `cluster` (= the component's minimum doc_id),
    * drop the rest. Each round is one equi-join + one aggregation — the
    * standard scalable connected-components loop (a large-star/small-star
    * variant would cut rounds on adversarially deep graphs).
    */
  def nearDupClusters(df: DataFrame, n: Int = 3, threshold: Double = 0.8,
      maxIters: Int = 20): DataFrame = {
    // Each round must CUT THE CATALYST PLAN, not just cache data (the
    // trainBpe discipline, CorpusOps.scala): persist leaves every round's
    // join+agg in the analyzed tree, so planning cost grows O(rounds²)
    // over the loop and every consumer of the result re-analyzes the
    // whole iteration history. localCheckpoint(eager) truncates lineage
    // to a LogicalRDD; its blocks are not cacheManager-visible, so the
    // superseded round is released by diffing persistent-RDD ids around
    // the checkpoint (mis-attribution under concurrent persists means a
    // recompute, never a correctness issue).
    val sc = df.sparkSession.sparkContext
    def checkpointed(d: DataFrame): (DataFrame, Set[Int]) = {
      val before = sc.getPersistentRDDs.keySet.toSet
      val out = d.localCheckpoint(eager = true)
      (out, sc.getPersistentRDDs.keySet.toSet -- before)
    }
    def release(ids: Set[Int]): Unit =
      ids.foreach(id => sc.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = false)))
    val pairs = ngramJaccardPairs(df, n, threshold).select(col("doc_a"), col("doc_b"))
    val (edges, edgeIds) = checkpointed(pairs
      .union(pairs.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b"))))
    var (labels, labelIds) = checkpointed(
      edges.select(col("doc_a").as("doc_id")).distinct()
        .withColumn("label", col("doc_id")))
    var converged = false
    var i = 0
    while (!converged && i < maxIters) {
      val nbrMin = edges
        .join(labels.select(col("doc_id").as("doc_b"), col("label").as("nl")), "doc_b")
        .groupBy(col("doc_a")).agg(min(col("nl")).as("mn"))
      // the old label rides along so the convergence probe is a filter on
      // this frame, not an extra join; the eager checkpoint materializes
      // the frame end-to-end, making the release of the previous round
      // safe, and the loop holds two label sets, ever
      val next0 = labels.withColumnRenamed("label", "old")
        .join(nbrMin.withColumnRenamed("doc_a", "doc_id"), Seq("doc_id"), "left")
        .select(col("doc_id"),
          least(col("old"), coalesce(col("mn"), col("old"))).as("label"),
          col("old"))
      if (i == 0)
        PlanCapture.record(
          "q64_dedup_clusters (one label-propagation round, pre-checkpoint)",
          next0)
      val (next, nextIds) = checkpointed(next0)
      val changed = next.filter(col("label") =!= col("old")).count()
      release(labelIds)
      labels = next.select(col("doc_id"), col("label"))
      labelIds = nextIds
      converged = changed == 0L
      i += 1
    }
    release(edgeIds)
    labels.select(col("doc_id"), col("label").as("cluster"))
  }

  /** Cluster chaining audit (q241) — the transitive-closure honesty
    * check on [[nearDupClusters]]: connected components chain A~B~C into
    * one cluster even when A and C are nothing alike, and at crawl scale
    * boilerplate bridges can weld unrelated documents into one giant
    * cluster whose min-id "survivor" then silently deletes distinct
    * content. Per multi-doc cluster (capped at `maxClusterSize` members
    * — the audit is pairwise; production triages bigger clusters
    * separately): exact Jaccard over EVERY intra-cluster pair (not just
    * the ≥ threshold edges that built the component — chained pairs can
    * share zero shingles), the minimum and mean pairwise similarity, the
    * fraction of pairs that are true edges, and the `chained` verdict
    * (some pair below threshold). A clean corpus shows frac_edges = 1;
    * chained = true rows are where survivor-based dedup over-deletes.
    *
    * Exactness: per-pair j₄ = ⌊c·10⁴/(nₐ+n_b−c)⌋ as BIGINT (c, n from
    * the shingle sets — q26's convention), min/sum exact, mean one
    * integer division. Scale shape: clusters are edge-participants only
    * and the pair fan-out is Σ size² bounded by the size cap; shingle
    * arrays join per pair (two equi-joins), everything else is
    * |clusters|-sized.
    */
  def clusterChainAudit(df: DataFrame, n: Int = 3, threshold: Double = 0.8,
      maxClusterSize: Int = 100): DataFrame = {
    val thr4 = math.round(threshold * 10000).toInt
    val clusters = nearDupClusters(df, n, threshold)
    val kept = clusters.groupBy(col("cluster"))
      .agg(count(lit(1)).as("size"))
      .filter(col("size") <= maxClusterSize)
    val m = clusters.join(broadcast(kept), "cluster")
    val pairs = m.as("a").join(m.as("b"),
        col("a.cluster") === col("b.cluster")
          && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.cluster").as("cluster"), col("a.size").as("size"),
        col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
    val sh = shingleArrays(df, n)
    val j = pairs
      .join(sh.select(col("doc_id").as("doc_a"), col("sh").as("sha")),
        "doc_a")
      .join(sh.select(col("doc_id").as("doc_b"), col("sh").as("shb")),
        "doc_b")
      .withColumn("c", size(array_intersect(col("sha"), col("shb")))
        .cast("long"))
      .withColumn("j4", expr(
        "c * 10000 div (size(sha) + size(shb) - c)"))
    j.groupBy(col("cluster"))
      .agg(first(col("size")).as("size"), count(lit(1)).as("n_pairs"),
        min(col("j4")).as("minj4"), sum(col("j4")).as("sumj4"),
        sum(when(col("j4") >= thr4, 1L).otherwise(0L)).as("n_edges"))
      .select(col("cluster"), col("size"), col("n_pairs"),
        (col("minj4").cast("double") / 1e4).as("min_jaccard"),
        (expr("sumj4 * 100 div n_pairs").cast("double") / 1e6)
          .as("avg_jaccard"),
        (expr("n_edges * 1000000 div n_pairs").cast("double") / 1e6)
          .as("frac_edges"),
        (col("minj4") < thr4).as("chained"))
  }

  /** Dedup SURVIVORS — the filtered corpus after near-dup clustering:
    * every document keeps its row unless it sits in a cluster and is not
    * that cluster's minimum doc_id (the canonical representative). This is
    * the final step of the dedup pipeline (pairs → clusters → survivors):
    * what actually feeds training. One left-anti join against the
    * (clusters-sized, i.e. tiny relative to the corpus) non-representative
    * set — broadcast-able at any scale.
    */
  /** Semantic deduplication over embeddings (the SemDeDup recipe, Abbas
    * et al. 2023): a vector is DROPPED iff some smaller-id vector lies
    * within the cosine threshold — the deterministic keep-the-first rule
    * applied to the EXACT near-dup pair set, so the output is
    * oracle-checkable against brute force. Returns the dropped set with
    * its chosen representative (`dup_of` = smallest such neighbor) and
    * the count of smaller near-neighbors; survivors are the complement.
    * Candidate generation is [[embeddingNearDups]] — k-means-cell-bounded
    * exact pairs, never all-pairs — so the scale shape is inherited:
    * work ∝ near-pair density, not corpus².
    */
  def semanticDropped(emb: DataFrame, threshold: Double): DataFrame =
    embeddingNearDups(emb, threshold)
      .groupBy(col("vec_b").as("vec_id"))
      .agg(min(col("vec_a")).as("dup_of"),
        count(lit(1)).cast("long").as("n_smaller_dups"))

  def survivors(df: DataFrame, n: Int = 3, threshold: Double = 0.8): DataFrame = {
    val dropped = nearDupClusters(df, n, threshold)
      .filter(col("doc_id") =!= col("cluster"))
      .select(col("doc_id"))
    df.join(dropped, Seq("doc_id"), "left_anti")
  }

  /** Near-dup survivors under a QUALITY policy — keep each cluster's BEST
    * member rather than [[survivors]]' minimum id. Min-id is the right
    * dedup-theoretic canonical (stable, order-free), but a curation
    * pipeline usually wants the best COPY: the crawl that kept its
    * paragraph breaks, not the first-seen one that lost them. Ranks each
    * cluster by (`scoreCol` desc, doc_id) — the id tiebreak keeps the
    * policy deterministic — and keeps rank 1; singletons (absent from the
    * cluster frame) survive untouched. Same shape as [[survivors]]: the
    * cluster frame is near-pair-participants-only (tiny in a cleaned
    * crawl), one ranking window over it, one broadcastable anti-join
    * against the non-survivor slice.
    */
  def survivorsBest(df: DataFrame, scoreCol: String, n: Int = 3,
      threshold: Double = 0.8): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cluster"))
      .orderBy(col(scoreCol).desc, col("doc_id"))
    val dropped = nearDupClusters(df, n, threshold)
      .join(df.select(col("doc_id"), col(scoreCol)), "doc_id")
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") =!= 1)
      .select(col("doc_id"))
    df.join(dropped, Seq("doc_id"), "left_anti")
  }

  /** MinHash + banded LSH: k per-row signature mins over the shingle array
    * (array_min ∘ transform — no explosion, no groupBy), band keys from
    * hashing signature slices, candidates from an equi-join on
    * (band, bandKey), then exact Jaccard verification of candidates only.
    *
    * Scale path: signatures are embarrassingly parallel; the only shuffles
    * are the band-bucket join and the candidate verification joins — at
    * 100 TB none of the stages is all-pairs, and the band key doubles as
    * the natural repartition key for bucket skew handling.
    */
  def minhashLshPairs(df: DataFrame, n: Int = 3, k: Int = 16, bands: Int = 4,
      threshold: Double = 0.8): DataFrame = {
    require(k % bands == 0, "k must divide into bands")
    // persisted for the same reasons as in ngramJaccardPairs: signature
    // build + two verification joins all read the shingle index
    val docs = shingleArrays(df, n)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val buckets = minhashBuckets(docs, k, bands)

    val cands = buckets.as("a").join(buckets.as("b"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey")
          && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()

    val out = verifyJaccard(cands, docs, threshold)
    // same eager-checkpoint + release as ngramJaccardPairs
    PlanCapture.record("q27_dedup_minhash (pre-checkpoint)", out)
    try out.localCheckpoint(true) finally docs.unpersist(blocking = false)
  }

  /** MinHash band buckets for a shingle-array frame (`doc_id`, `sh`):
    * k per-row signature mins (array_min ∘ transform — no explosion, no
    * shuffle), then one (band, bkey) row per band from hashing each
    * signature slice. Shared by [[minhashLshPairs]] (batch pair mining)
    * and [[IncrementalDedup]] (the persistent-index delta path) so the
    * two can never disagree on bucketing.
    */
  private[graft] def minhashBuckets(docs: DataFrame, k: Int, bands: Int): DataFrame = {
    require(k % bands == 0, "k must divide into bands")
    val rows = k / bands
    val sigCols = (0 until k).map(i =>
      array_min(transform(col("sh"), s => xxhash64(lit(i), s))).as(s"h$i"))
    val sig = docs.select(col("doc_id") +: sigCols: _*)
    val bandStructs = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        xxhash64((b * rows until (b + 1) * rows).map(i => col(s"h$i")): _*).as("bkey"))
    }
    sig.select(col("doc_id"), explode(array(bandStructs: _*)).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bkey").as("bkey"))
  }

  /** Modulus for the portable affine hash family: 2^31−1 (Mersenne prime).
    * Products stay ≤ (2k+1)·2^32 ≈ 2^38 — exact in BIGINT arithmetic in
    * both Spark and any ANSI SQL engine, which is the whole point.
    */
  private[graft] val PortableP = 2147483647L

  /** Base hash both engines compute bit-identically: the first 8 hex chars
    * of md5(s) read as an integer (Spark `conv(…,16,10)`; SQL
    * `CAST('0x'||… AS BIGINT)`). 32 bits — plenty for shingle identity at
    * verification-backed candidate generation.
    */
  private[graft] def portableHash32(s: Column): Column =
    conv(substring(md5(s), 1, 8), 16, 10).cast("long")

  /** Portable-hash twin of [[minhashLshPairs]] (q101): the identical
    * signature → band → candidate → exact-Jaccard pipeline, but over a
    * hash family a SQL oracle can replay bit-for-bit — base(s) =
    * [[portableHash32]], row hashes h_i = ((2i+3)·base + 7919·i + 1) mod
    * 2^31−1, band keys a base-31 polynomial fold of each signature slice.
    * q27 (seed-42 xxhash64) remains the production/scale variant (8-byte
    * hashed-tuple shingles, one fused codegen pass); its CORRECTNESS rows
    * were `no_oracle` only because DuckDB cannot replicate xxhash64 — this
    * twin closes that gap by hash-checking the ALGORITHM end-to-end under
    * an oracle-expressible family. Shingles here are the n-token STRINGS
    * (the oracle's representation), built row-locally with no explode;
    * the same LSH recall/candidate-bounding analysis applies unchanged.
    */
  def minhashLshPairsPortable(df: DataFrame, n: Int = 3, k: Int = 16,
      bands: Int = 4, threshold: Double = 0.8): DataFrame = {
    require(k % bands == 0, "k must divide into bands")
    val rows = k / bands
    // token array materialized at a projection boundary: inlining the
    // split into the per-position slice lambda would re-tokenize per
    // shingle — the O(tokens²)-per-row trap TextAnalysis.repetition
    // documents
    val w = col("_w")
    val shingleStrs = when(size(w) >= n,
        transform(sequence(lit(0), size(w) - n),
          i => concat_ws(" ", slice(w, i + lit(1), lit(n)))))
      .otherwise(array(concat_ws(" ", w)))
    // base hash computed once per distinct shingle, signatures from the
    // hashed array — still zero explosion, zero shuffle before banding
    val docs = df
      .withColumn("_w", filter(split(col("text"), " "), t => t =!= lit("")))
      .select(col("doc_id"), array_distinct(shingleStrs).as("sh"))
      .withColumn("hb", transform(col("sh"), s => portableHash32(s)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val sigCols = (0 until k).map(i =>
      array_min(transform(col("hb"),
        b => (b * lit(2L * i + 3) + lit(7919L * i + 1)) % lit(PortableP))).as(s"h$i"))
    val sig = docs.select(col("doc_id") +: sigCols: _*)

    def fold(cs: Seq[Column]): Column =
      cs.reduce((acc, h) => (acc * lit(31L) + h) % lit(PortableP))
    val bandStructs = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        fold((b * rows until (b + 1) * rows).map(i => col(s"h$i"))).as("bkey"))
    }
    val buckets = sig.select(col("doc_id"), explode(array(bandStructs: _*)).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bkey").as("bkey"))

    val cands = buckets.as("a").join(buckets.as("b"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey")
          && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()

    val out = verifyJaccard(cands, docs.select(col("doc_id"), col("sh")), threshold)
    PlanCapture.record("q101_minhash_portable (pre-checkpoint)", out)
    try out.localCheckpoint(true) finally docs.unpersist(blocking = false)
  }

  /** Edit-distance-verified near-dup pairs: the portable MinHash/LSH
    * candidate generator ([[minhashLshPairsPortable]] with the Jaccard
    * gate open) re-verified by LEVENSHTEIN similarity
    * 1 − lev(a,b)/max(|a|,|b|) — the gold-standard check where shingle
    * Jaccard is only a proxy (reorderings share every shingle yet read
    * differently; small in-place edits can shred shingles yet leave the
    * text 99% identical). The classic pipeline (e.g. RefinedWeb's
    * sequence-level verification): cheap sketch recall first, exact
    * O(|a|·|b|) dynamic programming only on the candidate pairs the
    * sketch admits — never corpus².
    *
    * Both output columns survive: `jaccard` (the sketch's own exact
    * verification) and `edit_sim`, so a caller can study sketch-vs-gold
    * disagreement; only `edit_sim` gates the output. Spark's codegen'd
    * `levenshtein` and DuckDB's built-in agree on character-level edits,
    * so the whole operator — candidates included — is oracle-replayable.
    *
    * 100 TB shape: identical to the portable LSH pipeline (row-local
    * shingling/signatures, band-bucket equi-join) plus two equi-joins to
    * fetch candidate texts; the DP cost is per-candidate and bounded by
    * document length, and the candidate list is the LSH-bounded set.
    */
  def editVerifiedNearDups(df: DataFrame, n: Int = 3, k: Int = 16,
      bands: Int = 4, minEditSim: Double = 0.8): DataFrame = {
    val cands = minhashLshPairsPortable(df, n, k, bands, threshold = 0.0)
    val texts = df.select(col("doc_id"), col("text"))
    cands
      .join(texts.select(col("doc_id").as("doc_a"), col("text").as("ta")), "doc_a")
      .join(texts.select(col("doc_id").as("doc_b"), col("text").as("tb")), "doc_b")
      .withColumn("lev", levenshtein(col("ta"), col("tb")).cast("long"))
      .withColumn("edit_sim", TextAnalysis.quant4(lit(1.0) -
        col("lev") / greatest(length(col("ta")), length(col("tb")), lit(1))))
      .filter(col("edit_sim") >= minEditSim)
      .select(col("doc_a"), col("doc_b"), col("jaccard"), col("lev"),
        col("edit_sim"))
  }

  /** Portable SimHash twin of [[simhash]] (q102): 60-bit signature — token
    * hash = the first 15 hex chars of md5(token) (60 bits, BIGINT-safe in
    * every engine); bit j is set iff the Σ±1 vote over token OCCURRENCES
    * is strictly positive, i.e. the classic frequency-weighted SimHash.
    * The production variant stays the row-local codegen'd SimHash64
    * expression (no explode, no shuffle); this twin takes the
    * explode+groupBy formulation — one equi-shuffle on doc_id — because
    * the oracle must observe the same per-token votes, and exists to
    * hash-check the signature construction end-to-end (q28's rows were
    * `no_oracle` purely for xxhash64 replicability).
    */
  def simhashPortable(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val toks = filter(split(col(textCol), " "), t => t =!= lit(""))
    val perTok = df.select(col(idCol).as("doc_id"), explode(toks).as("tok"))
      .select(col("doc_id"),
        conv(substring(md5(col("tok")), 1, 15), 16, 10).cast("long").as("h"))
    val sigExpr = (0 until 60).map { j =>
      (sum(when(col("h").bitwiseAND(lit(1L << j)) =!= 0L, 1L).otherwise(-1L)) > 0)
        .cast("long") * lit(1L << j)
    }.reduce(_ + _)
    perTok.groupBy(col("doc_id")).agg(sigExpr.as("simhash"))
  }

  /** 64-bit SimHash per document from whitespace tokens; near-dup pairs by
    * Hamming distance with 16-bit-chunk banding (a pair within distance d
    * over 4 chunks must share at least one exact chunk when d < 4... more
    * precisely any pair with ≤3 differing chunks is caught; standard
    * pigeonhole banding).
    */
  def simhash(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    // entirely row-local via the native codegen'd SimHash64 expression
    // (bit i set iff set-bit tokens strictly outnumber clear-bit ones —
    // identical to the Σ±1 > 0 vote). No explode, no shuffle: at 100 TB
    // the signature build scales with input splits. Token-less documents
    // are dropped (trim-length guard), matching the explode+groupBy
    // formulation's semantics.
    df.filter(length(trim(col(textCol))) > 0)
      .select(col(idCol).as("doc_id"),
        graft.functions.TextHashFunctions
          .simHash64(df.sparkSession, col(textCol)).as("simhash"))

  def simhashPairs(df: DataFrame, maxHamming: Int = 8): DataFrame = {
    val sh = simhash(df)
    val chunks = (0 until 4).map { j =>
      struct(lit(j).as("j"),
        shiftright(col("simhash"), j * 16).bitwiseAND(0xFFFFL).as("chunk"))
    }
    val bucketed = sh.select(col("doc_id"), col("simhash"),
      explode(array(chunks: _*)).as("c"))
      .select(col("doc_id"), col("simhash"), col("c.j").as("j"), col("c.chunk").as("chunk"))
    bucketed.as("a").join(bucketed.as("b"),
        col("a.j") === col("b.j") && col("a.chunk") === col("b.chunk")
          && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Deterministic mini-k-means (Lloyd) cell assignment on the unit
    * sphere: returns (vec_id, cell). Init = the k lowest-id vectors
    * (reproducible); each iteration is one broadcast-assignment map plus
    * one fully-distributed mean (posexplode → partial-aggregated
    * sum/count), so no step funnels a whole cell through one task.
    * Zero-norm vectors must be filtered by the caller.
    */
  private[graft] def kmeansCells(vecs: DataFrame, k: Int, iters: Int): DataFrame = {
    val spark = vecs.sparkSession
    import spark.implicits._
    val unit = vecs.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
      .map { case (id, v) =>
        val d = v.length
        val u = new Array[Double](d)
        var sq = 0.0
        var i = 0
        while (i < d) { sq += v(i).toDouble * v(i).toDouble; i += 1 }
        val n = math.sqrt(sq)
        i = 0
        while (i < d) { u(i) = v(i) / n; i += 1 }
        (id, u)
      }.toDF("vec_id", "u").cache()
    try {
      var centroids: Array[Array[Double]] = unit.orderBy(col("vec_id")).limit(k)
        .select(col("u")).as[Array[Double]].collect()

      def assigned: DataFrame = {
        val bc = spark.sparkContext.broadcast(centroids)
        unit.as[(Long, Array[Double])].map { case (id, u) =>
          val cs = bc.value
          var best = 0
          var bestDot = Double.NegativeInfinity
          var c = 0
          while (c < cs.length) {
            val cv = cs(c)
            var dot = 0.0
            var i = 0
            while (i < u.length) { dot += u(i) * cv(i); i += 1 }
            if (dot > bestDot) { bestDot = dot; best = c }
            c += 1
          }
          (id, best)
        }.toDF("vec_id", "cell")
      }

      var it = 0
      while (it < iters) {
        val means = assigned.join(unit, "vec_id")
          .select(col("cell"), posexplode(col("u")).as(Seq("pos", "x")))
          .groupBy(col("cell"), col("pos"))
          .agg(avg(col("x")).as("m"))
          .collect()
        val dim = centroids.head.length
        val next = centroids.map(_.clone())
        means.foreach { r =>
          next(r.getInt(0))(r.getInt(1)) = r.getDouble(2)
        }
        // renormalize so assignment stays a pure max-dot on the sphere
        next.indices.foreach { c =>
          val n = math.sqrt(next(c).map(x => x * x).sum)
          if (n > 0) (0 until dim).foreach(i => next(c)(i) /= n)
        }
        centroids = next
        it += 1
      }
      assigned
      // `unit` is released before the lazy `assigned` frame is consumed,
      // so the first downstream action recomputes normalization ONCE —
      // deliberate: the sole caller caches its packed projection
      // immediately, and holding the full normalized-vector cache across
      // the call boundary would pin input-sized blocks for no second use
    } finally unit.unpersist()
  }

  /** Embedding-cosine near-duplicates — EXACT, candidate-bounded.
    *
    * The verification kernel is unchanged from the block-nested-loop
    * formulation (flat primitive arrays, allocation-free JVM loop — the
    * row-pair `zip_with` formulation is ~30× slower since higher-order
    * expressions don't codegen), but block PAIRS are no longer all
    * (n/blockSize)²/2 combinations. Instead:
    *
    *   1. a deterministic mini-k-means groups vectors into spatial cells,
    *      capped into sub-blocks of ≤ blockSize;
    *   2. each block carries its mean vector and radius
    *      r = max‖uᵢ − mean‖ over its members' unit vectors;
    *   3. a pair of vectors can reach cos ≥ t only if their unit-vector
    *      distance is ≤ D = √(2−2t), so by the triangle inequality two
    *      blocks can contain a qualifying pair only if
    *      ‖m_A − m_B‖ ≤ D + r_A + r_B. Block pairs failing this bound are
    *      pruned BEFORE any vector data moves — the bound join touches
    *      only per-block metadata (centroid + radius), and the surviving
    *      pairs drive equi-joins on the packed blocks.
    *
    * Pruning is conservative (ε-slack on the bound), so the output is
    * bit-identical to the all-pairs scan; on clustered data the candidate
    * set collapses toward O(matching pairs), and in the worst case
    * (uniformly spread vectors, low threshold) it degrades to the full
    * block-pair set — never worse than the old plan. At 100 TB the heavy
    * joins are equi-joins on (cell, sub); the only non-equi join is over
    * B = n/blockSize metadata rows, bounded by the same k-means cells
    * (see SCALE.md). `Similarity.lshTopK` remains the approximate path
    * when even candidate-bounded exactness is too expensive.
    */
  def embeddingNearDups(emb: DataFrame, threshold: Double,
      blockSize: Int = 256, cells: Int = 0, kmeansIters: Int = 3): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._

    val base = emb.select(col("vec_id"), col("embedding"))
      .filter(aggregate(transform(col("embedding"),
        x => x * x), lit(0.0d), (acc, x) => acc + x) > 0)
    val n = base.count()
    if (n == 0) return spark.emptyDataFrame
      .select(lit(0L).as("vec_a"), lit(0L).as("vec_b"), lit(0.0).as("cos_sim"))
      .limit(0)
    val k = if (cells > 0) cells
      else math.max(1, math.ceil(math.sqrt(n.toDouble / blockSize)).toInt)

    // Spatial (k-means) grouping makes blocks tight so the radius bound
    // prunes hard — but costs a count, `kmeansIters` assignment passes and
    // a per-cell window. Below ~16 blocks that overhead exceeds the whole
    // all-pairs verify, and the bound still applies to ANY grouping, so
    // small inputs keep the zero-extra-job id-ranged blocks.
    val useKmeans = cells > 0 || n > blockSize.toLong * 16
    val withBlocks =
      if (useKmeans) {
        val assigned = kmeansCells(base, k, kmeansIters)
        // cap cell size: sub-blocks of ≤ blockSize, stable order by id
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("cell")).orderBy(col("vec_id"))
        base.join(assigned, "vec_id")
          .withColumn("sub", ((row_number().over(w) - 1) / blockSize).cast("int"))
      } else {
        base.withColumn("cell", (col("vec_id") / blockSize).cast("int"))
          .withColumn("sub", lit(0))
      }

    val packed = withBlocks
      .select(col("cell"), col("sub"), col("vec_id"), col("embedding"))
      .as[(Int, Int, Long, Array[Float])]
      .groupByKey { case (cell, sub, _, _) => (cell, sub) }
      .mapGroups { (key: (Int, Int), it: Iterator[(Int, Int, Long, Array[Float])]) =>
        val (cell, sub) = key
        val rows = it.map { case (_, _, id, v) => (id, v) }.toArray.sortBy(_._1)
        val m = rows.length
        val dim = rows.head._2.length
        val ids = new Array[Long](m)
        val flat = new Array[Double](m * dim)
        val norms = new Array[Double](m)
        val mean = new Array[Double](dim)
        var i = 0
        while (i < m) {
          ids(i) = rows(i)._1
          val v = rows(i)._2
          var kk = 0
          var sq = 0.0
          while (kk < dim) {
            val x = v(kk).toDouble
            flat(i * dim + kk) = x
            sq += x * x
            kk += 1
          }
          norms(i) = math.sqrt(sq)
          kk = 0
          while (kk < dim) { mean(kk) += flat(i * dim + kk) / norms(i) / m; kk += 1 }
          i += 1
        }
        var radius = 0.0
        i = 0
        while (i < m) {
          var sq = 0.0
          var kk = 0
          while (kk < dim) {
            val d = flat(i * dim + kk) / norms(i) - mean(kk)
            sq += d * d
            kk += 1
          }
          radius = math.max(radius, math.sqrt(sq))
          i += 1
        }
        (cell, sub, dim, ids, flat, norms, mean, radius)
      }
      .toDF("cell", "sub", "dim", "ids", "flat", "norms", "mean", "radius")
      .cache()

    val candidates = candidateBlockPairs(
      packed.select(col("cell"), col("sub"), col("mean"), col("radius")), threshold)

    val pa = packed.select(col("cell").as("ca"), col("sub").as("sa"),
      col("dim"), col("ids").as("aIds"), col("flat").as("aFlat"), col("norms").as("aNorms"))
    val pb = packed.select(col("cell").as("cb"), col("sub").as("sb"),
      col("ids").as("bIds"), col("flat").as("bFlat"), col("norms").as("bNorms"))
    val pairs = candidates
      .join(pa, Seq("ca", "sa"))
      .join(pb, Seq("cb", "sb"))
      .select(col("same"), col("dim"),
        col("aIds"), col("aFlat"), col("aNorms"),
        col("bIds"), col("bFlat"), col("bNorms"))
      // spread block pairs across tasks (the candidate join itself is tiny)
      .repartition(col("aIds"), col("bIds"))

    val preFilter = threshold - 1e-4 // cheap bound; exact round only near it
    val out = pairs.flatMap { row =>
      val same = row.getBoolean(0)
      val dim = row.getInt(1)
      val aIds = row.getSeq[Long](2).toArray
      val aFlat = row.getSeq[Double](3).toArray
      val aNorms = row.getSeq[Double](4).toArray
      val bIds = row.getSeq[Long](5).toArray
      val bFlat = row.getSeq[Double](6).toArray
      val bNorms = row.getSeq[Double](7).toArray
      val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
      var i = 0
      while (i < aIds.length) {
        var j = if (same) i + 1 else 0
        while (j < bIds.length) {
          var dot = 0.0
          var k = 0
          while (k < dim) {
            dot += aFlat(i * dim + k) * bFlat(j * dim + k)
            k += 1
          }
          val cos = dot / (aNorms(i) * bNorms(j))
          if (cos >= preFilter) {
            // mirror Spark's round(HALF_UP) exactly for the oracle compare
            val q = BigDecimal(cos)
              .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
            if (q >= threshold) {
              // blocks are not id-ranged: canonicalize the pair order
              val (lo, hi) = if (aIds(i) < bIds(j)) (aIds(i), bIds(j))
                             else (bIds(j), aIds(i))
              buf += ((lo, hi, q))
            }
          }
          j += 1
        }
        i += 1
      }
      buf
    }.toDF("vec_a", "vec_b", "cos_sim")
    // Materialize eagerly so `packed` can be released here: a lazy return
    // would pin the cached block data in executor storage for the session
    // lifetime. The checkpoint holds only the qualifying pairs (output-
    // sized, not input-sized) and is ContextCleaner-reclaimed once the
    // returned frame is unreferenced.
    PlanCapture.record("q29_embed_neardup (pre-checkpoint)", out)
    try out.localCheckpoint(true) finally packed.unpersist()
  }

  /** Winnowing fingerprints (Schleimer, Wilkerson & Aiken, the MOSS
    * algorithm): per document, hash every word k-gram, slide a window of
    * `w` consecutive hashes, and select each window's minimum — RIGHTMOST
    * on ties, the "robust" rule that minimizes re-selections between
    * overlapping windows. The guarantee that makes this the standard
    * local fingerprinting scheme: any shared substring of at least
    * k + w − 1 words between two documents is caught by at least one
    * COMMON selected fingerprint, while density stays ~2/(w+1) of
    * positions — a tunable, position-robust sketch (unlike [[TextAnalysis]]'
    * whole-doc rolling hash, a single global value).
    *
    * Everything up to the output is row-local array math (the token array
    * and hash array each materialize ONCE at projection boundaries — the
    * O(tokens²) re-tokenization trap documented at
    * [[minhashLshPairsPortable]] applies here too); the per-window slice
    * costs O(m·w) comparisons with w small and constant. Hashes are
    * [[portableHash32]], so the full chain — including the rightmost-tie
    * rule — replays in a SQL oracle.
    *
    * Output: one row per distinct selected (doc_id, pos, fp), pos 0-based
    * over the k-gram positions. Documents shorter than k words fingerprint
    * their whole text as a single 1-gram-style hash at pos 0; documents
    * with fewer than w k-grams get the minimum over what exists (the spec
    * behavior for short tails).
    */
  def winnowFingerprints(df: DataFrame, k: Int = 5, w: Int = 4,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val tw = col("_w")
    val grams = when(size(tw) >= k,
        transform(sequence(lit(0), size(tw) - k),
          i => portableHash32(concat_ws(" ", slice(tw, i + lit(1), lit(k))))))
      .otherwise(array(portableHash32(concat_ws(" ", tw))))
    val hs = col("hs")
    val m = size(hs)
    val starts = when(m >= w, sequence(lit(0), m - w)).otherwise(array(lit(0)))
    val win = col("win")
    val mn = array_min(win)
    // rightmost position of the window minimum (robust winnowing tie rule)
    val selInWin = array_max(filter(sequence(lit(0), size(win) - 1),
      p => element_at(win, p + 1) === mn))
    df.select(col(idCol).as("doc_id"),
        filter(split(col(textCol), " "), t => t =!= lit("")).as("_w"))
      .filter(size(col("_w")) > 0)
      .select(col("doc_id"), grams.as("hs"))
      .select(col("doc_id"), hs, explode(starts).as("j"))
      .withColumn("win", slice(hs, col("j") + 1, least(lit(w), m)))
      .select(col("doc_id"), (col("j") + selInWin).cast("long").as("pos"),
        element_at(hs, col("j") + selInWin + 1).as("fp"))
      .distinct()
  }

  /** Cross-document fingerprint overlap — the MOSS report: pairs of
    * documents sharing at least `minShared` distinct winnowing
    * fingerprints, with the shared count. The join is an equi-join on the
    * fingerprint value (bucketable, never all-pairs), and ubiquitous
    * fingerprints — boilerplate that would explode the join quadratically
    * in its bucket — are dropped FIRST by a document-frequency cap, the
    * same frequency-pruning argument PPJoin's prefix filter makes: a
    * fingerprint in > `maxDf` documents identifies boilerplate, not
    * plagiarism, and contributes pairs at O(df²). At 100 TB the df cap is
    * what keeps the pair fan-out linear in true overlap.
    */
  def winnowOverlapPairs(df: DataFrame, k: Int = 5, w: Int = 4,
      minShared: Int = 3, maxDf: Int = 100): DataFrame = {
    val fps = winnowFingerprints(df, k, w)
      .select(col("doc_id"), col("fp")).distinct()
      .localCheckpoint(true) // one fingerprint pass feeds df-cap AND join
    val rare = fps.groupBy(col("fp"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf && col("df") >= 2)
      .select(col("fp"))
    val pruned = fps.join(rare, Seq("fp"))
    pruned.as("a").join(pruned.as("b"),
        col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** The triangle-inequality block-pair filter, exposed for plan/spec
    * inspection: given per-block stats (cell, sub, mean, radius), returns
    * the (ca, sa, cb, sb, same) pairs that COULD hold a cos ≥ threshold
    * pair. Metadata-only — B rows per side, never vector data.
    */
  private[graft] def candidateBlockPairs(stats: DataFrame, threshold: Double): DataFrame = {
    val maxDist = math.sqrt(math.max(0.0, 2.0 - 2.0 * threshold)) + 1e-9
    val a = stats.select(col("cell").as("ca"), col("sub").as("sa"),
      col("mean").as("ma"), col("radius").as("ra"))
    val b = stats.select(col("cell").as("cb"), col("sub").as("sb"),
      col("mean").as("mb"), col("radius").as("rb"))
    val ordered = (col("ca") < col("cb")) ||
      (col("ca") === col("cb") && col("sa") <= col("sb"))
    val centroidDist = sqrt(aggregate(
      zip_with(col("ma"), col("mb"), (x, y) => (x - y) * (x - y)),
      lit(0.0d), (acc, x) => acc + x))
    a.join(b, ordered && centroidDist <= lit(maxDist) + col("ra") + col("rb"))
      .select(col("ca"), col("sa"), col("cb"), col("sb"),
        (col("ca") === col("cb") && col("sa") === col("sb")).as("same"))
  }

  /** LSH band-tuning table (q228) — the parameter-selection report
    * behind every MinHash deployment: for each banding of a k-hash
    * signature, the measured candidate volume (the COST: pairs the
    * verifier must score) against the measured recall of true
    * near-dup pairs (the QUALITY: banding theory says a pair at
    * similarity s survives with p = 1−(1−s^r)^b, so fewer, longer
    * bands are cheap and blind; more, shorter bands are thorough and
    * expensive). Ground truth is the exact prefix-filtered Jaccard
    * join — this table is how you pick bands for YOUR corpus instead
    * of trusting the formula's iid assumptions.
    *
    * Driver-side loop over |bandConfigs| (bounded, documented). The
    * shingle sets, base hashes, and 16-column signature table are
    * computed ONCE and persisted — per config only the (cheap) banding
    * fold, the bucket self-join, and candidate verification at
    * threshold 0 run, so n_cand and n_found come from the same frame.
    * recall₆ is an exact integer millionth; found ⊆ true by
    * construction (same shingle sets, same quantized Jaccard), so
    * recall ≤ 1 always.
    */
  def lshTuningTable(df: DataFrame, n: Int = 3, k: Int = 16,
      bandConfigs: Seq[Int] = Seq(2, 4, 8),
      threshold: Double = 0.8): DataFrame = {
    require(bandConfigs.nonEmpty && bandConfigs.forall(k % _ == 0))
    val spark = df.sparkSession
    import spark.implicits._
    val truth = ngramJaccardPairs(df, n, threshold)
    val nTrue = truth.count()
    // shared signature chain (the expensive part), once for all configs
    val w = col("_w")
    val shingleStrs = when(size(w) >= n,
        transform(sequence(lit(0), size(w) - n),
          i => concat_ws(" ", slice(w, i + lit(1), lit(n)))))
      .otherwise(array(concat_ws(" ", w)))
    val docs = df
      .withColumn("_w", filter(split(col("text"), " "), t => t =!= lit("")))
      .select(col("doc_id"), array_distinct(shingleStrs).as("sh"))
      .withColumn("hb", transform(col("sh"), s => portableHash32(s)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sigCols = (0 until k).map(i =>
      array_min(transform(col("hb"),
        b => (b * lit(2L * i + 3) + lit(7919L * i + 1)) % lit(PortableP)))
        .as(s"h$i"))
    val sig = docs.select(col("doc_id") +: sigCols: _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // round-13 (guide §1.4/§2.6): per config, n_cand and n_found were
      // two separate .count() actions over an UNCACHED verification frame
      // — the bucket self-join and exact verification ran twice per
      // config. They are now ONE aggregation (count + conditional count
      // over the same pass), and the independent per-config probes run as
      // overlapped driver threads against the shared persisted signature
      // table (concurrent first-touch of a persisted partition is safe:
      // BlockManager's per-block locks make one thread compute and the
      // others wait on the stored block). Counts are exact either way —
      // the report is unchanged.
      val pool = java.util.concurrent.Executors
        .newFixedThreadPool(bandConfigs.length)
      val futs = bandConfigs.sorted.map { b =>
        val rowsPer = k / b
        def fold(cs: Seq[Column]): Column =
          cs.reduce((acc, h) => (acc * lit(31L) + h) % lit(PortableP))
        val bandStructs = (0 until b).map { bb =>
          struct(lit(bb).as("band"),
            fold((bb * rowsPer until (bb + 1) * rowsPer)
              .map(i => col(s"h$i"))).as("bkey"))
        }
        scala.concurrent.Future {
          val buckets = sig
            .select(col("doc_id"), explode(array(bandStructs: _*)).as("bb"))
            .select(col("doc_id"), col("bb.band").as("band"),
              col("bb.bkey").as("bkey"))
          val cands = buckets.as("a").join(buckets.as("b"),
              col("a.band") === col("b.band")
                && col("a.bkey") === col("b.bkey")
                && col("a.doc_id") < col("b.doc_id"))
            .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
            .distinct()
          val verified = verifyJaccard(cands,
            docs.select(col("doc_id"), col("sh")), threshold = 0.0)
          val counts = verified.agg(count(lit(1)).as("nc"),
            count(when(col("jaccard") >= threshold, 1)).as("nf")).head()
          val (nCand, nFound) = (counts.getLong(0), counts.getLong(1))
          val recall =
            if (nTrue == 0L) 1.0
            else (nFound * 1000000L / nTrue).toDouble / 1e6
          (b.toLong, (k / b).toLong, nTrue, nCand, nFound, recall)
        }(scala.concurrent.ExecutionContext.fromExecutorService(pool))
      }
      val rows =
        try futs.map(f => scala.concurrent.Await.result(
          f, scala.concurrent.duration.Duration.Inf))
        finally pool.shutdown()
      rows.toDF("bands", "rows_per_band", "n_true", "n_cand", "n_found",
        "recall")
    } finally {
      sig.unpersist(blocking = false)
      docs.unpersist(blocking = false)
    }
  }

  /** Dedup ROI report (q277) — the DECISION read on top of
    * [[nearDupClusters]]: before running a corpus-wide dedup rewrite,
    * what does it actually buy? Per CLUSTER SIZE: how many clusters,
    * how many duplicate documents a survivors-only policy drops, and
    * how many words that saves (the q66 survivor convention — each
    * cluster keeps its minimum doc_id, which is exactly the cluster id
    * [[nearDupClusters]] assigns, so the survivor's cost is one join on
    * the cluster id, no ranking window). Singletons appear as the
    * size-1 row with zero savings — the report is a complete census of
    * the corpus, not just the clustered slice; `saved_share` is each
    * size's words_saved over the WHOLE corpus word count.
    *
    * Scale: the cluster pass is [[nearDupClusters]]'s (prefix-filtered
    * pairs + label propagation); the report itself is one left join of
    * the per-doc word counts against the cluster labels, one
    * cluster-keyed aggregation, one size-keyed aggregation — all
    * equi-shuffles, output ≤ max-cluster-size rows.
    */
  def dedupRoi(df: DataFrame, n: Int = 3, threshold: Double = 0.8)
      : DataFrame = {
    val clusters = nearDupClusters(df, n, threshold)
    val words = df.select(col("doc_id"),
      size(TextAnalysis.wsTokens(col("text"))).cast("long").as("nw"))
    val labeled = words
      .join(clusters, Seq("doc_id"), "left")
      .withColumn("cluster", coalesce(col("cluster"), col("doc_id")))
    val perCluster = labeled.groupBy(col("cluster"))
      .agg(count(lit(1)).as("s"), sum(col("nw")).as("total_w"))
      .join(words.select(col("doc_id").as("cluster"),
        col("nw").as("surv_w")), Seq("cluster"))
    val corpus = words.agg(sum(col("nw")).as("corpus_w"))
    perCluster.groupBy(col("s").as("cluster_size"))
      .agg(count(lit(1)).as("n_clusters"),
        sum(col("s")).as("n_docs"),
        sum(col("s") - 1L).as("n_dup_docs"),
        sum(col("total_w")).as("words_total"),
        sum(col("total_w") - col("surv_w")).as("words_saved"))
      .crossJoin(broadcast(corpus))
      .select(col("cluster_size"), col("n_clusters"), col("n_docs"),
        col("n_dup_docs"), col("words_total"), col("words_saved"),
        when(col("corpus_w") > 0,
          expr("words_saved * 1000000 div corpus_w")
            .cast("double") / 1e6).as("saved_share"))
  }
}
