package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-preparation operators beyond dedup: text normalization,
  * vocabulary building, n-gram statistics, benchmark decontamination, and
  * PII-pattern scanning. All pure DataFrame plans; the heavy ones
  * (decontamination) are equi-joins on hashed n-grams — the same
  * inverted-index shape as Dedup, never all-pairs.
  */
object CorpusOps {

  /** Canonical text normalization: lowercase, collapse whitespace, strip
    * leading/trailing space. (Unicode NFC would slot in here via
    * java.text.Normalizer in a mapPartitions stage; the test corpus is
    * ASCII so expressions suffice.)
    */
  def normalizeExpr(text: Column): Column =
    trim(regexp_replace(lower(text), "\\s+", " "))

  /** Corpus vocabulary: token → frequency, descending. */
  def vocabulary(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(explode(TextAnalysis.wsTokens(col(textCol))).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("freq"))

  /** Word bigram counts (order-sensitive n-gram statistics). The token
    * array is materialized at a projection boundary so the per-position
    * slice references an attribute, not a re-run of split+filter
    * (the O(tokens²)-per-row trap [[TextAnalysis.repetition]] documents).
    */
  def bigrams(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val w = col("_w")
    val grams = when(size(w) >= 2, TextAnalysis.wordNgrams(w, 2))
      .otherwise(array())
    docs.withColumn("_w", TextAnalysis.wsTokens(col(textCol)))
      .select(explode(grams).as("bigram"))
      .groupBy(col("bigram"))
      .agg(count(lit(1)).as("freq"))
  }

  /** Benchmark decontamination: flag corpus documents sharing any word
    * n-gram with a benchmark set — the standard eval-leak check before
    * training. One equi-join on hashed shingles; cost scales with shingle
    * collisions, not corpus².
    */
  def contaminated(corpus: DataFrame, benchmark: DataFrame, n: Int = 8): DataFrame = {
    val corpusSh = Dedup.shingles(corpus, n)
    val benchSh = Dedup.shingles(benchmark, n)
      .select(col("s")).distinct()
    corpusSh.join(benchSh, Seq("s"), "left_semi")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shared_ngrams"))
  }

  /** Eval-integrity report — the REVERSE direction of [[contaminated]]:
    * per BENCHMARK document, how much of it the training corpus has
    * already seen (distinct n-grams, exposed count, exposure fraction).
    * [[contaminated]] tells you which training docs to drop; this tells
    * you which EVAL items are compromised and by how much — the report
    * read before trusting a benchmark score, because a 0.9-exposed item
    * measures memorization whatever the corpus-side cleanup did.
    *
    * Shape at scale: the benchmark gram set broadcasts; the corpus gram
    * stream is filtered by a broadcast LEFT SEMI join (no corpus-side
    * shuffle), and only the matched grams — bounded by the benchmark's
    * own distinct-gram count — reach the distinct + report join.
    */
  def benchmarkExposure(corpus: DataFrame, benchmark: DataFrame,
      n: Int = 8): DataFrame = {
    val benchSh = Dedup.shingles(benchmark, n)
    val benchSet = benchSh.select(col("s")).distinct()
    val exposed = Dedup.shingles(corpus, n).select(col("s"))
      .join(broadcast(benchSet), Seq("s"), "left_semi")
      .distinct()
    benchSh.join(exposed.withColumn("hit", lit(1L)), Seq("s"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("long").as("n_grams"),
        coalesce(sum(col("hit")), lit(0L)).cast("long").as("n_exposed"))
      .withColumn("exposure_frac",
        TextAnalysis.quant4(col("n_exposed").cast("double") / col("n_grams")))
  }

  /** Scale path for [[contaminated]]: identical output, bloom-prefiltered
    * probe side. The benchmark shingle set is folded into a single Bloom
    * filter (Spark's own `BloomFilterAggregate`, the sketch behind AQE
    * runtime filters), shipped to every task as a literal, and applied as
    * a codegen'd `might_contain` predicate BEFORE the exact semi-join —
    * so the shuffle that feeds the join carries only bloom hits
    * (true matches + an fpp-bounded trickle of false positives) instead
    * of every corpus shingle. The exact semi-join then removes the false
    * positives, keeping the output bit-identical to [[contaminated]].
    * At 100 TB this is the difference between shuffling the corpus's
    * whole shingle stream and shuffling ~the contaminated slice: the
    * bloom is O(benchmark) bits regardless of corpus size.
    */
  def contaminatedBloom(corpus: DataFrame, benchmark: DataFrame, n: Int = 8,
      expectedItems: Long = 4L * 1000 * 1000, fpp: Double = 0.03): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.graft.SparkInternals.{columnOf, expressionOf}
    import org.apache.spark.sql.types.BinaryType
    import org.apache.spark.util.sketch.BloomFilter

    val corpusSh = Dedup.shingles(corpus, n)
    val benchSh = Dedup.shingles(benchmark, n).select(col("s")).distinct()
    val numBits = BloomFilter.optimalNumOfBits(expectedItems, fpp)
    // One distributed aggregation builds the filter; the resulting bytes
    // are a driver-side constant (same lifecycle as a broadcast dim).
    val bloomAgg = new BloomFilterAggregate(expressionOf(col("s")),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression()
    val bfBytes = benchSh.agg(columnOf(bloomAgg).as("bf")).head().getAs[Array[Byte]]("bf")
    val prefiltered =
      if (bfBytes == null) corpusSh.filter(lit(false)) // empty benchmark
      else corpusSh.filter(columnOf(BloomFilterMightContain(
        Literal(bfBytes, BinaryType), expressionOf(col("s")))))
    prefiltered.join(benchSh, Seq("s"), "left_semi")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shared_ngrams"))
  }

  /** Deterministic train/val/test assignment from pure integer arithmetic
    * (a Knuth multiplicative hash of the id) — reproducible across engines,
    * runs, and partitionings, with no RNG state to ship. Thresholds are
    * percentages: (80, 10) → 80% train, 10% val, 10% test.
    */
  /** The shared multiplicative id-hash: Knuth multiplier over an id
    * pre-reduced to 31 bits. The pre-reduction keeps the product inside
    * a signed 64-bit range ((2^31-1) * 2654435761 < 2^63), so the SAME
    * arithmetic evaluates identically in Spark and in SQL engines whose
    * BIGINT multiply raises on overflow instead of wrapping (DuckDB) —
    * without it, ids above ~3.4e9 would wrap here and error there.
    * Assumes non-negative ids (engines disagree on % of negatives).
    */
  private[operators] def idHash(id: Column): Column =
    pmod(pmod(id, lit(2147483648L)) * 2654435761L, lit(2147483647L))

  def splitExpr(id: Column, trainPct: Int = 80, valPct: Int = 10): Column = {
    val bucket = idHash(id) % 100
    when(bucket < trainPct, "train")
      .when(bucket < trainPct + valPct, "val")
      .otherwise("test")
  }

  /** Deterministic stratified sampling: keep `pctByStratum(stratum)`% of
    * each stratum (`defaultPct` elsewhere), decided by the same Knuth
    * multiplicative id-hash as [[splitExpr]] — reproducible across
    * engines, runs, and partitionings, and composable with it (different
    * multiplier usage patterns stay independent enough for rebalancing).
    * The class-rebalancing sampler of a training pipeline: per-row filter,
    * no shuffle, scales with input splits.
    */
  def stratifiedSample(df: DataFrame, strataCol: String,
      pctByStratum: Map[String, Int], defaultPct: Int,
      idCol: String = "doc_id"): DataFrame = {
    val bucket = idHash(col(idCol)) % 100
    val pct = pctByStratum.toSeq.sortBy(_._1)
      .foldLeft(lit(defaultPct)) { case (acc, (k, p)) =>
        when(col(strataCol) === k, lit(p)).otherwise(acc)
      }
    df.filter(bucket < pct)
  }

  /** Inverse-frequency class weights: weight(c) = total / (k * count(c)) —
    * the standard balancing factor for skewed label distributions.
    */
  def classWeights(df: DataFrame, labelCol: String): DataFrame = {
    val counts = df.groupBy(col(labelCol)).agg(count(lit(1)).as("cnt"))
    val totals = counts.agg(sum(col("cnt")).as("total"), count(lit(1)).as("k"))
    counts.crossJoin(totals)
      .withColumn("weight",
        TextAnalysis.quant4(col("total").cast("double") / (col("k") * col("cnt"))))
      .select(col(labelCol), col("cnt"), col("weight"))
  }

  /** Cross-source n-gram overlap matrix: for each unordered source pair,
    * the number of DISTINCT word n-gram shingles appearing in both — the
    * corpus-mixing diagnostic (template reuse, syndication, eval-set
    * bleed between slices) run before fixing a training mixture.
    * Inverted-index shape: per-doc shingles join the doc→source map,
    * collapse to distinct (source, shingle), then self-equi-join on the
    * 8-byte shingle hash with `source_a < source_b`. The distinct
    * (source, shingle) relation is bounded by |sources|×|vocabulary|,
    * not corpus size, so the pair join never sees document cardinality.
    */
  def sourceOverlap(docs: DataFrame, n: Int = 3,
      srcCol: String = "source"): DataFrame = {
    val srcOf = docs.select(col("doc_id"), col(srcCol).as("src"))
    val bySrc = Dedup.shingles(docs, n)
      .join(srcOf, Seq("doc_id"))
      .select(col("src"), col("s")).distinct()
    bySrc.as("a").join(bySrc.as("b"),
        col("a.s") === col("b.s") && col("a.src") < col("b.src"))
      .groupBy(col("a.src").as("source_a"), col("b.src").as("source_b"))
      .agg(count(lit(1)).as("n_shared"))
  }

  /** Boilerplate prevalence per document: the fraction of a document's
    * distinct n-gram shingles whose corpus document-frequency is at
    * least `minDf` — the C4/RefinedWeb-style signal for template text
    * (navigation chrome, legal footers) a training pipeline strips or
    * down-weights. Two inverted-index passes over (doc, shingle) rows —
    * one aggregation for document frequency, one semi-join back — both
    * shuffling 8-byte hash keys; the shingle relation is persisted so
    * the two passes share one tokenization scan.
    */
  def boilerplate(docs: DataFrame, n: Int = 3, minDf: Int = 20): DataFrame = {
    val sh = Dedup.shingleArrays(docs, n)
      .select(col("doc_id"), size(col("sh")).cast("long").as("n_shingles"),
        explode(col("sh")).as("s"))
      .persist()
    val common = sh.groupBy(col("s"))
      .agg(count(lit(1)).as("df"))   // shingles are distinct per doc → df
      .filter(col("df") >= minDf)
      .select(col("s"))
    val boiler = sh.join(common, Seq("s"), "left_semi")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_boiler"))
    val out = sh.select(col("doc_id"), col("n_shingles")).distinct()
      .join(boiler, Seq("doc_id"), "left")
      .withColumn("n_boiler", coalesce(col("n_boiler"), lit(0L)))
      .withColumn("boiler_frac",
        TextAnalysis.quant4(col("n_boiler").cast("double") / col("n_shingles")))
    out.count() // materialize while sh is pinned, then release the pin
    sh.unpersist()
    out
  }

  /** Inter-document duplicated-span analysis (the corpus-level signal
    * behind exact-substring dedup à la Lee et al. 2022): for every
    * document, how many of its distinct word n-gram spans also occur in
    * at least one OTHER document, and the resulting duplication fraction.
    * High `dup_frac` marks boilerplate/mirror content a pipeline trims
    * before training.
    *
    * Shape at scale: span sets are built row-locally (hashed shingle
    * arrays — no string n-grams ever shuffle), then ONE aggregation on
    * the span hash computes global document-frequency and ONE join back
    * distributes it; both are equi-shuffles on the span hash, so cost is
    * O(total spans), never corpus². The hash join carries 16 bytes/row,
    * not the n-gram text.
    */
  def dupSpans(docs: DataFrame, n: Int = 8): DataFrame = {
    val sh = Dedup.shingles(docs, n) // distinct per document by construction
    val df = sh.groupBy(col("s")).agg(count(lit(1)).as("ndocs"))
    sh.join(df, Seq("s"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("long").as("n_spans"),
        sum(when(col("ndocs") > 1, 1L).otherwise(0L)).cast("long").as("n_dup_spans"))
      .withColumn("dup_frac", TextAnalysis.quant4(
        col("n_dup_spans").cast("double") / col("n_spans")))
  }

  /** Exact-substring dedup REMOVAL (the surgery [[dupSpans]] only
    * measures): excise every token covered by a word n-gram span that
    * also occurs in at least one OTHER document — Lee et al. 2022's
    * ExactSubstr policy at word granularity. Emits per document the
    * original token count, how many tokens were removed, and the md5 of
    * the surviving text (fully-duplicated documents collapse to the
    * empty string).
    *
    * Shape at scale: per-start span hashes are built row-locally from a
    * materialized token array (projection boundary — the documented
    * alias-inlining trap would otherwise re-tokenize per position), the
    * duplicated-span set is ONE aggregation on the span hash, coverage
    * expansion is a generate bounded by n·|dup starts|, and the excision
    * itself is an ANTI-JOIN on (doc_id, position) — O(tokens + covered),
    * never per-doc quadratic scans. All shuffles are equi-shuffles on
    * hash/ids; nothing is corpus².
    */
  /** (doc_id, w, len) token frame + (doc_id, len, i, h) span-start table
    * for the excision operators — the span table is the working set both
    * the hash-selection side and the coverage expansion read, so it is
    * persisted (caller releases after materializing the result).
    */
  private def spanTables(docs: DataFrame, n: Int,
      textCol: String = "text"): (DataFrame, DataFrame) = {
    val dm = docs
      .select(col("doc_id"), TextAnalysis.wsTokens(col(textCol)).as("w"))
      .select(col("doc_id"), col("w"), size(col("w")).as("len"))
    val starts = dm
      .select(col("doc_id"), col("len"), col("w"),
        explode(sequence(lit(1), greatest(col("len") - (n - 1), lit(1)))).as("i"))
      .select(col("doc_id"), col("len"), col("i"),
        xxhash64(array_join(slice(col("w"), col("i"), lit(n)), " ")).as("h"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    (dm, starts)
  }

  /** Shared excision tail: expand the selected span hashes to covered
    * token positions, anti-join the token stream, reassemble per doc.
    */
  private def exciseSpans(dm: DataFrame, starts: DataFrame,
      spanHashes: DataFrame, n: Int): DataFrame = {
    val covered = starts.join(spanHashes, Seq("h"), "left_semi")
      .select(col("doc_id"),
        explode(sequence(col("i"), least(col("i") + (n - 1), col("len")))).as("j"))
      .distinct()
    val toks = dm
      .select(col("doc_id"), posexplode(col("w")))
      .select(col("doc_id"), (col("pos") + 1).as("j"), col("col").as("tok"))
    val kept = toks.join(covered, Seq("doc_id", "j"), "left_anti")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("long").as("n_kept"),
        md5(array_join(transform(
          array_sort(collect_list(struct(col("j"), col("tok")))),
          x => x.getField("tok")), " ")).as("clean_md5"))
    dm.select(col("doc_id"), col("len").cast("long").as("n_tokens"))
      .join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        (col("n_tokens") - coalesce(col("n_kept"), lit(0L))).as("n_removed"),
        coalesce(col("clean_md5"), md5(lit(""))).as("clean_md5"))
  }

  def removeDupSpans(docs: DataFrame, n: Int = 8): DataFrame = {
    val (dm, starts) = spanTables(docs, n)
    val dupH = starts.groupBy(col("h"))
      .agg(countDistinct(col("doc_id")).as("ndocs"))
      .filter(col("ndocs") > 1)
      .select(col("h"))
    val out = exciseSpans(dm, starts, dupH, n)
    // materialize (output is one compact row per doc), then release the pin
    PlanCapture.record("q88_span_removal (pre-checkpoint)", out)
    try out.localCheckpoint(true) finally starts.unpersist(blocking = false)
  }

  /** Boilerplate span EXCISION — the removal complement of
    * [[boilerplate]]'s prevalence report: every n-gram window appearing
    * in at least `dfFrac` of the corpus' documents (cookie banners,
    * navigation menus, license footers — template text no model should
    * train on at crawl multiplicity) is expanded to its covered
    * positions and removed from EVERY document, which is what
    * distinguishes it from [[lineDedup]] (keeps one canonical copy) and
    * from [[removeDupSpans]] (any cross-doc duplication, df ≥ 2 — here
    * the threshold is a corpus-fraction dial). Same output contract:
    * (doc_id, n_tokens, n_removed, clean_md5).
    *
    * Shape at scale: q88's pipeline with the dup-hash aggregation's
    * HAVING bound raised from 2 to ceil(dfFrac·N); the qualifying-hash
    * set SHRINKS as the threshold rises, so the semi-join side only
    * gets smaller. N is one count() on the input — driver-side scalar,
    * same lifecycle as the k-means centroids.
    */
  def removeBoilerplateSpans(docs: DataFrame, n: Int = 8,
      dfFrac: Double = 0.05): DataFrame = {
    require(dfFrac > 0 && dfFrac <= 1.0)
    val nDocs = docs.count()
    val minDf = math.max(2L, math.ceil(dfFrac * nDocs).toLong)
    val (dm, starts) = spanTables(docs, n)
    val hotH = starts.groupBy(col("h"))
      .agg(countDistinct(col("doc_id")).as("ndocs"))
      .filter(col("ndocs") >= minDf)
      .select(col("h"))
    val out = exciseSpans(dm, starts, hotH, n)
    PlanCapture.record("q120_boilerplate_removal (pre-checkpoint)", out)
    try out.localCheckpoint(true) finally starts.unpersist(blocking = false)
  }

  /** Benchmark-targeted span EXCISION — decontamination SURGERY instead
    * of document drops: [[contaminatedDocs]]/[[contaminatedBloom]] report
    * and drop whole documents sharing n-grams with an evaluation set, but
    * dropping wastes every clean token in a long document that quotes one
    * benchmark sentence. Here only the contaminated SPANS are removed
    * (every corpus n-gram window that appears verbatim in the benchmark,
    * expanded to its covered token positions), and the document is
    * reassembled from what remains — the Lee-et-al.-style surgery aimed
    * at eval n-grams rather than corpus duplicates. Same output contract
    * as [[removeDupSpans]]: (doc_id, n_tokens, n_removed, clean_md5).
    *
    * Shape at scale: the benchmark's distinct n-gram hash set replaces
    * q88's dup-hash aggregation — it is benchmark-sized (tiny against the
    * corpus), so the semi-join broadcasts; everything else is q88's
    * O(tokens + covered) pipeline unchanged. At extreme benchmark sizes
    * compose with [[contaminatedBloom]]'s bloom prefilter on the span
    * table first.
    */
  /** The benchmark's distinct word-n-gram hash set — the selection side
    * of both contaminated-span operators. Benchmark-sized, tiny against
    * the corpus.
    */
  private def benchSpanHashes(benchmark: DataFrame, n: Int): DataFrame =
    benchmark
      .select(TextAnalysis.wsTokens(col("text")).as("bw"))
      .select(col("bw"), size(col("bw")).as("blen"))
      .select(col("bw"),
        explode(sequence(lit(1), greatest(col("blen") - (n - 1), lit(1)))).as("i"))
      .select(xxhash64(array_join(slice(col("bw"), col("i"), lit(n)), " ")).as("h"))
      .distinct()

  def removeContaminatedSpans(docs: DataFrame, benchmark: DataFrame,
      n: Int = 8): DataFrame = {
    val (dm, starts) = spanTables(docs, n)
    val out = exciseSpans(dm, starts, benchSpanHashes(benchmark, n), n)
    PlanCapture.record("q118_decontam_spans (pre-checkpoint)", out)
    try out.localCheckpoint(true) finally starts.unpersist(blocking = false)
  }

  /** [[removeContaminatedSpans]]'s TEXT-emitting sibling — the form a
    * curation PIPELINE needs: instead of the audit digest
    * (n_removed, clean_md5), it returns the reassembled cleaned text
    * itself so downstream stages (split landing, shard export) ship the
    * surgically decontaminated document. Same span selection, same
    * coverage expansion, same anti-join excision; the only difference
    * is that the per-doc fold emits `array_join` of the surviving
    * tokens rather than its md5. Reassembly is whitespace-normalizing
    * by construction (tokens re-joined with single spaces — the same
    * canonical form every shingle/token operator in this engine
    * already keys on). Fully-contaminated documents come back with
    * empty text and `n_removed = n_tokens`; the caller decides whether
    * to keep the husk.
    *
    * Output: (doc_id, text, n_tokens, n_removed), one row per input
    * doc, eagerly checkpointed (compact — one row per doc).
    */
  def removeContaminatedSpansText(docs: DataFrame, benchmark: DataFrame,
      n: Int = 8): DataFrame = {
    val (dm, starts) = spanTables(docs, n)
    val covered = starts.join(benchSpanHashes(benchmark, n), Seq("h"), "left_semi")
      .select(col("doc_id"),
        explode(sequence(col("i"), least(col("i") + (n - 1), col("len")))).as("j"))
      .distinct()
    val toks = dm
      .select(col("doc_id"), posexplode(col("w")))
      .select(col("doc_id"), (col("pos") + 1).as("j"), col("col").as("tok"))
    val kept = toks.join(covered, Seq("doc_id", "j"), "left_anti")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("long").as("n_kept"),
        array_join(transform(
          array_sort(collect_list(struct(col("j"), col("tok")))),
          x => x.getField("tok")), " ").as("clean_text"))
    val out = dm.select(col("doc_id"), col("len").cast("long").as("n_tokens"))
      .join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("clean_text"), lit("")).as("text"),
        col("n_tokens"),
        (col("n_tokens") - coalesce(col("n_kept"), lit(0L))).as("n_removed"))
    try out.localCheckpoint(true) finally starts.unpersist(blocking = false)
  }

  /** Global first-occurrence segment dedup — the CCNet / RefinedWeb
    * LINE-level dedup policy: split every document into segments, keep
    * only the globally FIRST occurrence of each distinct segment
    * (ordered by (doc_id, position)), drop every later repeat — whether
    * in the same document or any other — and reassemble each document
    * from its surviving segments in order. This is the complementary
    * policy family to [[removeDupSpans]]: Lee et al.'s ExactSubstr
    * excises ALL duplicated occurrences (both copies lose the span);
    * CCNet keeps exactly one canonical copy of each line and the corpus
    * never loses content entirely. Real corpora segment on newlines;
    * the fixture text has none, so the segmenter here is fixed
    * `segWords`-token windows — the pipeline shape (explode → global
    * argmin → reassemble) is identical for any boundary rule.
    *
    * Emits one row per document: total segments, segments kept, and the
    * md5 of the reassembled surviving text (a document made entirely of
    * previously-seen segments collapses to md5 of the empty string).
    *
    * Shape at scale: segments are built row-locally (one `sequence` +
    * `slice` generate per doc, no window function over the corpus);
    * the first-occurrence winner is ONE aggregation on the segment key
    * — `min(struct(doc_id, seg_ord))`, map-side combinable, shuffling
    * 16-byte key + 16-byte winner rows; the keep/drop decision is an
    * equi-join back on the same key; reassembly is one groupBy on
    * doc_id. Segment text crosses a shuffle exactly twice (winner join,
    * reassembly) — O(corpus tokens) end to end, never corpus², and no
    * global ordering anywhere (the "first" relation is the natural
    * (doc_id, position) order, decided per key, not via a total sort).
    */
  def lineDedup(docs: DataFrame, segWords: Int = 12,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(segWords > 0)
    val segs = docs
      .select(col(idCol).as("doc_id"), TextAnalysis.wsTokens(col(textCol)).as("w"))
      .select(col("doc_id"), col("w"),
        explode(sequence(lit(1), greatest(size(col("w")), lit(1)),
          lit(segWords))).as("start"))
      .select(col("doc_id"),
        floor((col("start") - 1) / segWords).cast("long").as("seg_ord"),
        concat_ws(" ", slice(col("w"), col("start"), lit(segWords))).as("seg"))
      .withColumn("k", md5(col("seg")))
    val winners = segs.groupBy(col("k"))
      .agg(min(struct(col("doc_id"), col("seg_ord"))).as("first"))
    segs.join(winners, Seq("k"))
      .withColumn("kept",
        col("first.doc_id") === col("doc_id") && col("first.seg_ord") === col("seg_ord"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("long").as("n_segs"),
        sum(when(col("kept"), 1L).otherwise(0L)).cast("long").as("n_kept"),
        md5(concat_ws(" ", transform(
          array_sort(collect_list(when(col("kept"),
            struct(col("seg_ord"), col("seg"))))),
          x => x.getField("seg")))).as("kept_md5"))
  }

  /** Distributed BPE merge training (the tokenizer-learning primitive):
    * learn the first `merges` byte-pair merges from the corpus, greedy
    * highest-frequency-first with lexicographic tie-break. Returns one
    * row per learned merge: (rank, lhs, rhs, freq).
    *
    * The classic weighted-vocabulary formulation: the corpus collapses
    * ONCE to (distinct word, frequency) — every later pass runs over the
    * vocabulary, not the corpus, so per-merge cost is independent of
    * corpus size (the standard sentencepiece/HF-tokenizers shape). Words
    * are held as sentinel-delimited symbol strings (single-space ends,
    * double-space separators) so applying a merge is ONE non-overlapping
    * left-to-right regexp_replace — exactly BPE's greedy application
    * order, with no lookarounds (the double-space trick keeps adjacent
    * matches from consuming each other's boundary). Pre-tokenization
    * keeps [a-z0-9]+ words only, which also guarantees symbols never
    * contain regex/replacement metacharacters.
    *
    * Per ROUND (not per merge): one pair-count aggregation (map-side
    * combined) and one small top-K collect to the driver — the merge
    * DECISION is inherently a global argmax, everything else stays
    * distributed. Up to `maxBatch` merges are accepted per round (see
    * [[trainBpe]] for the exactness proof), so a production 32k-merge
    * vocabulary costs ~32k/maxBatch driver round-trips instead of 32k
    * sequential Spark jobs. The evolving vocabulary is persisted each
    * round and the previous round released after materialization, so
    * the lineage (and recompute cost) stays O(1) per round.
    */
  def bpeMerges(docs: DataFrame, merges: Int = 8,
      textCol: String = "text", maxBatch: Int = 16): DataFrame = {
    val spark = docs.sparkSession
    val (learned, _, _, release) =
      trainBpe(bpeVocab(docs, textCol), merges, maxBatch)
    release()
    import spark.implicits._
    learned.toDF("rank", "lhs", "rhs", "freq")
  }

  /** Initial BPE vocabulary: (distinct word, freq) with the word held as
    * a sentinel-delimited symbol string; `keepWord` retains the raw word
    * column for encode-table use.
    */
  private def bpeVocab(docs: DataFrame, textCol: String,
      keepWord: Boolean = false): DataFrame = {
    // split(_, "") keeps a trailing "" (Java split limit -1) — drop it
    val chars = filter(split(col("word"), ""), x => x =!= "")
    val base = docs
      .select(explode(TextAnalysis.wsTokens(lower(col(textCol)))).as("word"))
      .filter(col("word").rlike("^[a-z0-9]+$"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
    val sym = concat(lit(" "), array_join(chars, "  "), lit(" ")).as("sym")
    if (keepWord) base.select(col("word"), sym, col("freq"))
    else base.select(sym, col("freq"))
  }

  /** Batched BPE training loop shared by [[bpeMerges]] and [[bpeEncode]].
    * Input: a (sym, freq[, passthrough…]) vocabulary. Returns (learned
    * merges in rank order, final persisted vocabulary — caller must
    * unpersist, number of rounds executed).
    *
    * Exactness: the batched result is IDENTICAL to one-merge-at-a-time
    * greedy (count desc, pair-string asc tie-break), by construction.
    * Per round we take the pair table sorted by that order and accept a
    * PREFIX of pairwise-symbol-disjoint candidates, stopping at the
    * first candidate sharing a symbol with an earlier accepted one, then
    * truncating to candidates with count STRICTLY above that boundary
    * (falling back to the top-1, which is sequential's own argmax).
    * Why this is exact:
    *  - merging (a,b) cannot change the count of any pair disjoint from
    *    {a,b} — adjacency elsewhere is untouched — so accepted
    *    candidates keep their counts at their sequential turn;
    *  - every pair CREATED by merging (a,b) — (x,ab) or (ab,y) or
    *    (ab,cd) — embeds an occurrence of an OLD pair sharing a symbol
    *    with {a,b} ((x,a), (b,y), (b,c) resp.), so its count is bounded
    *    by a conflicting pair's count; all conflicting pairs rank at or
    *    below the first conflict, hence strictly below every accepted
    *    candidate after the boundary truncation — no created pair can
    *    outrank a batched pick at its sequential turn.
    * Disjoint merges also commute under the one-pass double-space
    * regexp application, so the fold order within a round is immaterial.
    */
  private[graft] def trainBpe(vocab0: DataFrame, merges: Int, maxBatch: Int)
      : (Seq[(Long, String, String, Long)], DataFrame, Int, () => Unit) = {
    require(maxBatch >= 1, "maxBatch must be >= 1")
    val sc = vocab0.sparkSession.sparkContext
    // Each round must CUT THE CATALYST PLAN, not just cache data: persist
    // leaves the full projection chain in the analyzed plan, and at
    // hundreds of rounds the AQE explain strings alone OOM the driver.
    // localCheckpoint(eager) truncates lineage to a LogicalRDD; its
    // checkpoint blocks are not cacheManager-visible, so Dataset.unpersist
    // cannot release them — instead we attribute the newly persisted RDD
    // ids by diffing getPersistentRDDs around the checkpoint and release
    // the previous round's ids directly. (If another thread persists
    // concurrently its RDD could be mis-attributed and unpersisted early —
    // a recompute, never a correctness issue.)
    def checkpointed(df: DataFrame): (DataFrame, Set[Int]) = {
      val before = sc.getPersistentRDDs.keySet.toSet
      val out = df.localCheckpoint(eager = true)
      (out, sc.getPersistentRDDs.keySet.toSet -- before)
    }
    def release(ids: Set[Int]): Unit =
      ids.foreach(id => sc.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = false)))
    var (vocab, vocabIds) = checkpointed(vocab0)
    val learned = Seq.newBuilder[(Long, String, String, Long)]
    var nLearned = 0
    var rounds = 0
    var exhausted = false
    while (nLearned < merges && !exhausted) {
      val syms = split(trim(col("sym")), "  ")
      val pairsOf = when(size(syms) >= 2,
        zip_with(slice(syms, lit(1), size(syms) - 1),
          slice(syms, lit(2), size(syms) - 1),
          (a, b) => concat(a, lit(" "), b))).otherwise(array())
      val want = math.min(maxBatch, merges - nLearned)
      val k = 2 * want + 8
      val top = vocab.select(explode(pairsOf).as("pair"), col("freq"))
        .groupBy(col("pair")).agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("pair"))
        .limit(k).collect()
      if (top.isEmpty) exhausted = true // vocabulary fully merged
      else {
        // greedy disjoint-prefix selection (exactness argument above)
        val used = scala.collection.mutable.Set[String]()
        val prefix = scala.collection.mutable.ArrayBuffer[(String, String, Long)]()
        var boundaryCnt = -1L
        var i = 0
        var conflicted = false
        while (i < top.length && !conflicted && prefix.size < want) {
          val Array(l, r) = top(i).getString(0).split(" ", 2)
          val cnt = top(i).getLong(1)
          if (used(l) || used(r)) { boundaryCnt = cnt; conflicted = true }
          else { prefix += ((l, r, cnt)); used += l; used += r; i += 1 }
        }
        if (!conflicted) {
          // No conflict seen among walked candidates. Anything we did not
          // inspect (beyond the cap, or beyond the collected k) can only
          // have count <= the next/last collected count — use it as the
          // boundary. If the WHOLE pair table fit in the walk, there is
          // nothing below at all and no boundary is needed.
          boundaryCnt =
            if (i < top.length) top(i).getLong(1)
            else if (top.length == k) top.last.getLong(1)
            else -1L
        }
        val strict = prefix.takeWhile(_._3 > boundaryCnt)
        val accepted = if (strict.nonEmpty) strict.toSeq else prefix.take(1).toSeq
        val newSym = accepted.foldLeft(col("sym")) { case (c, (l, r, _)) =>
          regexp_replace(c, lit(s" \\Q$l\\E  \\Q$r\\E "), lit(s" $l$r "))
        }
        // eager checkpoint materializes the round before the parent is freed
        val (next, nextIds) = checkpointed(vocab.withColumn("sym", newSym))
        release(vocabIds)
        vocab = next
        vocabIds = nextIds
        accepted.foreach { case (l, r, cnt) =>
          nLearned += 1
          learned += ((nLearned.toLong, l, r, cnt))
        }
        rounds += 1
      }
    }
    val finalIds = vocabIds
    (learned.result(), vocab, rounds, () => release(finalIds))
  }

  /** [[bpeMerges]] variant exposing the round count, for batching specs
    * and capacity planning (rounds ≈ merges / maxBatch when the top of
    * the pair table is conflict-sparse).
    */
  private[graft] def bpeMergesWithRounds(docs: DataFrame, merges: Int,
      textCol: String = "text", maxBatch: Int = 16): (DataFrame, Int) = {
    val spark = docs.sparkSession
    val (learned, _, rounds, release) =
      trainBpe(bpeVocab(docs, textCol), merges, maxBatch)
    release()
    import spark.implicits._
    (learned.toDF("rank", "lhs", "rhs", "freq"), rounds)
  }

  /** Unigram language-model scoring: train token probabilities on the
    * corpus itself (MLE unigram LM), then score every document by its
    * mean cross-entropy −Σ ln p(tokenᵢ) / n — the classic cheap
    * perplexity-style quality filter (high = rare-token soup, low =
    * common-token boilerplate; both tails get trimmed). Results are
    * 3dp-floored: cross-engine double summation order and libm ulp
    * differences sit far below that quantum.
    *
    * Shape at scale: vocabulary = one shuffle on token; scoring = one
    * shuffle join tokens⋈vocab on token + one aggregation on doc_id. The
    * one-row corpus total is broadcast. The token table is computed for
    * both passes — at 100 TB persist it (or feed a pre-tokenized column)
    * to trade storage for the second scan.
    */
  def lmScore(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"),
      explode(TextAnalysis.wsTokens(col(textCol))).as("token"))
    val vocab = toks.groupBy(col("token")).agg(count(lit(1)).as("freq"))
    val total = vocab.agg(sum(col("freq")).cast("double").as("total"))
    toks.join(vocab, Seq("token"))
      .crossJoin(broadcast(total))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("long").as("n_tokens"),
        (floor(-sum(log(col("freq") / col("total"))) / count(lit(1)) * 1000) / 1000)
          .as("xent"))
  }

  /** BM25 relevance scoring of every document against a fixed query term
    * set (Robertson/Sparck-Jones, the Lucene-default ranking function) —
    * the retrieval half of a RAG corpus pipeline. Shapes for scale:
    * the per-(doc, term) tf table is at most |docs|×|terms| rows (term
    * filter BEFORE the aggregation, so non-query tokens never shuffle);
    * document length rides the tf rows (no second join against the
    * corpus); df and corpus stats are one-row/tiny broadcasts. Scores
    * are floor-quantized at 1e-3 like [[lmScore]] so cross-engine float
    * comparison is stable.
    *
    * score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·|d|/avgdl)),
    * idf(t) = ln((N − df + 0.5)/(df + 0.5) + 1).
    */
  def bm25(docs: DataFrame, queryTerms: Seq[String], k1: Double = 1.2,
      b: Double = 0.75, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(queryTerms.nonEmpty)
    val toks = docs.select(col(idCol).as("doc_id"),
        TextAnalysis.wsTokens(col(textCol)).as("w"))
      .select(col("doc_id"), size(col("w")).cast("double").as("dl"),
        explode(col("w")).as("token"))
      .filter(col("token").isin(queryTerms: _*))
    val tf = toks.groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).cast("double").as("tf"), max(col("dl")).as("dl"))
    val stats = docs.agg(count(lit(1)).cast("double").as("n_docs"),
      avg(size(TextAnalysis.wsTokens(col(textCol))).cast("double")).as("avgdl"))
    val dfTab = tf.groupBy(col("token"))
      .agg(count(lit(1)).cast("double").as("df"))
    tf.join(broadcast(dfTab), Seq("token"))
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log((col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0)))
      .withColumn("contrib",
        col("idf") * col("tf") * lit(k1 + 1) /
          (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / col("avgdl"))))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("long").as("n_terms"),
        (floor(sum(col("contrib")) * 1000) / 1000).as("bm25"))
  }

  /** Multinomial Naive Bayes source classifier (q240) — the cheap
    * domain/provenance classifier every mixture pipeline trains before
    * reaching for embeddings (the CCNet/fastText-classifier role: route
    * unlabeled text to the source whose unigram model likes it most,
    * then audit the mixture): train add-one-smoothed per-source token
    * models on one corpus half, classify the held-out half, report
    * per-source accuracy. Also the direct measure of how SEPARABLE the
    * sources are — near-chance accuracy says the source labels carry no
    * lexical signal and source-balancing work is cosmetic.
    *
    * Exactness: ln p(t|s) = ln((c_st + 1)/(T_s + V)) quantizes to
    * integer millionths once per (source, token) — the [[sourceAffinity]]
    * discipline — and a test doc's score under s is the exact BIGINT dot
    * product Σ tf·l6 plus the quantized ln-prior; the predicted source
    * is a row_number window over (score6 desc, source) per doc (the
    * provenance argmax shape — no float comparison, deterministic ties).
    * Unseen-in-s tokens hit the same smoothed expression with c = 0; the
    * vocabulary is the TRAIN vocabulary (test-only tokens carry no
    * trained signal for any class and are dropped, the standard NB
    * convention; a test doc with ZERO train-vocab tokens has no lexical
    * evidence at all and is excluded from the report).
    *
    * Scale shape — the sparse decomposition: with m₆(s) = the quantized
    * absent-token score ln(1/(T_s+V)), score(d, s) = dl_v·m₆(s) +
    * Σ_{t present in s} tf·(l₆(t,s) − m₆(s)) — integer-IDENTICAL to
    * summing l₆ over the full vocabulary (the floors subtract exactly),
    * but the dense vocab×|sources| model grid never materializes: the
    * only token-keyed join is test tf against the PRESENT train cells,
    * and the base term is a |test docs|×|sources| cross of two tiny
    * frames. One train (source, token) agg; the argmax window partitions
    * by doc.
    */
  def nbSourceClassifier(docs: DataFrame,
      textCol: String = "text"): DataFrame = {
    val half = idHash(col("doc_id")) % 2 === 0
    val toks = docs.withColumn("_train", half)
      .select(col("doc_id"), col("source"), col("_train"),
        explode(TextAnalysis.wsTokens(col(textCol))).as("tok"))
    val train = toks.filter(col("_train"))
    val cells = train.groupBy(col("source"), col("tok"))
      .agg(count(lit(1)).as("c"))
    val totals = cells.groupBy(col("source")).agg(sum(col("c")).as("t"))
    val vocabN = cells.agg(countDistinct(col("tok")).as("v"))
    val docsPer = train.select(col("doc_id"), col("source")).distinct()
      .groupBy(col("source")).agg(count(lit(1)).as("nd"))
    val nTrain = docsPer.agg(sum(col("nd")).as("ntr"))
    def l6(c: Column, t: Column, v: Column): Column =
      floor(log((c + 1).cast("double") / (t + v).cast("double"))
        * 1000000L).cast("long")
    // per-model constants: absent-token score m6 and the ln-prior
    val base = totals.crossJoin(broadcast(vocabN))
      .withColumn("m6", l6(lit(0L), col("t"), col("v")))
      .join(docsPer.withColumnRenamed("source", "sourcep"),
        col("source") === col("sourcep"))
      .crossJoin(broadcast(nTrain))
      .withColumn("p6", floor(log(col("nd").cast("double") / col("ntr"))
        * 1000000L).cast("long"))
      .select(col("source").as("model"), col("m6"), col("p6"))
    // PRESENT cells only, carrying the exact integer delta over m6
    val model = cells.join(totals, Seq("source"))
      .crossJoin(broadcast(vocabN))
      .withColumn("d6",
        l6(col("c"), col("t"), col("v")) - l6(lit(0L), col("t"), col("v")))
      .select(col("source").as("model"), col("tok"), col("d6"))
    val testTf = toks.filter(!col("_train"))
      .groupBy(col("doc_id"), col("source"), col("tok"))
      .agg(count(lit(1)).as("tf"))
    // dl_v = the doc's token mass WITHIN the train vocabulary (test-only
    // tokens score identically under every model and are dropped)
    val inVocab = testTf.join(
      cells.select(col("tok")).distinct(), Seq("tok"), "left_semi")
    val docMass = inVocab.groupBy(col("doc_id"), col("source"))
      .agg(sum(col("tf")).as("dlv"))
    val present = inVocab.join(model, Seq("tok"))
      .groupBy(col("doc_id"), col("model"))
      .agg(sum(col("tf") * col("d6")).as("sp6"))
    val scored = docMass.crossJoin(broadcast(base))
      .join(present, Seq("doc_id", "model"), "left")
      .withColumn("score6",
        col("dlv") * col("m6") + coalesce(col("sp6"), lit(0L)) + col("p6"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"))
      .orderBy(col("score6").desc, col("model"))
    scored.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_test"),
        sum(when(col("model") === col("source"), 1L).otherwise(0L))
          .as("n_correct"))
      .withColumn("accuracy",
        expr("n_correct * 1000000 div n_test").cast("double") / 1e6)
  }

  /** Query-likelihood retrieval with Dirichlet smoothing (q239) — the
    * language-modeling ranker beside [[bm25]]/[[bm25f]] (Ponte & Croft;
    * Zhai & Lafferty's Dirichlet prior): score(d) = Σ_{t∈Q}
    * ln((tf + μ·p(t|C)) / (dl + μ)), where ABSENT query terms still
    * contribute (the smoothed corpus prior — the property BM25 lacks and
    * the reason QL degrades more gracefully on short docs). OOV query
    * terms (cf = 0) are dropped, the standard convention (their smoothed
    * probability is 0 for every document — an undefined ln and no
    * ranking signal).
    *
    * Exactness: the smoothed ratio is (tf·|C| + μ·cf) / ((dl + μ)·|C|)
    * — exact BIGINT numerator/denominator into ONE double division →
    * ln → millionth floor per (doc, term); the doc score sums ≤ |Q|
    * integers (order-free). Overflow bound (dl + μ)·|C| < 2⁶³ ⇒
    * |C| ≲ 9·10¹³ at dl ≤ 10⁵. Deterministic (score desc, doc_id) top-k.
    *
    * Scale shape: one explode pruned to query terms at the boundary,
    * map-side tf/cf aggs, a |docs|×|Q| grid via a broadcast term list
    * LEFT-joined to tf, TakeOrdered top-k.
    */
  def qlDirichlet(docs: DataFrame, queryTerms: Seq[String], mu: Int = 2000,
      topK: Int = 20, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(queryTerms.nonEmpty)
    val staged = docs.select(col(idCol).as("doc_id"),
        TextAnalysis.wsTokens(col(textCol)).as("w"))
      .select(col("doc_id"), size(col("w")).cast("long").as("dl"), col("w"))
    val toks = staged.select(col("doc_id"), explode(col("w")).as("token"))
      .filter(col("token").isin(queryTerms: _*))
    val tf = toks.groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"))
    val cfTab = toks.groupBy(col("token")).agg(count(lit(1)).as("cf"))
    val ctot = staged.agg(sum(col("dl")).as("ctot"))
    val grid = staged.select(col("doc_id"), col("dl"))
      .crossJoin(broadcast(cfTab))
      .join(tf, Seq("doc_id", "token"), "left")
      .withColumn("tf", coalesce(col("tf"), lit(0L)))
      .crossJoin(broadcast(ctot))
      .withColumn("l6", floor(log(
        (col("tf") * col("ctot") + lit(mu.toLong) * col("cf"))
          .cast("double") /
        ((col("dl") + mu) * col("ctot")).cast("double")) * 1000000L)
        .cast("long"))
    val top = grid.groupBy(col("doc_id"))
      .agg(sum(col("l6")).as("score6"),
        sum(when(col("tf") > 0, 1L).otherwise(0L)).as("n_hit"))
      .orderBy(col("score6").desc, col("doc_id")).limit(topK)
    top.withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("score6").desc, col("doc_id"))))
      .select(col("rank"), col("doc_id"), col("n_hit"),
        (col("score6").cast("double") / 1e6).as("ql_score"))
  }

  /** Fielded-document fixture for q192: title = the document's first two
    * words, body = words 8–29 — the field split [[htmlFixture]] renders
    * as title/paragraph, without re-running the HTML chain.
    */
  def fieldedFixture(docs: DataFrame): DataFrame = {
    val w = filter(split(col("text"), " "), x => x =!= lit(""))
    docs.select(col("doc_id"), slice(w, 1, 2).as("title"),
      slice(w, 8, 22).as("body"))
  }

  /** BM25F field-weighted ranking (q192): the structured-document form
    * of BM25 (Robertson & Zaragoza) — a title hit is worth more than a
    * body hit, and each field gets its OWN length normalization before
    * the weighted term frequencies combine and pass through the shared
    * k1 saturation. The field combination is a FIXED expression over
    * per-field integer tf columns (pivoted via conditional sums, never a
    * sum over per-field double rows whose order an engine could vary),
    * per-(doc, term) contributions floor-quantize at micro units, and
    * the doc score is an exact BIGINT sum — no float accumulation order
    * anywhere. Top-k is TakeOrdered.
    *
    * Scale shape: one explode per field pruned to the query terms at the
    * explode boundary, two map-side-combining aggregations, broadcast
    * df/stats, TakeOrdered top-k.
    */
  def bm25f(fielded: DataFrame, queryTerms: Seq[String],
      wTitle: Double = 3.0, wBody: Double = 1.0, b: Double = 0.75,
      k1: Double = 1.2, topK: Int = 20): DataFrame = {
    require(queryTerms.nonEmpty)
    val lens = fielded.select(col("doc_id"),
      size(col("title")).cast("double").as("lt"),
      size(col("body")).cast("double").as("lb"))
    val stats = lens.agg(count(lit(1)).cast("double").as("n_docs"),
      avg(col("lt")).as("avgt"), avg(col("lb")).as("avgb"))
    val toks = fielded.select(col("doc_id"), lit("t").as("field"),
        explode(col("title")).as("token"))
      .unionByName(fielded.select(col("doc_id"), lit("b").as("field"),
        explode(col("body")).as("token")))
      .filter(col("token").isin(queryTerms: _*))
    val tf = toks.groupBy(col("doc_id"), col("token"))
      .agg(sum(when(col("field") === "t", 1L).otherwise(0L)).as("tft"),
        sum(when(col("field") === "b", 1L).otherwise(0L)).as("tfb"))
    val dfTab = tf.groupBy(col("token"))
      .agg(count(lit(1)).cast("double").as("df"))
    val scored = tf.join(lens, Seq("doc_id"))
      .join(broadcast(dfTab), Seq("token"))
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log((col("n_docs") - col("df") + lit(0.5)) /
          (col("df") + lit(0.5)) + lit(1.0)))
      .withColumn("wtf",
        lit(wTitle) * col("tft").cast("double") /
          (lit(1 - b) + lit(b) * col("lt") / col("avgt")) +
        lit(wBody) * col("tfb").cast("double") /
          (lit(1 - b) + lit(b) * col("lb") / col("avgb")))
      .withColumn("c6",
        floor(col("idf") * col("wtf") / (lit(k1) + col("wtf")) * 1000000L)
          .cast("long"))
      .groupBy(col("doc_id")).agg(sum(col("c6")).as("score6"))
    val top = scored.orderBy(col("score6").desc, col("doc_id")).limit(topK)
    top.withColumn("rank", row_number()
        .over(Window.orderBy(col("score6").desc, col("doc_id"))).cast("long"))
      .select(col("rank"), col("doc_id"), col("score6"))
  }

  /** RM3 pseudo-relevance feedback (Lavrenko & Croft relevance models,
    * the classic first-pass→expand→rerank loop every lexical retrieval
    * stack ships): score the corpus for the original query with [[bm25]],
    * take the top `fbDocs` documents as pseudo-relevant, estimate a
    * feedback term model from them (per term, Σ_d tf/dl — each addend
    * floor-quantized to integer millionths so the model is an exact
    * BIGINT any engine reproduces), keep the `fbTerms` strongest
    * non-query terms, interpolate with the uniform original-query model
    * at λ (`lambda6`/1e6), and rerank the corpus under the expanded
    * weighted query. Final scores are exact BIGINTs: per-(doc, term)
    * BM25 contributions floor-quantized at 1e-3, then integer-weighted
    * and summed — no float accumulation order anywhere in the ranking.
    *
    * Scale shape: two corpus scans (base scoring + rerank), each with
    * the term filter applied at the explode boundary (a broadcast
    * semi-join on a ≤ |Q|+fbTerms term set); the feedback model reads
    * ONLY the fbDocs documents (broadcast id semi-join). The single
    * unpartitioned window ranks the feedback VOCABULARY of ~fbDocs
    * documents — hundreds of rows, never corpus-sized — and the final
    * top-k is TakeOrdered, never a global sort.
    */
  def rm3Rerank(docs: DataFrame, queryTerms: Seq[String], fbDocs: Int = 10,
      fbTerms: Int = 5, lambda6: Long = 500000L, topK: Int = 20,
      k1: Double = 1.2, b: Double = 0.75,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._

    val base = bm25(docs, queryTerms, k1, b, idCol, textCol)
    val fbIds = base.orderBy(col("bm25").desc, col("doc_id"))
      .limit(fbDocs).select(col("doc_id"))

    val toksAll = docs.select(col(idCol).as("doc_id"),
        TextAnalysis.wsTokens(col(textCol)).as("w"))
      .select(col("doc_id"), size(col("w")).cast("long").as("dl"),
        explode(col("w")).as("token"))

    // feedback model over the fbDocs only: r6(t) = Σ_d floor(tf·1e6/dl)
    val r6 = toksAll.join(broadcast(fbIds), Seq("doc_id"))
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"), max(col("dl")).as("dl"))
      .filter(!col("token").isin(queryTerms: _*))
      .withColumn("c", floor(col("tf") * 1000000L / col("dl")))
      .groupBy(col("token")).agg(sum(col("c")).as("r6"))
    val sel = r6.withColumn("rn",
        row_number().over(Window.orderBy(col("r6").desc, col("token"))))
      .filter(col("rn") <= fbTerms).select(col("token"), col("r6"))
    val tot = sel.agg(sum(col("r6")).as("s"))
    val wFb = sel.crossJoin(broadcast(tot))
      .select(col("token"),
        floor((lit(1000000L) - lambda6) * col("r6") / col("s")).as("w6"))
    val wOrig = queryTerms.map(t => (t, lambda6 / queryTerms.size))
      .toDF("token", "w6")
    // zero-weight terms contribute nothing to any score but would still
    // widen the rerank semi-join (and surface score-0 docs): drop them
    val wExp = wOrig.unionByName(wFb).filter(col("w6") > 0)

    // rerank under the expanded weighted query — exact integer scores
    val stats = docs.agg(count(lit(1)).cast("double").as("n_docs"),
      avg(size(TextAnalysis.wsTokens(col(textCol))).cast("double")).as("avgdl"))
    val tfe = toksAll.join(broadcast(wExp), Seq("token"))
      .groupBy(col("doc_id"), col("token"), col("w6"))
      .agg(count(lit(1)).cast("double").as("tf"),
        max(col("dl").cast("double")).as("dl"))
    val dfe = tfe.groupBy(col("token"))
      .agg(count(lit(1)).cast("double").as("df"))
    val scored = tfe.join(broadcast(dfe), Seq("token"))
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log((col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))
          + lit(1.0)))
      .withColumn("c3", floor(col("idf") * col("tf") * lit(k1 + 1) /
        (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / col("avgdl")))
        * 1000))
      .groupBy(col("doc_id")).agg(sum(col("w6") * col("c3")).as("score6"))
    val top = scored.orderBy(col("score6").desc, col("doc_id")).limit(topK)
    top.withColumn("rank", row_number()
        .over(Window.orderBy(col("score6").desc, col("doc_id"))).cast("long"))
      .select(col("rank"), col("doc_id"), col("score6"))
  }

  /** Sliding-window document chunking (the RAG/pretraining segmentation
    * step): fixed `window`-token chunks every `stride` tokens, each
    * carrying its doc back-reference, ordinal, start offset and content
    * hash. One generator per row (explode over the stride positions) —
    * no shuffle; output size is corpus tokens × (window/stride) overlap
    * factor, the usual dial at scale. Empty documents yield one empty
    * chunk so every doc_id stays represented.
    */
  def chunkDocs(docs: DataFrame, window: Int = 32, stride: Int = 24,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(window > 0 && stride > 0)
    docs.select(col(idCol).as("doc_id"), TextAnalysis.wsTokens(col(textCol)).as("w"))
      .withColumn("start",
        explode(sequence(lit(1), greatest(size(col("w")), lit(1)), lit(stride))))
      .withColumn("chunk", slice(col("w"), col("start"), lit(window)))
      .select(col("doc_id"),
        floor((col("start") - 1) / stride).cast("long").as("chunk_ord"),
        col("start").cast("long").as("start_tok"),
        size(col("chunk")).cast("long").as("chunk_tokens"),
        md5(concat_ws(" ", col("chunk"))).as("chunk_md5"))
  }

  /** Content-defined chunking (Rabin-style CDC at word granularity): cut
    * each document where the hash of the trailing `win`-token window is
    * ≡ 0 mod `divisor` — so boundaries are decided by LOCAL content, and
    * an insertion near the front shifts only the chunks it touches while
    * every later boundary (and chunk hash) survives unchanged. That
    * boundary stability is the property [[chunkDocs]]' fixed windows
    * fundamentally lack, and it is what makes chunk-hash dedup across
    * document revisions work (storage dedup, crawl re-fetch dedup,
    * near-identical-page chunk sharing). Expected chunk length is
    * `divisor` tokens; the hash is [[Dedup.portableHash32]], so a SQL
    * oracle replays boundaries bit-for-bit.
    *
    * Shape at scale: everything — window hashes, boundary selection,
    * chunk assembly — is row-local array math inside one projection;
    * the operator performs ZERO shuffles and composes with any
    * downstream groupBy on chunk_md5 (the cross-corpus chunk-dedup join)
    * as the only data movement.
    */
  def contentChunks(docs: DataFrame, win: Int = 3, divisor: Int = 8,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(win > 0 && divisor > 0)
    val base = docs
      .select(col(idCol).as("doc_id"), TextAnalysis.wsTokens(col(textCol)).as("w"))
      .withColumn("n", size(col("w")))
      .filter(col("n") > 0)
    // candidate boundaries after positions 1..n-1 (a chunk always ends at
    // n); the guarded sequence avoids Spark's descending sequence(1, 0)
    val windowHash = (i: Column) => Dedup.portableHash32(concat_ws(" ",
      slice(col("w"), greatest(i - (win - 1), lit(1)), least(i, lit(win)))))
    val withBounds = base.withColumn("bounds",
      filter(sequence(lit(1), greatest(col("n") - 1, lit(1))),
        i => i <= col("n") - 1 && windowHash(i) % divisor === 0))
      .withColumn("starts",
        concat(array(lit(1)), transform(col("bounds"), b => b + 1)))
      .withColumn("ends", concat(col("bounds"), array(col("n"))))
    // posexplode_OUTER: `starts` is never empty (it always leads with
    // element 1), so outer vs inner generate emits identical rows — but
    // the inner form lets InferFiltersFromGenerate derive a
    // `size(starts) > 0` filter whose condition embeds the ENTIRE
    // Rabin-window chain (windowHash per position), and filter pushdown
    // then re-evaluates that chain below the fan-out exchange on the
    // unsplit scan's single task (round-13 measured: 4.2 s of the
    // query's 4.4 s sat in that one-task stage). Outer generates are
    // exempt from the rule, so the chain runs once, post-exchange, in
    // parallel.
    withBounds
      .select(col("doc_id"), col("w"), col("ends"),
        posexplode_outer(col("starts")).as(Seq("chunk_ord", "s")))
      .withColumn("e", element_at(col("ends"), (col("chunk_ord") + 1).cast("int")))
      .select(col("doc_id"), col("chunk_ord").cast("long").as("chunk_ord"),
        col("s").cast("long").as("start_tok"),
        (col("e") - col("s") + 1).cast("long").as("n_toks"),
        md5(concat_ws(" ",
          slice(col("w"), col("s"), col("e") - col("s") + 1))).as("chunk_md5"))
  }

  /** Deterministic training-shard assignment: the same multiplicative
    * hash as [[splitExpr]]/[[stratifiedSample]] (stateless, partitioning-
    * independent, reproducible across engines) folded to `nShards`.
    */
  def shardExpr(id: Column, nShards: Int): Column =
    idHash(id) % nShards

  /** Training-shard composition audit (q219) — the shuffle-quality read
    * a trainer takes BEFORE streaming shards: per shard, how far its
    * group mix (source, language, …) drifts from the corpus-global mix,
    * as total-variation distance over millionth-quantized shares. The
    * failure it catches is the classic one: a shard key correlated with
    * the audited attribute (modulo on an id that encodes source, range
    * on a crawl-ordered id) silently turns "shuffled" training data
    * into single-source blocks — gradient noise goes structured and no
    * loss curve says why. Hash shards read `mixed`; a correlated scheme
    * lights up `skewed` with top_share ≈ 1.
    *
    * Exact staging: per-cell shares p₆ = ⌊o·10⁶/T⌋ and global q₆ =
    * ⌊gₙ·10⁶/G⌋ are integer millionths; tv = (Σ|p₆−q₆|) div 2 — no
    * float sums, and absent (shard, group) cells COUNT (their |0−q₆|
    * term is exactly the missing mass), which is why the fold runs over
    * the dense shard×group grid, not just observed cells.
    *
    * Scale shape: one map-side-combined (shard, group) count; the grid
    * and everything after are |shards|·|groups| rows — the audit's
    * premise is a bounded group attribute (sources, langs), never a
    * high-cardinality column.
    */
  def shardMix(docs: DataFrame, shardCol: String, groupCol: String,
      skewAt: Double = 0.25): DataFrame = {
    val o = docs.groupBy(col(shardCol).as("shard"), col(groupCol).as("g"))
      .agg(count(lit(1)).as("o"))
    val shardTot = o.groupBy(col("shard")).agg(sum(col("o")).as("t"))
    val gTot = o.groupBy(col("g")).agg(sum(col("o")).as("gn"))
    val grand = gTot.agg(sum(col("gn")).as("gt"))
    val grid = shardTot
      .crossJoin(broadcast(gTot.crossJoin(broadcast(grand))))
    val cells = grid.join(o, Seq("shard", "g"), "left")
      .withColumn("oo", coalesce(col("o"), lit(0L)))
      .withColumn("p6", expr("oo * 1000000 div t"))
      .withColumn("q6", expr("gn * 1000000 div gt"))
    cells.groupBy(col("shard"))
      .agg(max(col("t")).as("n_docs"),
        sum(when(col("oo") > 0, 1L).otherwise(0L)).as("n_groups"),
        (expr("sum(abs(p6 - q6)) div 2").cast("double") / 1e6).as("tv"),
        (max(col("p6")).cast("double") / 1e6).as("top_share"))
      .withColumn("verdict",
        when(col("tv") >= skewAt, "skewed").otherwise("mixed"))
  }

  /** Padding-waste report (q220) — the batching-efficiency read behind
    * every "tokens/sec" number: sequences padded to a fixed `seqLen`
    * burn compute on pad tokens, and LENGTH-BUCKETED batching (pad only
    * to the next power-of-two bucket ceiling, the bucketing every
    * serious data loader ships) recovers most of it. Per bucket:
    * real-token and pad-token totals under both policies and the
    * millionth-floored waste fractions — the delta IS the speedup
    * bucketing buys on this corpus. Documents are truncated at `seqLen`
    * (the trainer's cap); the bucket floor is 16 (tiny sequences batch
    * together regardless).
    *
    * Row-local arithmetic (token count, CASE-threshold bucket ceiling —
    * no float log2) + one bucket-keyed aggregation; output is
    * |buckets| ≤ log₂(seqLen) rows.
    */
  def paddingWaste(docs: DataFrame, seqLen: Int = 128,
      textCol: String = "text"): DataFrame = {
    require(seqLen >= 16 && (seqLen & (seqLen - 1)) == 0,
      "seqLen must be a power of two >= 16")
    val toks = least(size(TextAnalysis.wsTokens(col(textCol)))
      .cast("long"), lit(seqLen.toLong))
    val ceilings = Iterator.iterate(16L)(_ * 2)
      .takeWhile(_ <= seqLen).toSeq
    val bucket = ceilings.init.foldRight(lit(seqLen.toLong)) {
      (c, rest) => when(col("_tk") <= c, lit(c)).otherwise(rest)
    }
    docs.withColumn("_tk", toks)
      .withColumn("bucket", bucket)
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("_tk")).as("n_tokens"),
        sum(col("bucket") - col("_tk")).as("n_pad_bucketed"),
        sum(lit(seqLen.toLong) - col("_tk")).as("n_pad_naive"))
      .withColumn("waste",
        expr("n_pad_bucketed * 1000000 div (n_tokens + n_pad_bucketed)")
          .cast("double") / 1e6)
      .withColumn("waste_naive",
        expr("n_pad_naive * 1000000 div (n_tokens + n_pad_naive)")
          .cast("double") / 1e6)
  }

  /** Export the corpus as `nShards` training shards: hash-assigned via
    * [[shardExpr]], one directory per shard, rows sorted by id inside
    * each shard file — the deterministic final-mile layout a trainer
    * streams. One repartition on the shard id (each writer task owns
    * whole shards), and the in-task sort rides the shuffle; at 100 TB
    * raise `nShards` so a shard fits an executor's write buffer.
    */
  def exportShards(docs: DataFrame, nShards: Int, outDir: String,
      idCol: String = "doc_id"): Unit =
    docs.withColumn("shard", shardExpr(col(idCol), nShards))
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col(idCol))
      .write.mode("overwrite").partitionBy("shard").parquet(outDir)

  /** Dataset-release manifest (the "data card" every reproducible corpus
    * release ships next to its shards): per [[shardExpr]] shard — doc and
    * token and char counts, the id range, and an ORDER-INDEPENDENT
    * content checksum (Σ of [[Dedup.portableHash32]] over `id:text`).
    * Additivity is the point: shard checksums sum to the corpus checksum,
    * so a consumer can verify one shard, a re-shard, or the whole release
    * with the same arithmetic, and any flipped byte, dropped doc, or
    * duplicated doc shifts the sum. A positional hash chain would instead
    * depend on row order — unreproducible across engines and shuffles.
    *
    * One groupBy(shard) with map-side partials; everything row-local
    * before it. Pairs with [[exportShards]]: generate the manifest from
    * the same relation you exported, verify downstream against the files.
    */
  def shardManifest(docs: DataFrame, nShards: Int = 8,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.select(shardExpr(col(idCol), nShards).as("shard"),
        col(idCol).as("id"),
        size(TextAnalysis.wsTokens(col(textCol))).cast("long").as("n_toks"),
        length(col(textCol)).cast("long").as("nc"),
        Dedup.portableHash32(
          concat(col(idCol).cast("string"), lit(":"), col(textCol)))
          .as("h"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_toks")).as("n_tokens"),
        sum(col("nc")).as("n_chars"),
        min(col("id")).as("min_id"),
        max(col("id")).as("max_id"),
        sum(col("h")).as("checksum"))

  /** Temperature-scaled mixture weights: sampling probability per corpus
    * slice q_i ∝ (token share)^alpha — the standard multilingual /
    * multi-source rebalancing rule (alpha < 1 lifts low-resource slices,
    * alpha = 1 is proportional). One global aggregation over per-row
    * token counts; the result is slice-cardinality-sized, so the final
    * normalization cross-join is against a one-row total.
    */
  def mixtureWeights(docs: DataFrame, groupCol: String,
      alpha: Double = 0.5, textCol: String = "text"): DataFrame = {
    val counts = docs.groupBy(col(groupCol))
      .agg(sum(size(TextAnalysis.wsTokens(col(textCol))).cast("long"))
        .as("n_tokens"))
    val powed = counts.withColumn("p",
      pow(col("n_tokens").cast("double"), lit(alpha)))
    powed.crossJoin(powed.agg(sum(col("p")).as("tp")))
      .withColumn("weight", TextAnalysis.quant4(col("p") / col("tp")))
      .select(col(groupCol), col("n_tokens"), col("weight"))
  }

  /** Token-budget shard packing: documents (in id order) are assigned to
    * consecutive training shards of ~`budget` tokens each via a running
    * token sum — the deterministic sequential-fill sharding used to cut a
    * corpus into fixed-size training chunks.
    *
    * Distributed prefix sum, NOT one global-order window (which moves the
    * whole corpus to a single partition): ids are bucketed into coarse
    * ranges, the running sum is computed per range in parallel, and each
    * range's starting offset is the prefix sum of per-range totals — a
    * table with one row per range, small enough that its own window pass
    * is O(#ranges) on one task by design. Output is identical to the
    * single-window formulation for any `rangeWidth`.
    */
  def packShards(docs: DataFrame, budget: Long, idCol: String = "doc_id",
      textCol: String = "text", rangeWidth: Long = 1000L): DataFrame = {
    val toks = docs.select(col(idCol),
        size(TextAnalysis.wsTokens(col(textCol))).cast("long").as("n_tokens"))
      .withColumn("rng", floor(col(idCol) / rangeWidth).cast("long"))
    val wLocal = Window.partitionBy(col("rng")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = toks.withColumn("local_cum", sum(col("n_tokens")).over(wLocal))
    // per-range totals: one row per range; the offset window is over this
    // tiny table only — a DELIBERATE single partition of O(#ranges) rows.
    // The partition key is a constant-valued but non-foldable expression:
    // a literal would be constant-folded into an empty partition spec and
    // (correctly, in general) flagged by WindowExec as an unbounded
    // single-partition window.
    val totals = local.groupBy(col("rng"))
      .agg(max(col("local_cum")).as("rng_total"))
    val wOff = Window.partitionBy(pmod(col("rng"), lit(1))).orderBy(col("rng"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = totals
      .withColumn("offset", coalesce(sum(col("rng_total")).over(wOff), lit(0L)))
      .select(col("rng"), col("offset"))
    local.join(broadcast(offsets), Seq("rng"))
      .withColumn("cum_tokens", col("offset") + col("local_cum"))
      .withColumn("shard", floor((col("cum_tokens") - 1) / budget).cast("long"))
      .select(col(idCol), col("n_tokens"), col("cum_tokens"), col("shard"))
  }

  /** Per-source quality quota (the RefinedWeb / CCNet domain-cap step):
    * keep at most `cap` documents per source, best [[TextAnalysis
    * .withQuality]] score first (doc_id tiebreak) — the curation pass
    * that stops one prolific domain from dominating a mixture however
    * much it crawls.
    *
    * Shape at scale: quality is row-local codegen arithmetic; the only
    * wide op is one ranking window keyed by source, and the `row_number
    * <= cap` filter plans as WindowGroupLimit, so per-partition state is
    * `cap` rows per source — a hot source costs its cap, not its crawl.
    */
  def sourceQuota(docs: DataFrame, cap: Int,
      srcCol: String = "source", textCol: String = "text"): DataFrame = {
    require(cap > 0)
    val w = Window.partitionBy(col(srcCol))
      .orderBy(col("quality_score").desc, col("doc_id"))
    TextAnalysis.withQuality(docs, textCol)
      .withColumn("src_rank", row_number().over(w))
      .filter(col("src_rank") <= cap)
      .select(col(srcCol), col("doc_id"), col("quality_score"),
        col("src_rank").cast("long").as("src_rank"))
  }

  /** Global token-budget selection: fill a training-token budget with the
    * best documents — order the corpus by (quality desc, doc_id), keep
    * every document whose running token total still fits. The "give me
    * the best 10B tokens" step that turns a scored crawl into a training
    * set.
    *
    * Shape at scale: the running sum over QUALITY order cannot use
    * [[packShards]]' id-range bucketing directly (the order key is
    * computed, not monotone in id), so buckets are the composite
    * (quality value, id range): quality is already floor-quantized at
    * 1e-4 by [[TextAnalysis.withQuality]], so distinct values are ≤10k
    * and within one value the global order IS doc_id order — id-range
    * sub-buckets bound the window partition even when one quality value
    * is hot (the saturated-caps value at 1.0 in any big crawl). Local
    * windows run per composite bucket in parallel; bucket offsets are a
    * prefix sum over the ≤(values·ranges)-row totals table (deliberate
    * single small partition, [[packShards]]' pattern) broadcast back.
    * Output is identical to the one-global-window formulation.
    */
  def tokenBudgetSelect(docs: DataFrame, budget: Long,
      textCol: String = "text", rangeWidth: Long = 1000L): DataFrame = {
    require(budget > 0)
    val scored = TextAnalysis.withQuality(docs, textCol)
      .select(col("doc_id"), col("quality_score").as("q"),
        size(TextAnalysis.wsTokens(col(textCol))).cast("long").as("n_toks"))
      .withColumn("rng", floor(col("doc_id") / rangeWidth).cast("long"))
    val wLocal = Window.partitionBy(col("q"), col("rng")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = scored.withColumn("local_cum", sum(col("n_toks")).over(wLocal))
    val totals = local.groupBy(col("q"), col("rng"))
      .agg(max(col("local_cum")).as("bkt_total"))
    val wOff = Window.partitionBy(pmod(col("rng"), lit(1)))
      .orderBy(col("q").desc, col("rng"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = totals
      .withColumn("offset", coalesce(sum(col("bkt_total")).over(wOff), lit(0L)))
      .select(col("q"), col("rng"), col("offset"))
    local.join(broadcast(offsets), Seq("q", "rng"))
      .withColumn("cum_toks", col("offset") + col("local_cum"))
      .filter(col("cum_toks") <= budget)
      .select(col("doc_id"), col("q").as("quality_score"), col("n_toks"),
        col("cum_toks"))
  }

  /** Leakage-safe train/val/test split: assign the split at the NEAR-DUP
    * CLUSTER level, not the document level. [[splitExpr]] hashed on
    * `doc_id` silently leaks training data into eval whenever two
    * near-duplicate documents hash to different buckets — the classic
    * benchmark-contamination-by-split bug (measured eval loss is then
    * partly memorization). Here every document's split key is its dedup
    * cluster representative ([[Dedup.nearDupClusters]] — connected
    * components over exact-Jaccard near-dup pairs; singletons fall back
    * to their own id, where the assignment degenerates to [[splitExpr]]
    * exactly), so any two documents with Jaccard ≥ `threshold` — and,
    * transitively, any two in the same component — land in the SAME
    * split by construction.
    *
    * Shape at scale: cluster discovery inherits the prefix-filtered
    * pair generation + min-label-propagation shape of q64 (work ∝
    * near-pair density, never corpus²); the only additional op is one
    * left equi-join of the corpus against the clustered-doc set (pair
    * participants only — tiny relative to the corpus in any cleaned
    * crawl, broadcastable) and a row-local hash. No new wide ops.
    */
  def leakSafeSplit(docs: DataFrame, n: Int = 3, threshold: Double = 0.8,
      trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    val clusters = Dedup.nearDupClusters(docs, n, threshold)
    docs.join(clusters, Seq("doc_id"), "left")
      .withColumn("cluster", coalesce(col("cluster"), col("doc_id")))
      .select(col("doc_id"), col("cluster"),
        splitExpr(col("cluster"), trainPct, valPct).as("split"))
  }

  /** Leakage-safe K-FOLD assignment (q244) — [[leakSafeSplit]]
    * generalized to cross-validation: fold = idHash(cluster
    * representative) mod k, so near-duplicate documents (and,
    * transitively, whole dedup components) always share a fold and no
    * fold's holdout is contaminated by a near-copy in another fold's
    * training side — the k-fold version of the
    * benchmark-contamination-by-split bug. Singletons hash their own id
    * (degenerating to plain stratified folding exactly). Same scale
    * shape as leakSafeSplit: cluster discovery ∝ near-pair density, one
    * left equi-join against the clustered-doc set, a row-local hash.
    */
  def leakSafeFolds(docs: DataFrame, k: Int, n: Int = 3,
      threshold: Double = 0.8): DataFrame = {
    require(k >= 2, "k-fold needs k >= 2")
    val clusters = Dedup.nearDupClusters(docs, n, threshold)
    docs.join(clusters, Seq("doc_id"), "left")
      .withColumn("cluster", coalesce(col("cluster"), col("doc_id")))
      .select(col("doc_id"), col("cluster"),
        (idHash(col("cluster")) % k).as("fold"))
  }

  /** Fair-share token-budget selection: [[tokenBudgetSelect]]'s pure
    * quality ordering lets one dominant source crowd every other out of
    * the training set; [[sourceQuota]] caps a source but guarantees
    * nothing. This operator does both sides of fairness: FIRST each
    * source banks up to `floorToks` of its own best documents (every
    * source keeps a voice, however its quality distribution compares
    * globally), THEN the remaining global budget fills with the best
    * still-unselected documents regardless of source. Returns the
    * selected docs with `via` = 'floor' | 'fill' so mixture accounting
    * can attribute every token.
    *
    * Shape at scale: stage 1 is one running-sum window PARTITIONED BY
    * SOURCE (parallel across sources; within a source the window is the
    * source's crawl — for a pathologically hot source compose with
    * [[sourceQuota]]'s cap first). The floor spend is one scalar
    * aggregate (a driver-side long, same as k-means centroids). Stage 2
    * is [[tokenBudgetSelect]]'s composite (quality, id-range) bucketed
    * prefix sum over the complement — never a global-order window.
    *
    * Size `floorToks ≤ budget / #sources`: floors are banked
    * unconditionally, so floors summing past the budget leave nothing
    * for the fill stage (and the floor spend itself is then the total).
    */
  def fairBudgetSelect(docs: DataFrame, budget: Long, floorToks: Long,
      srcCol: String = "source", textCol: String = "text",
      rangeWidth: Long = 1000L): DataFrame = {
    require(budget > 0 && floorToks >= 0 && floorToks <= budget)
    val scored = TextAnalysis.withQuality(docs, textCol)
      .select(col("doc_id"), col(srcCol).as("source"),
        col("quality_score"),
        size(TextAnalysis.wsTokens(col(textCol))).cast("long").as("n_toks"))
    val wSrc = Window.partitionBy(col("source"))
      .orderBy(col("quality_score").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val floor = scored
      .withColumn("src_cum", sum(col("n_toks")).over(wSrc))
      .filter(col("src_cum") <= floorToks)
      .select(col("doc_id"), col("source"), col("quality_score"),
        col("n_toks"), lit("floor").as("via"))
      .localCheckpoint(true)
    val spent = floor.agg(coalesce(sum(col("n_toks")), lit(0L)))
      .collect().head.getLong(0)
    val remaining = budget - spent
    val fill =
      if (remaining <= 0) floor.limit(0)
      else tokenBudgetSelect(
        docs.join(floor.select(col("doc_id")), Seq("doc_id"), "left_anti"),
        remaining, textCol, rangeWidth)
        .join(scored.select(col("doc_id"), col("source")), "doc_id")
        .select(col("doc_id"), col("source"), col("quality_score"),
          col("n_toks"), lit("fill").as("via"))
    floor.union(fill)
  }

  /** Split-leakage audit — the DETECTOR complementing [[leakSafeSplit]]'s
    * preventer: given a corpus carrying an EXISTING split assignment
    * (however it was made — a legacy pipeline, a per-document hash, a
    * manual holdout), report every near-dup pair whose members sit in
    * DIFFERENT splits, with both split labels and the pair's Jaccard.
    * Zero rows certifies the assignment leakage-free at `threshold`;
    * each returned row is one place eval measures memorization. Pair
    * generation is [[Dedup.ngramJaccardPairs]] (prefix-filtered, work ∝
    * near-pair density); the audit adds two equi-joins against the
    * (doc_id, split) projection — broadcastable at any corpus size the
    * pair set itself is tractable at.
    */
  def splitLeakage(docs: DataFrame, splitCol: String = "split",
      n: Int = 3, threshold: Double = 0.8): DataFrame = {
    val pairs = Dedup.ngramJaccardPairs(docs, n, threshold)
    val sa = docs.select(col("doc_id").as("doc_a"), col(splitCol).as("split_a"))
    val sb = docs.select(col("doc_id").as("doc_b"), col(splitCol).as("split_b"))
    pairs.join(sa, "doc_a").join(sb, "doc_b")
      .filter(col("split_a") =!= col("split_b"))
      .select(col("doc_a"), col("doc_b"), col("split_a"), col("split_b"),
        col("jaccard"))
  }

  /** Composed curation audit — one row per document recording every
    * gate's verdict, the final keep decision, and the FIRST failing gate
    * in a fixed evaluation order. This is the provenance artifact a
    * production corpus pipeline keeps next to the filtered output: at
    * 100 TB you cannot re-derive "why was this document dropped" on
    * demand, and per-gate drop rates are the first thing audited when a
    * trained model misbehaves. Gates, in order:
    *
    *   1. `gate_exact`   — exact-dedup survivor (min doc_id over the
    *                       md5(text) group; the md5 keeps the shuffle key
    *                       32 chars instead of the full document)
    *   2. `gate_lang`    — language allowlist over `langCol`
    *   3. `gate_gopher`  — [[TextAnalysis.gopherFilter]]'s rule battery
    *   4. `gate_quality` — [[TextAnalysis.withQuality]] composite score
    *                       ≥ `minQuality`
    *   5. `gate_pii`     — no email-pattern hits ([[piiScan]]'s pattern;
    *                       emails are the unambiguous redact-or-drop class)
    *
    * Shape at scale: gates 2–5 are row-local codegen expressions; the
    * only wide op is the single hash-shuffle window for gate 1 — same
    * cost as the exact-dedup pass the pipeline already runs, now fused
    * into the audit instead of a separate job.
    */
  def curationReport(docs: DataFrame, minQuality: Double = 0.5,
      allowedLangs: Seq[String] = Seq("en", "de", "fr", "es", "ja"),
      langCol: String = "lang", textCol: String = "text"): DataFrame = {
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val w = Window.partitionBy(md5(col(textCol)))
    val staged = TextAnalysis.gopherFilter(docs, textCol)
      .withColumn("gate_exact", min(col("doc_id")).over(w) === col("doc_id"))
      .withColumn("gate_lang", col(langCol).isin(allowedLangs: _*))
      .withColumn("gate_gopher", col("reject_reasons") === "")
      .withColumn("gate_quality", col("quality_score") >= minQuality)
      .withColumn("gate_pii",
        size(regexp_extract_all(col(textCol), lit(email), lit(0))) === 0)
    val order = Seq("gate_exact" -> "exact_dup", "gate_lang" -> "lang",
      "gate_gopher" -> "gopher", "gate_quality" -> "quality",
      "gate_pii" -> "pii")
    val firstFail = coalesce(
      order.map { case (c, n) => when(!col(c), n) } :+ lit(""): _*)
    staged.select(col("doc_id") +: order.map(o => col(o._1)) :+
      order.map(o => col(o._1)).reduce(_ && _).as("keep") :+
      firstFail.as("first_fail"): _*)
  }

  /** Corpus snapshot diff (q259) — the dataset-versioning read every
    * release pipeline needs between two corpus snapshots: per doc_id,
    * `added` / `removed` / `unchanged` (byte-identical text) /
    * `minor_edit` (n-gram Jaccard between the two versions ≥
    * `threshold` — a re-crawl that gained a footer) / `rewrite`
    * (same id, substantively different content — the class that must
    * re-enter curation and dedup from scratch). Complements
    * [[graft.table.MergeTable]]'s change feed: the feed says WHICH rows
    * changed between table versions, this says HOW MUCH the content
    * moved.
    *
    * Shape at scale: ONE full-outer equi-join on doc_id; the Jaccard is
    * row-local between the two text versions of the SAME id (gram sets
    * built per row — never a pair join, never corpus²). Short-doc
    * convention mirrors [[Dedup]]'s shingling: a doc with < n words is
    * its single space-joined gram.
    *
    * Round-13 optimization (guide §2.3/§1.2): the gram SETS are built
    * map-side, BEFORE the exchange, once per row per side — the old
    * formulation inlined the gram expression into the post-join CASE,
    * where (a) higher-order functions are exempt from codegen common-
    * subexpression elimination (lambda-variable trees are skipped by
    * EquivalentExpressions), so each row rebuilt its gram set up to ~6×
    * per side, and (b) the whole cost sat in the post-shuffle stage,
    * which the output sort's range-sampling pass executes a second time
    * and AQE coalesces to one task at low volume. Text equality is
    * checked via md5 (the [[curationReport]] gate_exact convention) so
    * raw text never crosses the exchange — the shuffle carries
    * (doc_id, md5, gram set), and the post-join work is null checks +
    * one array_intersect. Jaccard values and status labels are
    * bit-identical (same gram expression, same quant4 arithmetic).
    */
  def snapshotDiff(v1: DataFrame, v2: DataFrame, n: Int = 3,
      threshold: Double = 0.8, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    def gramSet(t: Column): Column = {
      val w = TextAnalysis.wsTokens(t)
      array_distinct(when(size(w) >= n, TextAnalysis.wordNgrams(w, n))
        .otherwise(array(concat_ws(" ", w))))
    }
    val a = v1.select(col(idCol).as("doc_id"),
      md5(col(textCol)).as("_h1"), gramSet(col(textCol)).as("_g1"))
    val b = v2.select(col(idCol).as("doc_id"),
      md5(col(textCol)).as("_h2"), gramSet(col(textCol)).as("_g2"))
    val inter = size(array_intersect(col("_g1"), col("_g2")))
    val joined = a.join(b, Seq("doc_id"), "full_outer")
      .withColumn("_jac", TextAnalysis.quant4(inter.cast("double")
        / (size(col("_g1")) + size(col("_g2")) - inter)))
    joined
      .select(col("doc_id"),
        when(col("_h1").isNull, "added")
          .when(col("_h2").isNull, "removed")
          .when(col("_h1") === col("_h2"), "unchanged")
          .when(col("_jac") >= threshold, "minor_edit")
          .otherwise("rewrite").as("status"),
        when(col("_h1").isNotNull && col("_h2").isNotNull &&
          col("_h1") =!= col("_h2"), col("_jac")).as("jaccard"))
  }

  /** Inter-source containment matrix (q261) — [[sourceOverlap]]'s
    * shared-count diagnostic upgraded to the DECISION read: for every
    * source pair (dense spine — non-overlapping pairs report 0, they
    * don't vanish), the exact Jaccard and BOTH directional containments
    * of the distinct word-n-gram sets, plus the set sizes. Containment
    * is the source-pruning signal Jaccard hides: a small crawl 95%
    * contained in an existing source is redundant even though the
    * pair's Jaccard is tiny — drop or down-quota it before it enters
    * the pipeline ([[sourceQuota]]'s upstream question).
    *
    * Shape at scale: the inverted-index shape, never pairwise scans —
    * one distinct (source, gram) relation (map-side combinable), per-
    * source set sizes from it, and pair intersections from the gram-
    * keyed self-join (fan-out per gram = sources sharing it, bounded by
    * |sources|; work rides SHARED grams, not the corpus square).
    * Quantization: j6/containment6 = exact ·10⁶ integer divisions.
    */
  def sourceContainment(docs: DataFrame, n: Int = 3,
      sourceCol: String = "source", textCol: String = "text"): DataFrame = {
    val w = TextAnalysis.wsTokens(col(textCol))
    val gramArr = when(size(w) >= n, TextAnalysis.wordNgrams(w, n))
      .otherwise(array(concat_ws(" ", w)))  // Dedup's short-doc convention
    val grams = docs.select(col(sourceCol).as("_s"),
        explode(gramArr).as("_g"))
      .distinct()
    val sizes = grams.groupBy(col("_s")).agg(count(lit(1)).as("_n"))
    val inter = grams.as("a").join(grams.as("b"),
        col("a._g") === col("b._g") && col("a._s") < col("b._s"))
      .groupBy(col("a._s").as("_sa"), col("b._s").as("_sb"))
      .agg(count(lit(1)).as("_i"))
    // dense pair spine: pairs sharing NOTHING must still report 0
    val spine = sizes.select(col("_s").as("_sa"), col("_n").as("_na"))
      .join(sizes.select(col("_s").as("_sb"), col("_n").as("_nb")),
        col("_sa") < col("_sb"))
    spine.join(inter, Seq("_sa", "_sb"), "left")
      .withColumn("_i", coalesce(col("_i"), lit(0L)))
      .select(col("_sa").as("source_a"), col("_sb").as("source_b"),
        col("_na").as("n_grams_a"), col("_nb").as("n_grams_b"),
        col("_i").as("n_shared"),
        (expr("_i * 1000000 div (_na + _nb - _i)").cast("double") / 1e6)
          .as("jaccard"),
        (expr("_i * 1000000 div _na").cast("double") / 1e6)
          .as("containment_a"),
        (expr("_i * 1000000 div _nb").cast("double") / 1e6)
          .as("containment_b"))
  }

  /** Fixed-length training-sequence packing — the final pretraining
    * data-prep stage: conceptually concatenate every document's tokens
    * in id order into one stream, cut the stream into consecutive
    * sequences of exactly `seqLen` tokens, and emit the sequence ↔
    * document span map (one row per intersection) — the metadata a
    * packed-example collator needs for attention-boundary masks. Each
    * row carries (seq_id, doc_id, doc_start, seq_off, seg_len) plus the
    * md5 of the segment's tokens, so the cut is verified at TOKEN level,
    * not just by arithmetic. [[chunkDocs]] windows WITHIN a document and
    * [[packShards]] assigns whole documents to budgets; this is the
    * cross-document concat-and-cut neither expresses.
    *
    * Shape at scale: the global start offset of every document is the
    * same distributed prefix sum as [[packShards]] (range-bucketed local
    * windows + a broadcast offsets table of one row per range — never a
    * single global-order window). The window pass runs over SLIM
    * (doc_id, n_tokens) rows only; token arrays join back afterward on
    * doc_id — buffering arrays through a window sort would make the
    * window the memory bottleneck, a hash join of slim rows is not. Span
    * expansion is row-local `sequence` + `slice` (bounded by spans-per-
    * doc, ~n/seqLen + 1); there is no corpus-sized shuffle keyed on
    * anything but doc_id, and no stage sees global order.
    */
  def packSequences(docs: DataFrame, seqLen: Int, idCol: String = "doc_id",
      textCol: String = "text", rangeWidth: Long = 1000L): DataFrame = {
    require(seqLen > 0)
    val toked = docs.select(col(idCol).as("doc_id"),
        TextAnalysis.wsTokens(col(textCol)).as("w"))
      .withColumn("n", size(col("w")).cast("long"))
      .filter(col("n") > 0)
    val toks = toked.select(col("doc_id"), col("n"))
      .withColumn("rng", floor(col("doc_id") / rangeWidth).cast("long"))
    val wLocal = Window.partitionBy(col("rng")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = toks.withColumn("local_cum", sum(col("n")).over(wLocal))
    val totals = local.groupBy(col("rng")).agg(max(col("local_cum")).as("rng_total"))
    // one row per range; see packShards for why the partition key is a
    // non-foldable constant rather than a bare literal
    val wOff = Window.partitionBy(pmod(col("rng"), lit(1))).orderBy(col("rng"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = totals
      .withColumn("offset", coalesce(sum(col("rng_total")).over(wOff), lit(0L)))
      .select(col("rng"), col("offset"))
    val placed = local.join(broadcast(offsets), Seq("rng"))
      .withColumn("gstart", col("offset") + col("local_cum") - col("n"))
      .select(col("doc_id"), col("gstart"))
    toked.join(placed, Seq("doc_id"))
      .withColumn("seq_id", explode(sequence(
        floor(col("gstart") / seqLen).cast("long"),
        floor((col("gstart") + col("n") - 1) / seqLen).cast("long"))))
      .withColumn("doc_start",
        greatest(col("seq_id") * seqLen - col("gstart"), lit(0L)))
      .withColumn("seq_off",
        greatest(col("gstart") - col("seq_id") * seqLen, lit(0L)))
      .withColumn("seg_len",
        least((col("seq_id") + 1) * seqLen, col("gstart") + col("n"))
          - greatest(col("seq_id") * seqLen, col("gstart")))
      .select(col("seq_id"), col("doc_id"), col("doc_start"), col("seq_off"),
        col("seg_len"),
        md5(concat_ws(" ",
          slice(col("w"), (col("doc_start") + 1).cast("int"),
            col("seg_len").cast("int")))).as("seg_md5"))
  }

  /** Per-document top-`k` TF-IDF terms — the classic per-doc keyword /
    * feature-extraction pass (retrieval indexing, topic tagging, nearest-
    * neighbor features). tfidf = tf · ln(N/df), floor-quantized at 1e-3
    * (like [[lmScore]]/[[bm25]]) so cross-engine ranking is stable; ties
    * break on ascending term.
    *
    * Shape at scale: tf = one shuffle on (doc, term); df = one shuffle on
    * term over the tf relation (already collapsed to distinct doc-term
    * pairs, so df counts documents, not occurrences); the per-doc ranking
    * window shuffles doc-keyed rows once. N is a one-row broadcast. No
    * stage ever sees corpus² — everything is keyed by doc or term.
    */
  def tfidfTop(docs: DataFrame, k: Int = 3, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"),
      explode(TextAnalysis.wsTokens(col(textCol))).as("term"))
    val tf = toks.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).cast("double").as("tf"))
    val dfTab = tf.groupBy(col("term")).agg(count(lit(1)).cast("double").as("df"))
    val nDocs = docs.agg(count(lit(1)).cast("double").as("n_docs"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("tfidf").desc, col("term"))
    tf.join(dfTab, Seq("term"))
      .crossJoin(broadcast(nDocs))
      .withColumn("tfidf",
        floor(col("tf") * log(col("n_docs") / col("df")) * 1000) / 1000)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("rank").cast("long").as("rank"),
        col("term"), col("tfidf"))
  }

  /** Per-slice unigram KL divergence against the whole corpus:
    * KL(P_slice ‖ P_corpus) = Σ_t p_s(t)·ln(p_s(t)/p_c(t)) — the mixture
    * diagnostic run before fixing training weights (a slice with high KL
    * is distributionally far from the blend; near-zero means it adds no
    * distributional novelty). Every corpus token appears in P_corpus, so
    * the ratio is always defined (p_c ≥ p_s·share_s > 0).
    *
    * Shape at scale: slice counts = one shuffle on (slice, token); corpus
    * counts aggregate THE SAME relation (slice cardinality × vocab, not
    * corpus size) on token; the final join is token-keyed between two
    * vocab-bounded relations, then one slice-keyed aggregation. Totals
    * are slice-cardinality broadcasts.
    */
  def sourceKl(docs: DataFrame, groupCol: String = "source",
      textCol: String = "text"): DataFrame = {
    val toks = docs.select(col(groupCol).as("grp"),
      explode(TextAnalysis.wsTokens(col(textCol))).as("token"))
    val byGrp = toks.groupBy(col("grp"), col("token"))
      .agg(count(lit(1)).cast("double").as("c"))
    val grpTot = byGrp.groupBy(col("grp")).agg(sum(col("c")).as("gt"))
    val corpus = byGrp.groupBy(col("token")).agg(sum(col("c")).as("f"))
    val corpusTot = corpus.agg(sum(col("f")).as("ct"))
    byGrp.join(corpus, Seq("token"))
      .join(broadcast(grpTot), Seq("grp"))
      .crossJoin(broadcast(corpusTot))
      .groupBy(col("grp").as(groupCol))
      .agg(sum(col("c")).cast("long").as("n_tokens"),
        // KL >= 0 mathematically; the float SUM of a zero-KL slice can land
        // at ±1e-16, and floor would take -1e-16 to -0.001 while another
        // engine's +1e-17 floors to 0.000 — clamp before quantizing
        (floor(greatest(lit(0.0), sum((col("c") / col("gt")) *
          log((col("c") / col("gt")) / (col("f") / col("ct"))))) * 1000) / 1000)
          .as("kl"))
  }

  /** DoReMi-style domain reweighting (Xie et al. 2023, "DoReMi:
    * Optimizing Data Mixtures Speeds Up Language Model Pretraining"):
    * one multiplicative-weights step over the sources —
    * w_i ∝ share_i · exp(η · excess_i), normalized — where DoReMi's
    * proxy-vs-reference excess loss is instantiated model-free as
    * KL(source ‖ corpus) over the unigram models ([[sourceKl]]): exactly
    * the excess cross-entropy the corpus-trained unigram model pays on
    * that source versus the source's own model. Sources the blended model
    * fits worst get up-weighted, the DoReMi direction; η is the step
    * temperature (η = 0 recovers the token-share baseline).
    *
    * Cost is [[sourceKl]]'s one token-keyed aggregation; the update
    * itself is arithmetic over the source-cardinality table (eagerly
    * localCheckpointed so the corpus scan is paid once, not once per
    * downstream branch). The KL input is already 1e-3-quantized, so
    * exp() sees identical doubles in any engine.
    */
  def doremiWeights(docs: DataFrame, eta: Double = 1.0,
      groupCol: String = "source", textCol: String = "text"): DataFrame = {
    val kl = sourceKl(docs, groupCol, textCol).localCheckpoint(true)
    val tot = kl.agg(sum(col("n_tokens")).cast("double").as("tt"))
    val scored = kl.crossJoin(broadcast(tot))
      .withColumn("share", col("n_tokens") / col("tt"))
      .withColumn("u", col("share") * exp(lit(eta) * col("kl")))
    scored.crossJoin(broadcast(scored.agg(sum(col("u")).as("su"))))
      .select(col(groupCol), col("n_tokens"),
        TextAnalysis.quant4(col("share")).as("share"),
        col("kl").as("excess"),
        TextAnalysis.quant4(col("u") / col("su")).as("weight"))
  }

  /** Deterministic fixed-SIZE per-stratum sample: exactly `min(k, |stratum|)`
    * documents per stratum, chosen by ascending multiplicative id-hash
    * (same stateless family as [[splitExpr]]) with id tie-break — the
    * "give me 10k eval docs per language" sampler, complementing the
    * fixed-RATE [[stratifiedSample]]. Reproducible across engines, runs,
    * and partitionings.
    *
    * One ranking window per stratum. At 100 TB with k ≪ stratum size,
    * swap the full-stratum sort for a per-partition `k`-cap (the same
    * rows survive — rank ≤ k implies rank ≤ k within any subset, so a
    * partition-local top-k prefilter is lossless) — Spark's
    * WindowGroupLimit applies exactly that pushdown to this plan shape.
    */
  def fixedSample(docs: DataFrame, groupCol: String, k: Int,
      idCol: String = "doc_id"): DataFrame = {
    val h = idHash(col(idCol))
    val w = Window.partitionBy(col(groupCol)).orderBy(h, col(idCol))
    docs.withColumn("sample_rank", row_number().over(w))
      .filter(col("sample_rank") <= k)
      .select(col(idCol), col(groupCol),
        col("sample_rank").cast("long").as("sample_rank"))
  }

  /** Vocabulary coverage curve: for each cutoff N, the fraction of all
    * token OCCURRENCES covered by the N most frequent types (frequency
    * desc, token asc on ties) — the tokenizer-design diagnostic (how big
    * a vocab buys how much of the corpus). Returns one row per cutoff.
    *
    * Shape at scale: the corpus collapses to the vocabulary relation
    * first (one token-keyed shuffle); the ranking window then runs over
    * TYPES, not tokens — a deliberately single-partition window like
    * [[packShards]]'s offset table, bounded by vocabulary size (≈10⁷ at
    * 100 TB, far under a task). The same constant-valued non-foldable
    * partition key keeps WindowExec from flagging it.
    */
  def vocabCoverage(docs: DataFrame, cutoffs: Seq[Int],
      textCol: String = "text"): DataFrame = {
    require(cutoffs.nonEmpty)
    val vocab = vocabulary(docs, textCol)
    val total = vocab.agg(sum(col("freq")).cast("double").as("total"))
    val w = Window.partitionBy(pmod(col("freq"), lit(1)))
      .orderBy(col("freq").desc, col("token"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wr = Window.partitionBy(pmod(col("freq"), lit(1)))
      .orderBy(col("freq").desc, col("token"))
    val ranked = vocab
      .withColumn("rank", row_number().over(wr))
      .withColumn("cum", sum(col("freq")).over(w))
      .filter(col("rank") <= cutoffs.max)
    import docs.sparkSession.implicits._
    val cuts = cutoffs.sorted.toDF("top_n")
    ranked.join(broadcast(cuts), col("rank") <= col("top_n"))
      .groupBy(col("top_n").cast("long").as("top_n"))
      .agg(max(col("cum")).cast("long").as("covered_tokens"))
      .crossJoin(broadcast(total))
      .select(col("top_n"), col("covered_tokens"),
        (floor(col("covered_tokens") / col("total") * 10000) / 10000)
          .as("covered_frac"))
  }

  /** PII-pattern scan: per-document counts of email-like, phone-like, and
    * long-digit-run patterns (the redaction pre-pass of a training
    * pipeline; on real data the hits feed a masking stage).
    */
  def piiScan(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    docs.select(
      col(idCol),
      size(regexp_extract_all(t,
        lit("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"), lit(0)))
        .cast("long").as("n_email"),
      size(regexp_extract_all(t,
        lit("\\+?[0-9][0-9 ()-]{7,}[0-9]"), lit(0)))
        .cast("long").as("n_phone"),
      size(regexp_extract_all(t, lit("[0-9]{6,}"), lit(0)))
        .cast("long").as("n_digit_run"))
  }

  /** PII REDACTION (the masking stage [[piiScan]] feeds): replace
    * email-like, then phone-like, then long-digit-run spans with typed
    * placeholder tokens, in that order — emails first so their digits
    * never leak into the phone pass, phones before bare digit runs so a
    * number is tagged at its most specific type. Per-row regex
    * projection: stateless, shuffle-free, scales with input splits.
    * Returns the redacted text plus per-type counts (each counted on the
    * text as it enters that pass, i.e. exactly the spans replaced).
    */
  def piiRedact(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val phone = "\\+?[0-9][0-9 ()-]{7,}[0-9]"
    val digits = "[0-9]{6,}"
    val r1 = regexp_replace(col(textCol), email, "<EMAIL>")
    val r2 = regexp_replace(r1, phone, "<PHONE>")
    val r3 = regexp_replace(r2, digits, "<ID>")
    docs.select(
      col(idCol),
      r3.as("red_text"),
      size(regexp_extract_all(col(textCol), lit(email), lit(0)))
        .cast("long").as("n_email"),
      size(regexp_extract_all(r1, lit(phone), lit(0)))
        .cast("long").as("n_phone"),
      size(regexp_extract_all(r2, lit(digits), lit(0)))
        .cast("long").as("n_id"))
  }

  /** DSIR-style importance weights (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): score every document by
    * the mean per-token log-likelihood ratio between a TARGET
    * distribution (the slice you want more of) and the RAW corpus
    * distribution, both estimated as add-one-smoothed unigram models over
    * the shared vocabulary. High scores = documents that look like the
    * target; resampling by these weights steers the mixture.
    *
    * weight(d) = Σ_t ln(p_tgt(t)/p_raw(t)) / |d|,
    * p(t) = (c(t)+1)/(N+V) — floor-quantized at 1e-3 like [[lmScore]].
    *
    * Shape at scale: both models aggregate the SAME token relation (one
    * shuffle on token; target counts are a conditional sum riding the
    * same aggregation, so the target slice is never re-scanned); scoring
    * is one token-keyed join + one doc-keyed aggregation. V and the two
    * totals are one-row broadcasts. DSIR proper hashes n-grams into a
    * fixed bucket space so the model table stays O(buckets) at any corpus
    * size — the vocabulary here is corpus-sublinear (Heaps' law) and the
    * join is keyed either way, so bucketing changes constants, not shape.
    */
  def dsirWeights(docs: DataFrame, targetPred: Column, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"), targetPred.as("is_tgt"),
      explode(TextAnalysis.wsTokens(col(textCol))).as("token"))
    // one pass builds both models: raw = all rows, target = conditional sum
    val vocab = toks.groupBy(col("token"))
      .agg(count(lit(1)).cast("double").as("c_raw"),
        sum(when(col("is_tgt"), 1L).otherwise(0L)).cast("double").as("c_tgt"))
    val stats = vocab.agg(sum(col("c_raw")).as("n_raw"),
      sum(col("c_tgt")).as("n_tgt"), count(lit(1)).cast("double").as("v"))
    toks.join(vocab, Seq("token"))
      .crossJoin(broadcast(stats))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("long").as("n_tokens"),
        (floor(sum(log(((col("c_tgt") + 1) / (col("n_tgt") + col("v"))) /
            ((col("c_raw") + 1) / (col("n_raw") + col("v")))))
          / count(lit(1)) * 1000) / 1000).as("dsir_logw"))
  }

  /** Interpolated bigram language-model scoring (Jelinek–Mercer): the
    * bigram upgrade of [[lmScore]]. Every document is scored by the mean
    * cross-entropy of its token transitions under
    * p(w|v) = λ·c(v,w)/c(v) + (1−λ)·c(w)/N, with both count tables
    * trained on the corpus itself — the cheap fluency filter (repetitive
    * docs score low, shuffled-word soup scores high) one step up from
    * unigram. Documents with fewer than two tokens have no transitions
    * and report zero entropy over zero bigrams.
    *
    * Shape at scale: bigram counts = one shuffle keyed by the pair over
    * row-locally zipped transitions (no self-join — q51's trap); unigram
    * counts aggregate the same tokens; scoring joins transitions to the
    * two count tables (pair- and token-keyed) and aggregates per doc.
    * Vocabulary and bigram tables are corpus-sublinear; nothing is ever
    * corpus².
    */
  def bigramLmScore(docs: DataFrame, lambda: Double = 0.5,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val base = docs.select(col(idCol).as("doc_id"),
      TextAnalysis.wsTokens(col(textCol)).as("w"))
    // row-local transition pairs: (w[i], w[i+1]) via two shifted slices
    val pairs = base.select(col("doc_id"),
      explode(when(size(col("w")) >= 2,
        zip_with(slice(col("w"), lit(1), size(col("w")) - 1),
          slice(col("w"), lit(2), size(col("w")) - 1),
          (a, b) => struct(a.as("prev"), b.as("cur"))))
        .otherwise(array())).as("t"))
      .select(col("doc_id"), col("t.prev").as("prev"), col("t.cur").as("cur"))
    val uni = docs.select(explode(TextAnalysis.wsTokens(col(textCol))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).cast("double").as("c1"))
    val total = uni.agg(sum(col("c1")).as("n"))
    val bi = pairs.groupBy(col("prev"), col("cur"))
      .agg(count(lit(1)).cast("double").as("c2"))
    val scored = pairs
      .join(bi, Seq("prev", "cur"))
      .join(uni.select(col("token").as("prev"), col("c1").as("c_prev")), Seq("prev"))
      .join(uni.select(col("token").as("cur"), col("c1").as("c_cur")), Seq("cur"))
      .crossJoin(broadcast(total))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("long").as("n_bigrams"),
        (floor(-sum(log(lit(lambda) * col("c2") / col("c_prev") +
            lit(1 - lambda) * col("c_cur") / col("n")))
          / count(lit(1)) * 1000) / 1000).as("xent2"))
    docs.select(col(idCol).as("doc_id"))
      .join(scored, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("xent2"), lit(0.0)).as("xent2"))
  }

  /** Deterministic weighted sampling without replacement
    * (Efraimidis–Spirakis A-ES): each row draws a pseudo-uniform u from
    * the stateless multiplicative id-hash (same family as [[splitExpr]] —
    * reproducible across engines, runs, and partitionings) and the n
    * rows with the largest u^(1/w) win — equivalently the smallest
    * −ln(u)/w, which is what's computed (exponential race). Heavier
    * rows win proportionally more often; the classic one-pass
    * quality-weighted corpus subsampling primitive.
    *
    * Shape at scale: the key is a narrow per-row projection; selection is
    * top-n on the key = per-partition heaps + an n-row driver merge
    * (TakeOrderedAndProject), never a global sort.
    */
  def weightedSample(docs: DataFrame, n: Int, weightCol: Column,
      idCol: String = "doc_id"): DataFrame = {
    val h = idHash(col(idCol))
    val u = (h.cast("double") + 0.5) / 2147483647.0
    // normalize by the max weight (one-row broadcast): scaling every key
    // by a constant preserves the A-ES order exactly, but anchors the
    // HEAVIEST rows' keys at O(1) instead of O(1/w_max) — without it,
    // large weights would quantize to zero below and the "sample" would
    // degenerate to ascending id among heavy rows
    val wmax = docs.agg(max(weightCol.cast("double")).as("w_max"))
    docs.select(col(idCol), weightCol.cast("double").as("weight"))
      .filter(col("weight") > 0)
      .crossJoin(broadcast(wmax))
      // rank on the QUANTIZED key: raw -ln(u)·w_max/w can differ by a
      // libm ulp across engines, which must not flip the selection cutoff
      .withColumn("es_key",
        floor(-log(u) * col("w_max") / col("weight") * 1e6) / 1e6)
      .orderBy(col("es_key"), col(idCol))
      .limit(n)
      .select(col(idCol), col("weight"), col("es_key"))
  }

  /** BPE ENCODING with corpus-trained merges: learns `merges` merge rules
    * exactly as [[bpeMerges]] does, then tokenizes every document with
    * them, reporting per-document encoded length — the
    * tokens-per-document accounting pass that prices a corpus in
    * tokenizer units (training-budget estimates, packing, billing).
    *
    * The trick: training already maintains each distinct WORD's symbol
    * string under the merges applied so far, so encoding is free — carry
    * the word through the merge loop and the final vocabulary IS the
    * encode table (word → symbols). Documents then join their words
    * against it: one word-keyed shuffle of the (doc, word) relation plus
    * a doc-keyed count; the corpus text is never re-processed per merge.
    * Words outside the trained alphabet ([a-z0-9]+ after lowering) pass
    * through as single opaque tokens, like a tokenizer's byte-fallback.
    */
  def bpeEncode(docs: DataFrame, merges: Int = 8, idCol: String = "doc_id",
      textCol: String = "text", maxBatch: Int = 16): DataFrame = {
    val words = docs.select(col(idCol).as("doc_id"),
        explode(TextAnalysis.wsTokens(lower(col(textCol)))).as("word"))
    val (_, vocab, _, release) =
      trainBpe(bpeVocab(docs, textCol, keepWord = true), merges, maxBatch)
    val encodeTable = vocab.select(col("word"),
      size(split(trim(col("sym")), "  ")).cast("long").as("n_sym"))
    val out = words
      .join(encodeTable, Seq("word"), "left_outer")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("long").as("n_words"),
        sum(coalesce(col("n_sym"), lit(1L))).cast("long").as("n_bpe_tokens"))
    // eager-checkpoint and return the CHECKPOINTED frame (localCheckpoint
    // returns a new Dataset), so the trained vocab's checkpoint blocks can
    // be released without the caller's action recomputing the merge lineage
    try out.localCheckpoint(eager = true)
    finally release()
  }

  /** Unigram-LM subword vocabulary (q179, the SentencePiece-side
    * complement to [[trainBpe]]): candidate pieces are every substring of
    * length 1..`maxPieceLen` of every word OCCURRENCE, counted corpus-wide;
    * the vocabulary keeps the `topK` most frequent pieces (count desc,
    * piece asc) plus ALL single characters — the coverage guarantee that
    * makes every word segmentable, the same reason SentencePiece never
    * prunes single bytes. Scores are unigram log-probs over the selected
    * vocabulary's own count mass, floor-quantized to integer micro-nats
    * (ln then floor×1e6 — one IEEE log per piece, identical in any
    * engine).
    *
    * Scale shape: one bounded explode (≤ len·maxPieceLen candidates per
    * word), one map-side-combining count, top-K via TakeOrdered; the
    * returned table is ≤ topK + |alphabet| rows.
    */
  def unigramVocab(docs: DataFrame, topK: Int = 512, maxPieceLen: Int = 4,
      textCol: String = "text"): DataFrame = {
    val words = docs.select(
      explode(TextAnalysis.wsTokens(col(textCol))).as("word"))
    val pieces = words
      .select(col("word"), explode(sequence(lit(1), length(col("word"))))
        .as("p"))
      .select(explode(transform(
        sequence(lit(1), least(lit(maxPieceLen),
          length(col("word")) - col("p") + 1)),
        k => col("word").substr(col("p"), k))).as("piece"))
      .groupBy(col("piece")).agg(count(lit(1)).as("cnt"))
    val top = pieces.orderBy(col("cnt").desc, col("piece")).limit(topK)
    val chars = pieces.filter(length(col("piece")) === 1)
    val sel = top.unionByName(chars).groupBy(col("piece"))
      .agg(max(col("cnt")).as("cnt"))
    val tot = sel.agg(sum(col("cnt")).as("tot"))
    sel.crossJoin(broadcast(tot))
      .select(col("piece"), col("cnt"),
        floor(log(col("cnt").cast("double") / col("tot")) * 1000000L)
          .cast("long").as("score6"))
  }

  /** Unigram-LM Viterbi segmentation (q180): per document, the number of
    * subword pieces and the total log-prob of the MAX-LIKELIHOOD
    * segmentation of every word under a [[unigramVocab]] piece table —
    * the encode step of a SentencePiece-style tokenizer, and the exact
    * quantity its EM training maximizes.
    *
    * The per-word DP runs as a pure higher-order Catalyst expression:
    * `aggregate(sequence(1, len), dp₀, step)` carries the dp prefix as an
    * array of (score6, n_pieces) structs; each step maximizes over the
    * ≤`maxPieceLen` pieces ending at position i with the deterministic
    * tie rule (score desc, pieces asc, piece-length asc). Piece scores
    * reach the lambda as a LITERAL map (the vocabulary is topK-bounded —
    * the k-means-centroids-as-literals pattern), so the whole DP is
    * row-local: no join, no shuffle, no UDF. Single-character coverage
    * from the vocab guarantees every word segments.
    *
    * Scale shape: the DP runs once per DISTINCT word (the dedup that
    * makes tokenizing a 100 TB corpus tractable — word types grow
    * sub-linearly in tokens), then one equi-join back onto word
    * occurrences and one doc-keyed aggregation.
    */
  def unigramSegment(docs: DataFrame, topK: Int = 512, maxPieceLen: Int = 4,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    // literal score map: topK-bounded driver collect, like k-means
    // centroids — never corpus-sized
    val vocab = unigramVocab(docs, topK, maxPieceLen, textCol)
      .collect().map(r => r.getString(0) -> r.getLong(2))
    val scoreMap = map(vocab.sortBy(_._1).flatMap { case (p, s) =>
      Seq(lit(p), lit(s)) }.toIndexedSeq: _*)

    val sentinel = struct(lit(Long.MinValue / 2).as("s"), lit(0L).as("n"),
      lit(0).as("k"))
    def better(c: Column, b: Column): Column =
      c.getField("s") > b.getField("s") ||
        (c.getField("s") === b.getField("s") &&
          (c.getField("n") < b.getField("n") ||
            (c.getField("n") === b.getField("n") &&
              c.getField("k") < b.getField("k"))))
    val w = col("word")
    val step = (acc: Column, i: Column) => {
      val cands = filter(transform(sequence(lit(1), lit(maxPieceLen)), k => {
        val sc = element_at(scoreMap, w.substr(i - k + 1, k))
        val prev = element_at(acc, i - k + 1)
        when(i >= k && sc.isNotNull,
          struct((prev.getField("s") + sc).as("s"),
            (prev.getField("n") + 1L).as("n"), k.as("k")))
      }), c => c.isNotNull)
      val best = aggregate(cands, sentinel,
        (b, c) => when(better(c, b), c).otherwise(b))
      concat(acc, array(struct(best.getField("s").as("s"),
        best.getField("n").as("n"))))
    }
    val dpInit = array(struct(lit(0L).as("s"), lit(0L).as("n")))
    val dpLast = element_at(
      aggregate(sequence(lit(1), length(w)), dpInit, step), length(w) + 1)

    val occurrences = docs.select(col(idCol).as("doc_id"),
      explode(TextAnalysis.wsTokens(col(textCol))).as("word"))
    val perWord = occurrences.select(w).distinct()
      .select(w, dpLast.getField("s").as("w_s6"),
        dpLast.getField("n").as("w_n"))
    occurrences.join(perWord, Seq("word"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"), sum(col("w_n")).as("n_pieces"),
        sum(col("w_s6")).as("score6_total"))
  }

  /** Distributed logistic-regression quality scoring: full-batch gradient
    * descent on cheap per-document shape features (token count, raw
    * length, type/token ratio), trained against a slice indicator — the
    * fastText-style quality-classifier step of a curation pipeline,
    * reduced to its distributed-training skeleton. Returns every doc's
    * label and fitted probability.
    *
    * The scale shape is the textbook one (same family as
    * [[graft.operators.Similarity.kmeansClusters]]): each iteration is
    * ONE corpus scan — features are row-local projections, the gradient
    * is a map-side-combined aggregation of d+1 doubles, and the driver
    * applies the d+1-sized update. Iteration cost is scan-bandwidth-bound
    * and independent of model state size; the final scoring pass is
    * narrow. Deterministic: zero init, fixed lr/iters, no sampling.
    */
  def logregScore(docs: DataFrame, targetPred: Column, iters: Int = 3,
      lr: Double = 1.0, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val w = TextAnalysis.wsTokens(col(textCol))
    val feats = docs.select(col(idCol).as("doc_id"),
      targetPred.cast("double").as("y"),
      lit(1.0).as("x1"),
      (size(w).cast("double") / 100.0).as("x2"),
      (length(col(textCol)).cast("double") / 1000.0).as("x3"),
      (size(array_distinct(w)).cast("double") /
        greatest(size(w), lit(1)).cast("double")).as("x4"))
    var wts = Array(0.0, 0.0, 0.0, 0.0)
    for (_ <- 1 to iters) {
      val z = lit(wts(0)) * col("x1") + lit(wts(1)) * col("x2") +
        lit(wts(2)) * col("x3") + lit(wts(3)) * col("x4")
      val resid = col("y") - lit(1.0) / (lit(1.0) + exp(-z))
      val g = feats.agg(
        avg(col("x1") * resid), avg(col("x2") * resid),
        avg(col("x3") * resid), avg(col("x4") * resid)).collect()(0)
      wts = Array.tabulate(4)(j => wts(j) + lr * g.getDouble(j))
    }
    val z = lit(wts(0)) * col("x1") + lit(wts(1)) * col("x2") +
      lit(wts(2)) * col("x3") + lit(wts(3)) * col("x4")
    feats.select(col("doc_id"), col("y").cast("long").as("y"),
      (floor(lit(1.0) / (lit(1.0) + exp(-z)) * 1000) / 1000).as("score"))
  }

  /** Luhn sum of `digits` (a fixed-length all-digit string): standard
    * checksum walk — from the RIGHT, every second digit doubles, 9-fold
    * overflow subtracts 9, all summed. Pure integer column arithmetic
    * (exactly replayable in any engine), row-local.
    */
  private def luhnSum(digits: Column, nDigits: Int): Column =
    aggregate(transform(sequence(lit(1), lit(nDigits)), i => {
      val d = digits.substr(i, lit(1)).cast("int")
      when((lit(nDigits + 1) - i) % 2 === 0,
        when(d * 2 > 9, d * 2 - 9).otherwise(d * 2)).otherwise(d)
    }), lit(0), (acc, x) => acc + x)

  /** Deterministic PII-bearing text for a document (the [[piiScanValidated]]
    * fixture, same pattern as ImageHeaders.buildForDoc: the corpus carries
    * no real PII, so the query BUILDS a payload from `doc_id` arithmetic
    * and the scanner genuinely parses it back — one wrong span boundary
    * or checksum anywhere fails the oracle hash). Appends to `text`:
    * an email, a VALID IPv4, an INVALID IPv4 (first octet 999 — must be
    * rejected by octet validation), an SSN-shaped id for even docs, a URL
    * for docs ≡ 0 (mod 3), and a 16-digit card in spaced groups whose
    * Luhn check digit is correct exactly for even docs (odd docs get the
    * check digit bumped by 1 — a single-digit corruption Luhn must
    * catch).
    */
  def piiFixture(id: Column, text: Column): Column = {
    val base15 = lpad(((id * 2654435761L) % 1000000000000000L).cast("string"),
      15, "0")
    // Luhn over the payload with a placeholder 0 check digit: the check
    // position (fromRight = 1) never doubles, so the placeholder
    // contributes 0 and the remaining digits carry their final doubling
    val s15 = luhnSum(concat(base15, lit("0")), 16)
    val check = (lit(10) - (s15 % 10)) % 10
    val last = when(id % 2 === 0, check).otherwise((check + 1) % 10)
    val d16 = concat(base15, last.cast("string"))
    val grouped = concat_ws(" ", d16.substr(1, 4), d16.substr(5, 4),
      d16.substr(9, 4), d16.substr(13, 4))
    // card precedes the SSN: an SSN's last-4 followed by card digits
    // would otherwise form a bogus leftmost 4×4-digit candidate span
    concat(text,
      lit(" u"), id.cast("string"), lit("@ex"), (id % 7).cast("string"),
      lit(".com 10."), (id % 256).cast("string"), lit("."),
      ((id * 7) % 256).cast("string"), lit("."),
      ((id * 13) % 256).cast("string"),
      lit(" 999."), (id % 256).cast("string"), lit(".7.9 "),
      grouped,
      when(id % 2 === 0,
        concat(lit(" "), lpad((id % 1000).cast("string"), 3, "0"), lit("-"),
          lpad((id % 100).cast("string"), 2, "0"), lit("-"),
          lpad((id % 10000).cast("string"), 4, "0"))).otherwise(lit("")),
      when(id % 3 === 0,
        concat(lit(" https://ex.org/p/"), id.cast("string")))
        .otherwise(lit("")))
  }

  /** VALIDATED PII scan — the step up from [[piiScan]]'s pattern counts:
    * candidates are checked against the format's own rules before they
    * count. IPv4 octets must be 0–255 (the regex alternation rejects
    * 999.x.y.z), and card numbers must pass the Luhn checksum (the
    * mod-10 digit-doubling walk every issuer embeds), reported as
    * candidates vs validated so the false-candidate rate is visible.
    * Pattern-only matching over-redacts (masking ids and version strings
    * that merely look card-shaped) and over-reports PII incidence;
    * validation is what makes a scan auditable.
    *
    * Per-row regex + integer-checksum projection: stateless, no shuffle,
    * scales with input splits. Luhn runs only on regex-admitted
    * candidates (a handful per document), not every digit run.
    */
  def piiScanValidated(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val octet = "(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])"
    val ipv4 = s"\\b$octet(\\.$octet){3}\\b"
    val ssn = "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b"
    val url = "https?://[^\\s]+"
    val card = "\\b[0-9]{4}( [0-9]{4}){3}\\b"
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val cands = regexp_extract_all(t, lit(card), lit(0))
    val luhnOk = (c: Column) =>
      luhnSum(regexp_replace(c, " ", ""), 16) % 10 === 0
    docs.select(
      col(idCol),
      size(regexp_extract_all(t, lit(email), lit(0))).cast("long")
        .as("n_email"),
      size(regexp_extract_all(t, lit(ipv4), lit(0))).cast("long")
        .as("n_ipv4"),
      size(regexp_extract_all(t, lit(ssn), lit(0))).cast("long").as("n_ssn"),
      size(regexp_extract_all(t, lit(url), lit(0))).cast("long").as("n_url"),
      size(cands).cast("long").as("n_cc"),
      size(filter(cands, luhnOk)).cast("long").as("n_cc_valid"))
  }

  /** Per-source tokenizer compression: chars-per-BPE-token and fertility
    * (BPE tokens per whitespace word) using the corpus-trained merge
    * table ([[bpeEncode]]). The tokenizer-fit diagnostic behind mixture
    * decisions: a source whose compression is far below the corpus
    * average is paying more of the context window per character (code,
    * rare scripts, OCR noise) — which changes its EFFECTIVE weight in
    * token-budgeted selections ([[tokenBudgetSelect]], [[epochSchedule]]
    * allocate TOKENS, so a poorly-compressed source gets fewer
    * characters of representation for the same budget).
    *
    * Pure composition: [[bpeEncode]]'s per-doc accounting + one
    * source-keyed rollup of exact long counts; ratios quantized at 1e-4.
    */
  def bpeCompression(docs: DataFrame, merges: Int = 8,
      srcCol: String = "source"): DataFrame = {
    val enc = bpeEncode(docs, merges)
    enc.join(docs.select(col("doc_id"), col(srcCol).as("source"),
        col("n_chars")), Seq("doc_id"))
      .groupBy(col("source"))
      .agg(sum(col("n_words")).as("n_words"),
        sum(col("n_bpe_tokens")).as("n_bpe_tokens"),
        sum(col("n_chars")).as("n_chars"))
      .withColumn("chars_per_tok", TextAnalysis.quant4(
        col("n_chars").cast("double") / col("n_bpe_tokens")))
      .withColumn("fertility", TextAnalysis.quant4(
        col("n_bpe_tokens").cast("double") / col("n_words")))
  }

  /** Epoch schedule: capped water-filling of a total token BUDGET across
    * sources — the mixture-design step after [[mixtureWeights]]. Each
    * source asks for budget share ∝ its temperature weight w = n^alpha
    * (alpha < 1 upweights small sources), but no source may be repeated
    * past `maxEpochs` (its cap = maxEpochs·n_toks — the "4 epochs max"
    * rule of standard pretraining recipes: more repeats degrade, see
    * Muennighoff et al. 2023). Classic bounded proportional allocation:
    * sources are capped in ascending cap/weight order (the temperature-
    * boosted SMALL sources hit the epoch cap first — exactly the regime
    * the cap exists for), and the remaining budget waterfills the rest
    * proportionally. Greedy-prefix = global optimum: capping a below-
    * fair-share source only RAISES the fill level λ for the rest, so the
    * capped set is a prefix of the ratio order and each row's test needs
    * only its predecessors' state.
    *
    * Returns one row per source: `capped`, allocated tokens, and the
    * effective epoch count (alloc/n ≤ maxEpochs). Budget here is
    * `budgetFactor × total corpus tokens` so the operator scales with
    * its input.
    *
    * Shape at scale: the only corpus-sized work is the token count (one
    * groupBy). Everything after runs on the per-source table — windows
    * over a #sources-row frame, deliberately single-partition (sources
    * number in the dozens at any corpus size). All running sums are
    * ORDERED (bit-reproducible addition order, engine-portable).
    */
  def epochSchedule(docs: DataFrame, budgetFactor: Double = 3.0,
      maxEpochs: Double = 4.0, alpha: Double = 0.5,
      srcCol: String = "source", textCol: String = "text"): DataFrame = {
    require(budgetFactor > 0 && maxEpochs > 0)
    val base = docs.groupBy(col(srcCol))
      .agg(sum(size(TextAnalysis.wsTokens(col(textCol))).cast("long"))
        .as("n_toks"))
      .select(col(srcCol).as("source"), col("n_toks"))
      .withColumn("w", pow(col("n_toks").cast("double"), lit(alpha)))
      .withColumn("cap", col("n_toks").cast("double") * maxEpochs)
      .withColumn("ratio", col("cap") / col("w"))
    val byRatio = Window.orderBy(col("ratio"), col("source"))
    val prev = byRatio.rowsBetween(Window.unboundedPreceding, -1)
    val inc = byRatio.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = base
      .withColumn("pcap", coalesce(sum(col("cap")).over(prev), lit(0.0)))
      .withColumn("pw", coalesce(sum(col("w")).over(prev), lit(0.0)))
      .withColumn("iw", sum(col("w")).over(inc))
      .withColumn("itoks", sum(col("n_toks")).over(inc))
    // ordered totals (identical addition order in every engine)
    val tot = ranked.agg(max(col("iw")).as("tot_w"),
      max(col("itoks")).as("tot_toks"))
    val flagged = ranked.crossJoin(broadcast(tot))
      .withColumn("budget", col("tot_toks").cast("double") * budgetFactor)
      // capped ⇔ ratio ≤ λ-so-far = (B - pcap) / (tot_w - pw),
      // cross-multiplied (tot_w - pw > 0 whenever the row exists)
      .withColumn("capped",
        col("ratio") * (col("tot_w") - col("pw")) <=
          col("budget") - col("pcap"))
    // capped spend as ORDERED running sums (capped rows form a prefix and
    // the terms are non-negative, so max(cumsum) = the last value —
    // bit-identical addition order in every engine)
    val flagged2 = flagged
      .withColumn("cap_cum",
        sum(when(col("capped"), col("cap")).otherwise(lit(0.0))).over(inc))
      .withColumn("w_cum",
        sum(when(col("capped"), col("w")).otherwise(lit(0.0))).over(inc))
    val spent = flagged2.agg(max(col("cap_cum")).as("cap_spent"),
      max(col("w_cum")).as("w_spent"))
    flagged2.crossJoin(broadcast(spent))
      .withColumn("lam",
        (col("budget") - col("cap_spent")) / (col("tot_w") - col("w_spent")))
      .withColumn("alloc_toks",
        floor(when(col("capped"), col("cap"))
          .otherwise(col("lam") * col("w"))).cast("long"))
      .withColumn("epochs", TextAnalysis.quant4(
        col("alloc_toks").cast("double") / col("n_toks").cast("double")))
      .select(col("source"), col("n_toks"), col("capped"),
        col("alloc_toks"), col("epochs"))
  }

  /** CCNet-style perplexity buckets (Wenzek et al. 2020): rank every
    * document within its source by LM cross-entropy ([[bigramLmScore]],
    * ascending — fluent first) and cut each source's ranking into
    * `head` / `middle` / `tail` thirds. The canonical crawl-curation
    * triage: train on head+middle, inspect or drop tail, and keep the
    * cut PER SOURCE so a noisy source's best third survives even when
    * its absolute perplexity is worse than a clean source's worst.
    *
    * Bucket rule: `bucket_ix = ((rank-1) * 3) div n_source` — pure
    * integer arithmetic, so the cut is engine-portable (no ntile
    * semantics to replicate, no float boundaries) and ties are broken
    * deterministically by `doc_id`.
    *
    * Shape at scale: the per-source ranking deliberately avoids a
    * per-source total-order window (one reducer per source = the
    * hottest source becomes the straggler). Same composite-bucket trick
    * as [[tokenBudgetSelect]]: `row_number` within (source, xent2,
    * id-range) partitions — all narrow slices, parallel — plus one
    * BROADCAST offsets table (distinct (source, score, range) triples,
    * corpus-sublinear) whose running sum converts local ranks to exact
    * per-source ranks. Provably identical to the single-window
    * formulation for any `rangeWidth`.
    */
  def pplBuckets(docs: DataFrame, lambda: Double = 0.5,
      rangeWidth: Long = 1000L, idCol: String = "doc_id",
      textCol: String = "text", srcCol: String = "source"): DataFrame = {
    val scored = bigramLmScore(docs, lambda, idCol, textCol)
      .join(docs.select(col(idCol).as("doc_id"), col(srcCol).as("source")),
        Seq("doc_id"))
      .withColumn("rng", floor(col("doc_id") / rangeWidth).cast("long"))
    val wLocal = Window.partitionBy(col("source"), col("xent2"), col("rng"))
      .orderBy(col("doc_id"))
    val local = scored.withColumn("local_rn",
      row_number().over(wLocal).cast("long"))
    val wOff = Window.partitionBy(col("source"))
      .orderBy(col("xent2"), col("rng"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wTot = Window.partitionBy(col("source"))
    val offsets = scored.groupBy(col("source"), col("xent2"), col("rng"))
      .agg(count(lit(1)).as("c"))
      .withColumn("offset", coalesce(sum(col("c")).over(wOff), lit(0L)))
      .withColumn("n_src", sum(col("c")).over(wTot))
      .select(col("source"), col("xent2"), col("rng"), col("offset"),
        col("n_src"))
    local.join(broadcast(offsets), Seq("source", "xent2", "rng"))
      .withColumn("src_rank", col("offset") + col("local_rn"))
      .withColumn("bix", expr("((src_rank - 1) * 3) div n_src"))
      .withColumn("bucket",
        when(col("bix") === 0, "head")
          .when(col("bix") === 1, "middle")
          .otherwise("tail"))
      .select(col("doc_id"), col("source"), col("xent2"), col("src_rank"),
        col("bucket"))
  }

  /** Per-document n-gram NOVELTY: what fraction of a document's distinct
    * n-grams appear in no other document. The inverse view of
    * [[boilerplate]] (which reports corpus-level prevalence) and the
    * corpus-internal sibling of [[benchmarkExposure]]: novelty ≈ 0 means
    * the document is assembled from text the corpus already has (a
    * near-dup or a template instance — [[Dedup]] candidates), novelty
    * ≈ 1 means it contributes genuinely new text. Used as a curation
    * signal (prefer novel documents under a token budget) and as a
    * dedup-recall diagnostic (high-shared documents that survived dedup
    * warrant a look).
    *
    * Shingle rule matches the portable-hash dedup family
    * ([[Dedup.minhashLshPairsPortable]]): word n-grams, whole text as
    * one shingle when shorter than n, hashed by md5-prefix so every
    * engine computes identical keys.
    *
    * Shape at scale: one distinct (doc, gram-hash) relation; document
    * frequency is one map-side-combinable count on the hash; the join
    * back to doc grams is hash-keyed equi — the standard inverted-index
    * shape, never pairwise. Final per-doc rollup rides the doc_id key.
    */
  /** Phrase-level heavy hitters with a count-min-sketch candidate pass and
    * an exact rescan — the two-pass shape that makes corpus-wide frequent-
    * phrase mining feasible at 100 TB. A single exact
    * `groupBy(gram).count()` shuffles EVERY occurrence of EVERY distinct
    * n-gram (the long Zipf tail is almost all of them); the sketch pass
    * instead map-side-combines occurrences into a fixed `depth`×`width`
    * counter grid (≤ depth·width rows cross the wire regardless of corpus
    * size), the tiny grid is collected and re-enters the plan as LITERAL
    * arrays, and the second scan filters each occurrence ROW-LOCALLY on
    * its sketch estimate before the only per-gram shuffle — so the shuffle
    * carries just candidate occurrences. CMS never underestimates
    * (estimate = min over rows of a counter the gram itself incremented),
    * so candidates ⊇ true heavy hitters: the rescan output is EXACT, not
    * approximate — which is why this query gets a full hash-checked DuckDB
    * oracle (the oracle replays the sketch as a join instead of a literal
    * lookup; same arithmetic, same admissions).
    *
    * Pruning efficacy is governed by `width`: a tail gram survives
    * admission only via collision mass, expected tot/width per counter, so
    * size width ≳ e·tot/minCount at the target scale (the classic CMS
    * bound). At sf0.01 (≈26 k occurrences, width 8192) the grid is sparse
    * and the tail really is dropped pre-shuffle; at 100 TB the same plan
    * wants width ~1e7 — still a few hundred MB of driver grid, still a
    * plan literal well below broadcast-join sizes. Hash family: the
    * portable affine rows over [[Dedup.portableHash32]], exact in BIGINT
    * in both engines.
    */
  def heavyHitters(docs: DataFrame, n: Int = 3, minCount: Long = 6,
      depth: Int = 4, width: Int = 8192,
      textCol: String = "text"): DataFrame = {
    // token array materialized once — see [[bigrams]] on the O(tokens²) trap
    val w = col("_w")
    val shingleStrs = when(size(w) >= n,
        transform(sequence(lit(0), size(w) - n),
          i => concat_ws(" ", slice(w, i + lit(1), lit(n)))))
      .otherwise(array(concat_ws(" ", w)))
    // one row per OCCURRENCE (no array_distinct: this is frequency, not df)
    val occ = docs
      .withColumn("_w", TextAnalysis.wsTokens(col(textCol)))
      .select(explode(shingleStrs).as("s"))
      .withColumn("b", Dedup.portableHash32(col("s")))
    def bucket(i: Int): Column =
      (((lit(2L * i + 3) * col("b") + lit(7919L * i) + lit(1L))
        % Dedup.PortableP) % width).cast("int")

    // pass 1: the sketch. posexplode multiplies rows by `depth` but the
    // partial aggregation collapses them to ≤ depth·width per task before
    // anything shuffles.
    val grid = occ
      .select(posexplode(array((0 until depth).map(bucket): _*))
        .as(Seq("i", "bucket")))
      .groupBy(col("i"), col("bucket")).agg(count(lit(1)).as("c"))
      .collect()
    val rows = Array.fill(depth)(Array.fill(width)(0L))
    grid.foreach(r => rows(r.getInt(0))(r.getInt(1)) = r.getLong(2))

    // pass 2: row-local admission against the literal grid, then the exact
    // count over admitted occurrences only
    val est = least((0 until depth).map(i =>
      element_at(typedLit(rows(i).toSeq), bucket(i) + lit(1))): _*)
    occ.withColumn("cms_est", est)
      .filter(col("cms_est") >= minCount)
      .groupBy(col("s").as("gram"), col("cms_est"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)
      .select(col("gram"), col("cnt"), col("cms_est"))
  }

  /** Deterministic URL-bearing text for a document (the [[domainStats]]
    * fixture, same doc_id-arithmetic pattern as [[piiFixture]]): the test
    * corpus carries no URLs, so the query BUILDS them and the extractor
    * genuinely parses them back. Appends one primary URL exercising every
    * normalization rule — scheme varies by parity, a `www.` prefix every
    * third doc, an explicit `:8080` port every seventh, a path suffix —
    * and, for docs ≡ 0 (mod 5), a second URL on a blocklisted domain
    * behind an `ads.` subdomain (so registered-domain folding, not host
    * equality, must be what matches the blocklist).
    */
  /** Deterministic noisy-URL fixture: per document one URL whose
    * idHash-driven noise features are exactly the equivalences a crawler
    * frontier must collapse — scheme/host case (h%2), a `www.` prefix
    * (h%3), an explicit default port `:443` (h%5), a trailing slash
    * (h%7), `utm_` tracking params ahead of a real param (h%4=0), a real
    * `id` param alone (h%4=1), and a fragment (h%6). The underlying
    * identity (host h%13, path h%37, id h%11) is shared across documents,
    * so canonicalization produces REAL collisions to dedup.
    */
  def urlNoisyFixture(id: Column): Column = {
    val h = idHash(id)
    val prefix = concat(lit("https://"),
      when(h % 3 === 0, lit("www.")).otherwise(lit("")),
      lit("site"), (h % 13).cast("string"), lit(".example.com"),
      when(h % 5 === 0, lit(":443")).otherwise(lit("")))
    concat(
      when(h % 2 === 0, upper(prefix)).otherwise(prefix),
      lit("/p/"), (h % 37).cast("string"),
      when(h % 7 === 0, lit("/")).otherwise(lit("")),
      when(h % 4 === 0, concat(lit("?utm_source=feed&id="), (h % 11).cast("string")))
        .when(h % 4 === 1, concat(lit("?id="), (h % 11).cast("string")))
        .otherwise(lit("")),
      when(h % 6 === 0, lit("#sec")).otherwise(lit("")))
  }

  /** URL canonicalization (q173): the frontier/dedup normal form every
    * web-scale corpus keys on — drop the fragment, lowercase the
    * scheme+authority (never the path: paths are case-sensitive), strip
    * a `www.` prefix and explicit default ports (:80/:443), drop `utm_*`
    * tracking parameters while KEEPING real ones (the query string is
    * split into params and filtered as a LIST, so the `?`/`&` separator
    * structure survives partial removal — the naive regex strip leaves a
    * dangling `&`), and strip one trailing slash. Adds `canonical_url`;
    * intermediates are staged at projection boundaries so each regex
    * runs once per row. Row-local, shuffle-free; identical regex
    * semantics in Java and RE2.
    */
  def canonicalizeUrls(df: DataFrame, urlCol: String = "url"): DataFrame = {
    val staged = df
      .withColumn("_nf", regexp_replace(col(urlCol), "#.*$", ""))
      .withColumn("_a0", regexp_extract(col("_nf"), "^([A-Za-z]+://[^/?]*)", 1))
      .withColumn("_rest", col("_nf").substr(length(col("_a0")) + 1, length(col("_nf"))))
    val auth = regexp_replace(
      regexp_replace(lower(col("_a0")), "^(https?://)www\\.", "$1"),
      ":(443|80)$", "")
    val path = regexp_replace(regexp_extract(col("_rest"), "^([^?]*)", 1),
      "/$", "")
    val qs = when(instr(col("_rest"), "?") > 0,
      col("_rest").substr(instr(col("_rest"), "?") + 1, length(col("_rest"))))
      .otherwise(lit(""))
    val params = filter(split(qs, "&"),
      p => !p.startsWith("utm_") && p =!= lit(""))
    staged.withColumn("canonical_url",
        concat(auth, path,
          when(size(params) > 0, concat(lit("?"), array_join(params, "&")))
            .otherwise(lit(""))))
      .drop("_nf", "_a0", "_rest")
  }

  /** Canonical-URL dedup report (q173): one row per canonical form with
    * the variant count and the kept (minimum) id — the frontier's
    * visited-set semantics. One equi-shuffle on the canonical key with
    * map-side combine.
    */
  def urlCanonicalDedup(df: DataFrame, idCol: String = "doc_id"): DataFrame =
    df.groupBy(col("canonical_url"))
      .agg(count(lit(1)).as("n_variants"), min(col(idCol)).as("keep_id"))

  def urlFixture(id: Column, text: Column): Column = {
    val tld = element_at(typedLit(Seq("com", "org", "net", "io")),
      (id % 4).cast("int") + lit(1))
    concat(text,
      lit(" "), when(id % 2 === 0, lit("https://")).otherwise(lit("http://")),
      when(id % 3 === 0, lit("www.")).otherwise(lit("")),
      lit("site"), (id % 23).cast("string"), lit("."), tld,
      when(id % 7 === 0, lit(":8080")).otherwise(lit("")),
      lit("/p/"), id.cast("string"),
      when(id % 5 === 0,
        concat(lit(" https://ads.spamhub.biz/x"), id.cast("string")))
        .otherwise(lit("")))
  }

  /** Per-domain corpus statistics with blocklist verdicts — the
    * RefinedWeb/C4-style curation gate that decides a web corpus's fate at
    * the REGISTERED-DOMAIN level, not per page: extract every URL, fold it
    * to its registered domain (strip scheme, `www.`, port, path; keep the
    * last two dot-labels so `ads.spamhub.biz` and `www.spamhub.biz` meet
    * at `spamhub.biz`), and aggregate. Verdict: blocklisted → `drop`;
    * domains seen in ≥ `minDocs` documents → `keep`; the long tail →
    * `review` (the manual-audit queue every production crawl filter
    * feeds).
    *
    * Scale: extraction and normalization are row-local regex/string
    * projections (stateless, split-parallel); the only shuffle is the
    * domain rollup, whose partial aggregation absorbs hot domains
    * map-side (counts are algebraic; the distinct-doc count is Spark's
    * two-phase partial-distinct). The blocklist rides the plan as an
    * `IN` literal — at production size it becomes a broadcast semi-join,
    * same verdict semantics.
    */
  def domainStats(docs: DataFrame, blocklist: Seq[String] = Seq(
      "spamhub.biz", "malware.net"), minDocs: Int = 5,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val urls = docs.select(col(idCol).as("doc_id"),
      explode(regexp_extract_all(col(textCol),
        lit("https?://[^\\s]+"), lit(0))).as("url"))
    val host = split_part(split_part(
      regexp_replace(col("url"), "^https?://", ""), lit("/"), lit(1)),
      lit(":"), lit(1))
    val labels = split(lower(regexp_replace(host, "^www\\.", "")), "\\.")
    val domain = concat_ws(".", slice(labels, -2, 2))
    urls.select(col("doc_id"), domain.as("domain"))
      .groupBy(col("domain"))
      .agg(count(lit(1)).as("n_urls"),
        countDistinct(col("doc_id")).as("n_docs"))
      .withColumn("blocked", col("domain").isin(blocklist: _*))
      .withColumn("verdict",
        when(col("blocked"), "drop")
          .when(col("n_docs") >= minDocs, "keep")
          .otherwise("review"))
  }

  /** Context-window fit report: for each candidate sequence length L, what
    * one-doc-per-sequence training at L would cost this corpus — tokens
    * truncated away (docs longer than L), padding burned (docs shorter
    * than L), and the fraction of docs that fit outright. This is the
    * table read BEFORE choosing [[packSequences]]' seqLen or
    * [[chunkDocs]]' window: truncation waste rises with doc length,
    * padding waste falls, and the crossover is a corpus property, not a
    * constant. All sums are exact BIGINTs over whitespace token counts;
    * fractions are floor-quantized at 1e-6 — engine-portable.
    *
    * Shape: one row-local token count per doc, a |lengths|-way explode
    * (bounded fan-out), and a groupBy(seq_len) whose partial aggregation
    * collapses everything map-side to |lengths| rows per task.
    */
  def seqLenFit(docs: DataFrame, lengths: Seq[Int] = Seq(64, 128, 256, 512),
      textCol: String = "text"): DataFrame = {
    val toks = size(filter(split(col(textCol), " "), t => t =!= lit("")))
      .cast("long")
    docs.select(toks.as("tok"),
        explode(typedLit(lengths.map(_.toLong))).as("seq_len"))
      .groupBy(col("seq_len"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("tok")).as("total_tokens"),
        sum(greatest(col("tok") - col("seq_len"), lit(0L)))
          .as("trunc_tokens"),
        sum(col("seq_len") - least(col("tok"), col("seq_len")))
          .as("pad_tokens"),
        sum(when(col("tok") <= col("seq_len"), 1L).otherwise(0L))
          .as("n_fit"))
      .select(col("seq_len"), col("n_docs"), col("total_tokens"),
        col("trunc_tokens"), col("pad_tokens"),
        (floor(col("trunc_tokens") * 1000000L / col("total_tokens"))
          .cast("double") / 1e6).as("trunc_frac"),
        (floor(col("pad_tokens") * 1000000L
          / (col("n_docs") * col("seq_len"))).cast("double") / 1e6)
          .as("pad_frac"),
        (floor(col("n_fit") * 1000000L / col("n_docs")).cast("double") / 1e6)
          .as("fit_frac"))
  }

  /** Population-stability drift between two corpus snapshots — the
    * continuous-crawl monitoring query: bucket a score column into
    * equal-width bins fixed by the BASELINE snapshot's [min, max], count
    * both snapshots into those bins, and report per-bin PSI contributions
    * (p−q)·ln(p/q) with 0.5-add smoothing so empty bins stay finite.
    * PSI ≳ 0.2 on a quality score between lake versions is the classic
    * "retrain/re-curate" alarm. Pairs with the table layer's time travel:
    * `driftReport(t.read(spark, Some(v)), t.read(spark), "quality")` is
    * drift between snapshot v and head (q134 drives exactly that).
    *
    * Equal-width baseline bins (not rank deciles) keep the whole report
    * deterministic and engine-portable: bin edges are two broadcast
    * scalars, assignment is row-local double arithmetic both engines run
    * identically, and ties never consult a window. Shape: two scans, each
    * collapsing map-side to ≤ buckets rows; everything downstream is
    * bucket-count-sized.
    */
  def driftReport(before: DataFrame, after: DataFrame, scoreCol: String,
      buckets: Int = 10): DataFrame = {
    val sc = col(scoreCol).cast("double")
    val stats = before.agg(min(sc).as("lo"), max(sc).as("hi"))
    val totals = before.agg(count(lit(1)).as("nb"))
      .crossJoin(after.agg(count(lit(1)).as("na")))
    def bucketed(df: DataFrame): DataFrame =
      df.select(sc.as("score")).crossJoin(broadcast(stats))
        .select(when(col("hi") === col("lo"), lit(0L))
          .otherwise(least(greatest(
              floor((col("score") - col("lo")) * buckets
                / (col("hi") - col("lo"))), lit(0.0)),
            lit((buckets - 1).toDouble)).cast("long"))
          .as("bucket"))
    val cb = bucketed(before).groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_before"))
    val ca = bucketed(after).groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_after"))
    val spine = before.sparkSession.range(buckets)
      .select(col("id").as("bucket"))
    val p = (col("n_before") + lit(0.5)) / (col("nb") + lit(0.5 * buckets))
    val q = (col("n_after") + lit(0.5)) / (col("na") + lit(0.5 * buckets))
    spine.join(cb, Seq("bucket"), "left").join(ca, Seq("bucket"), "left")
      .select(col("bucket"),
        coalesce(col("n_before"), lit(0L)).as("n_before"),
        coalesce(col("n_after"), lit(0L)).as("n_after"))
      .crossJoin(broadcast(totals))
      .select(col("bucket"), col("n_before"), col("n_after"),
        (floor(p * 1000000L).cast("double") / 1e6).as("p"),
        (floor(q * 1000000L).cast("double") / 1e6).as("q"),
        (floor((p - q) * log(p / q) * 10000L).cast("double") / 1e4)
          .as("psi"))
  }

  /** Deterministic epoch ordering — the reproducible "shuffle" a training
    * run needs: every worker, on every restart, must agree on exactly
    * which document occupies global position i of epoch `seed`, without
    * any engine materializing a total order. The classic trick (what
    * multi-worker data loaders actually do) is shard-then-interleave:
    * hash every doc with a seed-keyed portable hash, route it to
    * shard = hash mod nShards, sort WITHIN the shard by (hash, id), and
    * define the global order as the strided interleave
    * `global_pos = (pos_in_shard − 1)·nShards + shard`. That is a
    * bijection into [0, N·nShards) that consumes shards round-robin —
    * statistically a full shuffle (the hash already randomized shard
    * assignment and within-shard order) but each window is PARTITIONED BY
    * shard, so at 100 TB this is nShards independent sorts of corpus/nShards
    * rows each, never a single-partition global row_number. Changing the
    * seed re-deals both the shard assignment and every within-shard rank —
    * a fresh permutation per epoch from one integer.
    *
    * The hash is [[Dedup.portableHash32]] over `"seed:doc_id"`, so a SQL
    * oracle replays the exact permutation bit-for-bit (q137).
    */
  def epochOrder(docs: DataFrame, seed: Long, nShards: Int = 8,
      idCol: String = "doc_id"): DataFrame = {
    val key = Dedup.portableHash32(
      concat(lit(seed.toString), lit(":"), col(idCol).cast("string")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("skey"), col(idCol))
    docs.withColumn("skey", key)
      .withColumn("shard", col("skey") % nShards)
      .withColumn("pos_in_shard", row_number().over(w).cast("long"))
      .withColumn("global_pos",
        (col("pos_in_shard") - 1) * nShards + col("shard"))
      .select(col(idCol), col("shard"), col("pos_in_shard"),
        col("global_pos"))
  }

  /** Dataset card — the per-source datasheet a release ships with (one
    * row per source): volume (docs/tokens/chars), share of the corpus
    * token budget, exact-duplicate rate (1 − distinct md5(text)/docs),
    * language spread (distinct langs + Shannon entropy of the language
    * mix, in nats), and mean document length. This is the summary table
    * every curation decision upstream (quotas, budgets, mixtures) reads
    * first; it composes the corpus-level aggregates the engine already
    * computes piecemeal into one release artifact.
    *
    * Entropy uses the exact identity H = ln N − (Σ c·ln c)/N over the
    * per-(source,lang) counts, so no per-row probability division ever
    * happens — both aggregation levels collapse map-side (the first to
    * |sources|·|langs| rows, the second to |sources|). The duplicate
    * count is a two-phase distinct on md5(text) — the only shuffle
    * whose width is data-sized, keyed by a 128-bit hash so it cannot
    * skew. All fractions floor-quantized (1e-6; avg 1e-3) for
    * engine-portable doubles.
    */
  def datasetCard(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val toks = size(filter(split(col(textCol), " "), t => t =!= lit("")))
      .cast("long")
    val base = docs.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(toks).as("n_tokens"),
        sum(length(col(textCol)).cast("long")).as("n_chars"),
        countDistinct(md5(col(textCol))).as("n_distinct"))
    val langs = docs.groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_langs"),
        sum(col("c") * log(col("c"))).as("clnc"),
        sum(col("c")).as("nd"))
    val totals = docs.agg(sum(toks).as("total_tokens"))
    base.join(langs, Seq("source"))
      .crossJoin(broadcast(totals))
      .select(col("source"), col("n_docs"), col("n_tokens"), col("n_chars"),
        (floor(col("n_tokens") * 1000000L / col("total_tokens"))
          .cast("double") / 1e6).as("token_share"),
        (floor(col("n_tokens") * 1000L / col("n_docs")).cast("double") / 1e3)
          .as("avg_tokens"),
        (floor((col("n_docs") - col("n_distinct")) * 1000000L
          / col("n_docs")).cast("double") / 1e6).as("dup_rate"),
        col("n_langs"),
        (floor((log(col("nd").cast("double"))
          - col("clnc") / col("nd")) * 1000000L).cast("double") / 1e6)
          .as("lang_entropy"))
  }

  /** Cluster keywords (class-based TF-IDF, the BERTopic labeling step):
    * given documents and a cluster assignment (here the embedding table's
    * `label`, joined on doc_id = vec_id), concatenate each cluster into
    * one virtual document and rank its terms by
    * `tf(term | cluster) · ln((1 + L) / (1 + df_clusters(term)))` — term
    * frequency within the cluster, damped by how many OTHER clusters the
    * term also appears in. The top-k rows per cluster are the
    * human-readable name of an otherwise opaque embedding cluster; this
    * is the query a curation UI runs right after [[Similarity.kMeans]].
    *
    * Shape at 100 TB: the doc↔assignment join is keyed on doc_id (equi,
    * and the assignment side is narrow); everything after tokenization is
    * (cluster, term)-keyed aggregation that collapses map-side; df is a
    * second small agg over (term → distinct clusters); the final top-k
    * window partitions by cluster — parallel across clusters, never a
    * global sort. Ranking compares full-precision doubles (both engines
    * compute the identical product), the emitted score is floor-quantized
    * at 1e-6, ties break on term asc.
    */
  def clusterKeywords(docs: DataFrame, assignments: DataFrame, k: Int = 5,
      textCol: String = "text"): DataFrame = {
    val toks = docs.join(
        assignments.select(col("vec_id").as("doc_id"), col("label")),
        Seq("doc_id"))
      .select(col("label"),
        explode(filter(split(col(textCol), " "), t => t =!= lit("")))
          .as("term"))
    val tf = toks.groupBy(col("label"), col("term"))
      .agg(count(lit(1)).as("c"))
    val perLabel = tf.groupBy(col("label")).agg(sum(col("c")).as("t"))
    val dfTab = tf.groupBy(col("term"))
      .agg(count(lit(1)).as("df")) // one row per (label, term) → distinct labels
    val nLabels = assignments.agg(countDistinct(col("label")).as("nl"))
    val scored = tf.join(perLabel, Seq("label")).join(dfTab, Seq("term"))
      .crossJoin(broadcast(nLabels))
      .withColumn("score", (col("c") / col("t"))
        * log((lit(1) + col("nl")) / (lit(1) + col("df"))))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("label"))
      .orderBy(col("score").desc, col("term"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("label").cast("long").as("label"), col("rank"),
        col("term"), col("c").as("tf"), col("df").as("n_clusters"),
        (floor(col("score") * 1000000L).cast("double") / 1e6).as("score"))
  }

  /** N-gram language model table (the infini-gram primitive): count every
    * n-token context → next-token continuation in the corpus, and emit
    * the top-k continuations per context for contexts seen at least
    * `minCount` times, with floor-quantized conditional probabilities.
    * This is simultaneously (a) a queryable suffix-count index — "what
    * follows 'of the' in my corpus, how often?" — (b) the memorization /
    * contamination probe (a context whose top continuation carries
    * probability ≈ 1 at high support is boilerplate or a leaked eval
    * answer), and (c) the backing table for n-gram novelty scoring.
    *
    * Shape: the token array is materialized ONCE at a projection boundary
    * (inlining it into the per-position lambda would re-run split+filter
    * per trigram — the O(tokens²)-per-row trap [[TextAnalysis.repetition]]
    * documents); contexts are then built row-locally (slice + concat — no
    * explode-then-self-join), the count is one (context, next)-keyed agg
    * that collapses map-side, and BOTH the support total and the ranking
    * run as windows over a single ctx-partitioned exchange of the
    * already-aggregated table — one scan, one data-width shuffle, no
    * support join, no second Generate subtree. At 100 TB the (ctx, next)
    * key space is huge but the agg is the canonical map-side-combine
    * shape; minCount prunes between the two windows (zero extra
    * exchanges) and bounds the output, not the shuffle.
    */
  def ngramLm(docs: DataFrame, n: Int = 2, k: Int = 3, minCount: Long = 4,
      textCol: String = "text"): DataFrame = {
    val w = col("_w")
    val pairs = when(size(w) > n,
      transform(sequence(lit(0), size(w) - n - 1), i =>
        struct(concat_ws(" ", slice(w, i + lit(1), lit(n))).as("ctx"),
          element_at(w, i + n + 1).as("next_tok"))))
    val counts = docs
      .withColumn("_w", filter(split(col(textCol), " "), t => t =!= lit("")))
      .select(explode(pairs).as("p"))
      .select(col("p.ctx").as("ctx"), col("p.next_tok").as("next_tok"))
      .groupBy(col("ctx"), col("next_tok")).agg(count(lit(1)).as("n_obs"))
    val byCtx = org.apache.spark.sql.expressions.Window
      .partitionBy(col("ctx"))
    val win = byCtx.orderBy(col("n_obs").desc, col("next_tok"))
    counts.withColumn("t", sum(col("n_obs")).over(byCtx))
      .filter(col("t") >= minCount)
      .withColumn("rank", row_number().over(win).cast("long"))
      .filter(col("rank") <= k)
      .select(col("ctx"), col("rank"), col("next_tok"), col("n_obs"),
        col("t").as("ctx_count"),
        (floor(col("n_obs") * 1000000L / col("t")).cast("double") / 1e6)
          .as("prob"))
  }

  /** Quality-threshold calibration sweep — the table read before picking
    * a selection cutoff: for each candidate threshold t, how much of the
    * corpus survives `quality ≥ t` (docs, fraction, tokens) and how well
    * the cheap scalar score agrees with the full Gopher rule battery
    * (precision/recall of the selection against [[TextAnalysis
    * .gopherFilter]]'s keep verdict as the reference gate). A flat
    * precision curve says the score adds nothing over the gate; a recall
    * cliff locates the threshold where real content starts drowning.
    *
    * Shape: ONE row-local scoring pass (both the score and the gate are
    * codegen per-row expressions), a |thresholds|-way bounded explode,
    * and a groupBy(threshold) whose map-side partials collapse to
    * |thresholds| rows per task — the [[seqLenFit]] sweep shape. The
    * gate totals ride a broadcast 1-row crossJoin. Thresholds compare as
    * raw doubles (identical literals and identical quantized scores in
    * both engines); emitted fractions floor-quantized at 1e-6.
    */
  def scoreSweep(docs: DataFrame,
      thresholds: Seq[Double] = (0 until 10).map(_ / 10.0),
      textCol: String = "text"): DataFrame = {
    val g = TextAnalysis.gopherFilter(docs, textCol)
      .select(col("quality_score"), col("n_words"),
        when(col("keep"), 1L).otherwise(0L).as("k"))
    val totals = g.agg(sum(col("k")).as("total_keep"),
      count(lit(1)).as("total_docs"))
    g.select(col("quality_score"), col("n_words"), col("k"),
        explode(typedLit(thresholds)).as("threshold"))
      .filter(col("quality_score") >= col("threshold"))
      .groupBy(col("threshold"))
      .agg(count(lit(1)).as("n_selected"),
        sum(col("n_words")).as("sel_tokens"),
        sum(col("k")).as("n_keep_sel"))
      .crossJoin(broadcast(totals))
      .select(col("threshold"), col("n_selected"), col("sel_tokens"),
        (floor(col("n_selected") * 1000000L / col("total_docs"))
          .cast("double") / 1e6).as("frac_selected"),
        (floor(col("n_keep_sel") * 1000000L / col("n_selected"))
          .cast("double") / 1e6).as("precision_vs_gate"),
        (floor(col("n_keep_sel") * 1000000L / col("total_keep"))
          .cast("double") / 1e6).as("recall_vs_gate"))
  }

  /** Zipf rank–frequency fit — the corpus-linguistics health check: a
    * natural corpus follows freq ∝ rank^slope with slope ≈ −1; machine-
    * generated or template-heavy corpora bend the log–log line. Reports
    * the least-squares (slope, intercept, r²) of ln freq on ln rank over
    * the top-N token types, plus vocabulary totals.
    *
    * Engine-portable exactness without order-dependent float sums: ln
    * values are quantized to integer thousandths per TYPE (row-local),
    * so every regression moment (Σx, Σy, Σxy, Σx², Σy²) is an exact
    * BIGINT whose value no shuffle order can change; the closed-form
    * slope/intercept/r² then divide identical longs in double space.
    * Scale shape: the freq table is the canonical map-side-combine agg;
    * top-N is TakeOrdered (per-partition top-N + merge, never a global
    * sort); the rank window runs over N ROWS (constant, corpus-size-
    * independent) after the limit.
    */
  /** Per-source information panel (q209): unigram entropy H₁, bigram
    * entropy H₂, conditional entropy H(next|prev) ≈ H₂ − H₁ (the chain
    * rule with the bigram-prefix marginal approximated by the unigram
    * table — exact up to each doc's final token), and redundancy
    * 1 − (H₂−H₁)/H₁ — the information-theoretic complement of the
    * compression-ratio signal (deflate measures byte-level structure;
    * this measures TOKEN-level predictability, the thing LM loss
    * actually sees: boilerplate-heavy sources have high redundancy and
    * contribute little gradient signal per token).
    *
    * Engine-portable exactness, the [[sourceAffinity]] discipline: each
    * type's ln(c/T) quantizes to integer millionths ONCE (row-local),
    * entropies are exact BIGINT dot products then one integer division —
    * no order-dependent float sum anywhere.
    *
    * Scale shape: two map-side-combined (source, gram) aggs; everything
    * after is |sources|-sized.
    */
  def entropyPanel(docs: DataFrame, textCol: String = "text"): DataFrame = {
    def h6(grams: DataFrame): DataFrame = {
      val cnt = grams.groupBy(col("source"), col("g"))
        .agg(count(lit(1)).as("c"))
      val tot = cnt.groupBy(col("source"))
        .agg(sum(col("c")).as("tt"), count(lit(1)).as("v"))
      cnt.join(tot, "source")
        .withColumn("l6",
          floor(log(col("c").cast("double") / col("tt")) * 1000000L)
            .cast("long"))
        .groupBy(col("source")).agg(sum(col("c") * col("l6")).as("s"),
          first(col("tt")).as("tt"), first(col("v")).as("v"))
        .withColumn("h6", expr("(-s) div tt"))
    }
    val staged = docs.withColumn("_w", TextAnalysis.wsTokens(col(textCol)))
    val uni = h6(staged.select(col("source"), explode(col("_w")).as("g")))
      .select(col("source"), col("tt").as("n_tokens"), col("v").as("vocab"),
        col("h6").as("h1_6"))
    val grams = when(size(col("_w")) >= 2,
      TextAnalysis.wordNgrams(col("_w"), 2)).otherwise(array())
    val bi = h6(staged.select(col("source"), explode(grams).as("g")))
      .select(col("source"), col("h6").as("h2_6"))
    // greatest(·,0): true conditional entropy is nonnegative, but the
    // unigram approximation of the prefix marginal can dip below zero on
    // tiny/deterministic sources — and a NEGATIVE numerator would split
    // the engines (Spark div truncates toward zero, SQL // floors)
    uni.join(bi, "source")
      .withColumn("red6",
        when(col("h1_6") > 0, lit(1000000L) -
          expr("greatest(h2_6 - h1_6, 0L) * 1000000 div h1_6")))
      .select(col("source"), col("n_tokens"), col("vocab"),
        (col("h1_6").cast("double") / 1e6).as("h_unigram"),
        (col("h2_6").cast("double") / 1e6).as("h_bigram"),
        ((col("h2_6") - col("h1_6")).cast("double") / 1e6).as("h_cond"),
        (col("red6").cast("double") / 1e6).as("redundancy"))
  }

  /** Good-Turing frequency-of-frequencies report (q203): N_r = how many
    * word types occur exactly r times, the smoothed count r* =
    * (r+1)·N_{r+1}/N_r, and the unseen-mass estimate p₀ = N₁/N — the
    * quantities every smoothed LM (Katz backoff, simple Good-Turing) is
    * built from, and the OOV-rate forecast a tokenizer/eval split needs
    * ([[heapsFit]] says how fast new types arrive; p₀ says how much
    * probability the NEXT token draw puts on types never seen). Reported
    * for r ≤ `maxR` (the regime where GT smoothing is actually used;
    * above it r* ≈ r). r* and p₀ are exact BIGINT millionth divisions —
    * no float boundary — and r* = 0 marks the standard truncation where
    * N_{r+1} = 0.
    *
    * Measured over word BIGRAMS by default: GT smoothing lives in the
    * low-count regime, and a unigram table over a bounded vocab has no
    * singletons once the corpus is a few hundred docs (an empty report);
    * the n-gram table is where N₁..N₁₀ stay populated at any corpus
    * size — and it is the table Katz backoff actually smooths.
    *
    * Scale shape: the gram-count agg (map-side combine), a |distinct r|-
    * row frequency-of-frequencies agg, a self-join on r+1 over that tiny
    * table, and a one-row totals broadcast. Nothing after the first agg
    * is corpus-sized.
    */
  def goodTuring(docs: DataFrame, maxR: Int = 10, n: Int = 2,
      textCol: String = "text"): DataFrame = {
    val w = col("_w")
    val grams = when(size(w) >= n, TextAnalysis.wordNgrams(w, n))
      .otherwise(array())
    val freq = docs
      .withColumn("_w", TextAnalysis.wsTokens(col(textCol)))
      .select(explode(grams).as("g"))
      .groupBy(col("g")).agg(count(lit(1)).as("c"))
    val fof = freq.groupBy(col("c").as("r")).agg(count(lit(1)).as("n_r"))
    val tot = freq.agg(sum(col("c")).as("n_tokens"),
      sum(when(col("c") === 1, 1L).otherwise(0L)).as("n1"))
    val next = fof.select(col("r").as("r1"), col("n_r").as("n_r1"))
    fof.filter(col("r") <= maxR)
      .join(next, col("r") + 1 === col("r1"), "left")
      .crossJoin(broadcast(tot))
      .withColumn("n_r_next", coalesce(col("n_r1"), lit(0L)))
      .withColumn("num6", (col("r") + 1) * col("n_r_next") * 1000000L)
      .select(col("r"), col("n_r"), col("n_r_next"),
        (expr("num6 div n_r").cast("double") / 1e6).as("r_star"),
        (expr("n1 * 1000000 div n_tokens").cast("double") / 1e6).as("p0"))
  }

  /** Chao1 vocabulary-richness estimate per source (q247) — the
    * nonparametric "how many types does the UNSEEN tail hold" read
    * (Chao 1984): observed distinct tokens D plus the
    * singleton/doubleton correction f₁²/(2f₂) — an asymptotic LOWER
    * bound on true type richness using only the rarest counts, where
    * [[heapsFit]] extrapolates a power law and [[goodTuring]] prices the
    * next token. The tokenizer-budget complement: a source whose chao1
    * far exceeds its observed D still yields new types to a bigger
    * crawl; a saturated source doesn't. The bias-corrected
    * f₁(f₁−1)/(2(f₂+1)) form applies when f₂ = 0 (Chao's own fix —
    * the raw form divides by zero). Coverage Ĉ = 1 − f₁/N (Good 1953)
    * rides along as exact floored millionths.
    *
    * All integer: the correction divides whole counts (an ESTIMATE of a
    * type count — sub-token precision is noise), f₁² stays in BIGINT to
    * f₁ ≈ 3·10⁹ types. One token aggregation, then a fof collapse per
    * source; the report is |sources| rows.
    */
  def chao1(docs: DataFrame, srcCol: String = "source",
      textCol: String = "text"): DataFrame = {
    val freq = docs
      .select(col(srcCol).as("source"),
        explode(TextAnalysis.wsTokens(col(textCol))).as("w"))
      .groupBy(col("source"), col("w")).agg(count(lit(1)).as("c"))
    freq.groupBy(col("source")).agg(
        sum(col("c")).as("n_tokens"),
        count(lit(1)).as("d_observed"),
        sum(when(col("c") === 1, 1L).otherwise(0L)).as("f1"),
        sum(when(col("c") === 2, 1L).otherwise(0L)).as("f2"))
      .withColumn("chao1", col("d_observed") + when(col("f2") > 0,
          expr("f1 * f1 div (2 * f2)"))
        .otherwise(expr("f1 * (f1 - 1) div (2 * (f2 + 1))")))
      .select(col("source"), col("n_tokens"), col("d_observed"),
        col("f1"), col("f2"), col("chao1"),
        (expr("(n_tokens - f1) * 1000000 div n_tokens")
          .cast("double") / 1e6).as("coverage"))
  }

  /** Heaps-law vocabulary-growth fit (q202): V(N) ≈ K·N^β measured at
    * `k` doc-id checkpoints — the tokenizer-planning read ([[zipfFit]]'s
    * companion: Zipf says how mass concentrates, Heaps says how fast NEW
    * types keep arriving, i.e. whether a 32k/64k/128k vocab saturates).
    * Per checkpoint c: N_c = tokens in docs with id ≤ ⌊max_id·c/k⌋ and
    * V_c = types whose FIRST occurrence (min doc_id per word — one
    * map-side-combined agg, no global sort) lies ≤ the threshold; then
    * the same quantized log-log least squares as [[zipfFit]] over the k
    * points gives β (slope) and ln K (intercept).
    *
    * Scale shape: per-doc token counts and first-occurrence docs are two
    * linear aggregations; the checkpoint fan-out is a broadcast k-row
    * cross join collapsed straight back to k rows by a map-side-combined
    * sum — no running-total window over the corpus (an unpartitioned
    * cumulative-sum window would serialize |docs| rows through one
    * task). Every moment is an exact BIGINT; slope/r² floor-quantized.
    */
  def heapsFit(docs: DataFrame, k: Int = 10, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val perDoc = docs.select(col(idCol).as("id"),
      size(TextAnalysis.wsTokens(col(textCol))).cast("long").as("nt"))
    val firstOcc = docs
      .select(col(idCol).as("id"),
        explode(TextAnalysis.wsTokens(col(textCol))).as("w"))
      .groupBy(col("w")).agg(min(col("id")).as("fd"))
      .groupBy(col("fd")).agg(count(lit(1)).as("nv"))
    val mx = broadcast(perDoc.agg(max(col("id")).as("mx")))
    val cks = mx.select(explode(sequence(lit(1), lit(k))).as("c"),
      col("mx"))
      .select(col("c"), expr("mx * c div " + k).as("thresh"))
    val toks = perDoc.crossJoin(broadcast(cks))
      .filter(col("id") <= col("thresh"))
      .groupBy(col("c"), col("thresh")).agg(sum(col("nt")).as("n_tokens"))
    val types = firstOcc.crossJoin(broadcast(cks))
      .filter(col("fd") <= col("thresh"))
      .groupBy(col("c").as("c2")).agg(sum(col("nv")).as("n_types"))
    val pts = toks.join(types, col("c") === col("c2")).drop("c2")
      .withColumn("x", floor(log(col("n_tokens").cast("double")) * 1000))
      .withColumn("y", floor(log(col("n_types").cast("double")) * 1000))
    val m = pts.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
      sum(col("y")).as("sy"), sum(col("x") * col("x")).as("sxx"),
      sum(col("x") * col("y")).as("sxy"),
      sum(col("y") * col("y")).as("syy"))
    val num = (col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
    val denX = (col("n") * col("sxx") - col("sx") * col("sx")).cast("double")
    val denY = (col("n") * col("syy") - col("sy") * col("sy")).cast("double")
    // degenerate guards: a SATURATED vocab (all checkpoints at the same
    // n_types) zeroes denY — a legitimate corpus signal, not an error —
    // and ANSI double division by exact 0 throws; slope/r² are undefined
    // there, reported as NULL in both engines
    val fit = m.select(
      when(denX =!= 0.0, floor(num / denX * 10000L).cast("double") / 1e4)
        .as("beta"),
      when(denX =!= 0.0, floor((col("sy").cast("double")
          - num / denX * col("sx").cast("double"))
        / (col("n") * lit(1000L)).cast("double")
        * 10000L).cast("double") / 1e4).as("ln_k"),
      when(denX =!= 0.0 && denY =!= 0.0,
        floor(num * num / (denX * denY) * 1000000L).cast("double") / 1e6)
        .as("r2"))
    pts.crossJoin(broadcast(fit))
      .select(col("c").cast("long").as("checkpoint"), col("thresh"),
        col("n_tokens"), col("n_types"), col("beta"), col("ln_k"),
        col("r2"))
  }

  def zipfFit(docs: DataFrame, topN: Int = 1000,
      textCol: String = "text"): DataFrame = {
    val freq = docs
      .select(explode(TextAnalysis.wsTokens(col(textCol))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("freq"))
    val vocab = freq.agg(count(lit(1)).as("n_types"),
      sum(col("freq")).as("n_tokens"))
    val top = freq.orderBy(col("freq").desc, col("token")).limit(topN)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("freq").desc, col("token"))
    val moments = top.withColumn("rank", row_number().over(w))
      .select(floor(log(col("rank").cast("double")) * 1000).as("x"),
        floor(log(col("freq").cast("double")) * 1000).as("y"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"), sum(col("x") * col("x")).as("sxx"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("y") * col("y")).as("syy"))
    val num = (col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
    val denX = (col("n") * col("sxx") - col("sx") * col("sx")).cast("double")
    val denY = (col("n") * col("syy") - col("sy") * col("sy")).cast("double")
    moments.crossJoin(broadcast(vocab))
      .select(col("n").as("n_top"), col("n_types"), col("n_tokens"),
        (floor(num / denX * 10000L).cast("double") / 1e4).as("slope"),
        (floor((col("sy").cast("double")
            - num / denX * col("sx").cast("double"))
          / (col("n") * lit(1000L)).cast("double")
          * 10000L).cast("double") / 1e4).as("intercept"),
        (floor(num * num / (denX * denY) * 1000000L).cast("double") / 1e6)
          .as("r2"))
  }

  /** Data-scaling loss curve (q250) — the measurement behind every
    * "is more of this data worth it" decision: train the [[bigramLmScore]]
    * language model on k NESTED prefixes of a train split (deterministic
    * id-hash slices, so prefix c contains prefix c−1), score ONE fixed
    * holdout's transitions under each, and report the per-checkpoint
    * cross-entropy plus the log-log slope of xent vs train tokens — the
    * finite-data face of the scaling-law fit (Kaplan et al. 2020 fit
    * L = L∞ + a·N^−b; with a weak bigram LM far from its plateau the
    * log-log slope IS the −b read, and a slope near 0 says this corpus
    * has stopped teaching this model family).
    *
    * Unseen-event contract (a trained-on-everything join can't drop
    * rows here the way bigramLmScore's inner join does — small prefixes
    * MUST pay for what they haven't seen):
    * p = λ·c₂/c_prev (0 when the prefix never saw `prev`) +
    * (1−λ)·(c_cur+1)/(N+V) — add-one on the unigram backoff keeps p > 0
    * always. Per-transition −ln p quantizes to floored millionths
    * (zipfFit's log discipline), the holdout collapses to DISTINCT
    * transitions with multiplicities, and each checkpoint's xent is one
    * integer division. The slope reuses the quantized log-log LSQ.
    *
    * Shape at scale: count tables build once per SLICE (one pass), the
    * cumulative-per-checkpoint expansion joins each count row against
    * the ≤ k later checkpoints (a k-row broadcast — vocab·k and
    * bigrams·k rows, both corpus-sublinear), and the holdout side is
    * the eval slice's transition VALUE SET. Nothing is per-checkpoint
    * rescanned.
    */
  def lossCurveFit(docs: DataFrame, k: Int = 5, lambda: Double = 0.5,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(k >= 2)
    val spark = docs.sparkSession
    val h = idHash(col(idCol))
    val base = docs.select(col(idCol).as("doc_id"),
      TextAnalysis.wsTokens(col(textCol)).as("w"),
      (h % 10 === 0).as("is_eval"),
      // (h/10) exact in double for h < 2^53; cast truncates = floor on
      // the non-negative hash, matching the oracle's integer h // 10
      (((h / 10).cast("long")) % k).as("slice"))
    def transitions(df: DataFrame): DataFrame = df.select(col("slice"),
      explode(when(size(col("w")) >= 2,
        zip_with(slice(col("w"), lit(1), size(col("w")) - 1),
          slice(col("w"), lit(2), size(col("w")) - 1),
          (a, b) => struct(a.as("prev"), b.as("cur"))))
        .otherwise(array())).as("t"))
      .select(col("slice"), col("t.prev").as("prev"), col("t.cur").as("cur"))
    val train = base.filter(!col("is_eval"))
    val cps = broadcast(spark.range(1, k + 1).select(col("id").as("cp")))
    // per-slice counts once; cumulative per checkpoint via the k-row join
    val uniSlice = train.select(col("slice"),
        explode(col("w")).as("token"))
      .groupBy(col("slice"), col("token")).agg(count(lit(1)).as("c"))
    val uniCum = uniSlice.join(cps, col("slice") < col("cp"))
      .groupBy(col("cp"), col("token")).agg(sum(col("c")).as("c1"))
    val biCum = transitions(train)
      .groupBy(col("slice"), col("prev"), col("cur"))
      .agg(count(lit(1)).as("c"))
      .join(cps, col("slice") < col("cp"))
      .groupBy(col("cp"), col("prev"), col("cur"))
      .agg(sum(col("c")).as("c2"))
    val totals = uniCum.groupBy(col("cp"))
      .agg(sum(col("c1")).as("n_tok"), count(lit(1)).as("v"))
    // holdout transition value set with multiplicities
    val ho = transitions(base.filter(col("is_eval")))
      .groupBy(col("prev"), col("cur")).agg(count(lit(1)).as("n_t"))
    val scored = ho.crossJoin(cps)
      .join(biCum, Seq("cp", "prev", "cur"), "left")
      .join(uniCum.select(col("cp"), col("token").as("prev"),
        col("c1").as("c_prev")), Seq("cp", "prev"), "left")
      .join(uniCum.select(col("cp"), col("token").as("cur"),
        col("c1").as("c_cur")), Seq("cp", "cur"), "left")
      .join(broadcast(totals), "cp")
      .withColumn("p",
        lit(lambda) * when(coalesce(col("c_prev"), lit(0L)) > 0,
          coalesce(col("c2"), lit(0L)).cast("double") / col("c_prev"))
          .otherwise(lit(0.0))
        + lit(1 - lambda) * (coalesce(col("c_cur"), lit(0L)) + 1)
          .cast("double") / (col("n_tok") + col("v")).cast("double"))
      .withColumn("q6", floor(-log(col("p")) * 1000000d))
      .groupBy(col("cp"))
      .agg(sum(col("n_t")).as("n_trans"),
        sum(col("n_t") * col("q6")).as("qsum"))
      .withColumn("xent6", expr("qsum div n_trans"))
      .join(broadcast(totals), "cp")
    // quantized log-log LSQ over the k (ln N, ln xent) points
    val pts = scored.select(
      floor(log(col("n_tok").cast("double")) * 1000).as("x"),
      floor(log(col("xent6").cast("double") / 1e6) * 1000).as("y"))
    val m = pts.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
      sum(col("y")).as("sy"), sum(col("x") * col("x")).as("sxx"),
      sum(col("x") * col("y")).as("sxy"),
      sum(col("y") * col("y")).as("syy"))
    val num = (col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
    val denX = (col("n") * col("sxx") - col("sx") * col("sx")).cast("double")
    val denY = (col("n") * col("syy") - col("sy") * col("sy")).cast("double")
    val fit = m.select(
      (floor(num / denX * 10000L).cast("double") / 1e4).as("slope"),
      (floor(num * num / (denX * denY) * 1000000L).cast("double") / 1e6)
        .as("r2"))
    scored.crossJoin(broadcast(fit))
      .select(col("cp").as("checkpoint"), col("n_tok").as("n_train_tokens"),
        col("n_trans").as("n_holdout_transitions"),
        (col("xent6").cast("double") / 1e6).as("xent"),
        col("slope"), col("r2"))
  }

  /** Hill tail-index estimator (q231) — the heavy-tail diagnostic for
    * document lengths (and any positive size metric): if the upper tail
    * follows a power law P(X > x) ∝ x^−α, the Hill estimator over the
    * top-k order statistics x₍₁₎ ≥ … ≥ x₍ₖ₊₁₎ is
    * α̂ = [ (1/k)·Σ_{i≤k} ln x₍ᵢ₎ − ln x₍ₖ₊₁₎ ]⁻¹ (Hill 1975). Why a
    * pipeline cares: α ≤ 1 means the MEAN of the tail is infinite-ish —
    * shard sizing, packing-buffer bounds, and per-partition memory
    * budgets derived from average document length are all lies; α tells
    * you which percentile you must provision for instead. Reported per
    * source with the tail threshold x₍ₖ₊₁₎ so the fit is auditable.
    *
    * Engine-portable exactness, the [[zipfFit]] discipline: each order
    * statistic's ln quantizes to integer millionths ONCE (row-local),
    * the Hill sum is an exact BIGINT, and α̂ is one integer division
    * k·10¹² div (Σt₆ − k·t₆₍ₖ₊₁₎) — no order-dependent float anywhere.
    * Groups with ≤ k+1 rows or a degenerate tail (all top values equal)
    * report a NULL α̂ rather than a fake one.
    *
    * Scale shape: the rank window is a WindowGroupLimit-pushable
    * row_number ≤ k+1 filter (per-partition top-(k+1) + merge — never a
    * global per-source sort), then |sources|·(k+1)-row arithmetic; the
    * group totals are one map-side-combining count.
    */
  def hillTail(docs: DataFrame, groupCol: String = "source",
      valueCol: String = "n_chars", k: Int = 50): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(col("x").desc, col("doc_id"))
    val ranked = docs
      .select(col(groupCol), col(valueCol).cast("long").as("x"),
        col("doc_id"))
      .filter(col("x") >= 1L)
      .withColumn("r", row_number().over(w))
      .filter(col("r") <= k + 1)
      .withColumn("t6",
        floor(log(col("x").cast("double")) * 1000000L).cast("long"))
    val top = ranked.groupBy(col(groupCol)).agg(
      sum(when(col("r") <= k, col("t6")).otherwise(0L)).as("s6"),
      max(when(col("r") === k + 1, col("t6"))).as("tk6"),
      max(when(col("r") === k + 1, col("x"))).as("x_k1"))
    val tot = docs.filter(col(valueCol).cast("long") >= 1L)
      .groupBy(col(groupCol)).agg(count(lit(1)).as("n"))
    top.join(tot, groupCol)
      .withColumn("inv6", col("s6") - lit(k.toLong) * col("tk6"))
      .select(col(groupCol), col("n"), lit(k.toLong).as("k"),
        col("x_k1").as("x_threshold"),
        (when(col("inv6") > 0,
          expr(s"${k}L * 1000000000000L div inv6"))
          .cast("double") / 1e6).as("alpha"))
  }

  /** Cross-source LM affinity matrix — every source scored under every
    * source's add-one-smoothed unigram LM: H(s, m) = −Σ_t p_s(t)·ln
    * p_m(t), plus the EXCESS over self-scoring H(s,m) − H(s,s). This is
    * the full matrix behind [[sourceKl]]'s single column: the
    * domain-transfer table mixture design reads (a low-excess pair means
    * m's data models s well — upweighting m helps s; a high-excess row
    * isolates a source nothing else covers). Diagonal excess ≡ 0 by
    * construction.
    *
    * Engine-portable exactness without order-dependent float sums: the
    * per-token log term ln((c_m+1)/(T_m+V)) is quantized to integer
    * MILLIONTHS once per (model, token) — row-local — so each Σ is an
    * exact BIGINT·BIGINT dot product no shuffle order can change; H then
    * divides exact longs in double space (floor-quantized 1e-4).
    *
    * Shape at 100 TB: one (source, token) aggregation (map-side
    * combine), then an eval-side × model-list broadcast fan-out joined
    * LEFT to model counts on the token key — the blowup is |sources|²
    * per DISTINCT token, bounded by source-count², never corpus-sized;
    * the final matrix agg collapses to |sources|² rows.
    */
  /** Jensen–Shannon divergence matrix (q233) — the SYMMETRIC, bounded
    * [0, ln 2] companion to [[sourceAffinity]]'s cross-entropy view:
    * JSD(P,Q) = ½KL(P‖M) + ½KL(Q‖M), M = (P+Q)/2, over per-source
    * unigram distributions. Where the affinity matrix answers "does m's
    * data model s" (asymmetric, unbounded), JSD is the metric-like
    * pairwise distance clustering/mixture design wants: symmetric,
    * finite even with disjoint vocabularies (disjoint → exactly ln 2),
    * and √JSD is a true metric.
    *
    * Exactness: each present token contributes p·ln(2p/(p+q)) where the
    * ratio 2·c_a·t_b / (c_a·t_b + c_b·t_a) has EXACT integer inputs; the
    * ln input is built with a pinned double op order (both engines run
    * the identical IEEE chain), quantized to integer millionths
    * row-locally, then Σ c_a·l₆ is an exact BIGINT dot product divided
    * once by t_a — no order-dependent float sum. Zero-q tokens hit the
    * same expression with c_b = 0 (ratio 2 → ln 2 exactly). BIGINT bound:
    * Σ c·|l₆| ≤ t·10⁶·ln t — safe to ~3·10¹¹ tokens per source; lift the
    * dot product to DECIMAL past that.
    *
    * Scale shape: one (source, token) aggregation; the directional term
    * table is the [[sourceAffinity]] fan-out — |sources| per distinct
    * a-cell via a broadcast source list, LEFT-joined to the b-cells on
    * (token, source) — bounded by |sources|²·|distinct tokens|, never
    * corpus-sized; the matrix agg collapses to |sources|² rows.
    */
  def jsdMatrix(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val c = docs
      .select(col("source"),
        explode(TextAnalysis.wsTokens(col(textCol))).as("tok"))
      .groupBy(col("source"), col("tok")).agg(count(lit(1)).as("c"))
    val totals = c.groupBy(col("source")).agg(sum(col("c")).as("t"))
    val cells = c.join(totals, Seq("source"))
    val aSide = cells.select(col("source").as("sa"), col("tok"),
      col("c").as("ca"), col("t").as("ta"))
    val srcs = totals.select(col("source").as("sb"), col("t").as("tb"))
    val bSide = cells.select(col("source").as("sb"), col("tok"),
      col("c").as("cb"))
    val terms = aSide.crossJoin(broadcast(srcs))
      .filter(col("sa") =!= col("sb"))
      .join(bSide, Seq("sb", "tok"), "left")
      .withColumn("cb", coalesce(col("cb"), lit(0L)))
      // pinned double chain: (2.0·ca·tb) / (ca·tb + cb·ta)
      .withColumn("l6", floor(log(
        (lit(2.0) * col("ca").cast("double") * col("tb")) /
          (col("ca").cast("double") * col("tb") +
            col("cb").cast("double") * col("ta"))) * 1000000L)
        .cast("long"))
    // greatest(·,0): true KL(P‖M) ≥ 0, but per-term floors can push the
    // quantized sum a few millionths below zero on near-identical
    // distributions — and a NEGATIVE numerator would split the engines
    // (Spark div truncates toward zero, SQL // floors)
    val dir = terms.groupBy(col("sa"), col("sb"))
      .agg(sum(col("ca") * col("l6")).as("s"), first(col("ta")).as("ta"))
      .withColumn("t6", expr("greatest(s, 0L) div ta"))
      .select(col("sa"), col("sb"), col("t6"))
    dir.as("x").join(dir.as("y"),
        col("x.sa") === col("y.sb") && col("x.sb") === col("y.sa"))
      .filter(col("x.sa") < col("x.sb"))
      .select(col("x.sa").as("source_a"), col("x.sb").as("source_b"),
        (expr("(x.t6 + y.t6) div 2").cast("double") / 1e6).as("jsd"))
  }

  def sourceAffinity(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val c = docs
      .select(col("source"),
        explode(TextAnalysis.wsTokens(col(textCol))).as("tok"))
      .groupBy(col("source"), col("tok")).agg(count(lit(1)).as("c"))
    val totals = c.groupBy(col("source")).agg(sum(col("c")).as("t"))
    val vocab = c.agg(countDistinct(col("tok")).as("v"))
    val models = c.join(totals, Seq("source")).crossJoin(broadcast(vocab))
      .select(col("source").as("model_source"), col("tok"),
        floor(log((col("c") + 1).cast("double") / (col("t") + col("v"))
          .cast("double")) * 1000000L).as("l"),
        (col("t") + col("v")).as("tv"))
    val defaults = totals.crossJoin(broadcast(vocab))
      .select(col("source").as("model_source"),
        floor(log(lit(1.0) / (col("t") + col("v")).cast("double"))
          * 1000000L).as("l0"))
    val pairs = c.select(col("source").as("eval_source"), col("tok"),
        col("c").as("cs"))
      .crossJoin(broadcast(defaults))
      .join(models, Seq("model_source", "tok"), "left")
      .select(col("eval_source"), col("model_source"),
        (col("cs") * coalesce(col("l"), col("l0"))).as("term"),
        col("cs"))
    val h = pairs.groupBy(col("eval_source"), col("model_source"))
      .agg(sum(col("term")).as("sterm"), sum(col("cs")).as("ts"))
    val self = h.filter(col("eval_source") === col("model_source"))
      .select(col("eval_source"), col("sterm").as("sself"))
    h.join(self, Seq("eval_source"))
      .select(col("eval_source"), col("model_source"), col("ts").as("n_tokens"),
        (floor(-col("sterm").cast("double")
          / (col("ts") * lit(1000000L)).cast("double") * 10000L)
          .cast("double") / 1e4).as("h"),
        (floor((col("sself") - col("sterm")).cast("double")
          / (col("ts") * lit(1000000L)).cast("double") * 10000L)
          .cast("double") / 1e4).as("excess"))
  }

  /** Source × length-bucket balance audit — Pearson's χ² of independence
    * over the (source, equal-width n_chars bucket) contingency table: is
    * document length distributed the same way across sources, or does
    * some source ship systematically truncated/padded text? Each cell
    * reports observed count, expected count under independence
    * (row·col/N), and its χ² contribution (o−e)²/e — the cells that
    * dominate Σχ² are the imbalance, already localized. The standard
    * pre-training corpus-composition audit next to [[datasetCard]].
    *
    * All counts are exact BIGINTs; expected/contrib divide identical
    * longs in double space (floor-quantized 1e-4). A sources × buckets
    * spine keeps empty cells in the table (they carry contribution = e).
    * Shape: one scan collapsing map-side to |sources|·|buckets| cells,
    * margins and spine are cell-table-sized — nothing downstream of the
    * first agg is corpus-sized.
    */
  def sourceBalance(docs: DataFrame, buckets: Int = 5): DataFrame = {
    val sc = col("n_chars").cast("double")
    val stats = docs.agg(min(sc).as("lo"), max(sc).as("hi"),
      count(lit(1)).as("n"))
    val cells = docs.crossJoin(broadcast(stats))
      .select(col("source"),
        when(col("hi") === col("lo"), lit(0L))
          .otherwise(least(greatest(
              floor((sc - col("lo")) * buckets / (col("hi") - col("lo"))),
              lit(0.0)), lit((buckets - 1).toDouble)).cast("long"))
          .as("bucket"))
      .groupBy(col("source"), col("bucket")).agg(count(lit(1)).as("obs"))
    val rows = cells.groupBy(col("source")).agg(sum(col("obs")).as("rt"))
    val cols = cells.groupBy(col("bucket")).agg(sum(col("obs")).as("ct"))
    val spine = rows.select(col("source"), col("rt"))
      .crossJoin(cols.select(col("bucket"), col("ct")))
    val e = (col("rt") * col("ct")).cast("double") / col("n").cast("double")
    spine.join(cells, Seq("source", "bucket"), "left")
      .crossJoin(broadcast(stats.select(col("n"))))
      .select(col("source"), col("bucket"),
        coalesce(col("obs"), lit(0L)).as("n_obs"), col("rt"), col("ct"),
        (floor(e * 10000L).cast("double") / 1e4).as("expected"),
        (floor((coalesce(col("obs"), lit(0L)).cast("double") - e)
          * (coalesce(col("obs"), lit(0L)).cast("double") - e) / e
          * 10000L).cast("double") / 1e4).as("chi2_contrib"))
  }

  /** k-anonymity audit over quasi-identifiers — the dataset-release
    * privacy check next to [[datasetCard]]/[[shardManifest]]: group the
    * corpus by its released quasi-identifier tuple (here lang × source ×
    * equal-width length bucket — the metadata a release ships per doc)
    * and flag every equivalence class smaller than k: documents in those
    * classes are re-identifiable from metadata alone and need
    * generalization (coarser buckets) or suppression before release.
    *
    * Exact BIGINT counts throughout; the length buckets reuse
    * [[sourceBalance]]'s corpus-min/max equal-width rule (two broadcast
    * scalars, row-local assignment). One map-side-collapsing groupBy to
    * \|lang\|·\|source\|·buckets classes — nothing downstream is
    * corpus-sized.
    */
  /** Bitext sentence-length fixture: per document a source paragraph of
    * 3–5 sentence LENGTHS (closed forms of the id hash) and a target
    * paragraph derived from it by one planted edit family — h%4=0 merges
    * the first two sentences, h%4=1 splits the first, otherwise 1-1 with
    * ±3 length noise everywhere. All lengths are closed forms of
    * (doc_id, position), so both engines build identical arrays without
    * indexed lambdas. Output: (doc_id, ls, lt).
    */
  def bitextFixture(docs: DataFrame): DataFrame = {
    val h = idHash(col("doc_id"))
    def lsAt(i: Column): Column = lit(20) + (h % 97 + i * 13) % 60
    def nz(j: Column): Column = (h % 89 + j * 7) % 7 - 3
    val m = (lit(3) + h % 3).cast("int")
    val ls = transform(sequence(lit(1), m), i => lsAt(i).cast("long"))
    val fam = h % 4
    val ltMerge = transform(sequence(lit(1), m - 1), j =>
      when(j === 1, lsAt(lit(1)) + lsAt(lit(2)) + nz(j))
        .otherwise(lsAt(j + 1) + nz(j)).cast("long"))
    val ltSplit = transform(sequence(lit(1), m + 1), j =>
      when(j === 1, floor(lsAt(lit(1)) / 2).cast("long") + nz(j))
        .when(j === 2,
          lsAt(lit(1)) - floor(lsAt(lit(1)) / 2).cast("long") + nz(j))
        .otherwise(lsAt(j - 1) + nz(j)).cast("long"))
    val ltId = transform(sequence(lit(1), m), j =>
      (lsAt(j) + nz(j)).cast("long"))
    docs.select(col("doc_id"), ls.as("ls"),
      when(fam === 0, ltMerge).when(fam === 1, ltSplit)
        .otherwise(ltId).as("lt"))
  }

  /** Gale–Church-style sentence alignment (q190): the length-based
    * bitext aligner (Gale & Church 1993) — the step between document
    * pairing (q141's margin mining finds WHICH docs translate each
    * other) and usable parallel sentences. Per document pair, a 2-D DP
    * over (source sentence, target sentence) with the five classic moves
    * (1-1 substitution, 2-1 merge, 1-2 split, 1-0/0-1 skip); the match
    * cost is the Gaussian length-mismatch surprisal δ²=(lt−ls)²/(6.8·ls)
    * floor-quantized to 1e4 units plus integer move penalties (0 / 23000
    * / 45000) — every DP decision is an integer comparison with move
    * priority as the tie rule.
    *
    * The grid runs as a ROW-LOCAL higher-order aggregate over the
    * flattened (m+1)×(n+1) cells (the [[unigramSegment]] DP pattern in
    * two dimensions: cell p reads up to five earlier cells at fixed
    * offsets from the carried array) — no join, no shuffle, no UDF.
    * Output per doc: alignment move counts and total cost; the planted
    * edit family is recovered exactly (spec-pinned).
    */
  def galeChurchAlign(pairs: DataFrame): DataFrame = {
    val mC = size(col("ls"))
    val nC = size(col("lt"))
    val W = nC + 1
    val sentinel = struct(lit(Long.MaxValue / 2).as("c"), lit(0L).as("n11"),
      lit(0L).as("n21"), lit(0L).as("n12"), lit(0L).as("ns"))
    def d2cost(a: Column, b: Column): Column =
      floor((b - a).cast("double") * (b - a).cast("double") * 10000.0 /
        (lit(6.8) * a.cast("double"))).cast("long")
    def bump(prev: Column, add: Column, f: String): Column = struct(
      (prev.getField("c") + add).as("c"),
      (prev.getField("n11") + (if (f == "n11") 1L else 0L)).as("n11"),
      (prev.getField("n21") + (if (f == "n21") 1L else 0L)).as("n21"),
      (prev.getField("n12") + (if (f == "n12") 1L else 0L)).as("n12"),
      (prev.getField("ns") + (if (f == "ns") 1L else 0L)).as("ns"))
    val step = (acc: Column, p: Column) => {
      val i = floor(p / W).cast("int")
      val j = (p % W).cast("int")
      val lsI = element_at(col("ls"), i)
      val ltJ = when(j >= 1, element_at(col("lt"), j))
      val cands = filter(array(
        when(i >= 1 && j >= 1,
          bump(element_at(acc, p - W - 1 + 1), d2cost(lsI, ltJ), "n11")),
        when(i >= 2 && j >= 1,
          bump(element_at(acc, p - W * 2 - 1 + 1),
            lit(23000L) + d2cost(element_at(col("ls"), i - 1) + lsI, ltJ),
            "n21")),
        when(i >= 1 && j >= 2,
          bump(element_at(acc, p - W - 2 + 1),
            lit(23000L) + d2cost(lsI,
              element_at(col("lt"), j - 1) + ltJ), "n12")),
        when(i >= 1, bump(element_at(acc, p - W + 1), lit(45000L), "ns")),
        when(j >= 1, bump(element_at(acc, p - 1 + 1), lit(45000L), "ns"))
      ), c => c.isNotNull)
      // strict < keeps the EARLIER candidate on ties = move priority
      val best = aggregate(cands, sentinel,
        (b, c) => when(c.getField("c") < b.getField("c"), c).otherwise(b))
      concat(acc, array(best))
    }
    val dp0 = array(struct(lit(0L).as("c"), lit(0L).as("n11"),
      lit(0L).as("n21"), lit(0L).as("n12"), lit(0L).as("ns")))
    val last = element_at(
      aggregate(sequence(lit(1), (mC + 1) * W - 1), dp0, step), (mC + 1) * W)
    pairs.select(col("doc_id"), mC.cast("long").as("m"),
        nC.cast("long").as("n"), last.as("_d"))
      .select(col("doc_id"), col("m"), col("n"),
        (col("_d.c").cast("double") / 1e4).as("cost"),
        col("_d.n11").as("n_sub"), col("_d.n21").as("n_merge"),
        col("_d.n12").as("n_split"), col("_d.ns").as("n_skip"))
  }

  /** Neyman-allocation stratified sample (q189): the survey-sampling
    * optimum for building an audit/eval sample under a fixed budget —
    * allocate n_h ∝ N_h·σ_h (stratum size × metric stddev), which
    * minimizes the stratified estimator's variance; a high-variance
    * source earns more of the budget than proportional allocation would
    * give it. Allocation is exact: per-stratum Σx/Σx² BIGINTs → one
    * sqrt → micro-quantized weights, integer floor shares, and the
    * largest-remainder method (remainder = n·a₆ mod T, ties by source)
    * distributes the leftover so shares sum exactly to n. Shares cap at
    * the stratum size (no reallocation pass — documented). The draw
    * itself is the deterministic id-hash order per stratum.
    *
    * Scale shape: one map-side stats aggregation; allocation runs on the
    * |strata|-row table (tiny windows); the draw is a per-stratum
    * ranking window cut at n_h (WindowGroupLimit-bounded state).
    */
  def neymanSample(docs: DataFrame, n: Int = 100,
      metricCol: String = "n_chars"): DataFrame = {
    val x = col(metricCol).cast("long")
    val stats = docs.groupBy(col("source")).agg(
      count(lit(1)).as("nh"), sum(x).as("sx"), sum(x * x).as("sx2"))
    // clamp at 0: sx2 - sx²/nh is a catastrophic cancellation on a
    // near-constant large stratum — a tiny NEGATIVE residual would make
    // sqrt() NaN and silently zero the stratum's weight
    val variance = greatest((col("sx2").cast("double") -
      col("sx").cast("double") * col("sx").cast("double") / col("nh")) /
      (col("nh") - 1), lit(0.0))
    val a6 = (floor(sqrt(variance) * 1000000L).cast("long") * col("nh"))
    val weighted = stats.withColumn("a6",
      when(col("nh") > 1, a6).otherwise(lit(0L)))
    // t = 0 (every stratum singleton or zero-variance) would divide by
    // zero below; fall back to PROPORTIONAL allocation (weight = nh),
    // the textbook Neyman degenerate case
    val tot = weighted.agg(sum(col("a6")).as("t"), sum(col("nh")).as("tn"))
    val alloc0 = weighted.crossJoin(broadcast(tot))
      .withColumn("w6", when(col("t") > 0, col("a6")).otherwise(col("nh")))
      .withColumn("tt", when(col("t") > 0, col("t")).otherwise(col("tn")))
      .withColumn("base", floor(col("w6") * n / col("tt")).cast("long"))
      .withColumn("rem", (col("w6") * n) % col("tt"))
    val leftover = lit(n) - sum(col("base")).over(
      Window.partitionBy(lit(1)))
    val alloc = alloc0
      .withColumn("extra_rk", row_number().over(
        Window.partitionBy(lit(1)).orderBy(col("rem").desc, col("source"))))
      .withColumn("n_h",
        least(col("base") + when(col("extra_rk") <= leftover, 1L)
          .otherwise(0L), col("nh")))
      .select(col("source"), col("n_h"))
    val drawW = Window.partitionBy(col("source"))
      .orderBy(idHash(col("doc_id")), col("doc_id"))
    docs.select(col("doc_id"), col("source"))
      .withColumn("rk", row_number().over(drawW).cast("long"))
      .join(broadcast(alloc), Seq("source"))
      .filter(col("rk") <= col("n_h"))
      .select(col("source"), col("doc_id"), col("rk"))
  }

  /** Deterministic model-output fixture for q197: 50 "generations", the
    * even idHash half copied VERBATIM from a corpus document (words
    * 5–24 of doc idHash%500 — the memorized case), the odd half the
    * same words REVERSED (same unigram profile, so unigram-level
    * attribution would false-positive; n-gram provenance must not).
    */
  def generationFixture(docs: DataFrame, nGens: Int = 50): DataFrame = {
    val spark = docs.sparkSession
    val gens = spark.range(0, nGens).select(col("id").as("gen_id"))
      .withColumn("h", idHash(col("gen_id")))
      .withColumn("src_doc", col("h") % 500)
    val w = filter(split(col("text"), " "), x => x =!= lit(""))
    gens.join(docs.select(col("doc_id").as("src_doc"),
        slice(w, 5, 20).as("_w")), Seq("src_doc"))
      .select(col("gen_id"),
        when(col("h") % 2 === 0, concat_ws(" ", col("_w")))
          .otherwise(concat_ws(" ", reverse(col("_w")))).as("gen_text"))
  }

  /** Generation-provenance attribution (q197): the reverse memorization
    * lookup — given model outputs, WHERE in the training corpus did each
    * come from. Every `n`-gram of a generation is probed against the
    * corpus n-gram inverted index; the report gives per generation the
    * fraction of its n-gram positions found verbatim (coverage), the
    * dominant source document (top-1 window argmax: match count desc,
    * doc asc), and a copied/original verdict at `threshold` coverage. The
    * complement of [[memorizationRisk]]: q155 predicts which CORPUS text
    * is regurgitation-prone, this attributes a concrete OUTPUT back to
    * its source — the audit pair every extraction review needs.
    *
    * Scale shape: generations are tiny next to the corpus; the corpus
    * side is the distinct (doc, gram) relation joined on the gram key —
    * the inverted-index shape (q125's), never pairwise.
    */
  def provenance(gens: DataFrame, corpus: DataFrame, n: Int = 5,
      threshold6: Long = 800000L): DataFrame = {
    val gw = filter(split(col("gen_text"), " "), x => x =!= lit(""))
    val genGrams = gens.select(col("gen_id"), gw.as("_w"))
      .select(col("gen_id"),
        posexplode(when(size(col("_w")) >= n,
          TextAnalysis.wordNgrams(col("_w"), n))
          .otherwise(array().cast("array<string>"))))
      .select(col("gen_id"), col("pos"), col("col").as("g"))
    val corpusGrams = corpus.select(col("doc_id"),
        explode(when(size(filter(split(col("text"), " "),
            x => x =!= lit(""))) >= n,
          TextAnalysis.wordNgrams(
            filter(split(col("text"), " "), x => x =!= lit("")), n))
          .otherwise(array().cast("array<string>"))).as("g"))
      .distinct()
    val hits = genGrams.join(corpusGrams, Seq("g"))
    val perDoc = hits.groupBy(col("gen_id"), col("doc_id"))
      .agg(count(lit(1)).as("cnt"))
    // (cnt desc, doc_id asc) argmax as a top-1 window, NOT a folded
    // integer key: a cnt*K - doc_id fold silently inverts the order once
    // doc_id >= K (a count step is crossed by the id term), and no K is
    // safe for every corpus. row_number carries no id bound and Spark
    // rewrites the rk=1 filter to a WindowGroupLimit (top-1 per key).
    val topW = Window.partitionBy(col("gen_id"))
      .orderBy(col("cnt").desc, col("doc_id"))
    val top = perDoc.withColumn("_rk", row_number().over(topW))
      .filter(col("_rk") === 1)
      .select(col("gen_id"), col("doc_id").as("top_source"))
    val matched = hits.groupBy(col("gen_id"))
      .agg(countDistinct(col("pos")).as("n_matched"))
    // anchor on the full generation set: a generation too short to carry
    // one n-gram still gets a row (n_pos 0, verdict original)
    val totals = gens.select(col("gen_id"))
      .join(genGrams.groupBy(col("gen_id")).agg(count(lit(1)).as("n_pos")),
        Seq("gen_id"), "left")
      .withColumn("n_pos", coalesce(col("n_pos"), lit(0L)))
    totals
      .join(matched, Seq("gen_id"), "left")
      .join(top, Seq("gen_id"), "left")
      .withColumn("cov6",
        when(col("n_pos") > 0,
          floor(coalesce(col("n_matched"), lit(0L)) * 1000000L /
            col("n_pos")).cast("long")).otherwise(lit(0L)))
      .select(col("gen_id"), col("n_pos"),
        coalesce(col("n_matched"), lit(0L)).as("n_matched"),
        (col("cov6").cast("double") / 1e6).as("coverage"),
        col("top_source"),
        when(col("cov6") >= threshold6, "copied").otherwise("original")
          .as("verdict"))
  }

  /** Deterministic HTML-page fixture: wraps each document's words in a
    * realistic page skeleton — head with title + style + script, an h1,
    * a nav list of link items, a main paragraph with an inline anchor —
    * with idHash families adding a second script block (h%3=0) and an
    * HTML comment (h%4=0). Every visible word comes from the document's
    * own token stream, so extraction results are closed forms of the
    * fixture.
    */
  def htmlFixture(id: Column, text: Column): Column = {
    val h = idHash(id)
    val w = filter(split(text, " "), x => x =!= lit(""))
    def seg(from: Int, len: Int) = concat_ws(" ", slice(w, from, len))
    concat(
      lit("<html><head><title>"), seg(1, 2), lit("</title>"),
      lit("<style>p{margin:0}</style><script>var a=1;</script></head><body>"),
      when(h % 3 === 0,
        lit("<script type=\"text/javascript\">trackPage();</script>"))
        .otherwise(lit("")),
      lit("<h1>"), seg(3, 2), lit("</h1>"),
      when(h % 4 === 0, concat(lit("<!-- draft "), seg(5, 1), lit(" -->")))
        .otherwise(lit("")),
      lit("<ul><li><a href=\"/a\">"), seg(6, 1),
      lit("</a></li><li><a href=\"/b\">"), seg(7, 1),
      lit("</a></li></ul><div><p>"), seg(8, 12),
      lit(" <a href=\"/c\">"), seg(20, 2), lit("</a> "), seg(22, 8),
      lit("</p></div></body></html>"))
  }

  /** HTML main-content extraction (q181): the WET-style step every web
    * corpus runs before any text signal — script/style blocks removed
    * WITH their contents (dotall non-greedy), comments removed, the
    * title captured, all remaining tags stripped to whitespace and
    * squeezed. Plus the curation signals layered on the structure:
    * anchor count and LINK DENSITY (chars inside anchors / extracted
    * chars — the classic nav/boilerplate discriminator: a page whose
    * text is mostly link text is a menu, not content). Row-local regex
    * chain staged at projection boundaries; identical (?s)/lazy
    * semantics in Java regex and RE2.
    */
  def htmlExtract(docs: DataFrame, idCol: String = "doc_id",
      htmlCol: String = "html"): DataFrame = {
    val staged = docs
      .withColumn("_noscript", regexp_replace(col(htmlCol),
        "(?s)(<script[^>]*>.*?</script>|<style[^>]*>.*?</style>|<!--.*?-->)",
        ""))
    val title = regexp_extract(col("_noscript"), "(?s)<title>(.*?)</title>", 1)
    val anchorTexts = regexp_extract_all(col("_noscript"),
      lit("(?s)<a [^>]*>(.*?)</a>"), lit(1))
    val extracted = trim(regexp_replace(
      regexp_replace(col("_noscript"), "<[^>]*>", " "), " +", " "))
    staged.select(col(idCol),
        title.as("title"),
        extracted.as("_x"),
        size(anchorTexts).cast("long").as("n_links"),
        length(concat_ws("", anchorTexts)).cast("long").as("_linkchars"))
      .select(col(idCol), col("title"),
        length(col("_x")).cast("long").as("text_len"),
        size(filter(split(col("_x"), " "), x => x =!= lit("")))
          .cast("long").as("n_words"),
        col("n_links"),
        when(length(col("_x")) > 0,
          floor(col("_linkchars") * 1000000L / length(col("_x")))
            .cast("double") / 1e6).otherwise(lit(0.0)).as("link_density"),
        md5(col("_x")).as("extracted_md5"))
  }

  /** Deterministic outlink fixture: per document 3 links, each with a
    * target host/path from idHash arithmetic (hosts shared ACROSS
    * documents, so targets accumulate anchors from many sources) and an
    * anchor text sliced from the document's own words at a per-link
    * offset. Output: (doc_id, host, anchor).
    */
  def linkFixture(docs: DataFrame): DataFrame = {
    val h = idHash(col("doc_id"))
    docs.select(col("doc_id"),
        filter(split(col("text"), " "), x => x =!= lit("")).as("_w"),
        explode(sequence(lit(0), lit(2))).as("j"))
      .select(col("doc_id"),
        concat(lit("site"), ((h + col("j") * 5) % 13).cast("string"),
          lit(".example.com")).as("host"),
        concat_ws(" ",
          slice(col("_w"), (h % 7 + col("j") * 4 + 1).cast("int"), lit(3)))
          .as("anchor"))
      .filter(col("anchor") =!= "")
  }

  /** Anchor-text aggregation (q188): the inbound-anchor index every web
    * retrieval stack builds — anchor text describes the TARGET page
    * better than the page describes itself, so per target host this
    * collects inbound link counts, distinct referring documents, and the
    * top-3 anchor TERMS (count desc, term asc) as the host's inbound
    * description. Shapes: one bounded explode per link, map-side
    * (host, term) counts, a per-host top-k window over the host's term
    * table (WindowGroupLimit-bounded), and a |hosts|-row report.
    */
  def anchorIndex(links: DataFrame, topK: Int = 3): DataFrame = {
    val stats = links.groupBy(col("host"))
      .agg(count(lit(1)).as("n_links"),
        countDistinct(col("doc_id")).as("n_src_docs"))
    val terms = links.select(col("host"),
        explode(TextAnalysis.wsTokens(col("anchor"))).as("term"))
      .groupBy(col("host"), col("term")).agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col("host"))
      .orderBy(col("cnt").desc, col("term"))
    // collect_list order is nondeterministic: build the joined string
    // from the ranked rows via one conditional-min per slot instead
    val slots = (1 to topK).map { k =>
      min(when(col("rk") === k, col("term"))).as(s"t$k")
    }
    val topDet = terms.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= topK)
      .groupBy(col("host")).agg(slots.head, slots.tail: _*)
    stats.join(topDet, Seq("host"))
      .select(col("host"), col("n_links"), col("n_src_docs"),
        concat_ws(",", (1 to topK).map(k => col(s"t$k")): _*).as("top_terms"))
  }

  /** Deterministic robots-policy fixture: each of the 13 fixture hosts
    * publishes 3 rules — two Disallow path prefixes and one Allow that
    * re-opens a more specific form of the first Disallow (the shape that
    * exercises longest-match precedence and allow-wins-ties).
    */
  def robotsRules(spark: org.apache.spark.sql.SparkSession): DataFrame = {
    val k = col("id")
    spark.range(0, 13)
      .select(concat(lit("site"), k.cast("string"),
          lit(".example.com")).as("host"),
        explode(array(
          struct(lit("disallow").as("rule"),
            concat(lit("/p/"), (k * 7 % 37).cast("string")).as("prefix")),
          struct(lit("allow").as("rule"),
            concat(lit("/p/"), (k * 7 % 37).cast("string"), lit("?id="))
              .as("prefix")),
          struct(lit("disallow").as("rule"),
            concat(lit("/p/"), (k * 11 % 37).cast("string")).as("prefix"))))
          .as("r"))
      .select(col("host"), col("r.rule").as("rule"),
        col("r.prefix").as("prefix"))
  }

  /** Robots-policy crawl filter (q193): the REP decision a crawler (and
    * a license-respecting corpus builder) applies per URL — among the
    * host's rules whose prefix matches the URL path, the LONGEST prefix
    * wins, Allow beats Disallow on equal length, and no match means
    * allowed. The whole precedence collapses to one argmax over a folded
    * integer key (2·len + allow-bit; non-matching rules get a null key,
    * which max_by skips, and coalesce supplies the default) — no window,
    * no ordering dependence. Rules broadcast (robots files are tiny);
    * one equi-join on host + one url-keyed aggregation.
    */
  def robotsFilter(urls: DataFrame): DataFrame = {
    val rules = robotsRules(urls.sparkSession)
    urls.join(broadcast(rules), Seq("host"), "left")
      .withColumn("mkey",
        when(col("path").startsWith(col("prefix")),
          length(col("prefix")) * 2 +
            when(col("rule") === "allow", 1).otherwise(0)))
      .groupBy(col("doc_id"), col("host"), col("path"))
      .agg(coalesce(max_by(col("rule"), col("mkey")), lit("allow"))
        .as("winning_rule"))
      .withColumn("allowed", col("winning_rule") === "allow")
  }

  /** URL path fixture for q193: the q173 identity's host and path plus
    * the optional id-param suffix, as one path+query string per doc. */
  def urlPathFixture(docs: DataFrame): DataFrame = {
    val h = idHash(col("doc_id"))
    docs.select(col("doc_id"),
      concat(lit("site"), (h % 13).cast("string"), lit(".example.com"))
        .as("host"),
      concat(lit("/p/"), (h % 37).cast("string"),
        when(h % 4 === 0 || h % 4 === 1,
          concat(lit("?id="), (h % 11).cast("string"))).otherwise(lit("")))
        .as("path"))
  }

  /** Cross-source quantile normalization (q178): maps every document's
    * quality score to the GLOBAL score distribution at the document's
    * within-source percentile — CDF matching, the calibration step
    * before one global keep-threshold can be fair across sources whose
    * raters/heuristics score on different scales (one source's 0.6 is
    * another's 0.9; after mapping, a global cut keeps the same per-source
    * fraction a per-source cut would).
    *
    * Scale shape — deliberately NO per-source total-order window over
    * documents (the q122 straggler argument): percentiles come from the
    * DISTINCT-SCORE distribution tables instead. Scores are 4dp-quantized
    * (the [[TextAnalysis.quant4]] invariant), so the per-source table is
    * ≤ |sources|·10⁴ rows and the global table ≤ 10⁴ rows — the only
    * windows run over those bounded tables, and the 1001-point global
    * quantile spine is a broadcast join. Percentiles use percent_rank
    * tie semantics ((rank−1)/(n−1), rank = first tied row) in exact
    * floored millionths; the spine lookup is q(t) = min{s : cdfₘₐₓ(s) ≥ t}.
    */
  def quantileNormalize(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    val qs = TextAnalysis.withQuality(docs)
      .select(col("doc_id"), col("source"), col("quality_score"),
        round(col("quality_score") * 10000).cast("long").as("s4"))
    val srcCnt = qs.groupBy(col("source"), col("s4"))
      .agg(count(lit(1)).as("cnt"))
    val wSrc = Window.partitionBy(col("source")).orderBy(col("s4"))
    val srcTot = qs.groupBy(col("source")).agg(count(lit(1)).as("n_src"))
    val srcDist = srcCnt.withColumn("cum", sum(col("cnt")).over(wSrc))
      .join(srcTot, "source")
      .withColumn("p6", when(col("n_src") === 1, lit(0L)).otherwise(
        floor((col("cum") - col("cnt")) * 1000000L / (col("n_src") - 1))))
      .select(col("source"), col("s4"), col("p6"))
    val globTot = qs.agg(count(lit(1)).as("n_glob"))
    val globDist = qs.groupBy(col("s4")).agg(count(lit(1)).as("gcnt"))
      .withColumn("gcum", sum(col("gcnt")).over(Window.orderBy(col("s4"))))
      .crossJoin(broadcast(globTot))
      .withColumn("pmax6", when(col("n_glob") === 1, lit(1000000L))
        .otherwise(floor((col("gcum") - 1) * 1000000L / (col("n_glob") - 1))))
      .select(col("s4").as("g_s4"), col("pmax6"))
    val spine = spark.range(0, 1001).select(col("id").as("b"))
    val quantiles = broadcast(spine)
      .join(globDist, col("pmax6") >= col("b") * 1000)
      .groupBy(col("b")).agg(min(col("g_s4")).as("norm_s4"))
    qs.join(srcDist, Seq("source", "s4"))
      .withColumn("b", floor(col("p6") / 1000L))
      .join(broadcast(quantiles), Seq("b"))
      .select(col("doc_id"), col("source"),
        col("quality_score").as("score"),
        (col("p6").cast("double") / 1e6).as("src_pct"),
        (col("norm_s4").cast("double") / 10000.0).as("norm_score"))
  }

  /** DP-histogram MECHANISM, deterministically simulated (q176): the
    * two-sided-geometric (discrete Laplace) noisy-counts shape every
    * ε-DP composition release uses — noise = G₁−G₂ with G geometric
    * (P(G≥k) = αᵏ, α = alpha6/1e6, ε = ln(1/α)), drawn by inverse CDF
    * G = ⌊ln(U)/ln(α)⌋, released counts clamped at 0.
    *
    * NOT private as shipped: the uniforms come from
    * portableHash32(group|seed|tag) so the noise is a deterministic
    * function of the PUBLIC group key and the seed — anyone holding the
    * seed (and with the default, everyone) recomputes the noise and
    * subtracts it back to the exact counts. That determinism is the
    * point here: it is what lets the DuckDB oracle hash-check the
    * mechanism's arithmetic end to end. A production release MUST swap
    * in a secret, per-release seed (one seed = one privacy spend) kept
    * out of the published artifact; only then does the ε accounting
    * mean anything. One map-side-combining aggregation, then row-local
    * noise on |groups| rows.
    */
  def dpHistogram(docs: DataFrame, groupCol: String = "source",
      alpha6: Long = 500000L, seed: String = "graft-dp-v1"): DataFrame = {
    val counts = docs.groupBy(col(groupCol)).agg(count(lit(1)).as("n"))
    def u(tag: String): Column =
      Dedup.portableHash32(concat(col(groupCol), lit(s"|$seed|$tag"))) %
        1000000L + 1L
    val lnAlpha = math.log(alpha6.toDouble / 1e6)
    def geo(uc: Column): Column =
      floor(log(uc.cast("double") / 1e6) / lnAlpha).cast("long")
    counts.select(col(groupCol),
      greatest(col("n") + geo(u("a")) - geo(u("b")), lit(0L)).as("released"))
  }

  def kAnonymity(docs: DataFrame, k: Long = 5,
      buckets: Int = 10): DataFrame = {
    val sc = col("n_chars").cast("double")
    val stats = docs.agg(min(sc).as("lo"), max(sc).as("hi"))
    docs.crossJoin(broadcast(stats))
      .select(col("lang"), col("source"),
        when(col("hi") === col("lo"), lit(0L))
          .otherwise(least(greatest(
              floor((sc - col("lo")) * buckets / (col("hi") - col("lo"))),
              lit(0.0)), lit((buckets - 1).toDouble)).cast("long"))
          .as("len_bucket"))
      .groupBy(col("lang"), col("source"), col("len_bucket"))
      .agg(count(lit(1)).as("group_size"))
      .withColumn("at_risk", col("group_size") < k)
  }

  /** l-diversity audit (q230) — the [[kAnonymity]] follow-up: k-anonymity
    * bounds re-identification but not ATTRIBUTE disclosure (a k=50 class
    * whose sensitive value is constant leaks that value for everyone in
    * it). Per equivalence class over the quasi-identifiers
    * (lang, length-bucket — the same bucket rule as q148), treating
    * `source` as the sensitive attribute: class size, distinct sensitive
    * values, the dominant value's share, the sensitive-value entropy,
    * and the two standard verdicts — distinct l-diversity
    * (l_distinct ≥ l) and entropy l-diversity (H ≥ ln l, Machanavajjhala
    * et al. 2007).
    *
    * Entropy is engine-portable the [[entropyPanel]] way: each cell's
    * ln(c/n) quantizes to integer millionths row-locally, H₆ is an exact
    * BIGINT dot product divided once; the ln(l) threshold is a Scala-side
    * constant inlined into both engines. Scale shape: one map-side-
    * combining (QI, sensitive) cell aggregation, then |cells|-sized
    * arithmetic — nothing touches raw rows twice.
    */
  def lDiversity(docs: DataFrame, l: Long = 3,
      buckets: Int = 10): DataFrame = {
    val lnL6 = math.floor(math.log(l.toDouble) * 1e6).toLong
    val sc = col("n_chars").cast("double")
    val stats = docs.agg(min(sc).as("lo"), max(sc).as("hi"))
    val cells = docs.crossJoin(broadcast(stats))
      .select(col("lang"),
        when(col("hi") === col("lo"), lit(0L))
          .otherwise(least(greatest(
              floor((sc - col("lo")) * buckets / (col("hi") - col("lo"))),
              lit(0.0)), lit((buckets - 1).toDouble)).cast("long"))
          .as("len_bucket"),
        col("source"))
      .groupBy(col("lang"), col("len_bucket"), col("source"))
      .agg(count(lit(1)).as("c"))
    val cls = cells.groupBy(col("lang"), col("len_bucket"))
      .agg(sum(col("c")).as("n"), count(lit(1)).as("l_distinct"),
        max(col("c")).as("top_cnt"))
    cells.join(cls, Seq("lang", "len_bucket"))
      .withColumn("l6",
        floor(log(col("c").cast("double") / col("n")) * 1000000L)
          .cast("long"))
      .groupBy(col("lang"), col("len_bucket"))
      .agg(first(col("n")).as("n"), first(col("l_distinct")).as("l_distinct"),
        first(col("top_cnt")).as("top_cnt"), sum(col("c") * col("l6")).as("s"))
      .withColumn("h6", expr("(-s) div n"))
      .select(col("lang"), col("len_bucket"), col("n"), col("l_distinct"),
        (floor(col("top_cnt") * 1000000L / col("n")).cast("double") / 1e6)
          .as("top_share"),
        (col("h6").cast("double") / 1e6).as("entropy"),
        (col("l_distinct") >= l).as("distinct_ok"),
        (col("h6") >= lnL6).as("entropy_ok"))
  }

  /** t-closeness audit (q236) — the third leg of the release-privacy
    * triad ([[kAnonymity]] bounds re-identification, [[lDiversity]]
    * bounds attribute disclosure by COUNT; t-closeness bounds it by
    * DISTRIBUTION, Li et al. 2007): an attacker learns something even
    * from a diverse class if its sensitive-value mix differs sharply
    * from the published global mix. Per equivalence class (same QIs and
    * bucket rule as q148/q230, `source` sensitive): the Earth Mover's
    * Distance to the global distribution — which for categorical values
    * under unit ground distance IS total variation
    * ½·Σ_s |c_s/n − g_s/N| — and the verdict against threshold `t`.
    *
    * Exactness: TV's numerator Σ|c_s·N − g_s·n| is an exact BIGINT over
    * the DENSE class×source grid (absent values contribute their global
    * mass — a LEFT join from the grid, the [[shardMix]] discipline),
    * quantized once by one integer division; overflow bound
    * Σ|·|·10⁶ < 2⁶³ ⇒ n·N ≲ 4.6·10¹² per class — stratify the release
    * past that. Scale shape: one (QI, sensitive) cell agg, a
    * \|classes\|×\|sources\| grid, nothing corpus-sized twice.
    */
  def tCloseness(docs: DataFrame, t6: Long = 300000L,
      buckets: Int = 10): DataFrame = {
    val sc = col("n_chars").cast("double")
    val stats = docs.agg(min(sc).as("lo"), max(sc).as("hi"))
    val cells = docs.crossJoin(broadcast(stats))
      .select(col("lang"),
        when(col("hi") === col("lo"), lit(0L))
          .otherwise(least(greatest(
              floor((sc - col("lo")) * buckets / (col("hi") - col("lo"))),
              lit(0.0)), lit((buckets - 1).toDouble)).cast("long"))
          .as("len_bucket"),
        col("source"))
      .groupBy(col("lang"), col("len_bucket"), col("source"))
      .agg(count(lit(1)).as("c"))
    val cls = cells.groupBy(col("lang"), col("len_bucket"))
      .agg(sum(col("c")).as("n"))
    val glob = cells.groupBy(col("source")).agg(sum(col("c")).as("g"))
    val nTot = cells.agg(sum(col("c")).as("nn"))
    val grid = cls.crossJoin(broadcast(glob))
      .join(cells, Seq("lang", "len_bucket", "source"), "left")
      .withColumn("c", coalesce(col("c"), lit(0L)))
      .crossJoin(broadcast(nTot))
    grid.groupBy(col("lang"), col("len_bucket"))
      .agg(first(col("n")).as("n"), first(col("nn")).as("nn"),
        sum(abs(col("c") * col("nn") - col("g") * col("n"))).as("num"))
      .withColumn("tv6", expr("num * 1000000 div (2 * n * nn)"))
      .select(col("lang"), col("len_bucket"), col("n"),
        (col("tv6").cast("double") / 1e6).as("tv"),
        (col("tv6") <= t6).as("t_ok"))
  }

  /** Distinguishing lexicon — Monroe, Colaresi & Quinn's "Fightin' Words"
    * log-odds with informative Dirichlet prior: for each source, the
    * terms whose usage most distinguishes it from the REST of the corpus,
    * scored by the z-statistic of the prior-smoothed log-odds delta
    * δ_w = ln[(c_sw+α_w)/(n_s+α₀−c_sw−α_w)] − ln[(c_rw+α_w)/(n_r+α₀−c_rw−α_w)],
    * z = δ/√(1/(c_sw+α_w) + 1/(c_rw+α_w)), prior α_w = α₀·f_w/N (the
    * corpus itself, so frequent-everywhere words need MORE evidence to
    * register). The principled replacement for raw tf-idf contrast when
    * naming what makes a source a source — rare-word variance is
    * controlled, common-word bias is prior-damped.
    *
    * Every input to the floats is an exact BIGINT from one (source,
    * token) aggregation joined to token and source margins — all
    * row-local arithmetic after cell-table-sized joins; both engines run
    * identical double ops per row (nothing order-dependent), ranking
    * compares those identical doubles, and the emitted z is 1e-4-floored.
    * Top-k per source behind a per-source window.
    */
  def logOddsLexicon(docs: DataFrame, k: Int = 5, alpha0: Double = 500.0,
      textCol: String = "text"): DataFrame = {
    val c = docs
      .select(col("source"),
        explode(TextAnalysis.wsTokens(col(textCol))).as("term"))
      .groupBy(col("source"), col("term")).agg(count(lit(1)).as("csw"))
    val srcTot = c.groupBy(col("source")).agg(sum(col("csw")).as("ns"))
    val termTot = c.groupBy(col("term")).agg(sum(col("csw")).as("fw"))
    val corpus = c.agg(sum(col("csw")).as("nn"))
    val scored = c.join(srcTot, Seq("source")).join(termTot, Seq("term"))
      .crossJoin(broadcast(corpus))
      .withColumn("aw", col("fw").cast("double") * alpha0
        / col("nn").cast("double"))
      .withColumn("crw", (col("fw") - col("csw")).cast("double"))
      .withColumn("nr", (col("nn") - col("ns")).cast("double"))
      .withColumn("delta",
        log((col("csw") + col("aw"))
          / (col("ns") + lit(alpha0) - col("csw") - col("aw")))
        - log((col("crw") + col("aw"))
          / (col("nr") + lit(alpha0) - col("crw") - col("aw"))))
      .withColumn("z", col("delta")
        / sqrt(lit(1.0) / (col("csw") + col("aw"))
          + lit(1.0) / (col("crw") + col("aw"))))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("z").desc, col("term"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("source"), col("rank"), col("term"),
        col("csw").as("n_in"), (col("fw") - col("csw")).as("n_out"),
        (floor(col("z") * 10000L).cast("double") / 1e4).as("z"))
  }

  /** Collocation mining — top adjacent-pair PMI (pointwise mutual
    * information): ln(c₁₂·N / (c₁·c₂)) over adjacent token pairs,
    * support-filtered so rare-pair noise (the classic PMI failure mode)
    * never reaches the ranking. High-PMI pairs are the corpus's
    * multi-word units — what a tokenizer-merge pass or a phrase-aware
    * index wants first; a corpus whose top collocations are template
    * fragments ("click here") is telling you something [[boilerplate]]
    * quantifies.
    *
    * All PMI inputs are exact BIGINTs from two map-side-combining aggs
    * (pairs and unigrams); each pair's PMI is one row-local double chain
    * identical in both engines, ranking compares those doubles (ties on
    * the pair), and the global top-k is orderBy+limit — TakeOrdered,
    * per-partition top-k + merge, never a global sort.
    */
  def collocations(docs: DataFrame, k: Int = 50, minCount: Long = 5,
      textCol: String = "text"): DataFrame = {
    val w = col("_w")
    // zip_with pads to the LONGER input (w_n pairs with null) — slice to
    // n−1 before exploding, the repetition-bigram discipline
    val pairsExpr = when(size(w) >= 2,
      slice(zip_with(w, slice(w, lit(2), size(w) - 1),
        (a, b) => struct(a.as("w1"), b.as("w2"))), lit(1), size(w) - 1))
      .otherwise(array())
    val pairs = docs
      .withColumn("_w", TextAnalysis.wsTokens(col(textCol)))
      .select(explode(pairsExpr).as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
      .filter(col("c12") >= minCount)
    val uni = docs
      .select(explode(TextAnalysis.wsTokens(col(textCol))).as("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("c"))
    val n2 = docs
      .select((greatest(size(TextAnalysis.wsTokens(col(textCol))) - 1,
        lit(0))).cast("long").as("np"))
      .agg(sum(col("np")).as("n2"))
    pairs
      .join(uni.select(col("t").as("w1"), col("c").as("c1")), Seq("w1"))
      .join(uni.select(col("t").as("w2"), col("c").as("c2")), Seq("w2"))
      .crossJoin(broadcast(n2))
      .withColumn("pmi", log(col("c12").cast("double") * col("n2")
        / (col("c1").cast("double") * col("c2"))))
      .orderBy(col("pmi").desc, col("w1"), col("w2"))
      .limit(k)
      .select(col("w1"), col("w2"), col("c12"), col("c1"), col("c2"),
        (floor(col("pmi") * 10000L).cast("double") / 1e4).as("pmi"))
  }

  /** Length-bucketed batching report — quantifies the classic
    * sort-by-length trick: shard the corpus, form size-B batches within
    * each shard either in HASHED order (the random-shuffle baseline) or
    * LENGTH-SORTED order, and account each batch's padding waste
    * `B·max(len) − Σlen` exactly. Sorted batching puts like-sized docs
    * together, collapsing the max-vs-mean gap that padding burns; the
    * report is the measured GPU-hours argument for dynamic batching,
    * per shard and strategy, before anyone changes a data loader.
    *
    * Exact BIGINT accounting throughout. Shape: the same per-shard
    * window discipline as [[epochOrder]] — both orderings are windows
    * PARTITIONED BY shard (parallel, never global); batch aggregation
    * collapses map-side to batches-per-shard rows.
    */
  def batchingWaste(docs: DataFrame, batchSize: Int = 32, nShards: Int = 8,
      textCol: String = "text"): DataFrame = {
    val base = docs.select(col("doc_id"),
        size(TextAnalysis.wsTokens(col(textCol))).cast("long").as("len"))
      .withColumn("skey", Dedup.portableHash32(
        concat(lit("b:"), col("doc_id").cast("string"))))
      .withColumn("shard", col("skey") % nShards)
    def waste(ordered: org.apache.spark.sql.expressions.WindowSpec,
        strategy: String): DataFrame =
      base.withColumn("batch",
          ((row_number().over(ordered) - 1) / batchSize).cast("long"))
        .groupBy(col("shard"), col("batch"))
        .agg(count(lit(1)).as("n"), max(col("len")).as("mx"),
          sum(col("len")).as("sm"))
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("n_batches"), sum(col("sm")).as("total_tokens"),
          sum(col("n") * col("mx") - col("sm")).as("total_waste"))
        .select(lit(strategy).as("strategy"), col("shard"),
          col("n_batches"), col("total_tokens"), col("total_waste"),
          (floor(col("total_waste") * 1000000L
            / (col("total_tokens") + col("total_waste"))).cast("double")
            / 1e6).as("waste_frac"))
    val byShard = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard"))
    waste(byShard.orderBy(col("skey"), col("doc_id")), "hashed")
      .unionByName(
        waste(byShard.orderBy(col("len").desc, col("doc_id")), "sorted"))
  }

  /** Per-document memorization-risk audit — [[ngramLm]] turned back on
    * the corpus: a context is PREDICTABLE when its corpus-wide top
    * continuation carries probability ≥ `topProb` at support ≥
    * `minCount`; a document's risk is the fraction of its contexts that
    * FOLLOW the dominant continuation. A risk ≈ 1 document is made of
    * text the corpus LM already completes — boilerplate, a near-copy, or
    * a leaked eval answer — exactly what extraction-attack audits
    * (Carlini et al.) drop or downweight before training.
    *
    * Shape: the LM side is [[ngramLm]] (k=1) — already aggregated and
    * tiny after the support+probability filter; the doc side is one
    * row-local context build (the `_w` projection-boundary discipline);
    * the join is token-keyed equi on ctx. Exact integer counts, one
    * floored ratio.
    */
  def memorizationRisk(docs: DataFrame, n: Int = 2, minCount: Long = 8,
      topProb: Double = 0.9, textCol: String = "text"): DataFrame = {
    val lm = ngramLm(docs, n, k = 1, minCount, textCol)
      .filter(col("rank") === 1 && col("prob") >= topProb)
      .select(col("ctx"), col("next_tok").as("top_next"))
    val w = col("_w")
    val pairsExpr = when(size(w) > n,
      transform(sequence(lit(0), size(w) - n - 1), i =>
        struct(concat_ws(" ", slice(w, i + lit(1), lit(n))).as("ctx"),
          element_at(w, i + n + 1).as("next_tok"))))
    val pairs = docs
      .withColumn("_w", filter(split(col(textCol), " "), t => t =!= lit("")))
      .select(col("doc_id"), explode(pairsExpr).as("p"))
      .select(col("doc_id"), col("p.ctx").as("ctx"),
        col("p.next_tok").as("next_tok"))
    pairs.join(lm, Seq("ctx"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_ctx"),
        sum(when(col("top_next").isNotNull, 1L).otherwise(0L))
          .as("n_predictable"),
        sum(when(col("next_tok") === col("top_next"), 1L).otherwise(0L))
          .as("n_following"))
      .withColumn("risk",
        floor(col("n_following") * 1000000L / col("n_ctx")).cast("double")
          / 1e6)
  }

  def novelty(docs: DataFrame, n: Int = 3, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    // token array materialized once — see [[bigrams]] on the O(tokens²) trap
    val w = col("_w")
    val shingleStrs = when(size(w) >= n,
        transform(sequence(lit(0), size(w) - n),
          i => concat_ws(" ", slice(w, i + lit(1), lit(n)))))
      .otherwise(array(concat_ws(" ", w)))
    val grams = docs
      .withColumn("_w", TextAnalysis.wsTokens(col(textCol)))
      .select(col(idCol).as("doc_id"),
        explode(array_distinct(shingleStrs)).as("s"))
      .select(col("doc_id"), Dedup.portableHash32(col("s")).as("h"))
    val df = grams.groupBy(col("h")).agg(count(lit(1)).as("df"))
    grams.join(df, Seq("h"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("df") >= 2, 1L).otherwise(0L)).as("n_shared"))
      .withColumn("novelty",
        floor((col("n_grams") - col("n_shared")) * 1000000L / col("n_grams"))
          .cast("double") / 1e6)
      .select(col("doc_id"), col("n_grams"), col("n_shared"), col("novelty"))
  }

  /** Quality-weighted mixture allocation (q295) — the budget decision a
    * mixture designer makes after the audits: given per-source token
    * availability (whitespace tokens of Gopher-KEPT docs) and quality
    * (the gopherFilter keep rate), allocate a corpus-wide token budget
    * B = ΣT·budgetPerMille/1000 with quality-squared weighting
    * w_s = keep6²·T_s (emphasize quality — the standard high-quality
    * upsampling shape) under a per-source repetition cap of
    * capMilliEpochs/1000 epochs (alloc_s ≤ cap·T_s — data repeated too
    * often stops helping). Water-filling is ONE redistribution round:
    * clamp, then share the clamped surplus across uncapped sources by
    * weight, clamp again (deterministic; any residual stays
    * unallocated and is visible as B − Σalloc). Every step is exact
    * BIGINT/DECIMAL with truncating divisions — the whole allocation
    * replays in the oracle bit-for-bit.
    *
    * Scale: the gopher gate is row-local; one aggregation to |sources|
    * rows; the allocation arithmetic is report-sized.
    */
  def mixtureAllocation(df: DataFrame, groupCol: String,
      budgetPerMille: Int = 500, capMilliEpochs: Int = 2000): DataFrame = {
    val gated = TextAnalysis.gopherFilter(df)
      .withColumn("_tok",
        size(filter(split(col("text"), " "), t => t =!= lit("")))
          .cast("long"))
    val per = gated.groupBy(col(groupCol).as("_g"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("_kept"),
        sum(when(col("keep"), col("_tok")).otherwise(0L)).as("_t"))
      .withColumn("_keep6", expr("_kept * 1000000 div nullif(n_docs, 0)"))
      .withColumn("_w", expr(
        "CAST(_keep6 AS DECIMAL(38,0)) * _keep6 * _t"))
    val tot = per.agg(sum(col("_t")).as("_tall"),
      sum(col("_w").cast("decimal(38,0)")).as("_wall"))
    val raw = per.crossJoin(broadcast(tot))
      .withColumn("_b", expr(
        s"CAST(_tall AS DECIMAL(38,0)) * $budgetPerMille div 1000"))
      // weights normalize to parts-per-1e9 BEFORE multiplying into the
      // budget: B*w directly would pass DECIMAL38 near 1e13 corpus
      // tokens; B*w9 caps at B*1e9 <= 1e24 (granularity 1e-9 of B)
      .withColumn("_w9", coalesce(expr(
        "_w * 1000000000 div nullif(_wall, 0)"), lit(0L)))
      .withColumn("_raw", expr("_b * _w9 div 1000000000"))
      .withColumn("_cap", expr(
        s"CAST(_t AS DECIMAL(38,0)) * $capMilliEpochs div 1000"))
      .withColumn("_a1", least(col("_raw"), col("_cap")))
      .withColumn("_capped1", col("_raw") > col("_cap"))
    val round2 = raw.agg(
      sum(col("_a1")).as("_alloc1"),
      sum(when(!col("_capped1"), col("_w").cast("decimal(38,0)"))
        .otherwise(lit(0))).as("_wunc"))
    raw.crossJoin(broadcast(round2))
      .withColumn("_left", col("_b") - col("_alloc1"))
      .withColumn("_wu9", coalesce(expr(
        "_w * 1000000000 div nullif(_wunc, 0)"), lit(0L)))
      .withColumn("_a2", when(col("_capped1"), col("_a1"))
        .otherwise(col("_a1")
          + expr("_left * _wu9 div 1000000000")))
      .withColumn("_alloc", least(col("_a2"), col("_cap")))
      .withColumn("_e6", expr(
        "CAST(_alloc AS DECIMAL(38,0)) * 1000000 div nullif(_t, 0)"))
      .select(col("_g").as(groupCol), col("n_docs"),
        (col("_keep6").cast("double") / 1e6).as("keep_rate"),
        col("_t").as("tokens_avail"),
        col("_b").cast("long").as("budget_tokens"),
        col("_alloc").cast("long").as("alloc_tokens"),
        (col("_e6").cast("double") / 1e6).as("epochs"),
        (col("_a2") > col("_cap") || col("_capped1")).as("capped"))
  }
}
