package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{AudioWav, CorpusOps, Dedup, EvalOps, GraphOps, Multimodal, SftOps, Similarity, TextAnalysis}

/** LLM-data-pipeline operator queries (north-star extension): dedup,
  * similarity search, text analysis, multimodal columns — each a `queries`
  * entry over `documents` / `embeddings`, with a DuckDB oracle where the
  * semantics are SQL-expressible (approximate algorithms — MinHash, SimHash,
  * LSH — get rows-only checks plus ScalaTest recall assertions).
  */
object LlmOps {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "q25_dedup_exact" -> ((s, d) =>
      Dedup.exact(Tables.documents(s, d)).orderBy(col("keep_id"))),

    "q26_dedup_jaccard" -> ((s, d) =>
      Dedup.ngramJaccardPairs(Tables.fanout(Tables.documents(s, d)), n = 3, threshold = 0.8)
        .orderBy(col("doc_a"), col("doc_b"))),

    "q27_dedup_minhash" -> ((s, d) =>
      Dedup.minhashLshPairs(Tables.fanout(Tables.documents(s, d)), n = 3, k = 16, bands = 4,
        threshold = 0.8).orderBy(col("doc_a"), col("doc_b"))),

    "q28_dedup_simhash" -> ((s, d) =>
      Dedup.simhashPairs(Tables.fanout(Tables.documents(s, d)), maxHamming = 10)
        .orderBy(col("doc_a"), col("doc_b"))),

    // portable-hash twins of q27/q28: same algorithms under an
    // oracle-expressible hash family (md5-prefix base), so MinHash/SimHash
    // get full hash-checked rows instead of q27/q28's no_oracle
    "q101_minhash_portable" -> ((s, d) =>
      Dedup.minhashLshPairsPortable(Tables.fanout(Tables.documents(s, d)),
        n = 3, k = 16, bands = 4, threshold = 0.8)
        .orderBy(col("doc_a"), col("doc_b"))),

    "q102_simhash_portable" -> ((s, d) =>
      Dedup.simhashPortable(Tables.fanout(Tables.documents(s, d)))
        .orderBy(col("doc_id"))),

    // incremental dedup against a persistent index, replayed as two
    // parity-split batches: batch 1 (even ids) dedups within itself and
    // seeds the index; batch 2 (odd ids) dedups within itself AND against
    // batch 1's accepted docs. Oracle replays both connected-component
    // rounds (recursive CTEs) + the cross-batch exact-Jaccard drop; the
    // hash match relies on the LSH candidate stage having full recall at
    // these parameters on this data — empirically true (q101's banded
    // pair set equals q26's exact pair set), and the spec holds the
    // recall-independent contract
    "q104_incremental_dedup" -> ((s, d) => {
      val root = java.nio.file.Files.createTempDirectory("dedupidx-q").toString
      val idx = graft.operators.IncrementalDedup.create(root)
      val docs = Tables.fanout(Tables.documents(s, d))
      val a1 = idx.dedupeBatch(docs.filter(col("doc_id") % 2 === 0),
        batchId = Some("p1"))
      val a2 = idx.dedupeBatch(docs.filter(col("doc_id") % 2 =!= 0),
        batchId = Some("p2"))
      a1.select(col("doc_id")).union(a2.select(col("doc_id")))
        .orderBy(col("doc_id"))
    }),

    "q106_line_dedup" -> ((s, d) =>
      CorpusOps.lineDedup(Tables.fanout(Tables.documents(s, d)), segWords = 12)
        .orderBy(col("doc_id"))),

    "q107_pack_sequences" -> ((s, d) =>
      CorpusOps.packSequences(Tables.fanout(Tables.documents(s, d)), seqLen = 256)
        .orderBy(col("seq_id"), col("doc_id"))),

    "q108_content_chunks" -> ((s, d) =>
      CorpusOps.contentChunks(Tables.fanout(Tables.documents(s, d)))
        .orderBy(col("doc_id"), col("chunk_ord"))),

    "q109_hybrid_retrieval" -> ((s, d) =>
      Similarity.hybridRetrieve(Tables.fanout(Tables.documents(s, d)),
          Tables.embeddings(s, d), queryIds = Seq(0L, 1L, 2L))
        .orderBy(col("q_id"), col("rank"))),

    "q110_edit_verified_dups" -> ((s, d) =>
      Dedup.editVerifiedNearDups(Tables.fanout(Tables.documents(s, d)))
        .orderBy(col("doc_a"), col("doc_b"))),

    "q111_source_quota" -> ((s, d) =>
      CorpusOps.sourceQuota(Tables.fanout(Tables.documents(s, d)), cap = 50)
        .orderBy(col("source"), col("src_rank"))),

    "q112_token_budget" -> ((s, d) =>
      CorpusOps.tokenBudgetSelect(Tables.fanout(Tables.documents(s, d)),
          budget = 20000L)
        .orderBy(col("doc_id"))),

    // split assignment hashed on the near-dup cluster representative, so
    // near-duplicates can never straddle train/val/test (leakage-safe)
    "q113_leak_safe_split" -> ((s, d) =>
      CorpusOps.leakSafeSplit(Tables.fanout(Tables.documents(s, d)))
        .orderBy(col("doc_id"))),

    // boilerplate surgery: excise spans present in >= ceil(0.6% of docs)
    "q120_boilerplate_removal" -> ((s, d) =>
      CorpusOps.removeBoilerplateSpans(
          Tables.fanout(Tables.documents(s, d)), n = 8, dfFrac = 0.006)
        .orderBy(col("doc_id"))),

    // decontamination surgery: excise only the spans overlapping the
    // benchmark slice's n-grams, keep the reassembled documents
    "q118_decontam_spans" -> ((s, d) => {
      val docs = Tables.fanout(Tables.documents(s, d))
      CorpusOps.removeContaminatedSpans(
        docs.filter(col("doc_id") % 20 =!= 0),
        docs.filter(col("doc_id") % 20 === 0), n = 8)
        .orderBy(col("doc_id"))
    }),

    // fair-share budget: per-source floors banked first, then the global
    // quality fill of what budget remains
    "q117_fair_budget" -> ((s, d) =>
      CorpusOps.fairBudgetSelect(Tables.fanout(Tables.documents(s, d)),
          budget = 20000L, floorToks = 500L)
        .orderBy(col("doc_id"))),

    // persistent cluster-consistent split: two parity batches through the
    // registry; batch-2 near-dups of batch-1 docs inherit their splits
    "q116_incremental_split" -> ((s, d) => {
      val root = java.nio.file.Files.createTempDirectory("splitreg-q").toString
      val reg = graft.operators.IncrementalSplit.create(root)
      val docs = Tables.fanout(Tables.documents(s, d))
      val a1 = reg.assignBatch(docs.filter(col("doc_id") % 2 === 0),
        batchId = Some("p1"))
      val a2 = reg.assignBatch(docs.filter(col("doc_id") % 2 =!= 0),
        batchId = Some("p2"))
      a1.select(col("doc_id"), col("split"))
        .union(a2.select(col("doc_id"), col("split")))
        .orderBy(col("doc_id"))
    }),

    // leakage DETECTOR: near-dup pairs straddling a naive per-doc split
    "q115_split_leakage" -> ((s, d) =>
      CorpusOps.splitLeakage(
          Tables.fanout(Tables.documents(s, d))
            .withColumn("split", CorpusOps.splitExpr(col("doc_id"))))
        .orderBy(col("doc_a"), col("doc_b"))),

    // per-document curation audit: every gate's verdict + first failure
    "q114_curation_report" -> ((s, d) =>
      CorpusOps.curationReport(Tables.fanout(Tables.documents(s, d)))
        .select(col("doc_id"),
          col("gate_exact").cast("long").as("gate_exact"),
          col("gate_lang").cast("long").as("gate_lang"),
          col("gate_gopher").cast("long").as("gate_gopher"),
          col("gate_quality").cast("long").as("gate_quality"),
          col("gate_pii").cast("long").as("gate_pii"),
          col("keep").cast("long").as("keep"),
          col("first_fail"))
        .orderBy(col("doc_id"))),

    "q29_embed_neardup" -> ((s, d) =>
      Dedup.embeddingNearDups(Tables.embeddings(s, d), threshold = 0.45)
        .orderBy(col("vec_a"), col("vec_b"))),

    "q30_ann_bruteforce" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      Similarity.bruteForceTopK(e, e.filter(col("vec_id") < 5), k = 10)
        .orderBy(col("q_id"), col("rank"))
    }),

    "q31_ann_lsh" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      Similarity.lshTopK(e, e.filter(col("vec_id") < 5), k = 10, nBits = 8)
        .orderBy(col("q_id"), col("rank"))
    }),

    // persistent IVF index maintained incrementally: train+seed on the
    // even-id half, addBatch the odd half WITHOUT retraining, query the
    // whole corpus. The two-phase angular bound keeps queries exact under
    // drifted centroids, so the oracle is plain brute force over all
    // vectors — the index changes the COST shape, never the answer
    "q105_vector_index" -> ((s, d) => {
      val root = java.nio.file.Files.createTempDirectory("vecidx-q").toString
      val e = Tables.embeddings(s, d)
      val idx = graft.operators.VectorIndex.create(root,
        e.filter(col("vec_id") % 2 === 0), nlist = 16)
      idx.addBatch(e.filter(col("vec_id") % 2 =!= 0), Some("delta"))
      idx.query(e.filter(col("vec_id") < 5), k = 10)
        .orderBy(col("q_id"), col("rank"))
    }),

    "q59_ann_ivf" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      // k-means-trained centroids + two-phase angular-bound probing: the
      // candidate set provably contains the true top-k, so the oracle is
      // plain brute force — IVF here changes the COST, never the answer
      Similarity.ivfTopKExact(e, e.filter(col("vec_id") < 5), k = 10,
        nlist = 16, nProbe = 4).orderBy(col("q_id"), col("rank"))
    }),

    "q32_text_quality" -> ((s, d) =>
      TextAnalysis.withQuality(Tables.fanout(Tables.documents(s, d)))
        .select(col("doc_id"), col("n_chars"), col("n_words"), col("avg_word_len"),
          col("punct_ratio"), col("digit_ratio"), col("stopword_ratio"),
          col("quality_score"))
        .orderBy(col("doc_id"))),

    "q33_text_langid" -> ((s, d) =>
      Tables.fanout(Tables.documents(s, d))
        .select(col("lang"), TextAnalysis.langIdExpr(col("text")).as("lang_id"))
        .groupBy(col("lang"), col("lang_id"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("lang"), col("lang_id"))),

    "q34_text_tokens" -> ((s, d) =>
      Tables.fanout(Tables.documents(s, d))
        .select(col("doc_id"),
          size(TextAnalysis.wsTokens(col("text"))).cast("long").as("n_ws"),
          size(TextAnalysis.bpeTokens(col("text"))).cast("long").as("n_bpe"))
        .orderBy(col("doc_id"))),

    "q35_text_fingerprint" -> ((s, d) =>
      Tables.fanout(Tables.documents(s, d))
        .select(col("doc_id"), TextAnalysis.fingerprintExpr(col("text")).as("fp"))
        .orderBy(col("doc_id"))),

    "q36_binary_meta" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          octet_length(encode(col("text"), "UTF-8")).cast("long").as("byte_len"),
          md5(encode(col("text"), "UTF-8")).as("content_md5"))
        .orderBy(col("doc_id"))),

    "q37_multimodal_features" -> ((s, d) =>
      Multimodal.featureQuery(s, Tables.documents(s, d))),

    "q49_normalize" -> ((s, d) =>
      Tables.fanout(Tables.documents(s, d))
        .select(col("doc_id"),
          md5(CorpusOps.normalizeExpr(col("text"))).as("norm_md5"),
          length(CorpusOps.normalizeExpr(col("text"))).cast("long").as("norm_len"))
        .orderBy(col("doc_id"))),

    "q50_vocab_top" -> ((s, d) =>
      CorpusOps.vocabulary(Tables.fanout(Tables.documents(s, d)))
        .orderBy(col("freq").desc, col("token"))
        .limit(20)),

    "q51_bigrams_top" -> ((s, d) =>
      CorpusOps.bigrams(Tables.fanout(Tables.documents(s, d)))
        .orderBy(col("freq").desc, col("bigram"))
        .limit(20)),

    "q52_contamination" -> ((s, d) => {
      val docs = Tables.fanout(Tables.documents(s, d))
      CorpusOps.contaminated(
        docs.filter(col("doc_id") >= 10),
        docs.filter(col("doc_id") < 10), n = 8)
        .orderBy(col("doc_id"))
    }),

    // eval-integrity: per benchmark doc, the fraction the corpus has seen
    "q119_benchmark_exposure" -> ((s, d) => {
      val docs = Tables.fanout(Tables.documents(s, d))
      CorpusOps.benchmarkExposure(
        docs.filter(col("doc_id") >= 10),
        docs.filter(col("doc_id") < 10), n = 8)
        .orderBy(col("doc_id"))
    }),

    "q53_pii_scan" -> ((s, d) =>
      CorpusOps.piiScan(Tables.fanout(Tables.documents(s, d)))
        .orderBy(col("doc_id"))),

    "q56_train_split" -> ((s, d) =>
      Tables.documents(s, d)
        .groupBy(CorpusOps.splitExpr(col("doc_id")).as("split"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).cast("long").as("n_chars"))
        .orderBy(col("split"))),

    "q57_class_weights" -> ((s, d) =>
      CorpusOps.classWeights(Tables.documents(s, d), "lang")
        .orderBy(col("lang"))),

    // pairs -> connected components -> canonical survivor per cluster
    "q64_dedup_clusters" -> ((s, d) =>
      Dedup.nearDupClusters(Tables.fanout(Tables.documents(s, d)),
          n = 3, threshold = 0.8)
        .orderBy(col("doc_id"))),

    // deterministic class-rebalancing sampler: keep 40% of 'en', 80% of
    // every other language (per-row hash filter — no shuffle, no RNG state)
    "q61_stratified_sample" -> ((s, d) =>
      CorpusOps.stratifiedSample(Tables.documents(s, d), "lang",
          Map("en" -> 40), defaultPct = 80)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_kept"))
        .orderBy(col("lang"))),

    // quality binning for curriculum schedules: per-language deciles by
    // document length (ntile + percent_rank ranking windows)
    "q62_quality_deciles" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("lang")).orderBy(col("n_chars"), col("doc_id"))
      Tables.documents(s, d)
        .withColumn("decile", ntile(10).over(w).cast("long"))
        .withColumn("pr", TextAnalysis.quant4(percent_rank().over(w)))
        .groupBy(col("lang"), col("decile"))
        .agg(count(lit(1)).as("n"),
          max(col("n_chars")).cast("long").as("max_chars"),
          max(col("pr")).as("max_pr"))
        .orderBy(col("lang"), col("decile"))
    }),

    "q58_token_packing" -> ((s, d) =>
      CorpusOps.packShards(Tables.documents(s, d), budget = 2000)
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).cast("long").as("n_tokens"))
        .orderBy(col("shard"))),

    // pairs -> clusters -> the FILTERED corpus (what actually feeds
    // training): drop every non-representative cluster member
    "q66_dedup_survivors" -> ((s, d) =>
      Dedup.survivors(Tables.fanout(Tables.documents(s, d)),
          n = 3, threshold = 0.8)
        .select(col("doc_id")).orderBy(col("doc_id"))),

    // policy survivors: each cluster keeps its LONGEST member (best copy)
    "q121_survivors_best" -> ((s, d) =>
      Dedup.survivorsBest(Tables.fanout(Tables.documents(s, d)),
          scoreCol = "n_chars", n = 3, threshold = 0.8)
        .select(col("doc_id")).orderBy(col("doc_id"))),

    // CCNet perplexity triage: per-source head/middle/tail by bigram-LM
    // cross-entropy (scale-safe bucketed ranking, no per-source window)
    "q122_ppl_buckets" -> ((s, d) =>
      CorpusOps.pplBuckets(Tables.fanout(Tables.documents(s, d)))
        .orderBy(col("doc_id"))),

    // cluster-balanced sampling: 10 deterministic md5-order picks per
    // k-means cell (diversity-preserving curation subsample)
    "q123_cluster_sample" -> ((s, d) =>
      Similarity.clusterSample(Tables.embeddings(s, d), perCluster = 10)
        .orderBy(col("vec_id"))),

    // validated PII scan: deterministic doc_id-built payloads (email,
    // valid+invalid IPv4, SSN, URL, Luhn-correct/corrupted card) parsed
    // back with octet validation and the Luhn checksum
    "q124_pii_validated" -> ((s, d) =>
      CorpusOps.piiScanValidated(
        Tables.fanout(Tables.documents(s, d))
          .withColumn("text", CorpusOps.piiFixture(col("doc_id"), col("text"))))
        .orderBy(col("doc_id"))),

    // per-document n-gram novelty vs the rest of the corpus
    "q125_novelty" -> ((s, d) =>
      CorpusOps.novelty(Tables.fanout(Tables.documents(s, d)), n = 3)
        .orderBy(col("doc_id"))),

    // contrastive triplets: hardest same-label positive + hardest
    // different-label negative per query, with the triplet margin
    "q126_triplets" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      Similarity.tripletMine(e, e.filter(col("vec_id") < 8))
        .orderBy(col("q_id"))
    }),

    // epoch schedule: capped water-fill of a 3x-corpus token budget
    // across sources (temperature weights, 4-epoch repetition cap)
    "q127_epoch_schedule" -> ((s, d) =>
      CorpusOps.epochSchedule(Tables.fanout(Tables.documents(s, d)),
          budgetFactor = 3.0, maxEpochs = 4.0, alpha = 0.5)
        .orderBy(col("source"))),

    // Matryoshka dimension-energy curve: avg fraction of squared norm
    // in the first k dims (integer-exact aggregation)
    "q128_dim_energy" -> ((s, d) =>
      Similarity.dimEnergy(Tables.embeddings(s, d))
        .orderBy(col("cutoff"))),

    // per-source tokenizer compression with the corpus-trained BPE table
    "q129_bpe_compression" -> ((s, d) =>
      CorpusOps.bpeCompression(Tables.documents(s, d), merges = 8)
        .orderBy(col("source"))),

    // two-pass heavy hitters: count-min candidate grid (collected, re-
    // entering the plan as literals) + exact rescan of admitted grams
    "q130_heavy_hitters" -> ((s, d) =>
      CorpusOps.heavyHitters(Tables.fanout(Tables.documents(s, d)),
          n = 3, minCount = 6)
        .orderBy(col("cnt").desc, col("gram"))),

    // registered-domain curation gate over fixture-built URLs
    "q131_domain_stats" -> ((s, d) =>
      CorpusOps.domainStats(
        Tables.fanout(Tables.documents(s, d))
          .withColumn("text",
            CorpusOps.urlFixture(col("doc_id"), col("text"))))
        .orderBy(col("domain"))),

    // snapshot drift: PSI between a real MergeTable's version-1 snapshot
    // (even docs) and head (all docs minus %7 deletes) over n_chars —
    // time travel feeding the monitoring query; the oracle replays the
    // deterministic version subsets straight from the parquet table
    "q134_snapshot_drift" -> ((s, d) => {
      import org.apache.spark.sql.types.StructType
      val docs = Tables.documents(s, d)
      val root = java.nio.file.Files.createTempDirectory("drift-q").toString
      val t = new graft.table.MergeTable(root,
        StructType.fromDDL("doc_id BIGINT, n_chars BIGINT"),
        keyCol = "doc_id", partitionCol = None).create()
      t.appendAll(docs.filter(col("doc_id") % 2 === 0)
        .select(col("doc_id"), col("n_chars")))
      val v1 = t.latestVersion
      t.appendAll(docs.filter(col("doc_id") % 2 =!= 0)
        .select(col("doc_id"), col("n_chars")))
      t.deleteWhere(s, col("doc_id") % 7 === 0)
      CorpusOps.driftReport(t.read(s, Some(v1)), t.read(s), "n_chars")
        .orderBy(col("bucket"))
    }),

    // DoReMi multiplicative-weights mixture step over model-free excess
    // loss (per-source unigram KL vs the corpus blend)
    "q136_doremi_weights" -> ((s, d) =>
      CorpusOps.doremiWeights(Tables.fanout(Tables.documents(s, d)),
          eta = 1.0)
        .orderBy(col("source"))),

    // dataset-release shard manifest with order-independent checksums
    "q135_shard_manifest" -> ((s, d) =>
      CorpusOps.shardManifest(Tables.fanout(Tables.documents(s, d)),
          nShards = 8)
        .orderBy(col("shard"))),

    // context-window fit: truncation/padding waste per candidate seq_len
    "q133_seqlen_fit" -> ((s, d) =>
      CorpusOps.seqLenFit(Tables.fanout(Tables.documents(s, d)))
        .orderBy(col("seq_len"))),

    // deterministic epoch ordering: seed-keyed shard-then-interleave
    // permutation, no global sort — the reproducible training shuffle
    "q137_epoch_order" -> ((s, d) =>
      CorpusOps.epochOrder(Tables.documents(s, d), seed = 42L, nShards = 8)
        .orderBy(col("global_pos"))),

    // per-source dataset card: volume, token share, dup rate, language mix
    "q138_dataset_card" -> ((s, d) =>
      CorpusOps.datasetCard(Tables.fanout(Tables.documents(s, d)))
        .orderBy(col("source"))),

    // c-TF-IDF cluster labeling: top terms naming each embedding cluster
    "q139_cluster_keywords" -> ((s, d) =>
      CorpusOps.clusterKeywords(Tables.fanout(Tables.documents(s, d)),
          Tables.embeddings(s, d), k = 5)
        .orderBy(col("label"), col("rank"))),

    // trigram LM table: top continuations per 2-token context (infini-gram
    // primitive; support-filtered before the ranking window)
    "q140_ngram_lm" -> ((s, d) =>
      CorpusOps.ngramLm(Tables.fanout(Tables.documents(s, d)),
          n = 2, k = 3, minCount = 4)
        .orderBy(col("ctx"), col("rank"))),

    // margin-based bitext mining: ratio margin over integer-quantized
    // cosines, en → other-language best pairs above margin 1.0
    "q141_bitext_margin" -> ((s, d) =>
      Similarity.bitextMine(Tables.documents(s, d), Tables.embeddings(s, d),
          srcLang = "en", k = 4)
        .orderBy(col("src_id"))),

    // quality-threshold calibration sweep vs the Gopher gate verdict
    "q142_score_sweep" -> ((s, d) =>
      CorpusOps.scoreSweep(Tables.fanout(Tables.documents(s, d)))
        .orderBy(col("threshold"))),

    // Zipf rank-frequency least-squares fit over the top-1000 types
    "q143_zipf_fit" -> ((s, d) =>
      CorpusOps.zipfFit(Tables.fanout(Tables.documents(s, d)))),

    // cross-source LM affinity matrix: every source under every source's
    // smoothed unigram LM, with excess over self-scoring
    "q144_source_affinity" -> ((s, d) =>
      CorpusOps.sourceAffinity(Tables.fanout(Tables.documents(s, d)))
        .orderBy(col("eval_source"), col("model_source"))),

    // k-NN label-agreement audit: label-noise suspects from neighborhood
    // label disagreement over integer-quantized cosines
    "q145_label_agreement" -> ((s, d) =>
      Similarity.labelAgreement(Tables.embeddings(s, d), k = 8,
          sampleMod = 10)
        .orderBy(col("q_id"))),

    // source x length-bucket chi-square independence audit
    "q146_source_balance" -> ((s, d) =>
      CorpusOps.sourceBalance(Tables.documents(s, d))
        .orderBy(col("source"), col("bucket"))),

    // deflate compressibility quality signal (no SQL oracle: DuckDB has
    // no deflate — rows-check + contract specs, like q27/q28/q44)
    "q147_compress_ratio" -> ((s, d) =>
      TextAnalysis.compressionRatio(Tables.fanout(Tables.documents(s, d)))
        .orderBy(col("doc_id"))),

    // q147's CONTRACT twin (the q103 recipe): the deflate byte counts
    // cannot be oracle-replayed (DuckDB has no deflate), but the exact
    // inputs and the contract can — emit doc_id + the exact UTF-8 byte
    // count (oracle: octet_length(encode(text))) plus booleans asserting
    // (a) the ratio sits in the pinned-fixture band [0.25, 1.30]
    // (measured [0.38, 1.13] across all 3 SFs), (b) the deflate overhead
    // bound n_bytes+64 holds with a sane 8-byte floor, and (c) the
    // emitted ratio is exactly the 4dp floor of n_compressed/n_bytes.
    // The oracle computes the exact side and TRUE literals: a codec
    // regression flips a boolean and fails the hash.
    "q147b_compress_contract" -> ((s, d) => {
      val recomputed = floor(col("n_compressed").cast("double")
        / nullif(col("n_bytes").cast("double"), lit(0.0)) * 10000) / 10000
      TextAnalysis.compressionRatio(Tables.fanout(Tables.documents(s, d)))
        .select(col("doc_id"), col("n_bytes"),
          (col("ratio") >= 0.25 && col("ratio") <= 1.30).as("ratio_in_band"),
          (col("n_compressed") >= 8
            && col("n_compressed") <= col("n_bytes") + 64).as("overhead_ok"),
          ((col("n_bytes") === 0 && col("ratio") === 1.0)
            || col("ratio") === recomputed).as("ratio_consistent"))
        .orderBy(col("doc_id"))
    }),

    // k-anonymity release audit over (lang, source, length-bucket)
    "q148_k_anonymity" -> ((s, d) =>
      CorpusOps.kAnonymity(Tables.documents(s, d), k = 5L)
        .orderBy(col("lang"), col("source"), col("len_bucket"))),

    // Monroe log-odds "Fightin' Words": per-source distinguishing terms
    "q149_log_odds" -> ((s, d) =>
      CorpusOps.logOddsLexicon(Tables.fanout(Tables.documents(s, d)), k = 5)
        .orderBy(col("source"), col("rank"))),

    // RAG context assembly: ranked retrieval greedily packed into a
    // fixed token budget per query
    "q150_context_assembly" -> ((s, d) =>
      Similarity.contextAssemble(Tables.documents(s, d),
          Tables.embeddings(s, d), nQueries = 8, budget = 256L)
        .orderBy(col("q_id"), col("rank"))),

    // MMR diversified retrieval: 3 integer-exact selection rounds
    "q151_mmr_select" -> ((s, d) =>
      Similarity.mmrSelect(Tables.embeddings(s, d), nQueries = 4, k = 3)
        .orderBy(col("q_id"), col("step"))),

    // top-PMI adjacent collocations, support-filtered
    "q152_collocations" -> ((s, d) =>
      CorpusOps.collocations(Tables.fanout(Tables.documents(s, d)),
          k = 50, minCount = 5)
        .orderBy(col("pmi").desc, col("w1"), col("w2"))),

    // sort-by-length batching: padding waste, hashed vs sorted, per shard
    "q153_batch_waste" -> ((s, d) =>
      CorpusOps.batchingWaste(Tables.fanout(Tables.documents(s, d)))
        .orderBy(col("strategy"), col("shard"))),

    // semantic source map: pairwise cosine of per-source centroids
    "q154_source_map" -> ((s, d) =>
      Similarity.sourceCentroidMap(Tables.documents(s, d),
          Tables.embeddings(s, d))
        .orderBy(col("source_a"), col("source_b"))),

    // per-doc memorization risk: fraction of contexts following the
    // corpus LM's dominant continuation
    "q155_memorization_risk" -> ((s, d) =>
      CorpusOps.memorizationRisk(Tables.fanout(Tables.documents(s, d)),
          n = 2, minCount = 8, topProb = 0.9)
        .orderBy(col("doc_id"))),

    // deequ-style one-pass column profile over lineitem
    "q156_profile" -> ((s, d) =>
      graft.operators.DataQuality.profile(Tables.lineitem(s, d),
          Seq("l_orderkey", "l_quantity", "l_returnflag", "l_shipdate"))
        .orderBy(col("col_name"))),

    // constraint-check battery: not-null / unique / range / accepted
    // values / referential integrity across orders-lineitem-customer
    "q157_dq_checks" -> ((s, d) => {
      val dq = graft.operators.DataQuality
      val orders = Tables.orders(s, d)
      dq.battery(Seq(
        dq.notNull(orders, "o_orderkey", "orders.o_orderkey not_null"),
        dq.unique(orders, "o_orderkey", "orders.o_orderkey unique"),
        dq.satisfies(orders, col("o_totalprice") > 0,
          "orders.o_totalprice positive"),
        dq.satisfies(orders, col("o_orderstatus").isin("O", "F", "P"),
          "orders.o_orderstatus accepted"),
        dq.refIntegrity(orders, "o_custkey", Tables.customer(s, d),
          "c_custkey", "orders.o_custkey refs customer"),
        dq.refIntegrity(Tables.lineitem(s, d), "l_orderkey", orders,
          "o_orderkey", "lineitem.l_orderkey refs orders")))
        .orderBy(col("rule"))
    }),

    // partition completeness: daily counts over the full calendar spine
    "q158_partition_gaps" -> ((s, d) =>
      graft.operators.DataQuality.partitionCompleteness(
          Tables.orders(s, d), "o_orderdate")
        .orderBy(col("day"))),

    // ordered first-touch funnel over the event stream
    "q159_funnel" -> ((s, d) =>
      graft.operators.TemporalJoins.funnel(Tables.events(s, d),
          Seq("view", "click", "purchase"))
        .orderBy(col("step"))),

    // integer-quantized PageRank over the arithmetic link fixture: the
    // oracle replays all three power iterations bit-for-bit in BIGINTs
    "q132_pagerank" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val n = docs.count()
      val nodes = docs.select(col("doc_id"))
      val edges = graft.operators.GraphOps.linkFixture(nodes, n)
      graft.operators.GraphOps.pageRank(edges, nodes, n, iters = 3)
        .orderBy(col("doc_id"))
    }),

    // funnel conversion-latency distribution per adjacent step pair:
    // exact micro latencies, interpolated p50/p90 seconds
    "q217_conversion_lag" -> ((s, d) =>
      graft.operators.TemporalJoins.conversionLatency(Tables.events(s, d))
        .orderBy(col("step"))),

    // code-likeness gate: five exact millionth signals + integer
    // composite over a planted code-snippet slice
    "q227_code_detect" -> ((s, d) => {
      val h =
        ((col("doc_id") % 2147483648L) * 2654435761L) % 2147483647L
      val snippet = "\ndef compute(x):\n    return x * 2;\n" +
        "class FooBar:\n    val camelCaseVar = compute(42);"
      val docs = Tables.fanout(Tables.documents(s, d))
        .withColumn("text", when(h % 5 === 0,
          concat(col("text"), lit(snippet))).otherwise(col("text")))
      graft.operators.TextAnalysis.codeScore(docs)
        .select(col("doc_id"), col("sym6"), col("semi6"), col("ind6"),
          col("code6"), col("code_score"), col("is_code"))
        .orderBy(col("doc_id"))
    }),

    // LSH band-tuning table: candidate volume vs measured recall of the
    // exact near-dup pairs for 2/4/8-band splits of the 16-hash
    // portable signature
    "q228_lsh_tuning" -> ((s, d) =>
      graft.operators.Dedup.lshTuningTable(
          Tables.fanout(Tables.documents(s, d)))
        .orderBy(col("bands"))),

    // portable Count-Min sketch: top-20 user frequencies vs the 4x256
    // counter grid's min-estimate, overcount >= 0 by construction,
    // eps-bound verdict in exact integers
    "q229_countmin" -> ((s, d) =>
      graft.operators.Sketches.cmReport(Tables.events(s, d), "user_id")
        .orderBy(col("exact").desc, col("user_id"))),

    // l-diversity audit over the q148 equivalence classes with source
    // as the sensitive attribute: distinct-l + entropy-l verdicts
    "q230_l_diversity" -> ((s, d) =>
      graft.operators.CorpusOps.lDiversity(Tables.documents(s, d), l = 3L)
        .orderBy(col("lang"), col("len_bucket"))),

    // Hill tail-index per source over document lengths: top-k order
    // statistics, quantized-ln Hill sum, one integer division
    "q231_hill_tail" -> ((s, d) =>
      graft.operators.CorpusOps.hillTail(Tables.documents(s, d), k = 10)
        .orderBy(col("source"))),

    // Spearman rank correlation (tie-averaged midranks) between doc
    // length and distinct-token vocabulary per source
    "q232_rank_corr" -> ((s, d) => {
      val docs = Tables.fanout(Tables.documents(s, d))
        .withColumn("n_vocab",
          size(array_distinct(
            graft.operators.TextAnalysis.wsTokens(col("text"))))
            .cast("long"))
      graft.operators.EvalOps.spearman(docs, "source", "n_chars", "n_vocab")
        .orderBy(col("source"))
    }),

    // Jensen-Shannon divergence matrix between source unigram models:
    // symmetric bounded pairwise distance, exact BIGINT dot products
    "q233_jsd_matrix" -> ((s, d) =>
      graft.operators.CorpusOps.jsdMatrix(
          Tables.fanout(Tables.documents(s, d)))
        .orderBy(col("source_a"), col("source_b"))),

    // Youden-J operating point over the q206 planted-class fixture:
    // best classification threshold from the collapsed score value set
    "q234_youden" -> ((s, d) => {
      val ta = graft.operators.TextAnalysis
      val h = ((col("doc_id") % 2147483648L) * 2654435761L) % 2147483647L
      val labeled = Tables.fanout(Tables.documents(s, d))
        .withColumn("pos", h % 2 === 0)
        .withColumn("text", when(col("pos"),
          concat(col("text"), lit(" of the is"))).otherwise(col("text")))
      graft.operators.EvalOps.youdenThreshold(
        ta.withQuality(labeled), "quality_score", "pos")
    }),

    // Nelson-Aalen cumulative hazard over user lifetimes with horizon
    // censoring: exact integer per-step rationals, value-set windows
    "q235_hazard" -> ((s, d) =>
      graft.operators.TemporalJoins.hazard(Tables.events(s, d))
        .orderBy(col("duration_days"))),

    // t-closeness audit: per-class EMD (= total variation, categorical
    // unit distance) to the global source mix, dense grid, exact BIGINT
    "q236_t_closeness" -> ((s, d) =>
      graft.operators.CorpusOps.tCloseness(Tables.documents(s, d))
        .orderBy(col("lang"), col("len_bucket"))),

    // Mann-Kendall monotone-trend significance over daily volumes per
    // event type: exact S and tie-corrected variance, z verdict
    "q237_mann_kendall" -> ((s, d) =>
      graft.operators.TemporalJoins.mannKendall(Tables.events(s, d))
        .orderBy(col("event_type"))),

    // cluster chaining audit: exact Jaccard over EVERY intra-cluster
    // pair -- where transitive closure over-merges, named per cluster
    "q241_chain_audit" -> ((s, d) =>
      graft.operators.Dedup.clusterChainAudit(
          Tables.fanout(Tables.documents(s, d)))
        .orderBy(col("cluster"))),

    // Naive Bayes source classifier: train on even-hash half, classify
    // the holdout, per-source accuracy -- the source-separability probe
    "q240_nb_classifier" -> ((s, d) =>
      graft.operators.CorpusOps.nbSourceClassifier(
          Tables.fanout(Tables.documents(s, d)))
        .orderBy(col("source"))),

    // query-likelihood Dirichlet retrieval: smoothed LM ranker where
    // absent query terms still contribute the corpus prior
    "q239_ql_dirichlet" -> ((s, d) =>
      graft.operators.CorpusOps.qlDirichlet(
          Tables.fanout(Tables.documents(s, d)),
          Seq("vector", "stream", "filter", "spark"))
        .orderBy(col("rank"))),

    // token-WEIGHTED length quantiles per source: type-1 ceiling-rank
    // order statistics over the value-set cumulative of weight sums
    "q238_weighted_quantiles" -> ((s, d) => {
      val q = graft.operators.Quantiles
      val docs = Tables.fanout(Tables.documents(s, d))
        .withColumn("n_toks",
          size(graft.operators.TextAnalysis.wsTokens(col("text")))
            .cast("long"))
      q.weightedQuantiles(docs, "source", "n_chars", "n_toks",
          Seq(q.Q("p25", 1, 4), q.Q("p50", 1, 2), q.Q("p90", 9, 10)))
        .orderBy(col("source"))
    }),

    // key-skew diagnosis: freq-of-freq Gini + top-key share + salt
    // recommendation over three differently-shaped keyed relations
    "q225_key_skew" -> ((s, d) => {
      val sp = graft.operators.ScalePatterns
      def rep(df: org.apache.spark.sql.DataFrame, key: String,
          label: String) =
        sp.keySkewReport(df, key).withColumn("relation", lit(label))
      rep(Tables.events(s, d), "user_id", "events.user_id")
        .unionByName(rep(Tables.events(s, d), "event_type",
          "events.event_type"))
        .unionByName(rep(Tables.lineitem(s, d), "l_orderkey",
          "lineitem.l_orderkey"))
        .select(col("relation"), col("n_keys"), col("n_rows"),
          col("top_count"), col("top_share"), col("gini"),
          col("salt_factor"), col("verdict"))
        .orderBy(col("relation"))
    }),

    // split-conformal threshold per source over n_chars nonconformity:
    // exact ceiling-rank order statistic + holdout coverage audit
    "q226_conformal" -> ((s, d) => {
      val h =
        ((col("doc_id") % 2147483648L) * 2654435761L) % 2147483647L
      graft.operators.EvalOps.conformalThreshold(
          Tables.fanout(Tables.documents(s, d))
            .withColumn("cal", h % 2 === 0)
            .withColumn("nc", col("n_chars").cast("long")),
          "source", "nc", "cal")
        .orderBy(col("source"))
    }),

    // two-sided CUSUM changepoint scan over daily volumes per event
    // type: exact integer recurrence, alarm day named
    "q223_cusum" -> ((s, d) =>
      graft.operators.TemporalJoins.cusum(Tables.events(s, d))
        .orderBy(col("event_type"))),

    // Tukey outlier fences per source over token counts: exact
    // quarter-unit quartiles via the value-set collapse, integer fence
    // comparisons, collapsed-table census
    "q221_length_fences" -> ((s, d) =>
      graft.operators.Quantiles.outlierFences(
          Tables.fanout(Tables.documents(s, d))
            .withColumn("n_toks",
              size(graft.operators.TextAnalysis.wsTokens(col("text")))
                .cast("long")),
          "source", "n_toks")
        .orderBy(col("source"))),

    // grouped quantile panel over event purchase values (half-up cent
    // quantization): p50/p90/p99 per event type, value-set windows only
    "q222_value_quantiles" -> ((s, d) => {
      val qt = graft.operators.Quantiles
      qt.groupedQuantiles(
          Tables.events(s, d)
            .withColumn("cents",
              expr("cast(floor(value * 100 + 0.5) as bigint)")),
          "event_type", "cents",
          Seq(qt.Q("p50_cents", 1, 2), qt.Q("p90_cents", 9, 10),
            qt.Q("p99_cents", 99, 100)))
        .orderBy(col("event_type"))
    }),

    // shard-mix audit: hash shards vs the classic correlated-key
    // mistake (doc_id % 20 == the source encoding) — the latter lights
    // up skewed with top_share = 1
    "q219_shard_mix" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val co = graft.operators.CorpusOps
      val hash = docs.withColumn("shard",
        co.shardExpr(col("doc_id"), 8))
      val mod = docs.withColumn("shard", pmod(col("doc_id"), lit(20)))
      co.shardMix(hash, "shard", "source")
        .withColumn("scheme", lit("hash"))
        .unionByName(co.shardMix(mod, "shard", "source")
          .withColumn("scheme", lit("modulo")))
        .select(col("scheme"), col("shard"), col("n_docs"),
          col("n_groups"), col("tv"), col("top_share"), col("verdict"))
        .orderBy(col("scheme"), col("shard"))
    }),

    // padding-waste report: fixed-seqLen padding vs power-of-two
    // length-bucketed batching over the fanout corpus
    "q220_padding_waste" -> ((s, d) =>
      graft.operators.CorpusOps.paddingWaste(
          Tables.fanout(Tables.documents(s, d)), seqLen = 128)
        .orderBy(col("bucket"))),

    // Fellegi–Sunter record linkage: a planted dirty copy of the
    // customer table (one tail digit flipped, bal/segment perturbed on
    // hash slices, plus unlinked fresh records) linked back via two
    // skip-position blocking passes + integer milli-bit weights
    "q218_record_linkage" -> ((s, d) => {
      val (clean, dirty) = linkageFixture(s, d)
      val lk = graft.operators.Linkage
      lk.linkage(clean, dirty,
          cleanId = "c_custkey", dirtyId = "d_id",
          passes = linkagePasses,
          fields = Seq(
            lk.Field("name", levenshtein(col("c_name"), col("d_name")) <= 1,
              5000L, -3000L),
            lk.Field("seg", col("c_mktsegment") === col("d_seg"),
              1500L, -1200L),
            lk.Field("bal", abs(col("c_acctbal") - col("d_bal")) <= 1.0,
              1800L, -1500L)),
          matchAt = 5000L, nonMatchBelow = 0L)
        .select(col("d_id"), col("c_custkey"), col("name_agree"),
          col("seg_agree"), col("bal_agree"), col("score"), col("verdict"))
        .orderBy(col("d_id"), col("c_custkey"))
    }),

    // q218b: same planted fixture, but the m/u parameters are LEARNED —
    // integer EM over the 2^3 agreement-pattern census (3 rounds, exact
    // BigInt millionths; the oracle replays the rounds as unrolled
    // HUGEINT CTEs) — and the verdict bands on the match POSTERIOR still
    // recover the planted slice without any caller-supplied weights
    "q218b_linkage_em" -> ((s, d) => {
      val (clean, dirty) = linkageFixture(s, d)
      graft.operators.Linkage.linkageEm(clean, dirty,
          cleanId = "c_custkey", dirtyId = "d_id",
          passes = linkagePasses,
          fields = Seq(
            ("name", levenshtein(col("c_name"), col("d_name")) <= 1),
            ("seg", col("c_mktsegment") === col("d_seg")),
            ("bal", abs(col("c_acctbal") - col("d_bal")) <= 1.0)),
          iters = 3, matchAt6 = 900000L, nonMatchBelow6 = 100000L)
        .select(col("d_id"), col("c_custkey"), col("name_agree"),
          col("seg_agree"), col("bal_agree"), col("posterior6"),
          col("verdict"))
        .orderBy(col("d_id"), col("c_custkey"))
    }),

    // exact two-sample KS per source vs the rest of the corpus over
    // n_chars: value-set grid ECDFs, integer millionth D, IEEE-sqrt
    // critical band at alpha = 0.05
    "q242_ks_test" -> ((s, d) =>
      graft.operators.EvalOps.ksTest(Tables.documents(s, d),
        "source", "n_chars").orderBy(col("source"))),

    // Benjamini-Hochberg step-up over per-(source, lang) slice pseudo
    // p-values (hash-derived, with a planted small-p rule on
    // n_docs % 7 = 0 slices): exact cross-multiplied step-up decisions
    "q243_bh_fdr" -> ((s, d) => {
      val slices = Tables.documents(s, d)
        .groupBy(col("source"), col("lang"))
        .agg(min(col("doc_id")).as("test_id"),
          count(lit(1)).as("n_docs"))
      val h = ((col("test_id") % 2147483648L) * 2654435761L) % 2147483647L
      val tests = slices.select(col("test_id"),
        when(col("n_docs") % 7 === 0, h % 1000L)
          .otherwise(h % 1000000L).as("p6"))
      graft.operators.EvalOps.bhSelect(tests, "test_id", "p6")
        .orderBy(col("rank"))
    }),

    // leakage-safe k-fold: fold hashed on the near-dup cluster
    // representative, so components never straddle folds
    "q244_leak_folds" -> ((s, d) =>
      graft.operators.CorpusOps.leakSafeFolds(
          Tables.fanout(Tables.documents(s, d)), k = 5)
        .orderBy(col("doc_id"))),

    // Krippendorff's alpha (nominal) over the SPARSE ratings fixture
    // (deterministic rater dropout -> unequal raters per item, the
    // regime Fleiss' kappa cannot handle)
    "q245_krippendorff" -> ((s, d) =>
      graft.operators.EvalOps.krippendorffAlpha(
          graft.operators.EvalOps.ratingsSparse(Tables.documents(s, d)))
        .orderBy(col("source"))),

    // winsorized + trimmed per-source length means: robust centers with
    // exact order-statistic clips and rank-interval tie splitting
    "q251_winsorized" -> ((s, d) =>
      graft.operators.Quantiles.winsorizedStats(Tables.documents(s, d),
        "source", "n_chars").orderBy(col("source"))),

    // grouped MAD + 3.5-MAD robust outlier census over cent-quantized
    // event values (the q222 quantization grid)
    "q252_grouped_mad" -> ((s, d) =>
      graft.operators.Quantiles.groupedMad(
        Tables.events(s, d).withColumn("cents",
          expr("cast(floor(value * 100 + 0.5) as bigint)")),
        "event_type", "cents").orderBy(col("event_type"))),

    // data-scaling loss curve: bigram-LM holdout xent at 5 nested
    // train prefixes + the quantized log-log slope
    "q250_loss_curve" -> ((s, d) =>
      graft.operators.CorpusOps.lossCurveFit(Tables.documents(s, d), k = 5)
        .orderBy(col("checkpoint"))),

    // simplified-silhouette k sweep over the embeddings: the
    // k-selection read for kmeans/IVF nlist
    "q249_silhouette" -> ((s, d) =>
      graft.operators.Similarity.silhouetteSimplified(
          Tables.fanout(Tables.embeddings(s, d)), ks = Seq(2, 4, 8),
          iters = 3)
        .orderBy(col("k"))),

    // Kaplan-Meier survival over user lifetimes with the q235 censoring
    // contract; integer product-limit fold over the duration value set
    "q246_kaplan_meier" -> ((s, d) =>
      graft.operators.TemporalJoins.kaplanMeier(Tables.events(s, d))
        .orderBy(col("duration_days"))),

    // Chao1 vocabulary-richness estimate + Good coverage per source
    "q247_chao1" -> ((s, d) =>
      graft.operators.CorpusOps.chao1(Tables.documents(s, d))
        .orderBy(col("source"))),

    // pairwise Cohen's kappa matrix over the sparse ratings fixture:
    // which rater disagrees, not just whether the pool does
    "q248_kappa_matrix" -> ((s, d) =>
      graft.operators.EvalOps.cohenKappaMatrix(
          graft.operators.EvalOps.ratingsSparse(Tables.documents(s, d)))
        .orderBy(col("source"), col("rater_a"), col("rater_b"))),

    // Mann-Whitney U per source vs rest over n_chars: doubled integer
    // midranks, DECIMAL(38,0) tie-corrected variance + one IEEE sqrt,
    // exact truncating rank-biserial — ksTest's location-shift companion
    "q253_mann_whitney" -> ((s, d) =>
      graft.operators.EvalOps.mannWhitney(Tables.documents(s, d),
        "source", "n_chars").orderBy(col("source"))),

    // two-cohort log-rank over user lifetimes (q246's censoring
    // contract; cohorts by user_id parity): quantized per-event-time
    // E6/V6 sums, chi2_6 = D^2 div V6
    "q254_log_rank" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val span = ev.groupBy(col("user_id"))
        .agg(min(to_date(col("ts"))).as("first_d"),
          max(to_date(col("ts"))).as("last_d"))
      val horizon = ev.agg(max(to_date(col("ts"))).as("gmax"))
      val units = span.crossJoin(broadcast(horizon))
        .select(when(col("user_id") % 2 === 0, "cohort_even")
            .otherwise("cohort_odd").as("cohort"),
          datediff(col("last_d"), col("first_d")).cast("long").as("dur"),
          (datediff(col("gmax"), col("last_d")) >= 7).as("observed"))
      graft.operators.EvalOps.logRank(units, "cohort", "dur", "observed")
    }),

    // Kendall tau-b per source between length and word-count buckets:
    // cells^2 concordance join, exact tie terms, one exact-product sqrt
    "q255_kendall_tau" -> ((s, d) => {
      val d2 = Tables.documents(s, d).select(col("source"),
        expr("n_chars div 200").as("len_bucket"),
        expr("size(filter(split(text, ' '), x -> x != '')) div 20")
          .as("word_bucket"))
      graft.operators.EvalOps.kendallTauB(d2, "source",
        "len_bucket", "word_bucket").orderBy(col("source"))
    }),

    // Theil-Sen robust slope of daily volumes — q237 Mann-Kendall's
    // magnitude companion: truncating-division slope6 pairs over the
    // calendar-bounded daily table, pinned lower-median order statistic
    "q256_theil_sen" -> ((s, d) =>
      graft.operators.TemporalJoins.theilSen(Tables.events(s, d))
        .orderBy(col("event_type"))),

    // Cochran-Armitage trend: does the English share trend across
    // length buckets per source (exact T*N and DECIMAL(38,0) variance)
    "q257_cochran_armitage" -> ((s, d) =>
      graft.operators.EvalOps.cochranArmitage(
          Tables.documents(s, d).select(col("source"),
            expr("n_chars div 200").as("len_bucket"),
            (col("lang") === "en").as("is_en")),
          "source", "len_bucket", "is_en")
        .orderBy(col("source"))),

    // Page-Hinkley self-calibrating drift over daily volumes: running
    // mean/min as plain cumulative windows, lambda = 50 events
    "q258_page_hinkley" -> ((s, d) =>
      graft.operators.TemporalJoins.pageHinkley(Tables.events(s, d),
        lambda = 50.0).orderBy(col("event_type"))),

    // corpus snapshot diff: v1 drops doc_id%10==0, v2 drops %10==3 and
    // appends a 3-word marker to %7==0 texts — added/removed/unchanged/
    // minor_edit/rewrite per doc with the row-local version Jaccard
    "q259_snapshot_diff" -> ((s, d) => {
      // fanout: the gram sets are built map-side (snapshotDiff round-13
      // note) — without it both map sides run on the single-row-group
      // scan's one task
      val docs = Tables.fanout(Tables.documents(s, d))
      val v1 = docs.filter(col("doc_id") % 10 =!= 0)
      val v2 = docs.filter(col("doc_id") % 10 =!= 3)
        .withColumn("text", when(col("doc_id") % 7 === 0,
          concat(col("text"), lit(" revision marker two")))
          .otherwise(col("text")))
      graft.operators.CorpusOps.snapshotDiff(v1, v2)
        .orderBy(col("doc_id"))
    }),

    // Unicode normalization audit over planted anomalies: NFC via the
    // native codegen expression (combining acute composes), zero-width
    // strip, curly-quote/dash standardization — per-doc audit with the
    // cleaned text's md5 so the oracle checks the BYTES, not just flags
    "q260_normalize_text" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val injected = docs
        .withColumn("text", when(col("doc_id") % 5 === 0,
          concat(col("text"), lit(" caf"), lit("e"), lit("\u0301")))
          .otherwise(col("text")))
        .withColumn("text", when(col("doc_id") % 7 === 0,
          concat(lit("\u200B"), col("text"))).otherwise(col("text")))
        .withColumn("text", when(col("doc_id") % 11 === 0,
          concat(lit("\u201C"), col("text"), lit("\u201D")))
          .otherwise(col("text")))
      graft.operators.TextAnalysis.normalizeText(injected)
        .withColumn("clean_md5", md5(col("text_clean")))
        .drop("text_clean")
        .orderBy(col("doc_id"))
    }),

    // inter-source containment matrix: q87's shared counts upgraded to
    // exact pairwise Jaccard + BOTH directional containments over a
    // dense pair spine (inverted-index shape, never pairwise scans)
    "q261_source_containment" -> ((s, d) =>
      graft.operators.CorpusOps.sourceContainment(
          Tables.fanout(Tables.documents(s, d)))
        .orderBy(col("source_a"), col("source_b"))),

    // Kruskal-Wallis per lang: do the 20 sources differ in length
    // distribution at all — doubled midranks, exact DECIMAL(38,0) H,
    // tie-corrected, Wilson-Hilferty critical cube
    "q262_kruskal_wallis" -> ((s, d) =>
      graft.operators.EvalOps.kruskalWallis(
          Tables.documents(s, d).select(col("lang"), col("source"),
            expr("n_chars div 100").as("len_bucket")),
          "lang", "source", "len_bucket")
        .orderBy(col("lang"))),

    // 1-D Wasserstein drift per source vs rest: the ksTest grid with
    // the CDF gap INTEGRATED over the value axis (chars moved per doc)
    "q263_wasserstein" -> ((s, d) =>
      graft.operators.EvalOps.wasserstein1d(Tables.documents(s, d),
        "source", "n_chars").orderBy(col("source"))),

    // PSI per source vs the corpus baseline: value-set decile buckets,
    // +1/+10 Laplace shares, the 0.2 industry action line
    "q264_psi_drift" -> ((s, d) =>
      graft.operators.EvalOps.psiDrift(Tables.documents(s, d),
        "source", "n_chars").orderBy(col("source"))),

    // Gini + Lorenz landmarks of per-doc word counts per source:
    // doubled-midrank weighted identity, exact in-block Lorenz cuts
    "q265_gini_tokens" -> ((s, d) =>
      graft.operators.Quantiles.giniConcentration(
          Tables.documents(s, d).select(col("source"),
            expr("CAST(size(filter(split(text, ' '), x -> x != '')) AS BIGINT)")
              .as("n_words")),
          "source", "n_words")
        .orderBy(col("source"))),

    // exact triangle census + clustering coefficient over the chorded
    // ring fixture: degree-oriented wedge enumeration (each triangle
    // found once at its (deg,id)-min vertex), never sum-of-deg^2
    "q266_triangles" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val n = docs.count()
      val nodes = docs.select(col("doc_id"))
      val edges = graft.operators.GraphOps.triangleFixture(nodes, n)
      graft.operators.GraphOps.triangleCount(edges, nodes)
        .orderBy(col("doc_id"))
    }),

    // chi-square + Cramer's V over every metadata column pair: dense
    // margin spine (absent cells carry their expected mass), exact
    // DECIMAL cell terms, one IEEE sqrt per pair
    "q267_cramers_v" -> ((s, d) =>
      graft.operators.Association.cramersV(
          Tables.documents(s, d).select(col("source"), col("lang"),
            expr("n_chars div 200").as("len_bucket")),
          Seq("source", "lang", "len_bucket"))
        .orderBy(col("col_a"), col("col_b"))),

    // association rules over per-order brand baskets: presence
    // semantics, support cut, exact integer confidence + lift
    "q268_basket_pairs" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_partkey"))
      val pt = Tables.part(s, d)
        .select(col("p_partkey"), col("p_brand"))
      val baskets = li.join(pt, col("l_partkey") === col("p_partkey"))
        .select(col("l_orderkey"), col("p_brand"))
      graft.operators.Association.frequentPairs(baskets,
          "l_orderkey", "p_brand", minSupport = 3L)
        .orderBy(col("item_a"), col("item_b"))
    }),

    // isotonic (PAV) calibration fit per source over the q174
    // prediction fixture: max-min closed form on quantized interval
    // means — two windows over the B^2 interval table
    "q269_isotonic" -> ((s, d) =>
      graft.operators.EvalOps.isotonicCalibration(
          graft.operators.EvalOps.predictions(Tables.documents(s, d)))
        .orderBy(col("source"), col("bin"))),

    // image near-dups by 64-bit dHash through a REAL codec round trip
    // (PNG/BMP), 4x16 band bucketing (COMPLETE at Hamming <= 3 by
    // pigeonhole) + bit_count verify; the oracle brute-forces all pairs
    // from the closed-form cell grid, checking the banding's exactness
    "q270_image_phash" -> ((s, d) =>
      graft.operators.Multimodal.phashNearDups(s, Tables.documents(s, d))
        .orderBy(col("doc_a"), col("doc_b"))),

    // audio near-dups by 64-bit energy-delta fingerprint through the
    // REAL RIFF walker; 8x8 banding (complete at Hamming <= 7), exact
    // bit_count verify — the oracle brute-forces from closed-form amps
    "q271_audio_fingerprint" -> ((s, d) =>
      graft.operators.AudioWav.audioNearDups(s, Tables.documents(s, d))
        .orderBy(col("doc_a"), col("doc_b"))),

    // Holt linear-trend smoothing of daily volumes: exact integer
    // level/trend recurrence (alpha=1/5, beta=1/10), one-step MAE —
    // the oracle replays the fold as a recursive CTE
    "q272_holt_trend" -> ((s, d) =>
      graft.operators.TemporalJoins.holtLinear(Tables.events(s, d))
        .orderBy(col("event_type"))),

    // ORC round trip: write lineitem partitioned-by-flag to ORC, read
    // back with a pushed timestamp predicate, exact BIGINT aggregate —
    // the oracle computes from PARQUET, so the hash only matches if the
    // ORC layout preserved every row and value
    "q273_orc_roundtrip" -> ((s, d) =>
      graft.sources.OrcIngest.roundtrip(s, d)),

    // embedding-space mix audit: per-label centroid cosine vs the
    // corpus centroid — per-row quantized components, BIGINT sums
    // (cosine is scale-invariant, so sums stand in for means)
    "q274_centroid_drift" -> ((s, d) =>
      graft.operators.Similarity.centroidDrift(Tables.embeddings(s, d))
        .orderBy(col("label"))),

    // CMH stratified 2x2: does the even-id cohort long-doc rate differ
    // from the odd cohort CONTROLLING for language — exact E6/V6 sums,
    // MH common odds ratio, chi2_1 at alpha=0.05
    "q275_cmh_test" -> ((s, d) =>
      graft.operators.EvalOps.cmhTest(
        Tables.documents(s, d).select(col("lang"),
          (col("doc_id") % 2 === 0).as("cohort_even"),
          (col("n_chars") > 306).as("is_long")),
        "lang", "cohort_even", "is_long")),

    // Benford first-digit audit of extended prices per return flag:
    // pinned log10 constants, dense digit spine, integer TV fold
    "q276_benford" -> ((s, d) =>
      graft.operators.DataQuality.benfordAudit(
          Tables.lineitem(s, d), "l_returnflag", "l_extendedprice")
        .orderBy(col("l_returnflag"), col("digit"))),

    // dedup ROI: per cluster size, docs dropped and words saved under
    // the min-doc survivor policy, over a complete corpus census
    "q277_dedup_roi" -> ((s, d) =>
      graft.operators.Dedup.dedupRoi(
          Tables.fanout(Tables.documents(s, d)), n = 3, threshold = 0.8)
        .orderBy(col("cluster_size"))),

    // mutual information + NMI over the q267 column pairs: per-cell
    // quantized ln summands, clamp-at-zero, entropy-normalized
    "q278_mutual_info" -> ((s, d) =>
      graft.operators.Association.mutualInfo(
          Tables.documents(s, d).select(col("source"), col("lang"),
            expr("n_chars div 200").as("len_bucket")),
          Seq("source", "lang", "len_bucket"))
        .orderBy(col("col_a"), col("col_b"))),

    // gen-17 (round 11): parametric/effect-size inference battery —
    // exact x1e6 integer F machinery, value-set effect sizes, calendar
    // time-axis reads. All on raw fixture columns, no fanout.

    // one-way ANOVA per lang: do sources differ in mean length at all
    "q279_anova" -> ((s, d) =>
      graft.operators.Inference.anovaF(
          Tables.documents(s, d), "lang", "source", "n_chars")
        .orderBy(col("lang"))),

    // Brown–Forsythe: are the per-source length VARIANCES comparable
    "q280_brown_forsythe" -> ((s, d) =>
      graft.operators.Inference.brownForsythe(
          Tables.documents(s, d), "lang", "source", "n_chars")
        .orderBy(col("lang"))),

    // Cohen's d / Hedges' g per source vs rest on length
    "q281_cohens_d" -> ((s, d) =>
      graft.operators.Inference.cohensD(
          Tables.documents(s, d), "source", "n_chars")
        .orderBy(col("source"))),

    // Cliff's delta (ordinal effect size) per source vs rest
    "q282_cliffs_delta" -> ((s, d) =>
      graft.operators.Inference.cliffsDelta(
          Tables.documents(s, d), "source", "n_chars")
        .orderBy(col("source"))),

    // Hellinger distance matrix between sources over length deciles
    "q283_hellinger" -> ((s, d) =>
      graft.operators.Inference.hellingerMatrix(
          Tables.documents(s, d), "source", "n_chars")
        .orderBy(col("group_a"), col("group_b"))),

    // Wald–Wolfowitz runs test on daily event volume per type
    "q284_runs_test" -> ((s, d) =>
      graft.operators.Inference.runsTest(
          Tables.events(s, d), "event_type", "ts")
        .orderBy(col("event_type"))),

    // ACF lags 1..7 of daily counts per type, dense calendar spine
    "q285_acf" -> ((s, d) =>
      graft.operators.Inference.acf(
          Tables.events(s, d), "event_type", "ts", maxLag = 7)
        .orderBy(col("event_type"), col("lag"))),

    // best single change point (binary segmentation step) per type
    "q286_changepoint" -> ((s, d) =>
      graft.operators.Inference.changepoint(
          Tables.events(s, d), "event_type", "ts")
        .orderBy(col("event_type"))),

    // Dunn post-hoc pairwise rank z after the q262 omnibus
    "q287_dunn" -> ((s, d) =>
      graft.operators.Inference.dunnPosthoc(
          Tables.documents(s, d), "source", "n_chars")
        .orderBy(col("group_a"), col("group_b"))),

    // Wilson 95% score interval for per-source long-doc rates
    "q288_wilson" -> ((s, d) =>
      graft.operators.Inference.wilsonInterval(
          Tables.documents(s, d), "source", col("n_chars") >= 306)
        .orderBy(col("source"))),

    // Jonckheere–Terpstra ordered trend: does event value shift
    // monotonically across hour-of-day quarters
    "q289_jonckheere" -> ((s, d) =>
      graft.operators.Inference.jonckheereTerpstra(
          Tables.events(s, d).select(
            expr("hour(ts) div 6").as("bucket"),
            floor(col("value") * 100).cast("long").as("cents")),
          "bucket", "cents")
        .orderBy(col("k"))),

    // weekday seasonality = exact eta2 of the weekday factor + peaks
    "q290_seasonality" -> ((s, d) =>
      graft.operators.Inference.weekdaySeasonality(
          Tables.events(s, d), "event_type", "ts")
        .orderBy(col("event_type"))),

    // Friedman + Kendall's W: event types ranked within each day
    "q291_friedman" -> ((s, d) =>
      graft.operators.Inference.friedman(
          Tables.events(s, d), "event_type", "ts")
        .orderBy(col("k"))),

    // Poisson dispersion audit of daily volumes per type
    "q292_dispersion" -> ((s, d) =>
      graft.operators.Inference.dispersionAudit(
          Tables.events(s, d), "event_type", "ts")
        .orderBy(col("event_type"))),

    // Burrows' Delta stylometry matrix over the top-30 corpus words
    "q293_burrows_delta" -> ((s, d) =>
      graft.operators.Inference.burrowsDelta(
          Tables.documents(s, d), "source", "text", topM = 30)
        .orderBy(col("group_a"), col("group_b"))),

    // tokenizer fertility per lang under the q34 subword proxy
    "q294_fertility" -> ((s, d) =>
      graft.operators.TextAnalysis.tokenizerFertility(
          Tables.documents(s, d), "lang")
        .orderBy(col("lang"))),

    // quality-squared-weighted token budget with a 2-epoch cap
    "q295_mixture_alloc" -> ((s, d) =>
      graft.operators.CorpusOps.mixtureAllocation(
          Tables.documents(s, d), "source",
          budgetPerMille = 500, capMilliEpochs = 2000)
        .orderBy(col("source"))),

    // Cochran's Q per source over the 4-model paired-outcome fixture:
    // the k-model McNemar, exact integers to one truncating division
    "q296_cochran_q" -> ((s, d) =>
      graft.operators.Inference.cochranQ(
          graft.operators.EvalOps.modelOutcomes(Tables.documents(s, d)),
          "source", "task_id", "model", "ok")
        .orderBy(col("source"))),

    // Yule's K lexical-concentration constant per source: one token
    // census, K6 = (sum c^2 - N) * 1e10 div N^2
    "q297_yule_k" -> ((s, d) =>
      graft.operators.TextAnalysis.yuleK(Tables.documents(s, d), "source")
        .orderBy(col("source"))),

    // Mood's median test across sources on n_chars: global value-set
    // median + 2xk margin chi-square, one report row
    "q298_mood_median" -> ((s, d) =>
      graft.operators.Inference.moodMedian(
        Tables.documents(s, d), "source", "n_chars")),

    // Durbin-Watson per event type over the dense daily spine: the
    // n-scaled integer identity, labels on the quantized value
    "q299_durbin_watson" -> ((s, d) =>
      graft.operators.Inference.durbinWatson(
          Tables.events(s, d), "event_type", "ts")
        .orderBy(col("event_type"))),

    // PACF lags 1..7: Durbin-Levinson in x1e6 fixed point over the
    // quantized ACF values — every intermediate a BIGINT millionth
    "q300_pacf" -> ((s, d) =>
      graft.operators.Inference.pacf(Tables.events(s, d),
          "event_type", "ts")
        .orderBy(col("event_type"), col("lag"))),

    // Ansari-Bradley rank scale test per source vs rest: folded
    // doubled-midrank scores, permutation moments, one sqrt
    "q301_ansari_bradley" -> ((s, d) =>
      graft.operators.EvalOps.ansariBradley(
          Tables.documents(s, d), "source", "n_chars")
        .orderBy(col("source"))),

    // Wald SPRT per event type: frozen x1e6 LLR constants, calendar
    // cum, first-crossing decision (alpha=beta=0.05, p0=0.3 p1=0.4)
    "q302_sprt" -> ((s, d) =>
      graft.operators.Inference.sprt(Tables.events(s, d),
          "event_type", "ts", col("value") >= 100.0)
        .orderBy(col("event_type"))),

    // KR-20 / Cronbach's alpha on the 4-model outcome matrix: the
    // internal-consistency read on the same censuses as Cochran's Q
    "q303_kr20" -> ((s, d) =>
      graft.operators.Inference.kr20(
          graft.operators.EvalOps.modelOutcomes(Tables.documents(s, d)),
          "source", "task_id", "model", "ok")
        .orderBy(col("source"))),

    // Gwet's AC1 over the 5-rater/4-cat fixture: the prevalence-robust
    // chance model next to Fleiss' kappa (q168)
    "q304_gwet_ac1" -> ((s, d) =>
      graft.operators.EvalOps.gwetAC1(
          graft.operators.EvalOps.ratings(Tables.documents(s, d)))
        .orderBy(col("source"))),

    // confusable-fold dedup-evasion audit: homoglyph evader twins are
    // new distinct texts that fold back onto their originals —
    // fold_collisions counts exactly what exact-dedup would have missed
    "q305_confusable_fold" -> ((s, d) =>
      TextAnalysis.confusableDedupAudit(Tables.documents(s, d))
        .orderBy(col("source"))),

    // Cramér–von Mises two-sample per source vs rest: the integrated
    // ECDF-gap companion to q242's sup-gap KS
    "q306_cvm_test" -> ((s, d) =>
      graft.operators.EvalOps.cvmTest(Tables.documents(s, d),
        "source", "n_chars").orderBy(col("source"))),

    // Kuiper V = D+ + D- per source vs rest: the tail-sensitive,
    // rotation-invariant KS variant
    "q307_kuiper" -> ((s, d) =>
      graft.operators.EvalOps.kuiper(Tables.documents(s, d),
        "source", "n_chars").orderBy(col("source"))),

    // Page's L ordered-alternative trend across name-ordered treatments
    // blocked by day (the friedman grid)
    "q308_page_trend" -> ((s, d) =>
      graft.operators.Inference.pageTrend(
        Tables.events(s, d), "event_type", "ts")),

    // Randolph's free-marginal multirater kappa: the fixed-marginal
    // corner of the Fleiss/Gwet chance-correction triangle
    "q309_randolph_kappa" -> ((s, d) =>
      graft.operators.EvalOps.randolphKappa(
          graft.operators.EvalOps.ratings(Tables.documents(s, d)))
        .orderBy(col("source"))),

    // Bowker symmetry test on paired multi-category model answers
    "q310_bowker" -> ((s, d) =>
      graft.operators.EvalOps.bowker(
          graft.operators.EvalOps.pairedCats(Tables.documents(s, d)))
        .orderBy(col("source"))),

    // Newman degree assortativity over the q266 triangle-fixture graph
    "q311_assortativity" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val n = docs.count()
      val edges = graft.operators.GraphOps.triangleFixture(
        docs.select(col("doc_id")), n)
      graft.operators.GraphOps.assortativity(edges)
    }),

    // Ljung–Box portmanteau over the q285 ACF battery
    "q312_ljung_box" -> ((s, d) =>
      graft.operators.Inference.ljungBox(
          Tables.events(s, d), "event_type", "ts", maxLag = 7)
        .orderBy(col("event_type"))),

    // Wald–Wolfowitz turning-point randomness test on daily volumes
    "q313_turning_points" -> ((s, d) =>
      graft.operators.Inference.turningPoints(
          Tables.events(s, d), "event_type", "ts")
        .orderBy(col("event_type"))),

    // KPSS level-stationarity (null = stationary — the reversed-null
    // companion to Mann–Kendall) on daily volumes
    "q314_kpss" -> ((s, d) =>
      graft.operators.Inference.kpss(
          Tables.events(s, d), "event_type", "ts")
        .orderBy(col("event_type"))),

    // directed reciprocity + density-corrected rho over the q266
    // fixture's DIRECTED edges (pre-symmetrization)
    "q315_reciprocity" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val n = docs.count()
      val edges = graft.operators.GraphOps.triangleFixture(
        docs.select(col("doc_id")), n)
      graft.operators.GraphOps.reciprocity(edges, n)
    }),

    // rank-biased overlap between the byte-length and token-count
    // rankers per source (p = 0.9, depth 10, exact rational weights)
    "q316_rbo" -> ((s, d) =>
      graft.operators.EvalOps.rbo(Tables.documents(s, d))
        .orderBy(col("source"))),

    // Pettitt rank-based change point on daily volumes (the robust
    // companion to q286's mean-based split)
    "q317_pettitt" -> ((s, d) =>
      graft.operators.Inference.pettitt(
          Tables.events(s, d), "event_type", "ts")
        .orderBy(col("event_type"))),

    // Wilcoxon signed-rank on paired model scores (the continuous
    // paired-samples gap between mannWhitney and mcnemar)
    "q318_wilcoxon" -> ((s, d) =>
      graft.operators.EvalOps.wilcoxonSignedRank(
          graft.operators.EvalOps.pairedScores(Tables.documents(s, d)))
        .orderBy(col("source"))),

    // Goodman–Kruskal gamma + both Somers' D asymmetries between the
    // byte-length and token-count bucketings per source
    "q319_ordinal_assoc" -> ((s, d) =>
      graft.operators.EvalOps.ordinalAssociation(Tables.documents(s, d))
        .orderBy(col("source"))),

    // Theil's uncertainty coefficient both ways per column pair — the
    // dependency-DIRECTION read q278's symmetric NMI cannot give
    "q320_theil_u" -> ((s, d) =>
      graft.operators.Association.theilU(
          Tables.documents(s, d).select(col("source"), col("lang"),
            expr("n_chars div 200").as("len_bucket")),
          Seq("source", "lang", "len_bucket"))
        .orderBy(col("col_a"), col("col_b"))),

    // SCD2 dimension history: changed keys close + reopen, no-op
    // updates produce zero churn, new keys open their first interval
    "q215_scd2" -> ((s, d) => {
      val cust = Tables.customer(s, d)
      val h =
        ((col("c_custkey") % 2147483648L) * 2654435761L) % 2147483647L
      val current = cust.select(col("c_custkey"), col("c_mktsegment"),
          col("c_nationkey"))
        .withColumn("valid_from", lit(java.sql.Date.valueOf("2024-01-01")))
        .withColumn("valid_to", lit(null).cast("date"))
        .withColumn("is_current", lit(true))
      val updates = cust
        .filter(h % 4 <= 1)
        .select(col("c_custkey"),
          when(h % 4 === 0, concat(lit("SEG"), (h % 5).cast("string")))
            .otherwise(col("c_mktsegment")).as("c_mktsegment"),
          col("c_nationkey"),
          lit(java.sql.Date.valueOf("2024-02-01")).as("ts"))
      graft.table.Scd2.applyBatch(current, updates, "c_custkey",
          Seq("c_mktsegment", "c_nationkey"), "ts")
        .orderBy(col("c_custkey"), col("valid_from"))
    }),

    // directional shingle containment: embed-with-edits detection the
    // symmetric Jaccard threshold never sees
    "q214_containment" -> ((s, d) =>
      graft.operators.Dedup.containmentPairs(
          Tables.fanout(Tables.documents(s, d)), n = 3, threshold = 0.9)
        .orderBy(col("doc_a"), col("doc_b"))),

    // weekly cohort retention matrix: first-touch cohorts, epoch-weeks,
    // exact millionth fractions
    "q213_retention" -> ((s, d) =>
      graft.operators.TemporalJoins.retention(Tables.events(s, d))
        .orderBy(col("cohort_week"), col("week_offset"))),

    // Fano-factor dispersion of daily event volumes: exact BIGINT
    // variance/mean fold, regular/poisson/bursty verdicts
    "q207_dispersion" -> ((s, d) =>
      graft.operators.TemporalJoins.dispersion(Tables.events(s, d))
        .orderBy(col("event_type"))),

    // Flesch reading ease over sentence-ized text: exact integer ratio
    // staging, identical-order double score, band verdicts
    "q205_readability" -> ((s, d) => {
      val ta = graft.operators.TextAnalysis
      Tables.fanout(Tables.documents(s, d))
        .withColumn("text", ta.sentenceFixture(col("text")))
        .transform(ta.readability(_))
        .orderBy(col("doc_id"))
    }),

    // average precision (PR-AUC) of the same planted class — the
    // imbalance-honest companion read to q206
    "q216_pr_auc" -> ((s, d) => {
      val ta = graft.operators.TextAnalysis
      val h = ((col("doc_id") % 2147483648L) * 2654435761L) % 2147483647L
      val labeled = Tables.fanout(Tables.documents(s, d))
        .withColumn("pos", h % 2 === 0)
        .withColumn("text", when(col("pos"),
          concat(col("text"), lit(" of the is"))).otherwise(col("text")))
      graft.operators.EvalOps.prAuc(
        ta.withQuality(labeled), "quality_score", "pos")
    }),

    // exact Mann-Whitney AUC of the quality score against a planted
    // binary class (positives get a stopword boost) — tie half-credit
    "q206_rank_auc" -> ((s, d) => {
      val ta = graft.operators.TextAnalysis
      val h = ((col("doc_id") % 2147483648L) * 2654435761L) % 2147483647L
      val labeled = Tables.fanout(Tables.documents(s, d))
        .withColumn("pos", h % 2 === 0)
        .withColumn("text", when(col("pos"),
          concat(col("text"), lit(" of the is"))).otherwise(col("text")))
      graft.operators.EvalOps.rankAuc(
        ta.withQuality(labeled), "quality_score", "pos")
    }),

    // category-blocklist safety gate over the lexicon fixture:
    // per-category whole-token hit counts, policy verdicts, audit trail
    "q204_unsafe_gate" -> ((s, d) => {
      val ta = graft.operators.TextAnalysis
      Tables.documents(s, d)
        .withColumn("text", ta.unsafeFixture(col("doc_id"), col("text")))
        .transform(ta.unsafeGate(_))
        .orderBy(col("doc_id"))
    }),

    // CSV ingest round-trip: schema'd PERMISSIVE read, planted corrupt
    // rows dead-lettered, exact BIGINT totals over the clean slice
    "q211_csv_roundtrip" -> ((s, d) =>
      graft.sources.CsvIngest.roundtrip(s, d)),

    // binary-payload near-dup: native byte_histogram expression,
    // prefix blocking, exact integer cos² verification
    "q210_binary_neardup" -> ((s, d) =>
      graft.operators.Multimodal.binaryNearDup(s,
          Tables.fanout(Tables.documents(s, d)))
        .orderBy(col("doc_a"), col("doc_b"))),

    // per-source entropy panel: quantized-log exact BIGINT entropies,
    // conditional entropy, redundancy
    "q209_entropy" -> ((s, d) =>
      graft.operators.CorpusOps.entropyPanel(
          Tables.fanout(Tables.documents(s, d)))
        .orderBy(col("source"))),

    // Good-Turing frequency-of-frequencies: N_r, smoothed r*, unseen
    // mass p0 — exact millionth divisions
    "q203_good_turing" -> ((s, d) =>
      graft.operators.CorpusOps.goodTuring(
          Tables.fanout(Tables.documents(s, d)))
        .orderBy(col("r"))),

    // Heaps-law vocab growth at 10 doc-id checkpoints + quantized
    // log-log least squares (beta, ln K, r2)
    "q202_heaps_fit" -> ((s, d) =>
      graft.operators.CorpusOps.heapsFit(Tables.fanout(Tables.documents(s, d)))
        .orderBy(col("checkpoint"))),

    // dyadic-EWMA daily trend per event type: exact integer halving
    // recurrence, oracle replays it as a recursive CTE over day ranks
    "q201_ewma_trend" -> ((s, d) =>
      graft.operators.TemporalJoins.ewmaTrend(Tables.events(s, d))
        .orderBy(col("event_type"), col("day"))),

    // encoding-damage scan + repair over the mojibake fixture: artifact
    // counts, damaged verdicts, and the repaired text
    "q200_mojibake" -> ((s, d) => {
      val ta = graft.operators.TextAnalysis
      Tables.documents(s, d)
        .withColumn("text", ta.mojibakeFixture(col("doc_id"), col("text")))
        .transform(ta.mojibake(_))
        .orderBy(col("doc_id"))
    }),

    // k-core peel to fixpoint over the degree-tiered fixture:
    // surviving-subgraph degrees and core membership
    "q208_kcore" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val n = docs.count()
      val nodes = docs.select(col("doc_id"))
      val edges = graft.operators.GraphOps.tieredLinkFixture(nodes, n)
      graft.operators.GraphOps.kCore(edges, nodes, k = 3)
        .orderBy(col("doc_id"))
    }),

    // HITS hubs/authorities over the same link fixture: max-normalized
    // integer micro-scores, oracle replays every iteration bit-for-bit
    "q199_hits" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val n = docs.count()
      val nodes = docs.select(col("doc_id"))
      val edges = graft.operators.GraphOps.linkFixture(nodes, n)
      graft.operators.GraphOps.hits(edges, nodes, iters = 3)
        .orderBy(col("doc_id"))
    }),

    // Gopher-style repetition filters: duplicate word / bigram fractions
    "q67_repetition" -> ((s, d) =>
      TextAnalysis.repetition(Tables.fanout(Tables.documents(s, d)))
        .select(col("doc_id"), col("n_words"), col("dup_word_frac"),
          col("dup_bigram_frac"))
        .orderBy(col("doc_id"))),

    // int8 embedding quantization + reconstruction-loss gate
    "q68_embed_quant" -> ((s, d) =>
      Similarity.quantizeInt8(Tables.fanout(Tables.embeddings(s, d)))
        .orderBy(col("vec_id"))),

    // inter-document duplicated 8-gram spans (exact-substring dedup signal)
    "q69_dup_spans" -> ((s, d) =>
      CorpusOps.dupSpans(Tables.fanout(Tables.documents(s, d)), n = 8)
        .orderBy(col("doc_id"))),

    // distributed BPE merge training: first 8 learned merges
    "q90_bpe_merges" -> ((s, d) =>
      CorpusOps.bpeMerges(Tables.documents(s, d), merges = 8)
        .orderBy(col("rank"))),

    // exact-substring dedup removal: excise cross-document 8-gram spans
    "q88_span_removal" -> ((s, d) =>
      CorpusOps.removeDupSpans(Tables.fanout(Tables.documents(s, d)), n = 8)
        .orderBy(col("doc_id"))),

    // DSIR importance weights: target = first three sources
    "q91_dsir_weights" -> ((s, d) =>
      CorpusOps.dsirWeights(Tables.fanout(Tables.documents(s, d)),
          col("source").isin("src0", "src1", "src2"))
        .orderBy(col("doc_id"))),

    // interpolated bigram-LM cross-entropy (Jelinek–Mercer, λ=0.5)
    "q92_bigram_lm" -> ((s, d) =>
      CorpusOps.bigramLmScore(Tables.fanout(Tables.documents(s, d)), lambda = 0.5)
        .orderBy(col("doc_id"))),

    // hard-negative mining: top-k most-similar different-label vectors
    "q93_hard_negatives" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      Similarity.hardNegatives(e, e.filter(col("vec_id") < 5), k = 10)
        .orderBy(col("q_id"), col("rank"))
    }),

    // Efraimidis–Spirakis weighted sampling, weight = n_chars
    "q94_weighted_sample" -> ((s, d) =>
      CorpusOps.weightedSample(Tables.documents(s, d), n = 50, col("n_chars"))
        .orderBy(col("es_key"), col("doc_id"))),

    // BPE encoding with corpus-trained merges: tokens-per-doc accounting
    "q95_bpe_encode" -> ((s, d) =>
      CorpusOps.bpeEncode(Tables.documents(s, d), merges = 8)
        .orderBy(col("doc_id"))),

    // distributed logistic-regression quality scoring (full-batch GD)
    "q96_logreg_quality" -> ((s, d) =>
      CorpusOps.logregScore(Tables.fanout(Tables.documents(s, d)),
          col("source").isin("src0", "src1", "src2", "src3", "src4"))
        .orderBy(col("doc_id"))),

    // model-free hashed JL text embedding: integer components, exact
    "q97_text_embed" -> ((s, d) =>
      TextAnalysis.textEmbed(Tables.fanout(Tables.documents(s, d)), dim = 16)
        .select(col("doc_id"), col("n_tokens"),
          element_at(col("emb"), 1).as("e0"),
          element_at(col("emb"), 2).as("e1"),
          element_at(col("emb"), 3).as("e2"),
          element_at(col("emb"), 4).as("e3"),
          round(sqrt(aggregate(col("emb"), lit(0.0),
            (a, x) => a + x.cast("double") * x.cast("double"))), 4)
            .as("emb_norm"))
        .orderBy(col("doc_id"))),

    // REAL image-container headers: doc-derived PNG/GIF/JPEG bytes built
    // then parsed back by the real decoder (magic detect + marker scan);
    // oracle re-builds the hex in SQL and re-extracts every field with
    // byte (hex-substring) arithmetic at the same offsets
    "q98_image_headers" -> ((s, d) =>
      Multimodal.imageHeaderQuery(s, Tables.documents(s, d))),

    // FULL pixel decode round-trip through the JDK's real codecs (PNG
    // deflate / BMP): deterministic gradient per doc, encode, decode,
    // per-channel raster means; oracle = the gradient's closed-form means
    "q99_pixel_decode" -> ((s, d) =>
      Multimodal.pixelRoundtrip(s, Tables.fanout(Tables.documents(s, d)))),

    // REAL WAV/PCM decode round-trip: doc-derived RIFF bytes through the
    // byte-level writer, parsed back by the independent chunk walker
    // (odd-chunk padding, 16-bit LE, per-channel stats); oracle = ramp
    // closed forms incl. the cubic sum-of-squares identity
    "q100_audio_decode" -> ((s, d) =>
      AudioWav.audioRoundtrip(s, Tables.fanout(Tables.documents(s, d)))),

    // video-frame sampling from REAL container bytes: doc-derived
    // multi-frame GIF built, then every block walked back by the real
    // parser (color-table skips, sub-block chains, GCE timing), keeping
    // every 2nd frame's geometry/delay/offset; oracle = the container's
    // closed forms from doc_id, so a walker mis-step fails the hash
    "q160_gif_frames" -> ((s, d) =>
      Multimodal.gifFrameSample(Tables.fanout(Tables.documents(s, d)))
        .orderBy(col("doc_id"), col("frame_ord"))),

    // MOSS winnowing: robust local fingerprints (window-min over k-gram
    // hashes, rightmost tie), df-capped fingerprint equi-join, pairs
    // sharing >= 3 fingerprints — position-robust overlap detection
    "q161_winnow_overlap" -> ((s, d) =>
      Dedup.winnowOverlapPairs(Tables.fanout(Tables.documents(s, d)))
        .orderBy(col("doc_a"), col("doc_b"))),

    // SFT loss-mask accounting: per conversation (deterministic fixture),
    // trainable assistant tokens vs content + template overhead
    "q162_loss_mask" -> ((s, d) =>
      SftOps.lossMaskReport(SftOps.turns(Tables.fanout(Tables.documents(s, d))))
        .orderBy(col("conv_id"))),

    // SFT structural audit: role alternation, system placement, terminal
    // assistant turn, empty-turn detection — per-conversation verdicts
    "q163_chat_audit" -> ((s, d) =>
      SftOps.chatAudit(SftOps.turns(Tables.fanout(Tables.documents(s, d))))
        .orderBy(col("conv_id"))),

    // preference-pair length-bias audit: per source, how often "chosen"
    // is just the longer completion (the verbosity-bias go/no-go read)
    "q164_pref_bias" -> ((s, d) =>
      SftOps.lengthBias(SftOps.prefPairs(Tables.fanout(Tables.documents(s, d))))
        .orderBy(col("source"))),

    // frame-level audio features from real WAV bytes: channel-L samples
    // parsed back, 64-sample windows, exact sum/zero-crossings/RMS +
    // silence verdicts — the VAD front-end shape
    "q165_audio_frames" -> ((s, d) =>
      graft.operators.AudioWav.frameFeatures(s,
          Tables.fanout(Tables.documents(s, d)))
        .orderBy(col("doc_id"), col("win_ord"))),

    // prompt-level conversation dedup: same first user turn == same
    // training example; keep the answer-richest copy deterministically
    "q166_prompt_dedup" -> ((s, d) =>
      SftOps.promptDedup(SftOps.turns(Tables.fanout(Tables.documents(s, d))))
        .orderBy(col("prompt_md5"))),

    // RM3 pseudo-relevance feedback: BM25 first pass -> feedback term
    // model from the top-10 docs (integer-quantized) -> interpolated
    // expanded query -> exact-BIGINT rerank, top-20
    "q167_rm3_rerank" -> ((s, d) =>
      CorpusOps.rm3Rerank(Tables.fanout(Tables.documents(s, d)),
          Seq("vector", "stream", "filter", "spark"))
        .orderBy(col("rank"))),

    // Fleiss' kappa inter-annotator agreement per source over the
    // deterministic 5-rater/4-category fixture — every agreement decision
    // integer-exact (floored millionths)
    "q168_fleiss_kappa" -> ((s, d) =>
      EvalOps.fleissKappa(EvalOps.ratings(Tables.documents(s, d)))
        .orderBy(col("source"))),

    // Bradley-Terry leaderboard over the deterministic pairwise-battle
    // fixture: 10 integer-millionth MM rounds, bit-identical to the
    // oracle's unrolled floor-division iterations
    "q169_bradley_terry" -> ((s, d) =>
      EvalOps.bradleyTerry(EvalOps.btGames(Tables.documents(s, d)))
        .orderBy(col("rank"))),

    // pass@{1,4,8} unbiased estimator per task over the (n, c) eval-run
    // fixture — exact integer subset-count ratio, floored millionths
    "q170_pass_at_k" -> ((s, d) =>
      EvalOps.passAtK(EvalOps.evalRuns(Tables.documents(s, d)))
        .orderBy(col("task_id"))),

    // agentic tool-call schema audit: validity-gated JSON extraction,
    // registry check, required-arg and arg-type checks per call
    "q171_tool_call_audit" -> ((s, d) =>
      SftOps.toolCallAudit(SftOps.toolCalls(Tables.documents(s, d)))
        .orderBy(col("call_id"))),

    // unicode script-mix / confusable / invisible-control audit over the
    // mixed-script fixture — per-script counts, homoglyph tokens, verdict
    "q172_script_mix" -> ((s, d) =>
      TextAnalysis.scriptMix(Tables.documents(s, d).withColumn("text",
          TextAnalysis.scriptFixture(col("doc_id"), col("text"))))
        .orderBy(col("doc_id"))),

    // per-user consecutive-event Markov transition matrix with exact
    // row-normalized probabilities — the what-actually-happens flow view
    "q198_transitions" -> ((s, d) =>
      graft.operators.TemporalJoins.transitions(Tables.events(s, d))
        .orderBy(col("from_type"), col("to_type"))),

    // generation-provenance attribution: n-gram coverage vs the corpus
    // inverted index, dominant source doc, copied/original verdicts
    "q197_provenance" -> ((s, d) => {
      val docs = Tables.fanout(Tables.documents(s, d))
      CorpusOps.provenance(CorpusOps.generationFixture(docs), docs)
        .orderBy(col("gen_id"))
    }),

    // rolling 7-day distinct users from MERGED per-day HLL registers —
    // sketch reuse instead of per-window raw re-scans, exact witness
    "q196_rolling_distinct" -> ((s, d) =>
      graft.operators.Sketches.rollingDistinct(Tables.events(s, d))
        .orderBy(col("win_end"))),

    // portable HLL twin of q44's sketch family: every register and the
    // estimate itself hash-checked, plus the 3/sqrt(m) error contract
    "q195_hll_portable" -> ((s, d) =>
      graft.operators.Sketches.hllReport(Tables.lineitem(s, d),
          "l_returnflag", "l_partkey")
        .orderBy(col("l_returnflag"))),

    // hourly traffic anomalies vs a per-hour-of-day median/MAD baseline
    // — diurnal shape is not mistaken for anomaly
    "q194_hourly_anomaly" -> ((s, d) =>
      graft.operators.TemporalJoins.hourlyAnomalies(Tables.events(s, d))
        .orderBy(col("date"), col("hod"))),

    // robots-policy crawl filter: longest-prefix-match with
    // allow-wins-ties via one folded-key argmax per URL
    "q193_robots_filter" -> ((s, d) =>
      CorpusOps.robotsFilter(CorpusOps.urlPathFixture(Tables.documents(s, d)))
        .orderBy(col("doc_id"))),

    // BM25F: field-weighted ranking over title/body fields with
    // per-field length normalization — exact BIGINT scores, top-20
    "q192_bm25f" -> ((s, d) =>
      CorpusOps.bm25f(CorpusOps.fieldedFixture(Tables.fanout(
          Tables.documents(s, d))),
          Seq("vector", "stream", "filter", "spark"))
        .orderBy(col("rank"))),

    // length-debiased preference subsample: majority length-direction
    // class downsampled to the minority count per source (q164's repair)
    "q191_length_debias" -> ((s, d) =>
      SftOps.lengthDebias(SftOps.prefPairs(Tables.fanout(
          Tables.documents(s, d))))
        .orderBy(col("source"), col("pair_id"))),

    // Gale-Church-style bitext sentence alignment: the 2-D length DP as
    // a row-local higher-order aggregate; move counts + total cost
    "q190_bitext_align" -> ((s, d) =>
      CorpusOps.galeChurchAlign(CorpusOps.bitextFixture(Tables.documents(s, d)))
        .orderBy(col("doc_id"))),

    // Neyman-allocation stratified sample: variance-optimal per-source
    // budget shares (largest-remainder exact), deterministic hash draw
    "q189_neyman_sample" -> ((s, d) =>
      CorpusOps.neymanSample(Tables.documents(s, d))
        .orderBy(col("source"), col("rk"))),

    // inbound anchor-text index per target host: link counts, distinct
    // referrers, deterministic top-3 anchor terms
    "q188_anchor_index" -> ((s, d) =>
      CorpusOps.anchorIndex(CorpusOps.linkFixture(Tables.documents(s, d)))
        .orderBy(col("host"))),

    // sorted-neighborhood dedup: global key rank WITHOUT a total-order
    // window (prefix buckets + offset table), rank-adjacency candidates,
    // exact trigram-Jaccard verification
    "q187_sorted_neighborhood" -> ((s, d) =>
      Dedup.sortedNeighborhoodPairs(Tables.fanout(Tables.documents(s, d)))
        .orderBy(col("doc_a"), col("doc_b"))),

    // recall@10 / MRR@10 / nDCG@10 per query over the graded-relevance
    // retrieval fixture — per-rank gains quantized BEFORE summation
    "q186_ir_metrics" -> ((s, d) =>
      EvalOps.irMetrics(EvalOps.retrievalRuns(Tables.documents(s, d)))
        .orderBy(col("qid"))),

    // McNemar paired-model significance per category — integer-only
    // continuity-corrected chi-square and critical-value decision
    "q184_mcnemar" -> ((s, d) =>
      EvalOps.mcnemar(EvalOps.pairedOutcomes(Tables.documents(s, d)))
        .orderBy(col("source"))),

    // per-rater drift vs the majority label: agreement + Cohen's kappa
    // against majority — WHICH rater to retrain after a low Fleiss kappa
    "q185_rater_drift" -> ((s, d) =>
      EvalOps.raterDrift(EvalOps.ratings(Tables.documents(s, d)))
        .orderBy(col("rater"))),

    // per-category Wilson score interval over pooled eval trials — the
    // small-n-honest error bars, identical IEEE chain in both engines
    "q182_wilson_ci" -> ((s, d) =>
      EvalOps.wilsonCi(EvalOps.evalRuns(Tables.documents(s, d)))
        .orderBy(col("source"))),

    // per-category 95% Poisson-bootstrap CI: integer inverse-CDF weights
    // per (task, replica), bounded replica table, lower-rank percentiles
    "q183_bootstrap_ci" -> ((s, d) =>
      EvalOps.bootstrapCi(EvalOps.evalRuns(Tables.documents(s, d)))
        .orderBy(col("source"))),

    // WET-style HTML main-content extraction + link-density boilerplate
    // signal over the deterministic page fixture
    "q181_html_extract" -> ((s, d) =>
      CorpusOps.htmlExtract(Tables.fanout(Tables.documents(s, d))
          .select(col("doc_id"),
            CorpusOps.htmlFixture(col("doc_id"), col("text")).as("html")))
        .orderBy(col("doc_id"))),

    // unigram-LM (SentencePiece-side) subword vocabulary: top-K pieces
    // + single-char coverage, micro-nat log-prob scores
    "q179_unigram_vocab" -> ((s, d) =>
      CorpusOps.unigramVocab(Tables.fanout(Tables.documents(s, d)))
        .orderBy(col("piece"))),

    // Viterbi segmentation under the unigram vocab — the DP runs as a
    // higher-order Catalyst expression per DISTINCT word, zero UDFs
    "q180_unigram_segment" -> ((s, d) =>
      CorpusOps.unigramSegment(Tables.fanout(Tables.documents(s, d)))
        .orderBy(col("doc_id"))),

    // cross-source score calibration: within-source percentile from the
    // bounded distinct-score table, mapped onto the global quantile spine
    "q178_quantile_norm" -> ((s, d) =>
      CorpusOps.quantileNormalize(Tables.fanout(Tables.documents(s, d)))
        .orderBy(col("doc_id"))),

    // conversation-thread assembly: per post its thread root and reply
    // depth, resolved in O(log depth) pointer-doubling rounds
    "q177_thread_roots" -> ((s, d) =>
      GraphOps.threadRoots(GraphOps.forumFixture(Tables.documents(s, d)))
        .orderBy(col("node_id"))),

    // eps-DP released per-source histogram: deterministic two-sided
    // geometric noise from md5-seeded inverse-CDF draws, clamped at 0
    "q176_dp_histogram" -> ((s, d) =>
      CorpusOps.dpHistogram(Tables.documents(s, d))
        .orderBy(col("source"))),

    // ROUGE-1/2 multiset overlap between preference-pair completions —
    // the uninformative-pair (near-identical chosen/rejected) detector
    "q175_pair_rouge" -> ((s, d) =>
      SftOps.pairRouge(SftOps.prefPairTexts(Tables.fanout(
          Tables.documents(s, d))))
        .orderBy(col("pair_id"))),

    // Murphy decomposition of the Brier score per source over the same
    // prediction fixture — exact BIGINT folds, auditable residual
    "q212_brier_decomp" -> ((s, d) =>
      EvalOps.brierDecomposition(
          EvalOps.predictions(Tables.documents(s, d)))
        .orderBy(col("source"))),

    // reliability diagram + ECE per source over the planted-overconfident
    // prediction fixture — exact integer bin stats, floored millionths
    "q174_calibration" -> ((s, d) =>
      EvalOps.calibrationReport(EvalOps.predictions(Tables.documents(s, d)))
        .orderBy(col("source"), col("bin"))),

    // URL canonicalization + frontier dedup: case/www/port/utm/slash/
    // fragment noise collapsed to the canonical form, then count+min-id
    "q173_url_canonical" -> ((s, d) =>
      CorpusOps.urlCanonicalDedup(CorpusOps.canonicalizeUrls(
          Tables.documents(s, d).select(col("doc_id"),
            CorpusOps.urlNoisyFixture(col("doc_id")).as("url"))))
        .orderBy(col("canonical_url"))),

    // corpus-trained unigram-LM cross-entropy quality score
    "q70_lm_score" -> ((s, d) =>
      CorpusOps.lmScore(Tables.fanout(Tables.documents(s, d)))
        .orderBy(col("doc_id"))),

    // sliding-window chunking for RAG / pretraining segmentation
    "q74_doc_chunks" -> ((s, d) =>
      CorpusOps.chunkDocs(Tables.fanout(Tables.documents(s, d)),
          window = 32, stride = 24)
        .orderBy(col("doc_id"), col("chunk_ord"))),

    // full-corpus distributed Lloyd clustering: deterministic assignments
    "q89_kmeans" -> ((s, d) =>
      Similarity.kmeansClusters(Tables.fanout(Tables.embeddings(s, d)),
          k = 8, iters = 3)
        .orderBy(col("vec_id"))),

    // JL sign-projection sketch: 16-dim distance-preserving reduction
    "q73_embed_project" -> ((s, d) =>
      Similarity.signProject(Tables.fanout(Tables.embeddings(s, d)), outDim = 16)
        .select(col("vec_id"),
          round(element_at(col("proj"), 1), 4).as("p0"),
          round(element_at(col("proj"), 2), 4).as("p1"),
          round(element_at(col("proj"), 3), 4).as("p2"),
          round(element_at(col("proj"), 4), 4).as("p3"),
          round(sqrt(aggregate(col("proj"), lit(0.0), (a, x) => a + x * x)), 4)
            .as("proj_norm"))
        .orderBy(col("vec_id"))),

    // Gopher-rule composite quality gate with audit reasons
    "q72_gopher_filter" -> ((s, d) =>
      TextAnalysis.gopherFilter(Tables.fanout(Tables.documents(s, d)))
        .select(col("doc_id"), col("keep").cast("long").as("keep"),
          col("reject_reasons"))
        .orderBy(col("doc_id"))),

    // deterministic hash-shard layout for training export (16 shards)
    "q71_shard_stats" -> ((s, d) =>
      Tables.documents(s, d)
        .groupBy(CorpusOps.shardExpr(col("doc_id"), 16).cast("long").as("shard"))
        .agg(count(lit(1)).as("n_docs"),
          sum(size(TextAnalysis.wsTokens(col("text"))).cast("long")).cast("long")
            .as("n_tokens"),
          sum(col("n_chars")).cast("long").as("n_chars"),
          min(col("doc_id")).cast("long").as("min_doc"),
          max(col("doc_id")).cast("long").as("max_doc"))
        .orderBy(col("shard"))),

    // bloom-prefiltered decontamination: exact q52 semantics, sketch-pruned
    // probe side (the 100 TB path — shuffle only bloom hits)
    "q75_contamination_bloom" -> ((s, d) => {
      val docs = Tables.fanout(Tables.documents(s, d))
      CorpusOps.contaminatedBloom(
        docs.filter(col("doc_id") % 20 =!= 0),
        docs.filter(col("doc_id") % 20 === 0), n = 6)
        .orderBy(col("doc_id"))
    }),

    // BM25 relevance scoring against a fixed query (retrieval half of RAG)
    "q76_bm25" -> ((s, d) =>
      CorpusOps.bm25(Tables.fanout(Tables.documents(s, d)),
          Seq("vector", "stream", "filter", "spark"))
        .orderBy(col("doc_id"))),

    // SemDeDup: semantic near-dup drop set with chosen representatives
    "q77_semantic_dedup" -> ((s, d) =>
      Dedup.semanticDropped(Tables.embeddings(s, d), threshold = 0.45)
        .orderBy(col("vec_id"))),

    // PII redaction: typed-placeholder masking (deterministic PII is
    // synthesized onto every 7th doc so the masking path is exercised —
    // the raw corpus is PII-free by construction)
    "q78_pii_redact" -> ((s, d) => {
      val docs = Tables.fanout(Tables.documents(s, d))
      val pii = concat(col("text"), lit(" contact u"), col("doc_id"),
        lit("@ex.org tel +1 (555) 010-"),
        lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
        lit(" acct "), (col("doc_id") * 1000003L + 123456L).cast("string"))
      val seeded = docs.select(col("doc_id"),
        when(col("doc_id") % 7 === 0, pii).otherwise(col("text")).as("text"))
      CorpusOps.piiRedact(seeded).orderBy(col("doc_id"))
    }),

    // per-doc top-3 TF-IDF terms (keyword / retrieval-feature extraction)
    "q79_tfidf_top" -> ((s, d) =>
      CorpusOps.tfidfTop(Tables.fanout(Tables.documents(s, d)), k = 3)
        .orderBy(col("doc_id"), col("rank"))),

    // per-source unigram KL vs the corpus blend (mixture diagnostic)
    "q80_source_kl" -> ((s, d) =>
      CorpusOps.sourceKl(Tables.fanout(Tables.documents(s, d)), "source")
        .orderBy(col("source"))),

    // fixed-size deterministic per-language sample (eval-set carving)
    "q81_fixed_sample" -> ((s, d) =>
      CorpusOps.fixedSample(Tables.documents(s, d), "lang", k = 20)
        .orderBy(col("lang"), col("sample_rank"))),

    // vocabulary coverage curve (tokenizer-budget diagnostic)
    "q82_vocab_coverage" -> ((s, d) =>
      CorpusOps.vocabCoverage(Tables.fanout(Tables.documents(s, d)),
          Seq(5, 15, 30))
        .orderBy(col("top_n"))),

    // per-label centroid outliers (embedding label-QC)
    "q83_label_outliers" -> ((s, d) =>
      Similarity.labelOutliers(Tables.fanout(Tables.embeddings(s, d)), k = 5)
        .orderBy(col("label"), col("rank"))),

    // product-quantization ANN: m-byte codes, ADC shortlist, exact rerank
    "q84_ann_pq" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.pqTopK(Tables.fanout(emb), emb.filter(col("vec_id") < 5),
          k = 10, m = 16, ksub = 16, oversample = 8)
        .orderBy(col("q_id"), col("rank"))
    }),

    // temperature-scaled mixture weights (multi-source rebalancing rule)
    "q85_mixture_weights" -> ((s, d) =>
      CorpusOps.mixtureWeights(Tables.fanout(Tables.documents(s, d)),
          "source", alpha = 0.5)
        .orderBy(col("source"))),

    // boilerplate prevalence: fraction of shingles with corpus df >= 20
    "q86_boilerplate" -> ((s, d) =>
      CorpusOps.boilerplate(Tables.fanout(Tables.documents(s, d)),
          n = 3, minDf = 20)
        .orderBy(col("doc_id"))),

    // cross-source shared-shingle overlap matrix (mixing diagnostic)
    "q87_source_overlap" -> ((s, d) =>
      CorpusOps.sourceOverlap(Tables.fanout(Tables.documents(s, d)), n = 3)
        .orderBy(col("source_a"), col("source_b")))
  )

  private val langCase: String = {
    val cases = TextAnalysis.LangMarkers.map { case (l, _) =>
      s"WHEN s_$l >= best AND s_$l > 0 THEN '$l'"
    }.mkString(" ")
    s"CASE $cases ELSE 'und' END"
  }

  private val langScores: String = TextAnalysis.LangMarkers.map { case (l, ms) =>
    val set = ms.map(m => s"'$m'").mkString(",")
    s"len(list_filter(toks, x -> x IN ($set))) AS s_$l"
  }.mkString(", ")

  /** DuckDB replica of the deterministic LSH hyperplanes: the ±1 signs are
    * pure integer mixing (Similarity.planes), embedded as literals so the
    * oracle computes the exact same bucket assignment.
    */
  /** q218/q218b planted linkage fixture: a dirty copy of customer with
    * one name tail digit flipped at a hash-chosen position, segment and
    * balance perturbed on hash slices, plus unlinked fresh records.
    */
  private def linkageFixture(s: SparkSession, d: String)
      : (DataFrame, DataFrame) = {
    val cust = Tables.customer(s, d)
    val h = ((col("c_custkey") % 2147483648L) * 2654435761L) % 2147483647L
    val clean = cust.select(col("c_custkey"), col("c_name"),
      col("c_mktsegment"), col("c_acctbal"), col("c_nationkey"))
    val base = cust.withColumn("_h", h)
    val dirtyMatch = base.filter(col("_h") % 3 === 0)
      .withColumn("_p", expr("cast(_h % 4 + 6 as int)"))
      .select((col("c_custkey") + 10000000L).as("d_id"),
        expr("concat(substring(c_name, 1, 8 + _p), " +
          "cast((cast(substring(c_name, 9 + _p, 1) as int) + 1) % 10 " +
          "as string), substring(c_name, 10 + _p))").as("d_name"),
        when(col("_h") % 7 === 0, lit("XXXSEG"))
          .otherwise(col("c_mktsegment")).as("d_seg"),
        (col("c_acctbal") + when(col("_h") % 5 === 0, lit(3.5))
          .otherwise(lit(0.25))).as("d_bal"),
        col("c_nationkey").as("d_nat"))
    val dirtyFresh = base.filter(col("_h") % 3 === 1)
      .select((col("c_custkey") + 20000000L).as("d_id"),
        expr("concat('Customer#', lpad(cast(999999999 - c_custkey " +
          "as string), 9, '0'))").as("d_name"),
        col("c_mktsegment").as("d_seg"),
        (col("c_acctbal") + lit(100.0)).as("d_bal"),
        col("c_nationkey").as("d_nat"))
    (clean, dirtyMatch.unionByName(dirtyFresh))
  }

  /** Two skip-position blocking passes over name substrings + nation. */
  private def linkagePasses: Seq[(Column, Column)] = Seq(
    (concat_ws(":", col("c_nationkey"),
        expr("substring(c_name, 10, 7)")),
      concat_ws(":", col("d_nat"),
        expr("substring(d_name, 10, 7)"))),
    (concat_ws(":", col("c_nationkey"),
        expr("substring(c_name, 10, 5)"),
        expr("substring(c_name, 17, 2)")),
      concat_ws(":", col("d_nat"),
        expr("substring(d_name, 10, 5)"),
        expr("substring(d_name, 17, 2)"))))

  /** q218b oracle: the integer EM replayed as unrolled HUGEINT CTE
    * rounds — a genuine second implementation of
    * [[graft.operators.Linkage.emEstimate]]'s recurrence (census →
    * E-step posterior → clamped M-step, `iters` times, then a final
    * E step), exact because every operation is integer (floor division
    * on non-negative HUGEINTs ≡ BigInt truncation).
    */
  private def linkageEmOracle(iters: Int): String = {
    val S = "1000000"
    // product terms for the E step against round-state alias `r`
    def prodM(r: String) = (1 to 3).map(i =>
      s"(CASE WHEN cen.pat // ${1 << (i - 1)} % 2 = 1 THEN $r.m$i " +
        s"ELSE $S - $r.m$i END)").mkString(" * ")
    def prodU(r: String) = (1 to 3).map(i =>
      s"(CASE WHEN cen.pat // ${1 << (i - 1)} % 2 = 1 THEN $r.u$i " +
        s"ELSE $S - $r.u$i END)").mkString(" * ")
    def eStep(k: Int, r: String) =
      s"""e$k AS (SELECT cen.pat, cen.n,
           ($r.p * ${prodM(r)}) AS num,
           (($S - $r.p) * ${prodU(r)}) AS den
         FROM cen, $r),
       w$k AS (SELECT pat, n, num * $S // (num + den) AS w FROM e$k)"""
    def mStep(k: Int) = {
      def mOf(i: Int) =
        s"""CASE WHEN s$k.sw = 0 THEN CAST(900000 AS HUGEINT)
           ELSE greatest(CAST(1 AS HUGEINT), least(CAST(999999 AS HUGEINT),
             COALESCE((SELECT CAST(sum(n * w) AS HUGEINT) FROM w$k
               WHERE pat // ${1 << (i - 1)} % 2 = 1), 0)
             * $S // s$k.sw)) END AS m$i"""
      def uOf(i: Int) =
        s"""CASE WHEN s$k.swn = 0 THEN CAST(100000 AS HUGEINT)
           ELSE greatest(CAST(1 AS HUGEINT), least(CAST(999999 AS HUGEINT),
             COALESCE((SELECT CAST(sum(n * ($S - w)) AS HUGEINT) FROM w$k
               WHERE pat // ${1 << (i - 1)} % 2 = 1), 0)
             * $S // s$k.swn)) END AS u$i"""
      s"""s$k AS (SELECT CAST(sum(n * w) AS HUGEINT) AS sw,
           CAST(sum(n * ($S - w)) AS HUGEINT) AS swn FROM w$k),
       r$k AS (SELECT
           greatest(CAST(1 AS HUGEINT), least(CAST(999999 AS HUGEINT),
             s$k.sw // nn.total)) AS p,
           ${(1 to 3).map(mOf).mkString(",\n           ")},
           ${(1 to 3).map(uOf).mkString(",\n           ")}
         FROM s$k, nn)"""
    }
    val rounds = (1 to iters).map(k => eStep(k, s"r${k - 1}") + ",\n       " +
      mStep(k)).mkString(",\n       ")
    s"""WITH c AS (SELECT c_custkey, c_name, c_mktsegment, c_acctbal,
            c_nationkey,
            ((c_custkey % 2147483648) * 2654435761) % 2147483647 AS h
          FROM customer),
        dm AS (SELECT c_custkey + 10000000 AS d_id,
            substring(c_name, 1, 8 + CAST(h % 4 + 6 AS INT))
              || CAST((CAST(substring(c_name, 9 + CAST(h % 4 + 6 AS INT),
                   1) AS INT) + 1) % 10 AS VARCHAR)
              || substring(c_name, 10 + CAST(h % 4 + 6 AS INT)) AS d_name,
            CASE WHEN h % 7 = 0 THEN 'XXXSEG' ELSE c_mktsegment END
              AS d_seg,
            c_acctbal + CASE WHEN h % 5 = 0 THEN 3.5 ELSE 0.25 END
              AS d_bal,
            c_nationkey AS d_nat
          FROM c WHERE h % 3 = 0),
        df AS (SELECT c_custkey + 20000000 AS d_id,
            'Customer#' || lpad(CAST(999999999 - c_custkey AS VARCHAR),
              9, '0') AS d_name,
            c_mktsegment AS d_seg, c_acctbal + 100.0 AS d_bal,
            c_nationkey AS d_nat
          FROM c WHERE h % 3 = 1),
        d AS (SELECT * FROM dm UNION ALL SELECT * FROM df),
        cand AS (
          SELECT c.c_custkey, c.c_name, c.c_mktsegment, c.c_acctbal,
            d.d_id, d.d_name, d.d_seg, d.d_bal
          FROM c JOIN d
            ON CAST(c.c_nationkey AS VARCHAR) || ':'
                 || substring(c.c_name, 10, 7)
             = CAST(d.d_nat AS VARCHAR) || ':'
                 || substring(d.d_name, 10, 7)
          UNION
          SELECT c.c_custkey, c.c_name, c.c_mktsegment, c.c_acctbal,
            d.d_id, d.d_name, d.d_seg, d.d_bal
          FROM c JOIN d
            ON CAST(c.c_nationkey AS VARCHAR) || ':'
                 || substring(c.c_name, 10, 5)
                 || ':' || substring(c.c_name, 17, 2)
             = CAST(d.d_nat AS VARCHAR) || ':'
                 || substring(d.d_name, 10, 5)
                 || ':' || substring(d.d_name, 17, 2)),
        pt AS (SELECT d_id, c_custkey,
            levenshtein(c_name, d_name) <= 1 AS name_agree,
            c_mktsegment = d_seg AS seg_agree,
            abs(c_acctbal - d_bal) <= 1.0 AS bal_agree,
            CAST(CASE WHEN levenshtein(c_name, d_name) <= 1
                THEN 1 ELSE 0 END
              + CASE WHEN c_mktsegment = d_seg THEN 2 ELSE 0 END
              + CASE WHEN abs(c_acctbal - d_bal) <= 1.0 THEN 4 ELSE 0 END
              AS BIGINT) AS pat
          FROM cand),
        cen AS (SELECT pat, CAST(count(*) AS HUGEINT) AS n
          FROM pt GROUP BY pat),
        nn AS (SELECT CAST(sum(n) AS HUGEINT) AS total FROM cen),
        r0 AS (SELECT CAST(100000 AS HUGEINT) AS p,
            CAST(900000 AS HUGEINT) AS m1, CAST(900000 AS HUGEINT) AS m2,
            CAST(900000 AS HUGEINT) AS m3,
            CAST(100000 AS HUGEINT) AS u1, CAST(100000 AS HUGEINT) AS u2,
            CAST(100000 AS HUGEINT) AS u3),
       $rounds,
       ${eStep(iters + 1, s"r$iters")}
        SELECT pt.d_id, pt.c_custkey, pt.name_agree, pt.seg_agree,
          pt.bal_agree, CAST(wf.w AS BIGINT) AS posterior6,
          CASE WHEN wf.w >= 900000 THEN 'match'
               WHEN wf.w < 100000 THEN 'non_match'
               ELSE 'possible' END AS verdict
        FROM pt JOIN (SELECT pat, w FROM w${iters + 1}) wf
          ON pt.pat = wf.pat
        ORDER BY pt.d_id, pt.c_custkey"""
  }

  private def planeLit(p: Seq[Double]): String =
    p.map(x => if (x > 0) "1" else "-1").mkString("[", ",", "]")

  private val lshBucketSql: String =
    Similarity.planes(8).zipWithIndex.map { case (pl, p) =>
      s"(CASE WHEN list_inner_product(v, ${planeLit(pl)}) > 0 THEN ${1L << p} ELSE 0 END)"
    }.mkString(" + ")

  /** DuckDB replica of [[CorpusOps.bpeMerges]] with the merge rounds
    * unrolled as CTE stages: same weighted vocabulary, same
    * double-space symbol encoding, same (count DESC, pair ASC) argmax,
    * same non-overlapping left-to-right regexp application (RE2's 'g'
    * flag matches Java's global replace semantics; \Q…\E literal
    * quoting is common to both).
    */
  private def bpeOracle(merges: Int): String = {
    val b = new StringBuilder
    b ++= """WITH w0 AS (SELECT word, count(*) AS freq FROM (
         SELECT unnest(list_filter(string_split(lower(text),' '), x -> x <> '')) AS word
         FROM documents) t
       WHERE regexp_matches(word, '^[a-z0-9]+$') GROUP BY word),
       v0 AS (SELECT ' ' || array_to_string(
           list_transform(generate_series(1, length(word)), i -> word[i]), '  ')
           || ' ' AS sym, freq FROM w0)"""
    for (t <- 1 to merges) {
      b ++= s""",
       p$t AS (SELECT pair, sum(freq) AS cnt FROM (
           SELECT unnest(list_transform(generate_series(1, len(l)-1),
             i -> l[i] || ' ' || l[i+1])) AS pair, freq
           FROM (SELECT string_split(trim(sym), '  ') AS l, freq FROM v${t - 1}) s) u
         GROUP BY pair),
       b$t AS (SELECT pair, cnt FROM p$t ORDER BY cnt DESC, pair LIMIT 1),
       v$t AS (SELECT regexp_replace(v.sym,
           ' \\Q' || split_part(b.pair, ' ', 1) || '\\E  \\Q' || split_part(b.pair, ' ', 2) || '\\E ',
           ' ' || replace(b.pair, ' ', '') || ' ', 'g') AS sym, v.freq
         FROM v${t - 1} v CROSS JOIN b$t b)"""
    }
    b ++= (1 to merges).map(t =>
      s"""SELECT CAST($t AS BIGINT) AS rank, split_part(pair,' ',1) AS lhs,
          split_part(pair,' ',2) AS rhs, CAST(cnt AS BIGINT) AS freq FROM b$t""")
      .mkString("\n       ", "\n       UNION ALL ", "\n       ORDER BY rank")
    b.toString
  }

  /** DuckDB replica of [[CorpusOps.bpeEncode]]: the same merge-training
    * chain as [[bpeOracle]] but carrying each distinct WORD through the
    * rewrite stages, so the final stage doubles as the word→symbol-count
    * encode table; documents then join their words against it.
    */
  /** Shared CTE chain for the BPE-encode oracles (q95/q129): trains the
    * merge table round by round and ends at an `enc` CTE mapping each
    * word to its encoded symbol count.
    */
  private def bpeEncCtes(merges: Int): String = {
    val b = new StringBuilder
    b ++= """WITH w0 AS (SELECT word, count(*) AS freq FROM (
         SELECT unnest(list_filter(string_split(lower(text),' '), x -> x <> '')) AS word
         FROM documents) t
       WHERE regexp_matches(word, '^[a-z0-9]+$') GROUP BY word),
       v0 AS (SELECT word, ' ' || array_to_string(
           list_transform(generate_series(1, length(word)), i -> word[i]), '  ')
           || ' ' AS sym, freq FROM w0)"""
    for (t <- 1 to merges) {
      b ++= s""",
       p$t AS (SELECT pair, sum(freq) AS cnt FROM (
           SELECT unnest(list_transform(generate_series(1, len(l)-1),
             i -> l[i] || ' ' || l[i+1])) AS pair, freq
           FROM (SELECT string_split(trim(sym), '  ') AS l, freq FROM v${t - 1}) s) u
         GROUP BY pair),
       b$t AS (SELECT pair, cnt FROM p$t ORDER BY cnt DESC, pair LIMIT 1),
       v$t AS (SELECT v.word, regexp_replace(v.sym,
           ' \\Q' || split_part(b.pair, ' ', 1) || '\\E  \\Q' || split_part(b.pair, ' ', 2) || '\\E ',
           ' ' || replace(b.pair, ' ', '') || ' ', 'g') AS sym, v.freq
         FROM v${t - 1} v CROSS JOIN b$t b)"""
    }
    b ++= s""",
       enc AS (SELECT word, len(string_split(trim(sym), '  ')) AS n_sym
         FROM v$merges)"""
    b.toString
  }

  /** Unrolled power iteration: each CTE is one PageRank round in exact
    * BIGINT nano-rank arithmetic — `//` here floors exactly where the
    * engine's `div` floors, so all three rounds hash-match bit-for-bit.
    */
  private def pageRankOracle(iters: Int): String = {
    // the destination columns are PRE-computed (d1..d3) before the unnest:
    // DuckDB 1.0.0's binder has an internal-error bug on unnest of lists
    // whose elements reference a joined column, and the precomputed shape
    // sidesteps it with identical semantics
    val b = new StringBuilder(
      """WITH nn AS (SELECT count(*) AS n FROM documents),
       bb AS (SELECT (15 * CAST(1000000000 AS BIGINT)) // (100 * n) AS base
              FROM nn),
       nodes AS (SELECT doc_id FROM documents),
       pre AS (SELECT doc_id AS src, (31*doc_id+7) % n AS d1,
                 (17*doc_id+3) % n AS d2, (5*doc_id+11) % n AS d3
               FROM nodes, nn),
       edges0 AS (SELECT src, unnest([d1, d2, d3]) AS dst FROM pre),
       edges AS (SELECT DISTINCT src, dst FROM edges0 WHERE dst <> src),
       od AS (SELECT src, count(*) AS od FROM edges GROUP BY src),
       r0 AS (SELECT doc_id AS id, CAST(1000000000 AS BIGINT) // n AS r
              FROM nodes, nn)""")
    for (t <- 1 to iters) b ++= s""",
       s$t AS (SELECT e.dst AS id, CAST(SUM(r.r // od.od) AS BIGINT) AS s
         FROM edges e JOIN ${if (t == 1) "r0" else s"i${t - 1}"} r
           ON e.src = r.id
         JOIN od ON e.src = od.src
         GROUP BY e.dst),
       i$t AS (SELECT nd.doc_id AS id,
           b.base + (85 * COALESCE(s.s, 0)) // 100 AS r
         FROM nodes nd CROSS JOIN bb b
         LEFT JOIN s$t s ON nd.doc_id = s.id)"""
    b ++= s"""
       SELECT id AS doc_id, r AS rank_nano,
         CAST(r AS DOUBLE) / 1e9 AS rank
       FROM i$iters ORDER BY doc_id"""
    b.toString
  }

  /** q199's oracle: the HITS loop unrolled — per round, the in-link hub
    * sum, a one-row max, the `//`-floored L∞ normalization (exactly where
    * the engine's `div` floors), then the same on the out-link side.
    */
  private def hitsOracle(iters: Int): String = {
    val b = new StringBuilder(
      """WITH nn AS (SELECT count(*) AS n FROM documents),
       nodes AS (SELECT doc_id FROM documents),
       pre AS (SELECT doc_id AS src, (31*doc_id+7) % n AS d1,
                 (17*doc_id+3) % n AS d2, (5*doc_id+11) % n AS d3
               FROM nodes, nn),
       edges0 AS (SELECT src, unnest([d1, d2, d3]) AS dst FROM pre),
       edges AS (SELECT DISTINCT src, dst FROM edges0 WHERE dst <> src),
       h0 AS (SELECT doc_id AS id, CAST(1000000 AS BIGINT) AS h FROM nodes)""")
    for (t <- 1 to iters) b ++= s""",
       ar$t AS (SELECT e.dst AS id, CAST(SUM(h.h) AS BIGINT) AS ar
         FROM edges e JOIN h${t - 1} h ON e.src = h.id GROUP BY e.dst),
       am$t AS (SELECT CAST(max(ar) AS BIGINT) AS am FROM ar$t),
       a$t AS (SELECT nd.doc_id AS id,
           COALESCE((ar.ar * 1000000) // am.am, 0) AS a
         FROM nodes nd CROSS JOIN am$t am
         LEFT JOIN ar$t ar ON ar.id = nd.doc_id),
       hr$t AS (SELECT e.src AS id, CAST(SUM(a.a) AS BIGINT) AS hr
         FROM edges e JOIN a$t a ON e.dst = a.id GROUP BY e.src),
       hm$t AS (SELECT CAST(max(hr) AS BIGINT) AS hm FROM hr$t),
       h$t AS (SELECT nd.doc_id AS id,
           COALESCE((hr.hr * 1000000) // hm.hm, 0) AS h
         FROM nodes nd CROSS JOIN hm$t hm
         LEFT JOIN hr$t hr ON hr.id = nd.doc_id)"""
    b ++= s"""
       SELECT a.id AS doc_id, a.a AS auth6, h.h AS hub6,
         CAST(a.a AS DOUBLE) / 1e6 AS auth, CAST(h.h AS DOUBLE) / 1e6 AS hub
       FROM a$iters a JOIN h$iters h ON a.id = h.id ORDER BY doc_id"""
    b.toString
  }

  /** q200's oracle, GENERATED from [[graft.operators.TextAnalysis
    * .mojibakeMap]] (same signature order, same replace chain) so the
    * operator and oracle cannot drift; every non-ASCII character is
    * emitted as chr(codepoint) so the SQL survives any transport
    * encoding.
    */
  private def mojibakeOracle: String = {
    def s(str: String): String = str.map { c =>
      if (c >= ' ' && c.toInt < 127 && c != '\'') s"'$c'"
      else s"chr(${c.toInt})"
    }.mkString("(", " || ", ")")
    val mm = graft.operators.TextAnalysis.mojibakeMap
    val cnt = mm.map { case (sig, _) =>
      s"(length(t) - length(replace(t, ${s(sig)}, ''))) // ${sig.length}"
    }.mkString(" + ")
    val rep = mm.foldLeft("t") { case (e, (sig, fix)) =>
      s"replace($e, ${s(sig)}, ${s(fix)})"
    }
    val Seq(p1, p2, p3, p4) =
      graft.operators.TextAnalysis.MojibakePhrases.map(s)
    s"""WITH d AS (SELECT doc_id, text,
            ((doc_id % 2147483648) * 2654435761) % 2147483647 AS h
          FROM documents),
       f AS (SELECT doc_id, text ||
            CASE WHEN h % 5 = 1 THEN $p1
                 WHEN h % 5 = 2 THEN $p2
                 WHEN h % 5 = 3 THEN $p3
                 WHEN h % 5 = 4 THEN $p4
                 ELSE '' END AS t
          FROM d),
       c AS (SELECT doc_id, t, CAST($cnt AS BIGINT) AS n FROM f)
       SELECT doc_id, n AS n_mojibake, n > 0 AS damaged, $rep AS repaired
       FROM c ORDER BY doc_id"""
  }

  /** q204's oracle, GENERATED from [[graft.operators.TextAnalysis
    * .UnsafeLexicon]] — same categories, same term lists, same per-
    * category policy thresholds, same reason order.
    */
  private def unsafeGateOracle: String = {
    val lex = graft.operators.TextAnalysis.UnsafeLexicon
    val counts = lex.map { case (cat, terms, _) =>
      val l = terms.map(t => s"'$t'").mkString("[", ", ", "]")
      s"CAST(len(list_filter(toks, x -> list_contains($l, x))) AS BIGINT) AS n_$cat"
    }.mkString(",\n              ")
    val reasons = lex.map { case (cat, _, policy) =>
      val th = if (policy == "any") 1 else 2
      s"CASE WHEN n_$cat >= $th THEN '$cat' END"
    }.mkString(", ")
    val ncols = lex.map(l => s"n_${l._1}").mkString(", ")
    s"""WITH d AS (SELECT doc_id, text,
            ((doc_id % 2147483648) * 2654435761) % 2147483647 AS h
          FROM documents),
       f AS (SELECT doc_id, lower(text ||
            CASE WHEN h % 6 = 1 THEN ' rifle'
                 WHEN h % 6 = 2 THEN ' casino poker'
                 WHEN h % 6 = 3 THEN ' damn'
                 WHEN h % 6 = 4 THEN ' meth casino'
                 ELSE '' END) AS t
          FROM d),
       w AS (SELECT doc_id,
            list_filter(string_split(t, ' '), x -> x <> '') AS toks
          FROM f),
       c AS (SELECT doc_id,
              $counts
          FROM w),
       r AS (SELECT doc_id, $ncols,
            concat_ws(',', $reasons) AS flag_reasons
          FROM c)
       SELECT doc_id, $ncols, flag_reasons,
         flag_reasons = '' AS keep
       FROM r ORDER BY doc_id"""
  }

  /** q208's oracle: the k-core peel unrolled — per round a degree CTE,
    * a survivor filter at `k`, and the both-endpoints edge semi-join.
    * `rounds` sits past the fixture's measured fixpoint (9 at sf0.1);
    * post-fixpoint stages are identities, matching the engine's
    * early-exit loop exactly.
    */
  /** q300 oracle: the q285 ACF chain pivoted to r1..rK, then the
    * Durbin–Levinson recursion UNROLLED as fixed-point HUGEINT stages
    * (the k-core unrolled-oracle precedent) — fixed-mul a·b // 10⁶ at
    * every step, digit-identical to the engine's DECIMAL(38,0) chain.
    */
  private def pacfOracle(maxLag: Int): String = {
    def fm(a: String, b: String) = s"(CAST($a AS HUGEINT) * $b // 1000000)"
    val b = new StringBuilder(
      s"""WITH d0 AS (SELECT event_type AS g, CAST(ts AS DATE) AS d,
            CAST(count(*) AS BIGINT) AS x FROM events GROUP BY 1, 2),
        span AS (SELECT g, min(d) AS dlo, max(d) AS dhi
          FROM d0 GROUP BY 1),
        spine AS (SELECT g, CAST(unnest(generate_series(dlo, dhi,
            INTERVAL 1 DAY)) AS DATE) AS d FROM span),
        daily AS (SELECT spine.g, spine.d, coalesce(x, 0) AS x,
            date_diff('day', dlo, spine.d) AS t
          FROM spine LEFT JOIN d0 ON spine.g = d0.g AND spine.d = d0.d
            JOIN span ON spine.g = span.g),
        st AS (SELECT g, CAST(count(*) AS BIGINT) AS n,
            CAST(sum(x) AS BIGINT) AS s,
            CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS q
          FROM daily GROUP BY 1),
        lg AS (SELECT g, t, x, k, t + k AS tj
          FROM daily, unnest(generate_series(1, $maxLag)) AS u(k)),
        pr AS (SELECT lg.g, k,
            CAST(sum(CAST(lg.x AS HUGEINT) * tl.x) AS HUGEINT) AS p,
            CAST(sum(lg.x) AS BIGINT) AS h,
            CAST(sum(tl.x) AS BIGINT) AS t2
          FROM lg JOIN daily tl ON lg.g = tl.g AND lg.tj = tl.t
          GROUP BY 1, 2),
        r AS (SELECT pr.g, k, n,
            CAST(n AS HUGEINT) * n * p
              - CAST(n AS HUGEINT) * s * (h + t2)
              + (CAST(n AS HUGEINT) - k) * s * s AS num,
            CAST(n AS HUGEINT) * n * q
              - CAST(n AS HUGEINT) * s * s AS den
          FROM pr JOIN st ON pr.g = st.g),
        acf0 AS (SELECT g, k, n, CASE WHEN den > 0 THEN
            CAST(num * 1000000 // den AS BIGINT) END AS acf6 FROM r),
        pv AS (SELECT g, max(n) AS n""")
    (1 to maxLag).foreach(k =>
      b ++= s",\n            max(CASE WHEN k = $k THEN acf6 END) AS r$k")
    b ++= "\n          FROM acf0 GROUP BY 1),\n" +
      "        l1 AS (SELECT *, r1 AS p_1_1 FROM pv)"
    (2 to maxLag).foreach { k =>
      val num = (s"CAST(r$k AS HUGEINT)" +:
        (1 until k).map(j => s" - ${fm(s"p_${k - 1}_$j", s"r${k - j}")}"))
        .mkString
      val den = ("CAST(1000000 AS HUGEINT)" +:
        (1 until k).map(j => s" - ${fm(s"p_${k - 1}_$j", s"r$j")}"))
        .mkString
      b ++= s""",
        l${k}a AS (SELECT *, ($num) AS num_$k, ($den) AS den_$k
          FROM l${k - 1}),
        l${k}b AS (SELECT *, CASE WHEN den_$k > 0 THEN
            CAST(num_$k AS HUGEINT) * 1000000 // den_$k END AS p_${k}_$k
          FROM l${k}a)"""
      val projs = (1 until k).map(j =>
        s"p_${k - 1}_$j - ${fm(s"p_${k}_$k", s"p_${k - 1}_${k - j}")}" +
          s" AS p_${k}_$j").mkString(",\n            ")
      b ++= s""",
        l$k AS (SELECT *,
            $projs
          FROM l${k}b)"""
    }
    b ++= "\n        "
    b ++= (1 to maxLag).map(k =>
      s"SELECT g AS event_type, CAST($k AS BIGINT) AS lag, n AS n_days, " +
        s"CAST(p_${k}_$k AS BIGINT) AS pacf6 FROM l$maxLag")
      .mkString("\n        UNION ALL ")
    b ++= "\n        ORDER BY event_type, lag"
    b.toString
  }

  /** q267 oracle: one cell census + dense margin spine + HUGEINT chi2
    * per column pair, all pairs unioned — the same arithmetic as
    * Association.cramersV with suffix-indexed CTEs per pair.
    */
  private def cramersOracle(pairs: Seq[(String, String)]): String = {
    val b = new StringBuilder(
      "WITH d AS (SELECT source, lang, n_chars // 200 AS len_bucket FROM documents)")
    pairs.zipWithIndex.foreach { case ((a, c), i) =>
      b ++= s""",
        cells_$i AS (SELECT $a AS _a, $c AS _b,
            CAST(count(*) AS BIGINT) AS o FROM d
          WHERE $a IS NOT NULL AND $c IS NOT NULL GROUP BY 1, 2),
        ra_$i AS (SELECT _a, CAST(sum(o) AS BIGINT) AS ra
          FROM cells_$i GROUP BY 1),
        cb_$i AS (SELECT _b, CAST(sum(o) AS BIGINT) AS cb
          FROM cells_$i GROUP BY 1),
        nt_$i AS (SELECT CAST(sum(o) AS BIGINT) AS n,
            CAST(count(*) AS BIGINT) AS noc FROM cells_$i),
        spine_$i AS (SELECT ra.ra, cb.cb, coalesce(cl.o, 0) AS o, n, noc
          FROM ra_$i ra CROSS JOIN cb_$i cb
          LEFT JOIN cells_$i cl ON cl._a = ra._a AND cl._b = cb._b, nt_$i),
        agg_$i AS (SELECT max(n) AS n, max(noc) AS occupied_cells,
            CAST(sum((CAST(o AS HUGEINT) * n - CAST(ra AS HUGEINT) * cb)
              * (CAST(o AS HUGEINT) * n - CAST(ra AS HUGEINT) * cb)
              * 1000000 // (CAST(n AS HUGEINT) * ra * cb)) AS HUGEINT)
              AS chi6
          FROM spine_$i),
        res_$i AS (SELECT '$a' AS col_a, '$c' AS col_b, n, occupied_cells,
            ((SELECT CAST(count(*) AS BIGINT) FROM ra_$i) - 1)
              * ((SELECT CAST(count(*) AS BIGINT) FROM cb_$i) - 1) AS dof,
            CAST(chi6 AS DOUBLE) / 1e6 AS chi2,
            CASE WHEN least(
                (SELECT count(*) FROM ra_$i) - 1,
                (SELECT count(*) FROM cb_$i) - 1) > 0 THEN
              floor(sqrt(CAST(chi6 AS DOUBLE) / (1e6 * n * least(
                (SELECT count(*) FROM ra_$i) - 1,
                (SELECT count(*) FROM cb_$i) - 1))) * 1e6) / 1e6
            END AS cramers_v
          FROM agg_$i)"""
    }
    b ++= "\n        "
    b ++= pairs.indices.map(i => s"SELECT * FROM res_$i")
      .mkString(" UNION ALL ")
    b ++= " ORDER BY col_a, col_b"
    b.toString
  }

  /** q278 oracle: occupied-cell MI and margin entropies per pair with
    * the SAME double-division/ln/floor chain as Association.mutualInfo.
    */
  /** q320: the [[mutualInfoOracle]] chain with the two asymmetric
    * uncertainty coefficients in place of NMI — each one truncating
    * division of the already-quantized mi6/h6 integers, all outputs
    * BIGINT (the new-query integer-contract rule).
    */
  private def theilUOracle(pairs: Seq[(String, String)]): String = {
    val b = new StringBuilder(
      "WITH d AS (SELECT source, lang, n_chars // 200 AS len_bucket FROM documents)")
    pairs.zipWithIndex.foreach { case ((a, c), i) =>
      b ++= s""",
        cells_$i AS (SELECT $a AS _a, $c AS _b,
            CAST(count(*) AS BIGINT) AS o FROM d
          WHERE $a IS NOT NULL AND $c IS NOT NULL GROUP BY 1, 2),
        ra_$i AS (SELECT _a, CAST(sum(o) AS BIGINT) AS ra
          FROM cells_$i GROUP BY 1),
        cb_$i AS (SELECT _b, CAST(sum(o) AS BIGINT) AS cb
          FROM cells_$i GROUP BY 1),
        nt_$i AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM cells_$i),
        mi_$i AS (SELECT max(n) AS n,
            greatest(0, CAST(sum(CAST(floor(
              (CAST(o AS DOUBLE) / CAST(n AS DOUBLE))
              * ln(CAST(o * n AS DOUBLE) / CAST(ra * cb AS DOUBLE))
              * 1e6) AS BIGINT)) AS BIGINT)) AS mi6
          FROM cells_$i JOIN ra_$i USING (_a) JOIN cb_$i USING (_b),
            nt_$i),
        ha_$i AS (SELECT CAST(sum(CAST(floor(
            (CAST(ra AS DOUBLE) / CAST(n AS DOUBLE))
            * (-ln(CAST(ra AS DOUBLE) / CAST(n AS DOUBLE)))
            * 1e6) AS BIGINT)) AS BIGINT) AS h6a
          FROM ra_$i, nt_$i),
        hb_$i AS (SELECT CAST(sum(CAST(floor(
            (CAST(cb AS DOUBLE) / CAST(n AS DOUBLE))
            * (-ln(CAST(cb AS DOUBLE) / CAST(n AS DOUBLE)))
            * 1e6) AS BIGINT)) AS BIGINT) AS h6b
          FROM cb_$i, nt_$i),
        res_$i AS (SELECT '$a' AS col_a, '$c' AS col_b, n,
            mi6, h6a AS ha6, h6b AS hb6,
            CASE WHEN h6a > 0 THEN mi6 * 1000000 // h6a END
              AS u_a_given_b6,
            CASE WHEN h6b > 0 THEN mi6 * 1000000 // h6b END
              AS u_b_given_a6
          FROM mi_$i, ha_$i, hb_$i)"""
    }
    b ++= "\n        "
    b ++= pairs.indices.map(i => s"SELECT * FROM res_$i")
      .mkString(" UNION ALL ")
    b ++= " ORDER BY col_a, col_b"
    b.toString
  }

  private def mutualInfoOracle(pairs: Seq[(String, String)]): String = {
    val b = new StringBuilder(
      "WITH d AS (SELECT source, lang, n_chars // 200 AS len_bucket FROM documents)")
    pairs.zipWithIndex.foreach { case ((a, c), i) =>
      b ++= s""",
        cells_$i AS (SELECT $a AS _a, $c AS _b,
            CAST(count(*) AS BIGINT) AS o FROM d
          WHERE $a IS NOT NULL AND $c IS NOT NULL GROUP BY 1, 2),
        ra_$i AS (SELECT _a, CAST(sum(o) AS BIGINT) AS ra
          FROM cells_$i GROUP BY 1),
        cb_$i AS (SELECT _b, CAST(sum(o) AS BIGINT) AS cb
          FROM cells_$i GROUP BY 1),
        nt_$i AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM cells_$i),
        mi_$i AS (SELECT max(n) AS n,
            greatest(0, CAST(sum(CAST(floor(
              (CAST(o AS DOUBLE) / CAST(n AS DOUBLE))
              * ln(CAST(o * n AS DOUBLE) / CAST(ra * cb AS DOUBLE))
              * 1e6) AS BIGINT)) AS BIGINT)) AS mi6
          FROM cells_$i JOIN ra_$i USING (_a) JOIN cb_$i USING (_b),
            nt_$i),
        ha_$i AS (SELECT CAST(sum(CAST(floor(
            (CAST(ra AS DOUBLE) / CAST(n AS DOUBLE))
            * (-ln(CAST(ra AS DOUBLE) / CAST(n AS DOUBLE)))
            * 1e6) AS BIGINT)) AS BIGINT) AS h6a
          FROM ra_$i, nt_$i),
        hb_$i AS (SELECT CAST(sum(CAST(floor(
            (CAST(cb AS DOUBLE) / CAST(n AS DOUBLE))
            * (-ln(CAST(cb AS DOUBLE) / CAST(n AS DOUBLE)))
            * 1e6) AS BIGINT)) AS BIGINT) AS h6b
          FROM cb_$i, nt_$i),
        res_$i AS (SELECT '$a' AS col_a, '$c' AS col_b, n,
            CAST(mi6 AS DOUBLE) / 1e6 AS mi,
            CAST(h6a AS DOUBLE) / 1e6 AS h_a,
            CAST(h6b AS DOUBLE) / 1e6 AS h_b,
            CASE WHEN least(h6a, h6b) > 0 THEN
              CAST(mi6 * 1000000 // least(h6a, h6b) AS DOUBLE) / 1e6
            END AS nmi
          FROM mi_$i, ha_$i, hb_$i)"""
    }
    b ++= "\n        "
    b ++= pairs.indices.map(i => s"SELECT * FROM res_$i")
      .mkString(" UNION ALL ")
    b ++= " ORDER BY col_a, col_b"
    b.toString
  }

  private def kCoreOracle(k: Int, rounds: Int): String = {
    val b = new StringBuilder(
      """WITH nn AS (SELECT count(*) AS n FROM documents),
       nodes AS (SELECT doc_id FROM documents),
       ring AS (SELECT doc_id AS src, (doc_id + 1) % n AS dst
                FROM nodes, nn),
       hub0 AS (SELECT doc_id AS src, (31*doc_id+7) % n AS d1,
                 (17*doc_id+3) % n AS d2, (5*doc_id+11) % n AS d3
               FROM nodes, nn
               WHERE (((doc_id % 2147483648) * 2654435761) % 2147483647)
                 % 3 = 0),
       hubs AS (SELECT src, unnest([d1, d2, d3]) AS dst FROM hub0),
       edges AS (SELECT DISTINCT src, dst FROM
            (SELECT src, dst FROM ring UNION ALL SELECT src, dst FROM hubs)
          WHERE dst <> src),
       e0 AS (SELECT DISTINCT src, dst FROM (
            SELECT src, dst FROM edges
            UNION ALL SELECT dst AS src, src AS dst FROM edges))""")
    // MATERIALIZED is load-bearing: e(t-1) is referenced twice per
    // round, so inlined CTEs would double the scan DAG every stage —
    // 2^rounds scans by the end
    for (t <- 1 to rounds) b ++= s""",
       d$t AS MATERIALIZED (SELECT src AS id, count(*) AS deg
               FROM e${t - 1} GROUP BY src),
       s$t AS MATERIALIZED (SELECT id FROM d$t WHERE deg >= $k),
       e$t AS MATERIALIZED (SELECT e.src, e.dst FROM e${t - 1} e
         JOIN s$t a ON e.src = a.id JOIN s$t b ON e.dst = b.id)"""
    b ++= s""",
       fd AS (SELECT src AS id, CAST(count(*) AS BIGINT) AS deg
              FROM e$rounds GROUP BY src)
       SELECT doc_id, coalesce(deg, 0) AS core_degree,
         coalesce(deg, 0) >= $k AS in_core
       FROM nodes LEFT JOIN fd ON doc_id = fd.id ORDER BY doc_id"""
    b.toString
  }

  private def bpeEncodeOracle(merges: Int): String =
    bpeEncCtes(merges) + """,
       dw AS (SELECT doc_id,
           unnest(list_filter(string_split(lower(text),' '), x -> x <> '')) AS word
         FROM documents)
       SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
         CAST(sum(coalesce(n_sym, 1)) AS BIGINT) AS n_bpe_tokens
       FROM dw LEFT JOIN enc USING (word)
       GROUP BY doc_id ORDER BY doc_id"""

  private def bpeCompressionOracle(merges: Int): String =
    bpeEncCtes(merges) + """,
       dw AS (SELECT doc_id,
           unnest(list_filter(string_split(lower(text),' '), x -> x <> '')) AS word
         FROM documents),
       per AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
           CAST(sum(coalesce(n_sym, 1)) AS BIGINT) AS n_bpe
         FROM dw LEFT JOIN enc USING (word) GROUP BY doc_id),
       agg AS (SELECT d.source, CAST(sum(p.n_words) AS BIGINT) AS n_words,
           CAST(sum(p.n_bpe) AS BIGINT) AS n_bpe_tokens,
           CAST(sum(d.n_chars) AS BIGINT) AS n_chars
         FROM per p JOIN documents d USING (doc_id) GROUP BY d.source)
       SELECT source, n_words, n_bpe_tokens, n_chars,
         floor(CAST(n_chars AS DOUBLE) / n_bpe_tokens * 10000) / 10000
           AS chars_per_tok,
         floor(CAST(n_bpe_tokens AS DOUBLE) / n_words * 10000) / 10000
           AS fertility
       FROM agg ORDER BY source"""

  /** DuckDB replica of [[CorpusOps.logregScore]] with the gradient-descent
    * iterations unrolled as CTE stages: identical features, zero init
    * (σ(0)=0.5 exactly in both engines), same lr, scores floor-quantized
    * at 1e-3 so cross-engine summation-order ulp drift stays sub-quantum.
    */
  private def logregOracle(iters: Int, lr: Double, targetSql: String): String = {
    val toksSql = "list_filter(string_split(text,' '), x -> x <> '')"
    def zSql(w: String) =
      s"$w.w1*x1 + $w.w2*x2 + $w.w3*x3 + $w.w4*x4"
    val b = new StringBuilder
    b ++= s"""WITH f AS (SELECT doc_id,
         CASE WHEN $targetSql THEN 1.0 ELSE 0.0 END AS y,
         1.0 AS x1,
         CAST(len($toksSql) AS DOUBLE)/100.0 AS x2,
         CAST(length(text) AS DOUBLE)/1000.0 AS x3,
         CAST(len(list_distinct($toksSql)) AS DOUBLE)
           / CAST(greatest(len($toksSql), 1) AS DOUBLE) AS x4
       FROM documents),
       g1 AS (SELECT avg(x1*(y-0.5)) AS g1, avg(x2*(y-0.5)) AS g2,
           avg(x3*(y-0.5)) AS g3, avg(x4*(y-0.5)) AS g4 FROM f),
       wt1 AS (SELECT $lr*g1 AS w1, $lr*g2 AS w2, $lr*g3 AS w3, $lr*g4 AS w4
         FROM g1)"""
    for (t <- 2 to iters) {
      b ++= s""",
       g$t AS (SELECT avg(x1*r) AS g1, avg(x2*r) AS g2, avg(x3*r) AS g3,
           avg(x4*r) AS g4 FROM (
           SELECT x1, x2, x3, x4,
             y - 1.0/(1.0+exp(-(${zSql(s"w")}))) AS r
           FROM f CROSS JOIN wt${t - 1} w) t),
       wt$t AS (SELECT w.w1 + $lr*g.g1 AS w1, w.w2 + $lr*g.g2 AS w2,
           w.w3 + $lr*g.g3 AS w3, w.w4 + $lr*g.g4 AS w4
         FROM wt${t - 1} w CROSS JOIN g$t g)"""
    }
    b ++= s"""
       SELECT doc_id, CAST(y AS BIGINT) AS y,
         floor(1.0/(1.0+exp(-(${zSql("w")})))*1000)/1000 AS score
       FROM f CROSS JOIN wt$iters w ORDER BY doc_id"""
    b.toString
  }

  /** DuckDB replica of [[Similarity.kmeansClusters]] with the Lloyd
    * iterations unrolled as CTE stages: same md5-ordered deterministic
    * init, same squared-L2 double arithmetic, same lowest-id tie-break
    * (row_number ORDER BY dist, cent_id mirrors array_position's
    * first-minimum). Empty cells keep the previous centroid via the
    * LEFT JOIN + coalesce.
    */
  private def kmDistSql(dim: Int, c: String): String =
    s"""list_sum(list_transform(generate_series(1, $dim),
       i -> (e.v[i]-$c.cv[i])*(e.v[i]-$c.cv[i])))"""

  /** The Lloyd CTE chain shared by q89/q123/q249 oracles: `e` +
    * md5-ordered seeds + `iters` assign/recenter rounds, ending at the
    * `c<iters>` centroid relation.
    */
  private def kmeansCtes(k: Int, iters: Int, dim: Int): String = {
    val b = new StringBuilder
    b ++= s"""e AS (SELECT vec_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
       c0 AS (SELECT row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1
              AS cent_id, v AS cv
         FROM e ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT $k)"""
    for (t <- 1 to iters) {
      val prev = s"c${t - 1}"
      b ++= s""",
       a$t AS (SELECT vec_id, v, cent_id FROM (
           SELECT e.vec_id, e.v, c.cent_id,
             row_number() OVER (PARTITION BY e.vec_id
               ORDER BY ${kmDistSql(dim, "c")}, c.cent_id) AS rn
           FROM e CROSS JOIN $prev c) t WHERE rn = 1),
       m$t AS (SELECT cent_id, list(m ORDER BY d) AS cv FROM (
           SELECT cent_id, d, avg(v[d]) AS m FROM (
             SELECT cent_id, v, unnest(generate_series(1, $dim)) AS d FROM a$t) x
           GROUP BY cent_id, d) y GROUP BY cent_id),
       c$t AS (SELECT c.cent_id, coalesce(m.cv, c.cv) AS cv
           FROM $prev c LEFT JOIN m$t m USING (cent_id))"""
    }
    b.toString
  }

  private def kmeansOracle(k: Int, iters: Int, dim: Int): String =
    s"""WITH ${kmeansCtes(k, iters, dim)}
       SELECT vec_id, CAST(cent_id AS BIGINT) AS cluster FROM (
         SELECT e.vec_id, c.cent_id,
           row_number() OVER (PARTITION BY e.vec_id
             ORDER BY ${kmDistSql(dim, "c")}, c.cent_id) AS rn
         FROM e CROSS JOIN c$iters c) t WHERE rn = 1 ORDER BY vec_id"""

  /** q249 oracle: per candidate k, the same Lloyd chain, per-vector
    * sorted centroid distances, the same simplified-silhouette floor
    * quantization, and the integer mean.
    */
  private def silhouetteOracle(ks: Seq[Int], iters: Int, dim: Int): String = {
    def one(k: Int): String =
      s"""(WITH ${kmeansCtes(k, iters, dim)},
         dl AS (SELECT e.vec_id,
             list_sort(list(${kmDistSql(dim, "c")})) AS ds
           FROM e CROSS JOIN c$iters c GROUP BY e.vec_id),
         s AS (SELECT CASE WHEN greatest(sqrt(ds[1]), sqrt(ds[2])) > 0
             THEN CAST(floor((sqrt(ds[2]) - sqrt(ds[1]))
               / greatest(sqrt(ds[1]), sqrt(ds[2])) * 1000000) AS BIGINT)
             ELSE 0 END AS s6 FROM dl)
         SELECT CAST($k AS BIGINT) AS k,
           CAST(count(*) AS BIGINT) AS n_vecs,
           CAST(sum(s6) // count(*) AS DOUBLE) / 1e6 AS silhouette
         FROM s)"""
    ks.map(one).mkString("SELECT * FROM (\n", "\nUNION ALL ",
      "\n) ORDER BY k")
  }

  private val lshProbesSql: String =
    ("qb" +: (0 until 8).map(i => s"xor(qb, ${1L << i})"))
      .mkString("[", ", ", "]")

  /** q101 oracle: replay the portable MinHash+LSH pipeline exactly —
    * generated so the 16 affine row-hash mins and the 4 band folds carry
    * the same constants as `Dedup.minhashLshPairsPortable` (P = 2^31−1,
    * a_i = 2i+3, b_i = 7919i+1, base-31 fold).
    */
  /** Shared CTE chain for the portable MinHash/LSH pipeline (q101/q110):
    * shingles → md5-prefix base hashes → 16 affine min-signatures → 4
    * band keys → candidate pairs → exact shingle-overlap counts. Ends at
    * a `jac` CTE holding every candidate with its exact Jaccard.
    */
  private val portableLshJaccardCtes: String = {
    val P = graft.operators.Dedup.PortableP
    val mins = (0 until 16).map(i =>
      s"min((b*${2L * i + 3} + ${7919L * i + 1}) % $P) AS h$i")
      .mkString(",\n                ")
    val bandSelects = (0 until 4).map { b =>
      val key = (b * 4 until (b + 1) * 4).map(i => s"h$i")
        .reduce((acc, h) => s"(($acc) * 31 + $h) % $P")
      s"SELECT doc_id, $b AS band, ($key) AS bkey FROM sig"
    }.mkString("\n            UNION ALL ")
    s"""docs AS (SELECT doc_id,
              list_filter(string_split(text,' '), x -> x <> '') AS w
            FROM documents),
         sh AS (SELECT DISTINCT doc_id, s FROM (
            SELECT doc_id, unnest(CASE WHEN len(w) >= 3
              THEN list_transform(generate_series(1, len(w)-2),
                   i -> array_to_string(w[i:i+2], ' '))
              ELSE [array_to_string(w, ' ')] END) AS s
            FROM docs) t),
         hb AS (SELECT doc_id,
                  CAST('0x' || substring(md5(s),1,8) AS BIGINT) AS b
                FROM sh),
         sig AS (SELECT doc_id,
                $mins
            FROM hb GROUP BY doc_id),
         bk AS ($bandSelects),
         cand AS (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
            FROM bk a JOIN bk b
              ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id),
         sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         cm AS (SELECT da, db, count(*) AS c
            FROM cand
            JOIN sh sa ON sa.doc_id = da
            JOIN sh sb ON sb.doc_id = db AND sa.s = sb.s
            GROUP BY da, db),
         jac AS (SELECT da, db,
                floor(1.0*c/(sa.n + sb.n - c)*10000)/10000 AS jaccard
            FROM cm JOIN sizes sa ON da = sa.doc_id
                    JOIN sizes sb ON db = sb.doc_id)"""
  }

  /** Shared quality-score CTE (q111/q112): the q32 formula ending in a
    * `q` relation of (doc_id, source, nw, quality_score).
    */
  private val qualityCte: String =
    """q AS (SELECT doc_id, source, nw,
           floor((0.4*least(1.0, nw/50.0) + 0.3*(1.0 - np*1.0/nc)
                 + 0.3*least(1.0, ns*1.0/nw*5.0))*10000)/10000 AS quality_score
         FROM (SELECT doc_id, source, length(text) AS nc,
             len(list_filter(string_split(text,' '), x -> x <> '')) AS nw,
             length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS np,
             len(list_filter(string_split(text,' '),
                 x -> x IN ('the','a','of','and','to','in','is','on','for','with'))) AS ns
           FROM documents) t)"""

  private val minhashPortableSql: String =
    s"""WITH $portableLshJaccardCtes
         SELECT da AS doc_a, db AS doc_b, jaccard
         FROM jac WHERE jaccard >= 0.8
         ORDER BY doc_a, doc_b"""

  /** q228 oracle: the q101 portable signature chain re-banded per
    * config; candidates LEFT-join their common-shingle counts so
    * zero-overlap band collisions still count as candidates (the
    * engine's verify-at-threshold-0 keeps them too). Truth = the
    * brute-force shingle self-join.
    */
  private val lshTuningSql: String = {
    val P = graft.operators.Dedup.PortableP
    def cfg(bands: Int): String = {
      val rows = 16 / bands
      val bandSelects = (0 until bands).map { b =>
        val key = (b * rows until (b + 1) * rows).map(i => s"h$i")
          .reduce((acc, h) => s"(($acc) * 31 + $h) % $P")
        s"SELECT doc_id, $b AS band, ($key) AS bkey FROM sig"
      }.mkString("\n            UNION ALL ")
      s"""bk$bands AS ($bandSelects),
         cand$bands AS (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
            FROM bk$bands a JOIN bk$bands b ON a.band = b.band
              AND a.bkey = b.bkey AND a.doc_id < b.doc_id),
         cm$bands AS (SELECT da, db, CAST(count(*) AS BIGINT) AS c
            FROM (SELECT cand.da, cand.db, sa.s
              FROM cand$bands cand
              JOIN sh sa ON sa.doc_id = cand.da
              JOIN sh sb ON sb.doc_id = cand.db AND sb.s = sa.s) t
            GROUP BY da, db),
         jac$bands AS (SELECT c2.da, c2.db,
              floor(1.0*coalesce(cm.c, 0)
                /(sa.n + sb.n - coalesce(cm.c, 0))*10000)/10000 AS j
            FROM cand$bands c2
            LEFT JOIN cm$bands cm ON cm.da = c2.da AND cm.db = c2.db
            JOIN sizes sa ON c2.da = sa.doc_id
            JOIN sizes sb ON c2.db = sb.doc_id),
         agg$bands AS (SELECT $bands AS bands, $rows AS rows_per_band,
              CAST(count(*) AS BIGINT) AS n_cand,
              CAST(sum(CASE WHEN j >= 0.8 THEN 1 ELSE 0 END) AS BIGINT)
                AS n_found
            FROM jac$bands)"""
    }
    val mins = (0 until 16).map(i =>
      s"min((b*${2L * i + 3} + ${7919L * i + 1}) % $P) AS h$i")
      .mkString(",\n                ")
    s"""WITH docs AS (SELECT doc_id,
              list_filter(string_split(text,' '), x -> x <> '') AS w
            FROM documents),
         sh AS (SELECT DISTINCT doc_id, s FROM (
            SELECT doc_id, unnest(CASE WHEN len(w) >= 3
              THEN list_transform(generate_series(1, len(w)-2),
                   i -> array_to_string(w[i:i+2], ' '))
              ELSE [array_to_string(w, ' ')] END) AS s
            FROM docs) t),
         sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         hb AS (SELECT doc_id,
                  CAST('0x' || substring(md5(s),1,8) AS BIGINT) AS b
                FROM sh),
         sig AS (SELECT doc_id,
                $mins
            FROM hb GROUP BY doc_id),
         tcm AS (SELECT a.doc_id AS da, b.doc_id AS db,
              CAST(count(*) AS BIGINT) AS c
            FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
            GROUP BY 1, 2),
         truth AS (SELECT CAST(count(*) AS BIGINT) AS n_true FROM (
            SELECT da FROM tcm
            JOIN sizes sa ON da = sa.doc_id
            JOIN sizes sb ON db = sb.doc_id
            WHERE floor(1.0*c/(sa.n + sb.n - c)*10000)/10000 >= 0.8) t),
         ${cfg(2)},
         ${cfg(4)},
         ${cfg(8)},
         u AS (SELECT * FROM agg2 UNION ALL SELECT * FROM agg4
               UNION ALL SELECT * FROM agg8)
         SELECT CAST(bands AS BIGINT) AS bands,
           CAST(rows_per_band AS BIGINT) AS rows_per_band,
           truth.n_true, u.n_cand, u.n_found,
           CASE WHEN truth.n_true = 0 THEN 1.0
             ELSE CAST((u.n_found * 1000000) // truth.n_true AS DOUBLE)
               / 1e6 END AS recall
         FROM u, truth ORDER BY bands"""
  }

  /** q110 oracle: the q101 candidate chain re-gated by levenshtein
    * similarity on the candidate texts (jaccard kept, not filtered).
    */
  private val editVerifiedSql: String =
    s"""WITH $portableLshJaccardCtes,
         ev AS (SELECT da AS doc_a, db AS doc_b, jaccard,
              CAST(levenshtein(ta.text, tb.text) AS BIGINT) AS lev,
              floor((1.0 - 1.0*levenshtein(ta.text, tb.text) /
                greatest(length(ta.text), length(tb.text), 1))*10000)/10000
                AS edit_sim
            FROM jac
            JOIN documents ta ON ta.doc_id = da
            JOIN documents tb ON tb.doc_id = db)
         SELECT doc_a, doc_b, jaccard, lev, edit_sim
         FROM ev WHERE edit_sim >= 0.8
         ORDER BY doc_a, doc_b"""

  /** q102 oracle: the 60 per-bit Σ±1 occurrence votes replayed literally
    * (generated so each bit mask matches `Dedup.simhashPortable`).
    */
  private val simhashPortableSql: String = {
    val bits = (0 until 60).map(j =>
      s"(CASE WHEN sum(CASE WHEN (h & ${1L << j}) <> 0 THEN 1 ELSE -1 END) > 0 THEN ${1L << j} ELSE 0 END)")
      .mkString("\n            + ")
    s"""WITH t AS (SELECT doc_id,
            unnest(list_filter(string_split(text,' '), x -> x <> '')) AS tok
          FROM documents),
         h AS (SELECT doc_id,
                 CAST('0x' || substring(md5(tok),1,15) AS BIGINT) AS h
               FROM t)
         SELECT doc_id, CAST($bits AS BIGINT) AS simhash
         FROM h GROUP BY doc_id ORDER BY doc_id"""
  }

  /** q116 oracle: the q104 skeleton retargeted at split assignment —
    * per-parity components give each batch's cluster rep; batch 1 (evens)
    * hashes its rep through the q56 split CASE; batch 2 (odds) takes the
    * minimum exact-Jaccard-matched even doc over each cluster (the
    * anchor) and inherits ITS batch-1 split, falling back to the rep
    * hash when no match exists.
    */
  private val incrementalSplitSql: String = {
    def splitCase(x: String) =
      s"""CASE WHEN (($x % 2147483648) * 2654435761) % 2147483647 % 100 < 80 THEN 'train'
               WHEN (($x % 2147483648) * 2654435761) % 2147483647 % 100 < 90 THEN 'val'
               ELSE 'test' END"""
    s"""WITH RECURSIVE
         docs AS (SELECT doc_id,
              list_filter(string_split(text,' '), x -> x <> '') AS w
            FROM documents),
         sh AS (SELECT DISTINCT doc_id, s FROM (
            SELECT doc_id, unnest(CASE WHEN len(w) >= 3
              THEN list_transform(generate_series(1, len(w)-2),
                   i -> array_to_string(w[i:i+2], ' '))
              ELSE [array_to_string(w, ' ')] END) AS s
            FROM docs) t),
         sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         cm AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS c
            FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
            GROUP BY 1, 2),
         jp AS (SELECT da, db
            FROM cm JOIN sizes sa ON da = sa.doc_id
                    JOIN sizes sb ON db = sb.doc_id
            WHERE floor(1.0*c/(sa.n + sb.n - c)*10000)/10000 >= 0.8),
         e1 AS (SELECT da AS a, db AS b FROM jp WHERE da%2=0 AND db%2=0
                UNION SELECT db, da FROM jp WHERE da%2=0 AND db%2=0),
         r1(a,b) AS (SELECT a, b FROM e1
                UNION SELECT r.a, e.b FROM r1 r JOIN e1 e ON r.b = e.a),
         c1 AS (SELECT n.a AS doc_id, least(n.a, min(r.b)) AS rep
                FROM (SELECT DISTINCT a FROM e1) n JOIN r1 r ON r.a = n.a
                GROUP BY n.a),
         s1 AS (SELECT d.doc_id, coalesce(c1.rep, d.doc_id) AS rep
                FROM (SELECT doc_id FROM docs WHERE doc_id%2=0) d
                LEFT JOIN c1 USING(doc_id)),
         out1 AS (SELECT doc_id, ${splitCase("rep")} AS split FROM s1),
         e2 AS (SELECT da AS a, db AS b FROM jp WHERE da%2=1 AND db%2=1
                UNION SELECT db, da FROM jp WHERE da%2=1 AND db%2=1),
         r2(a,b) AS (SELECT a, b FROM e2
                UNION SELECT r.a, e.b FROM r2 r JOIN e2 e ON r.b = e.a),
         c2 AS (SELECT n.a AS doc_id, least(n.a, min(r.b)) AS rep
                FROM (SELECT DISTINCT a FROM e2) n JOIN r2 r ON r.a = n.a
                GROUP BY n.a),
         s2 AS (SELECT d.doc_id, coalesce(c2.rep, d.doc_id) AS rep
                FROM (SELECT doc_id FROM docs WHERE doc_id%2=1) d
                LEFT JOIN c2 USING(doc_id)),
         cx AS (SELECT da AS o, db AS e FROM jp WHERE da%2=1 AND db%2=0
                UNION ALL SELECT db, da FROM jp WHERE db%2=1 AND da%2=0),
         m2 AS (SELECT o AS doc_id, min(e) AS m FROM cx GROUP BY o),
         a2 AS (SELECT s2.rep, min(m2.m) AS anchor
                FROM s2 LEFT JOIN m2 USING(doc_id) GROUP BY s2.rep),
         out2 AS (SELECT s2.doc_id,
                coalesce(o1.split, ${splitCase("s2.rep")}) AS split
                FROM s2 JOIN a2 USING(rep)
                LEFT JOIN out1 o1 ON o1.doc_id = a2.anchor)
         SELECT doc_id, split FROM out1
         UNION ALL SELECT doc_id, split FROM out2
         ORDER BY doc_id"""
  }

  /** q104 oracle: both within-batch dedups as recursive-CTE connected
    * components (min-id survivor, the q64 machinery) over the exact
    * Jaccard pair set, then the cross-batch rule — an odd-id survivor
    * drops iff it pairs at J ≥ 0.8 with an even-id ACCEPTED doc.
    */
  private val incrementalDedupSql: String = {
    def component(tag: String, par: Int) =
      s"""e$tag AS (SELECT da AS a, db AS b FROM jp WHERE da%2=$par AND db%2=$par
               UNION SELECT db, da FROM jp WHERE da%2=$par AND db%2=$par),
         r$tag(a,b) AS (SELECT a, b FROM e$tag
               UNION SELECT r.a, e.b FROM r$tag r JOIN e$tag e ON r.b = e.a),
         drop$tag AS (SELECT n.a AS doc_id
               FROM (SELECT DISTINCT a FROM e$tag) n JOIN r$tag r ON r.a = n.a
               GROUP BY n.a HAVING n.a <> least(n.a, min(r.b)))"""
    s"""WITH RECURSIVE
         docs AS (SELECT doc_id,
              list_filter(string_split(text,' '), x -> x <> '') AS w
            FROM documents),
         sh AS (SELECT DISTINCT doc_id, s FROM (
            SELECT doc_id, unnest(CASE WHEN len(w) >= 3
              THEN list_transform(generate_series(1, len(w)-2),
                   i -> array_to_string(w[i:i+2], ' '))
              ELSE [array_to_string(w, ' ')] END) AS s
            FROM docs) t),
         sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         cm AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS c
            FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
            GROUP BY 1, 2),
         jp AS (SELECT da, db
            FROM cm JOIN sizes sa ON da = sa.doc_id
                    JOIN sizes sb ON db = sb.doc_id
            WHERE floor(1.0*c/(sa.n + sb.n - c)*10000)/10000 >= 0.8),
         ${component("1", 0)},
         acc1 AS (SELECT doc_id FROM docs WHERE doc_id%2=0
              AND doc_id NOT IN (SELECT doc_id FROM drop1)),
         ${component("2", 1)},
         surv2 AS (SELECT doc_id FROM docs WHERE doc_id%2=1
              AND doc_id NOT IN (SELECT doc_id FROM drop2)),
         cdrop AS (SELECT da AS doc_id FROM jp
              WHERE da%2=1 AND db%2=0 AND db IN (SELECT doc_id FROM acc1)
              UNION SELECT db FROM jp
              WHERE db%2=1 AND da%2=0 AND da IN (SELECT doc_id FROM acc1)),
         acc2 AS (SELECT doc_id FROM surv2
              WHERE doc_id NOT IN (SELECT doc_id FROM cdrop))
         SELECT doc_id FROM acc1 UNION ALL SELECT doc_id FROM acc2
         ORDER BY doc_id"""
  }

  /** q169's oracle: the Bradley-Terry MM loop unrolled to `iters` CTE
    * stages. Every stage uses `//` floor division on BIGINTs — the same
    * integer decisions as the Scala driver loop, so the strengths are
    * bit-identical, not approximately equal. The renormalization factor
    * is the model count OBSERVED in the edge set (mc CTE), mirroring the
    * operator's `models.length` — a hard-coded 8 would silently diverge
    * on any slice where fewer models appear or with a non-default
    * nModels fixture.
    */
  private def btOracleSql(iters: Int): String = {
    val stages = (1 to iters).map { k =>
      val prev = s"s${k - 1}"
      s"""d$k AS MATERIALIZED (SELECT e.i,
             CAST(sum((e.n * 1000000000000) // (si.s + sj.s)) AS BIGINT) AS d
           FROM e JOIN $prev si ON si.i = e.i JOIN $prev sj ON sj.i = e.j
           GROUP BY e.i),
         u$k AS MATERIALIZED (SELECT d.i, (coalesce(w.w, 0) * 1000000000000) // d.d AS s
           FROM d$k d LEFT JOIN wins w ON w.i = d.i),
         s$k AS MATERIALIZED (SELECT i, (s * mc.m * 1000000) // t.t AS s
           FROM u$k, (SELECT CAST(sum(s) AS BIGINT) AS t FROM u$k) t, mc)"""
    }.mkString(",\n         ")
    s"""WITH gsrc AS MATERIALIZED (SELECT ((doc_id % 2147483648) * 2654435761)
              % 2147483647 AS h FROM documents),
         par AS MATERIALIZED (SELECT h % 8 AS a, (h % 8 + 1 + h % 7) % 8 AS b,
              h % 1009 AS h2 FROM gsrc),
         games AS MATERIALIZED (SELECT a, b,
              CASE WHEN h2 % (a + b + 2) < a + 1 THEN a ELSE b END AS winner
            FROM par),
         e AS MATERIALIZED (SELECT i, j, count(*) AS n FROM
                 (SELECT a AS i, b AS j FROM games
                  UNION ALL SELECT b, a FROM games) GROUP BY i, j),
         wins AS MATERIALIZED (SELECT winner AS i, count(*) AS w FROM games GROUP BY winner),
         gm AS MATERIALIZED (SELECT i, CAST(sum(n) AS BIGINT) AS games FROM e GROUP BY i),
         mc AS MATERIALIZED (SELECT CAST(count(DISTINCT i) AS BIGINT) AS m FROM e),
         s0 AS MATERIALIZED (SELECT DISTINCT i, CAST(1000000 AS BIGINT) AS s FROM e),
         $stages
         SELECT CAST(row_number() OVER (ORDER BY s DESC, i) AS BIGINT) AS rank,
           i AS model, gm.games, CAST(coalesce(w.w, 0) AS BIGINT) AS wins,
           CAST(s AS DOUBLE)/1e6 AS strength
         FROM s$iters JOIN gm USING (i) LEFT JOIN wins w ON w.i = s$iters.i
         ORDER BY rank"""
  }

  /** q180's oracle: the per-word Viterbi DP as a recursive CTE. State per
    * (word, position): the dp score/piece-count prefixes as lists; each
    * step LEFT-JOINs the piece table once per candidate length and picks
    * the winner under the (score desc, pieces asc, length asc) tie rule
    * via a single combined integer key (score·4096 − pieces·8 − len: the
    * low bits can never flip the score comparison, and equal keys are
    * impossible for distinct lengths).
    */
  private def unigramSegOracleSql: String = {
    def sK(k: Int) = s"(d.ss[d.i + 2 - $k] + p$k.score6)"
    def nK(k: Int) = s"(d.nn[d.i + 2 - $k] + 1)"
    def key(k: Int) =
      s"""CASE WHEN d.i + 1 >= $k AND p$k.piece IS NOT NULL
           THEN ${sK(k)}*4096 - ${nK(k)}*8 - $k END"""
    def bkCase: String = (1 to 4).map { k =>
      val others = (1 to 4).filter(_ != k)
        .map(j => s"(k$j IS NULL OR k$k >= k$j)").mkString(" AND ")
      s"WHEN k$k IS NOT NULL AND $others THEN $k"
    }.mkString("CASE ", " ", " END")
    def pick(f: Int => String): String =
      (1 to 4).map(k => s"WHEN bk = $k THEN ${f(k)}")
        .mkString("CASE ", " ", " END")
    val joins = (1 to 4).map(k =>
      s"LEFT JOIN v p$k ON p$k.piece = substr(d.word, d.i + 2 - $k, $k)")
      .mkString("\n           ")
    s"""WITH RECURSIVE w AS MATERIALIZED (
           SELECT doc_id, unnest(list_filter(string_split(text, ' '),
             x -> x <> '')) AS word FROM documents),
         pos AS (SELECT word, unnest(generate_series(1, length(word))) AS p
                 FROM w),
         cand AS (SELECT substr(word, p, t.k) AS piece
            FROM pos, unnest(generate_series(1,
              least(4, length(word) - p + 1))) AS t(k)),
         cnts AS (SELECT piece, count(*) AS cnt FROM cand GROUP BY piece),
         top AS (SELECT piece, cnt FROM cnts
                 ORDER BY cnt DESC, piece LIMIT 512),
         chars AS (SELECT piece, cnt FROM cnts WHERE length(piece) = 1),
         sel AS (SELECT piece, CAST(max(cnt) AS BIGINT) AS cnt FROM
                  (SELECT * FROM top UNION ALL SELECT * FROM chars)
                 GROUP BY piece),
         tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS tot FROM sel),
         v AS MATERIALIZED (SELECT piece,
              CAST(floor(ln(cnt * 1.0 / tot) * 1000000) AS BIGINT) AS score6
            FROM sel, tot),
         dw AS MATERIALIZED (SELECT DISTINCT word FROM w),
         dp AS (
           SELECT word, 0 AS i, [CAST(0 AS BIGINT)] AS ss,
             [CAST(0 AS BIGINT)] AS nn
           FROM dw
           UNION ALL
           SELECT word, i + 1, list_append(ss, best_s), list_append(nn, best_n)
           FROM (
             SELECT d.word, d.i, d.ss, d.nn,
               ${pick(sK)} AS best_s, ${pick(nK)} AS best_n
             FROM (
               SELECT d.word, d.i, d.ss, d.nn,
                 $bkCase AS bk,
                 p1.score6 AS sc1, p2.score6 AS sc2,
                 p3.score6 AS sc3, p4.score6 AS sc4
               FROM (
                 SELECT d.*, ${key(1)} AS k1, ${key(2)} AS k2,
                   ${key(3)} AS k3, ${key(4)} AS k4
                 FROM dp d
                 $joins
                 WHERE d.i < length(d.word)) d
               $joins) d
             $joins)
         ),
         fin AS (SELECT word, ss[length(word) + 1] AS w_s6,
              nn[length(word) + 1] AS w_n
            FROM dp WHERE i = length(word))
         SELECT doc_id, count(*) AS n_words,
           CAST(sum(w_n) AS BIGINT) AS n_pieces,
           CAST(sum(w_s6) AS BIGINT) AS score6_total
         FROM w JOIN fin USING (word)
         GROUP BY doc_id ORDER BY doc_id"""
  }

  /** q190's oracle: the Gale–Church grid DP as a recursive CTE. One row
    * per (doc, flattened cell); the recursion carries the dp cost and
    * the four move-count prefixes as lists. The five candidates are
    * computed in an inner subquery, the winner picked by a ≤-cascade in
    * MOVE-PRIORITY order (sub, merge, split, del, ins — mirroring the
    * operator's strict-< fold that keeps the earlier candidate on ties),
    * and the chosen predecessor's counters are bumped in the outer
    * level.
    */
  private def gcOracleSql: String = {
    val lsAt = (i: String) => s"CAST(20 + (h % 97 + ($i) * 13) % 60 AS BIGINT)"
    val nz = (j: String) => s"((h % 89 + ($j) * 7) % 7 - 3)"
    def d2(a: String, b: String) =
      s"""CAST(floor(CAST(($b) - ($a) AS DOUBLE)
          * CAST(($b) - ($a) AS DOUBLE) * 10000.0
          / (6.8 * CAST(($a) AS DOUBLE))) AS BIGINT)"""
    // candidate k: (validity, dp-list position of predecessor, added cost)
    val cands = Seq(
      (s"ii >= 1 AND jj >= 1", "pp - w", d2("ls[ii]", "lt[jj]")),
      (s"ii >= 2 AND jj >= 1", "pp - 2*w",
        s"23000 + ${d2("ls[ii-1] + ls[ii]", "lt[jj]")}"),
      (s"ii >= 1 AND jj >= 2", "pp - w - 1",
        s"23000 + ${d2("ls[ii]", "lt[jj-1] + lt[jj]")}"),
      (s"ii >= 1", "pp - w + 1", "45000"),
      (s"jj >= 1", "pp", "45000"))
    val candCols = cands.zipWithIndex.map { case ((valid, pos, cost), k0) =>
      val k = k0 + 1
      s"CASE WHEN $valid THEN cc[$pos] + ($cost) END AS c$k, ($pos) AS q$k"
    }.mkString(",\n               ")
    val bk = (1 to 5).map { k =>
      val others = (1 to 5).filter(_ != k)
        .map(j => s"(c$j IS NULL OR c$k <= c$j)").mkString(" AND ")
      s"WHEN c$k IS NOT NULL AND $others THEN $k"
    }.mkString("CASE ", " ", " END")
    def pick(f: Int => String) =
      (1 to 5).map(k => s"WHEN bk = $k THEN ${f(k)}").mkString("CASE ", " ", " END")
    s"""WITH RECURSIVE d0 AS MATERIALIZED (
           SELECT doc_id, h, CAST(3 + h % 3 AS INT) AS m
           FROM (SELECT doc_id,
               ((doc_id % 2147483648) * 2654435761) % 2147483647 AS h
             FROM documents)),
         pairs AS MATERIALIZED (SELECT doc_id, ls,
              CASE WHEN h % 4 = 0 THEN
                list_transform(generate_series(1, m - 1), j ->
                  CAST(CASE WHEN j = 1
                    THEN ${lsAt("1")} + ${lsAt("2")} + ${nz("j")}
                    ELSE ${lsAt("j + 1")} + ${nz("j")} END AS BIGINT))
              WHEN h % 4 = 1 THEN
                list_transform(generate_series(1, m + 1), j ->
                  CAST(CASE WHEN j = 1
                      THEN CAST(floor(${lsAt("1")} / 2) AS BIGINT) + ${nz("j")}
                    WHEN j = 2 THEN ${lsAt("1")}
                      - CAST(floor(${lsAt("1")} / 2) AS BIGINT) + ${nz("j")}
                    ELSE ${lsAt("j - 1")} + ${nz("j")} END AS BIGINT))
              ELSE list_transform(generate_series(1, m), j ->
                CAST(${lsAt("j")} + ${nz("j")} AS BIGINT))
              END AS lt
            FROM (SELECT doc_id, h, m,
                list_transform(generate_series(1, m), i -> ${lsAt("i")}) AS ls
              FROM d0)),
         dp AS (
           SELECT doc_id, ls, lt, len(ls) AS m, len(lt) AS n,
             len(lt) + 1 AS w, 0 AS p,
             [CAST(0 AS BIGINT)] AS cc, [CAST(0 AS BIGINT)] AS a11,
             [CAST(0 AS BIGINT)] AS a21, [CAST(0 AS BIGINT)] AS a12,
             [CAST(0 AS BIGINT)] AS ans
           FROM pairs
           UNION ALL
           SELECT doc_id, ls, lt, m, n, w, p,
             list_append(cc, ${pick(k => s"c$k")}),
             list_append(a11, a11[${pick(k => s"q$k")}]
               + CASE WHEN bk = 1 THEN 1 ELSE 0 END),
             list_append(a21, a21[${pick(k => s"q$k")}]
               + CASE WHEN bk = 2 THEN 1 ELSE 0 END),
             list_append(a12, a12[${pick(k => s"q$k")}]
               + CASE WHEN bk = 3 THEN 1 ELSE 0 END),
             list_append(ans, ans[${pick(k => s"q$k")}]
               + CASE WHEN bk IN (4, 5) THEN 1 ELSE 0 END)
           FROM (
             SELECT *, $bk AS bk FROM (
               SELECT doc_id, ls, lt, m, n, w, p + 1 AS p, pp,
                 cc, a11, a21, a12, ans,
                 $candCols
               FROM (
                 SELECT d.*, (d.p + 1) // d.w AS ii, (d.p + 1) % d.w AS jj,
                   d.p + 1 AS pp
                 FROM dp d WHERE d.p < (d.m + 1) * d.w - 1) x) y) z
         ),
         fin AS (SELECT doc_id, m, n,
              cc[(m + 1) * w] AS c6, a11[(m + 1) * w] AS n_sub,
              a21[(m + 1) * w] AS n_merge, a12[(m + 1) * w] AS n_split,
              ans[(m + 1) * w] AS n_skip
            FROM dp WHERE p = (m + 1) * w - 1)
         SELECT doc_id, CAST(m AS BIGINT) AS m, CAST(n AS BIGINT) AS n,
           CAST(c6 AS DOUBLE)/1e4 AS cost, n_sub, n_merge, n_split, n_skip
         FROM fin ORDER BY doc_id"""
  }

  /** q195's oracle: the full portable-HLL replay — md5-prefix hashes,
    * top-b buckets, the integer leading-zero cascade (no log2: a float
    * boundary must never decide a register), exact integer register
    * sums, and the same estimate/correction arithmetic (small-range
    * linear counting AND 32-bit large-range branch, same CASE order as
    * Sketches.hllCorrect) in the same operation order.
    */
  private def hllOracleSql: String = {
    val b = 10; val m = 1 << b; val wBits = 32 - b; val scaleBit = wBits + 1
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    val rhoCase = (1 to wBits).map(r =>
      s"WHEN w >= ${1L << (wBits - r)} THEN $r")
      .mkString("CASE ", " ", s" ELSE ${wBits + 1} END")
    s"""WITH hh AS (SELECT l_returnflag AS grp,
            CAST('0x' || substr(md5(CAST(l_partkey AS VARCHAR)), 1, 8)
              AS BIGINT) AS h
          FROM lineitem),
       rr AS (SELECT grp, h // ${1L << wBits} AS bucket, $rhoCase AS rho
          FROM (SELECT grp, h, h % ${1L << wBits} AS w FROM hh) x),
       regs AS (SELECT grp, bucket, max(rho) AS mr FROM rr
                GROUP BY grp, bucket),
       folded AS (SELECT grp,
            CAST(sum(CAST(power(2, $scaleBit - mr) AS BIGINT)) AS BIGINT)
              AS z_num,
            count(*) AS used FROM regs GROUP BY grp),
       ex AS (SELECT l_returnflag AS grp,
            CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact
          FROM lineitem GROUP BY 1),
       est AS (SELECT grp, $m - used AS v,
            (z_num + ($m - used) * ${1L << scaleBit}) * 1.0
              / ${(1L << scaleBit).toDouble} AS z
          FROM folded),
       e2 AS (SELECT grp, v,
            CAST($alpha AS DOUBLE) * $m * $m / z AS e_raw FROM est),
       e3 AS (SELECT grp, CAST(floor(CASE WHEN e_raw <= ${2.5 * m} AND v > 0
              THEN $m.0 * ln($m.0 / v)
              WHEN e_raw > ${4294967296.0 / 30.0}
              THEN -4294967296.0 * ln(1.0 - e_raw / 4294967296.0)
              ELSE e_raw END) AS BIGINT) AS estimate
            FROM e2)
       SELECT e3.grp AS l_returnflag, exact, estimate,
         CAST(floor(abs(estimate - exact) * 1000000 / exact) AS DOUBLE)/1e6
           AS rel_err,
         CAST(abs(estimate - exact) AS DOUBLE)
           < exact * (3.0 / sqrt($m.0)) AS within_bound
       FROM e3 JOIN ex ON ex.grp = e3.grp ORDER BY l_returnflag"""
  }

  /** q196's oracle: per-day register replay, the trailing-window
    * bucket-max merge, and the same estimate arithmetic as q195. */
  private def rollingOracleSql: String = {
    val b = 10; val m = 1 << b; val wBits = 32 - b; val scaleBit = wBits + 1
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    val rhoCase = (1 to wBits).map(r =>
      s"WHEN w >= ${1L << (wBits - r)} THEN $r")
      .mkString("CASE ", " ", s" ELSE ${wBits + 1} END")
    s"""WITH e AS (SELECT CAST(ts AS DATE) AS day, user_id FROM events),
       hh AS (SELECT day, CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)),
            1, 8) AS BIGINT) AS h FROM e),
       rr AS (SELECT day, h // ${1L << wBits} AS bucket, $rhoCase AS rho
          FROM (SELECT day, h, h % ${1L << wBits} AS w FROM hh) x),
       regs AS (SELECT day, bucket, max(rho) AS mr FROM rr
                GROUP BY day, bucket),
       spine AS (SELECT DISTINCT day AS win_end FROM e),
       wr AS (SELECT win_end, bucket, max(mr) AS mr
          FROM spine s JOIN regs r
            ON r.day <= s.win_end AND r.day > s.win_end - 7
          GROUP BY win_end, bucket),
       folded AS (SELECT win_end,
            CAST(sum(CAST(power(2, $scaleBit - mr) AS BIGINT)) AS BIGINT)
              AS z_num,
            count(*) AS used FROM wr GROUP BY win_end),
       est AS (SELECT win_end, $m - used AS v,
            (z_num + ($m - used) * ${1L << scaleBit}) * 1.0
              / ${(1L << scaleBit).toDouble} AS z FROM folded),
       e2 AS (SELECT win_end, v,
            CAST($alpha AS DOUBLE) * $m * $m / z AS e_raw FROM est),
       e3 AS (SELECT win_end, CAST(floor(CASE WHEN e_raw <= ${2.5 * m}
              AND v > 0 THEN $m.0 * ln($m.0 / v)
              WHEN e_raw > ${4294967296.0 / 30.0}
              THEN -4294967296.0 * ln(1.0 - e_raw / 4294967296.0)
              ELSE e_raw END) AS BIGINT)
              AS estimate FROM e2),
       ex AS (SELECT s.win_end, CAST(count(DISTINCT user_id) AS BIGINT)
              AS exact
          FROM spine s JOIN e ON e.day <= s.win_end AND e.day > s.win_end - 7
          GROUP BY s.win_end)
       SELECT ex.win_end, exact, estimate,
         CAST(abs(estimate - exact) AS DOUBLE)
           < exact * (3.0 / sqrt($m.0)) AS within_bound
       FROM ex JOIN e3 ON e3.win_end = ex.win_end ORDER BY ex.win_end"""
  }

  val oracleSql: Map[String, String] = Map(
    // generation fixture replay (verbatim vs reversed halves), 5-gram
    // inverted-index probe, distinct-position coverage, top-1 argmax
    "q197_provenance" ->
      """WITH docs AS (SELECT doc_id,
              list_filter(string_split(text, ' '), x -> x <> '') AS w
            FROM documents),
         g0 AS (SELECT g.gen_id,
              ((g.gen_id % 2147483648) * 2654435761) % 2147483647 AS h
            FROM (SELECT unnest(generate_series(0, 49)) AS gen_id) g),
         gen AS (SELECT gen_id,
              CASE WHEN h % 2 = 0 THEN coalesce(array_to_string(sw, ' '), '')
                ELSE coalesce(array_to_string(list_reverse(sw), ' '), '')
              END AS gen_text
            FROM (SELECT gen_id, h, d.w[5:24] AS sw
                  FROM g0 JOIN docs d ON d.doc_id = h % 500)),
         gg AS (SELECT gen_id, t.i AS pos,
              array_to_string(gw[t.i : t.i + 4], ' ') AS g
            FROM (SELECT gen_id,
                list_filter(string_split(gen_text, ' '), x -> x <> '') AS gw
              FROM gen) x,
              unnest(generate_series(1, greatest(len(gw) - 4, 0))) AS t(i)),
         cg AS (SELECT DISTINCT doc_id, s FROM (
            SELECT doc_id, unnest(CASE WHEN len(w) >= 5
              THEN list_transform(generate_series(1, len(w) - 4),
                   i -> array_to_string(w[i:i+4], ' '))
              ELSE [] END) AS s FROM docs) t),
         hits AS (SELECT gen_id, pos, doc_id FROM gg
                  JOIN cg ON cg.s = gg.g),
         pd AS (SELECT gen_id, doc_id, count(*) AS cnt FROM hits
                GROUP BY gen_id, doc_id),
         top AS (SELECT gen_id, doc_id AS top_source FROM
              (SELECT gen_id, doc_id, row_number() OVER (PARTITION BY gen_id
                 ORDER BY cnt DESC, doc_id) AS rk FROM pd)
            WHERE rk = 1),
         mt AS (SELECT gen_id, CAST(count(DISTINCT pos) AS BIGINT)
                AS n_matched FROM hits GROUP BY gen_id),
         tot AS (SELECT gen_id, count(*) AS n_pos FROM gg GROUP BY gen_id),
         allg AS (SELECT g0.gen_id, coalesce(tot.n_pos, 0) AS n_pos,
              coalesce(mt.n_matched, 0) AS n_matched, top.top_source
            FROM g0 LEFT JOIN tot ON tot.gen_id = g0.gen_id
              LEFT JOIN mt ON mt.gen_id = g0.gen_id
              LEFT JOIN top ON top.gen_id = g0.gen_id),
         cv AS (SELECT *, CASE WHEN n_pos > 0
              THEN CAST(floor(n_matched * 1000000 / n_pos) AS BIGINT)
              ELSE 0 END AS cov6 FROM allg)
         SELECT gen_id, CAST(n_pos AS BIGINT) AS n_pos,
           CAST(n_matched AS BIGINT) AS n_matched,
           CAST(cov6 AS DOUBLE)/1e6 AS coverage, top_source,
           CASE WHEN cov6 >= 800000 THEN 'copied' ELSE 'original' END
             AS verdict
         FROM cv ORDER BY gen_id""",
    "q169_bradley_terry" -> btOracleSql(10),
    "q180_unigram_segment" -> unigramSegOracleSql,
    "q190_bitext_align" -> gcOracleSql,
    "q195_hll_portable" -> hllOracleSql,
    "q196_rolling_distinct" -> rollingOracleSql,
    // fixture replay + the exact subset-count ratio via list_product over
    // the same clamped factor lists, cast back to BIGINT before the
    // millionth floor so the integer decisions match Spark's aggregate()
    "q170_pass_at_k" -> {
      def p(k: Int) =
        s"""CASE WHEN n >= $k THEN
             CAST(1000000 - floor(
               CAST(list_product(list_transform(range($k),
                 x -> greatest(n - c - x, 0))) AS BIGINT) * 1000000 /
               CAST(list_product(list_transform(range($k),
                 x -> n - x)) AS BIGINT)) AS DOUBLE)/1e6
           END AS pass_$k"""
      s"""WITH r AS (SELECT doc_id AS task_id, source,
              ((doc_id % 2147483648) * 2654435761) % 2147483647 AS h
            FROM documents),
         t AS (SELECT task_id, source, 4 + h % 9 AS n,
              (h % 997) % (4 + h % 9 + 1) AS c FROM r)
         SELECT task_id, source, n, c, ${p(1)}, ${p(4)}, ${p(8)}
         FROM t ORDER BY task_id"""
    },
    // fixture replay (name registry pick + anomaly families + brace
    // truncation), then the same validity-gated extraction battery —
    // json_valid mirrors try_parse_json, never the lenient prefix read
    "q171_tool_call_audit" ->
      """WITH d AS (SELECT doc_id AS call_id, text,
              ((doc_id % 2147483648) * 2654435761) % 2147483647 AS h
            FROM documents),
         b AS (SELECT call_id, h,
              CASE WHEN h % 9 = 0 THEN 'shell_exec'
                ELSE ['search','calculator','lookup'][CAST(h % 3 AS INT) + 1]
              END AS name,
              array_to_string(list_filter(string_split(text, ' '),
                x -> x <> '')[1:3], ' ') AS q
            FROM d),
         j0 AS (SELECT call_id, h,
              '{"name":"' || name || '","arguments":{"query":"' || q || '"' ||
              CASE WHEN h % 5 = 0 THEN ''
                ELSE ',"top_k":' || CASE WHEN h % 7 = 0 THEN '"many"'
                  ELSE CAST(h % 50 AS VARCHAR) END END || '}}' AS js
            FROM b),
         j AS (SELECT call_id,
              CASE WHEN h % 13 = 0 THEN substr(js, 1, length(js) - 1)
                ELSE js END AS call_json
            FROM j0),
         x AS (SELECT call_id, call_json, json_valid(call_json) AS v,
              CASE WHEN json_valid(call_json)
                THEN json_extract_string(call_json, '$.name') END AS name,
              CASE WHEN json_valid(call_json)
                THEN json_extract_string(call_json, '$.arguments.query')
              END AS q,
              CASE WHEN json_valid(call_json)
                THEN json_extract_string(call_json, '$.arguments.top_k')
              END AS tk
            FROM j)
         SELECT call_id, call_json, v AS is_valid_json, name,
           coalesce(name IN ('search','calculator','lookup'), false)
             AS name_allowed,
           coalesce(length(q) > 0, false) AS has_query,
           coalesce(regexp_matches(tk, '^[0-9]+$'), false) AS topk_ok,
           CASE WHEN v AND coalesce(name IN ('search','calculator','lookup'),
               false) AND coalesce(length(q) > 0, false)
               AND coalesce(regexp_matches(tk, '^[0-9]+$'), false)
             THEN 'ok' ELSE 'bad' END AS verdict
         FROM x ORDER BY call_id""",
    // mixed-script fixture replay (invisible controls via chr(), the
    // confusable via chr(1072) CYRILLIC SMALL A), then the same
    // strip-and-diff per-script counts — \x{...} classes are RE2's
    // spelling of the identical code-point ranges
    "q172_script_mix" ->
      """WITH d AS (SELECT doc_id, text,
              ((doc_id % 2147483648) * 2654435761) % 2147483647 AS h
            FROM documents),
         f AS (SELECT doc_id, text ||
              CASE WHEN h % 4 = 1 THEN ' привет мир'
                   WHEN h % 4 = 2 THEN ' 你好世界'
                   WHEN h % 4 = 3 THEN ' p' || chr(1072) || 'ypal'
                   ELSE '' END ||
              CASE WHEN h % 10 = 0
                THEN ' ' || chr(8203) || chr(8238) || 'hidden'
                ELSE '' END AS t
            FROM d),
         c AS (SELECT doc_id,
              CAST(length(t) - length(regexp_replace(t, '[A-Za-z]', '', 'g'))
                AS BIGINT) AS n_latin,
              CAST(length(t) - length(regexp_replace(t,
                '[\x{0400}-\x{04FF}]', '', 'g')) AS BIGINT) AS n_cyrillic,
              CAST(length(t) - length(regexp_replace(t,
                '[\x{4E00}-\x{9FFF}]', '', 'g')) AS BIGINT) AS n_cjk,
              CAST(length(t) - length(regexp_replace(t,
                '[\x{200B}-\x{200F}\x{202A}-\x{202E}]', '', 'g'))
                AS BIGINT) AS n_controls,
              CAST(len(list_filter(string_split(t, ' '),
                w -> regexp_matches(w, '[A-Za-z]')
                  AND regexp_matches(w, '[\x{0400}-\x{04FF}]')))
                AS BIGINT) AS n_mixed_tokens
            FROM f)
         SELECT doc_id, n_latin, n_cyrillic, n_cjk, n_controls,
           n_mixed_tokens,
           CASE WHEN n_latin >= n_cyrillic AND n_latin >= n_cjk THEN 'latin'
                WHEN n_cyrillic >= n_cjk THEN 'cyrillic'
                ELSE 'cjk' END AS dominant_script,
           (n_controls > 0 OR n_mixed_tokens > 0) AS suspicious
         FROM c ORDER BY doc_id""",
    // noisy-URL fixture replay, then the same canonicalization chain:
    // fragment strip, authority lowercase + www/default-port strip,
    // list-filtered query params, trailing-slash strip, group+min
    "q173_url_canonical" ->
      """WITH d AS (SELECT doc_id,
              ((doc_id % 2147483648) * 2654435761) % 2147483647 AS h
            FROM documents),
         u AS (SELECT doc_id,
              CASE WHEN h % 2 = 0 THEN upper(pre) ELSE pre END
              || '/p/' || CAST(h % 37 AS VARCHAR)
              || CASE WHEN h % 7 = 0 THEN '/' ELSE '' END
              || CASE WHEN h % 4 = 0
                   THEN '?utm_source=feed&id=' || CAST(h % 11 AS VARCHAR)
                   WHEN h % 4 = 1 THEN '?id=' || CAST(h % 11 AS VARCHAR)
                   ELSE '' END
              || CASE WHEN h % 6 = 0 THEN '#sec' ELSE '' END AS url
            FROM (SELECT doc_id, h,
                'https://' || CASE WHEN h % 3 = 0 THEN 'www.' ELSE '' END
                || 'site' || CAST(h % 13 AS VARCHAR) || '.example.com'
                || CASE WHEN h % 5 = 0 THEN ':443' ELSE '' END AS pre
              FROM d)),
         c1 AS (SELECT doc_id, nf,
              regexp_extract(nf, '^([A-Za-z]+://[^/?]*)', 1) AS a0
            FROM (SELECT doc_id, regexp_replace(url, '#.*$', '') AS nf
                  FROM u)),
         c2 AS (SELECT doc_id, substr(nf, length(a0) + 1) AS rest,
              regexp_replace(regexp_replace(lower(a0),
                '^(https?://)www\.', '\1'), ':(443|80)$', '') AS auth
            FROM c1),
         c3 AS (SELECT doc_id, auth,
              regexp_replace(regexp_extract(rest, '^([^?]*)', 1), '/$', '')
                AS path,
              CASE WHEN instr(rest, '?') > 0
                THEN substr(rest, instr(rest, '?') + 1) ELSE '' END AS qs
            FROM c2),
         c4 AS (SELECT doc_id, auth || path ||
              CASE WHEN len(ps) > 0 THEN '?' || array_to_string(ps, '&')
                ELSE '' END AS canonical_url
            FROM (SELECT doc_id, auth, path,
                list_filter(string_split(qs, '&'),
                  p -> NOT starts_with(p, 'utm_') AND p <> '') AS ps
              FROM c3))
         SELECT canonical_url, count(*) AS n_variants, min(doc_id) AS keep_id
         FROM c4 GROUP BY canonical_url ORDER BY canonical_url""",
    // prediction fixture replay (second hash step, division-free
    // correctness draw), equal-width bins, exact bin stats, windowed ECE
    // same prediction fixture, same bins; every term the same integer
    // fold (millis-squared micro-units), residual included
    "q212_brier_decomp" ->
      """WITH p AS (SELECT source,
              h % 1000001 AS conf6,
              (((h % 999983) * 48271) % 2147483647) % 1000000 * 5
                < (h % 1000001) * 4
                AS correct
            FROM (SELECT source,
                ((doc_id % 2147483648) * 2654435761) % 2147483647 AS h
              FROM documents)),
         b AS (SELECT source,
              least(CAST(floor(conf6 / 100000) AS BIGINT), 9) AS bin,
              conf6 // 1000 AS p3,
              CASE WHEN correct THEN 1 ELSE 0 END AS y
            FROM p),
         g AS (SELECT source, bin, CAST(count(*) AS BIGINT) AS nb,
              CAST(sum(p3) AS BIGINT) AS sb,
              CAST(sum(p3 * p3) AS BIGINT) AS qb,
              CAST(sum(y) AS BIGINT) AS yb,
              CAST(sum((p3 - 1000 * y) * (p3 - 1000 * y)) AS BIGINT) AS d2b
            FROM b GROUP BY source, bin),
         s AS (SELECT source, CAST(sum(nb) AS BIGINT) AS n,
              CAST(sum(yb) AS BIGINT) AS ytot,
              CAST(sum(d2b) AS BIGINT) AS d2
            FROM g GROUP BY source),
         t AS (SELECT g.source, s.n, s.ytot, s.d2,
              CAST(sum(((sb - 1000 * yb) * (sb - 1000 * yb)) // nb)
                AS BIGINT) AS relsum,
              CAST(sum(((yb * n - ytot * nb) * (yb * n - ytot * nb)
                * 1000000) // nb) AS BIGINT) AS ressum
            FROM g JOIN s ON g.source = s.source
            GROUP BY g.source, s.n, s.ytot, s.d2),
         f AS (SELECT source, n, d2 // n AS bs6, relsum // n AS rel6,
              ressum // (n * n * n) AS res6,
              (ytot * (n - ytot) * 1000000) // (n * n) AS unc6
            FROM t)
         SELECT source, n,
           CAST(bs6 AS DOUBLE)/1e6 AS brier,
           CAST(rel6 AS DOUBLE)/1e6 AS reliability,
           CAST(res6 AS DOUBLE)/1e6 AS resolution,
           CAST(unc6 AS DOUBLE)/1e6 AS uncertainty,
           CAST(bs6 - (rel6 - res6 + unc6) AS DOUBLE)/1e6 AS resid
         FROM f ORDER BY source""",
    "q174_calibration" ->
      """WITH p AS (SELECT source,
              h % 1000001 AS conf6,
              (((h % 999983) * 48271) % 2147483647) % 1000000 * 5
                < (h % 1000001) * 4
                AS correct
            FROM (SELECT source,
                ((doc_id % 2147483648) * 2654435761) % 2147483647 AS h
              FROM documents)),
         b AS (SELECT source, least(CAST(floor(conf6 / 100000) AS BIGINT), 9)
                 AS bin, conf6, correct FROM p),
         g AS (SELECT source, bin, count(*) AS n,
              CAST(sum(conf6) AS BIGINT) AS sum_conf6,
              CAST(sum(CASE WHEN correct THEN 1 ELSE 0 END) AS BIGINT)
                AS n_correct
            FROM b GROUP BY source, bin),
         s AS (SELECT source, bin, n,
              CAST(floor(sum_conf6 / n) AS BIGINT) AS conf6b,
              CAST(floor(n_correct * 1000000 / n) AS BIGINT) AS acc6b
            FROM g),
         e AS (SELECT source, bin, n, conf6b, acc6b,
              abs(conf6b - acc6b) AS gap6,
              CAST(floor(
                CAST(sum(abs(conf6b - acc6b) * n) OVER (PARTITION BY source)
                  AS BIGINT) * 1.0 /
                CAST(sum(n) OVER (PARTITION BY source) AS BIGINT))
                AS BIGINT) AS ece6
            FROM s)
         SELECT source, bin, n,
           CAST(conf6b AS DOUBLE)/1e6 AS conf,
           CAST(acc6b AS DOUBLE)/1e6 AS acc,
           CAST(gap6 AS DOUBLE)/1e6 AS gap,
           CAST(ece6 AS DOUBLE)/1e6 AS ece
         FROM e ORDER BY source, bin""",
    // pair-text fixture replay (shifted completion windows), multiset
    // n-gram overlap via least() on inner-joined counts, exact F-scores
    "q175_pair_rouge" ->
      """WITH d AS (SELECT doc_id AS pair_id, source,
              list_filter(string_split(text, ' '), x -> x <> '') AS w
            FROM documents),
         p AS (SELECT pair_id, source,
              w[7 : 6 + CAST(10 + pair_id % 20 AS INT)] AS chosen,
              w[o : o - 1 + CAST(5 + (pair_id*7) % 25 AS INT)] AS rejected
            FROM (SELECT pair_id, source, w,
                CASE WHEN pair_id % 9 = 0 THEN 40
                  ELSE CAST(7 + pair_id % 4 AS INT) END AS o
              FROM d)),
         c1 AS (SELECT pair_id, g, count(*) AS cc FROM
                 (SELECT pair_id, unnest(chosen) AS g FROM p)
               GROUP BY pair_id, g),
         r1 AS (SELECT pair_id, g, count(*) AS cr FROM
                 (SELECT pair_id, unnest(rejected) AS g FROM p)
               GROUP BY pair_id, g),
         o1 AS (SELECT pair_id, CAST(sum(least(cc, cr)) AS BIGINT) AS ov1
                FROM c1 JOIN r1 USING (pair_id, g) GROUP BY pair_id),
         c2 AS (SELECT pair_id, g, count(*) AS cc FROM
                 (SELECT pair_id, unnest(CASE WHEN len(chosen) >= 2
                    THEN list_transform(range(1, len(chosen)),
                      i -> array_to_string(chosen[i:i+1], ' '))
                    ELSE [] END) AS g FROM p)
               GROUP BY pair_id, g),
         r2 AS (SELECT pair_id, g, count(*) AS cr FROM
                 (SELECT pair_id, unnest(CASE WHEN len(rejected) >= 2
                    THEN list_transform(range(1, len(rejected)),
                      i -> array_to_string(rejected[i:i+1], ' '))
                    ELSE [] END) AS g FROM p)
               GROUP BY pair_id, g),
         o2 AS (SELECT pair_id, CAST(sum(least(cc, cr)) AS BIGINT) AS ov2
                FROM c2 JOIN r2 USING (pair_id, g) GROUP BY pair_id),
         t AS (SELECT pair_id, source,
              CAST(len(chosen) AS BIGINT) AS nc1,
              CAST(len(rejected) AS BIGINT) AS nr1,
              CAST(greatest(len(chosen) - 1, 0) AS BIGINT) AS nc2,
              CAST(greatest(len(rejected) - 1, 0) AS BIGINT) AS nr2
            FROM p)
         SELECT t.pair_id, source, nc1, nr1,
           coalesce(ov1, 0) AS overlap1,
           CASE WHEN nc1 + nr1 > 0 THEN
             CAST(floor(coalesce(ov1, 0) * 2 * 1000000 / (nc1 + nr1))
               AS DOUBLE)/1e6 ELSE 0.0 END AS rouge1_f,
           nc2, nr2, coalesce(ov2, 0) AS overlap2,
           CASE WHEN nc2 + nr2 > 0 THEN
             CAST(floor(coalesce(ov2, 0) * 2 * 1000000 / (nc2 + nr2))
               AS DOUBLE)/1e6 ELSE 0.0 END AS rouge2_f
         FROM t LEFT JOIN o1 ON o1.pair_id = t.pair_id
           LEFT JOIN o2 ON o2.pair_id = t.pair_id
         ORDER BY t.pair_id""",
    // same md5-seeded inverse-CDF geometric draws and clamp; ln ratios
    // floored AFTER the division exactly as the operator computes them
    "q176_dp_histogram" ->
      """WITH c AS (SELECT source, count(*) AS n FROM documents
                    GROUP BY source),
         u AS (SELECT source, n,
              (CAST('0x' || substr(md5(source || '|graft-dp-v1|a'), 1, 8)
                 AS BIGINT) % 1000000) + 1 AS u1,
              (CAST('0x' || substr(md5(source || '|graft-dp-v1|b'), 1, 8)
                 AS BIGINT) % 1000000) + 1 AS u2
            FROM c)
         SELECT source,
           greatest(n
             + CAST(floor(ln(u1/1000000.0)/ln(0.5)) AS BIGINT)
             - CAST(floor(ln(u2/1000000.0)/ln(0.5)) AS BIGINT), 0)
             AS released
         FROM u ORDER BY source""",
    // reply-forest fixture replay, then a per-node recursive walk to the
    // root — arg_max(cur, depth) is the walk's endpoint = the root the
    // doubling loop must agree with
    "q177_thread_roots" ->
      """WITH RECURSIVE posts AS (
           SELECT id, CASE WHEN id = 0 OR h % 5 = 0 THEN NULL
               ELSE id - (1 + h % least(id, 20)) END AS parent
           FROM (SELECT doc_id AS id,
               ((doc_id % 2147483648) * 2654435761) % 2147483647 AS h
             FROM documents)),
         walk AS (
           SELECT id AS node_id, id AS cur, 0 AS depth FROM posts
           UNION ALL
           SELECT w.node_id, p.parent, w.depth + 1
           FROM walk w JOIN posts p ON p.id = w.cur
           WHERE p.parent IS NOT NULL)
         SELECT node_id, arg_max(cur, depth) AS root_id,
           CAST(max(depth) AS BIGINT) AS depth
         FROM walk GROUP BY node_id ORDER BY node_id""",
    // q32's quality chain, then the same distinct-score distribution
    // tables: percent_rank-convention source percentiles, the global
    // max-rank CDF, the 1001-point spine lookup q(t)=min{s: cdf>=t}
    "q178_quantile_norm" ->
      """WITH t AS (SELECT doc_id, source, text, length(text) AS nc,
              len(list_filter(string_split(text,' '), x -> x <> '')) AS nw,
              length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS np,
              len(list_filter(string_split(text,' '),
                  x -> x IN ('the','a','of','and','to','in','is','on','for','with'))) AS ns
            FROM documents),
         q AS (SELECT doc_id, source,
              floor((0.4*least(1.0, nw/50.0) + 0.3*(1.0 - np*1.0/nc)
                    + 0.3*least(1.0, ns*1.0/nw*5.0))*10000)/10000
                AS quality_score
            FROM t),
         qq AS (SELECT doc_id, source, quality_score,
              CAST(round(quality_score * 10000) AS BIGINT) AS s4 FROM q),
         sc AS (SELECT source, s4, count(*) AS cnt FROM qq
                GROUP BY source, s4),
         st AS (SELECT source, count(*) AS n_src FROM qq GROUP BY source),
         sd AS (SELECT x.source, s4,
              CASE WHEN n_src = 1 THEN 0
                ELSE CAST(floor((cum - cnt) * 1000000 / (n_src - 1))
                  AS BIGINT) END AS p6
            FROM (SELECT source, s4, cnt,
                    sum(cnt) OVER (PARTITION BY source ORDER BY s4) AS cum
                  FROM sc) x JOIN st ON st.source = x.source),
         gt AS (SELECT count(*) AS n_glob FROM qq),
         gd AS (SELECT s4 AS g_s4,
              CASE WHEN n_glob = 1 THEN 1000000
                ELSE CAST(floor((gcum - 1) * 1000000 / (n_glob - 1))
                  AS BIGINT) END AS pmax6
            FROM (SELECT s4, sum(gcnt) OVER (ORDER BY s4) AS gcum FROM
                   (SELECT s4, count(*) AS gcnt FROM qq GROUP BY s4)) y, gt),
         sp AS (SELECT unnest(generate_series(0, 1000)) AS b),
         qn AS (SELECT b, min(g_s4) AS norm_s4
                FROM sp JOIN gd ON pmax6 >= b * 1000 GROUP BY b)
         SELECT doc_id, qq.source, quality_score AS score,
           CAST(p6 AS DOUBLE)/1e6 AS src_pct,
           CAST(norm_s4 AS DOUBLE)/10000.0 AS norm_score
         FROM qq
           JOIN sd ON sd.source = qq.source AND sd.s4 = qq.s4
           JOIN qn ON qn.b = CAST(floor(p6 / 1000) AS BIGINT)
         ORDER BY doc_id""",
    // the same (ts, event_id)-ordered per-user lag, counts, margins,
    // floored-millionth row probabilities
    "q198_transitions" ->
      """WITH p AS (SELECT
              lag(event_type) OVER (PARTITION BY user_id
                ORDER BY ts, event_id) AS from_type,
              event_type AS to_type
            FROM events),
         c AS (SELECT from_type, to_type, count(*) AS n FROM p
               WHERE from_type IS NOT NULL GROUP BY from_type, to_type),
         m AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS row_n
               FROM c GROUP BY from_type)
         SELECT c.from_type, to_type, n,
           CAST(CAST(floor(n * 1000000 / row_n) AS BIGINT) AS DOUBLE)/1e6
             AS p
         FROM c JOIN m ON m.from_type = c.from_type
         ORDER BY c.from_type, to_type""",
    // the same exact interpolated medians (DuckDB median == Spark
    // percentile 0.5 arithmetic), MAD scale, identical flag rule
    "q194_hourly_anomaly" ->
      """WITH h AS (SELECT CAST(ts AS DATE) AS date, hour(ts) AS hod,
              count(*) AS n
            FROM events GROUP BY 1, 2),
         b AS (SELECT hod, CAST(median(n) AS DOUBLE) AS med
               FROM h GROUP BY hod),
         m AS (SELECT date, h.hod, n, med, abs(n - med) AS dev
               FROM h JOIN b ON b.hod = h.hod),
         md AS (SELECT hod, CAST(median(dev) AS DOUBLE) AS mad
                FROM m GROUP BY hod)
         SELECT date, m.hod, n, med, mad, dev,
           dev > greatest(mad * 3, 1.0) AS is_anomaly
         FROM m JOIN md ON md.hod = m.hod ORDER BY date, m.hod""",
    // rules + url fixtures replayed, prefix matches keyed 2*len+allow,
    // arg_max skips null keys, coalesce supplies the default-allow
    "q193_robots_filter" ->
      """WITH u AS (SELECT doc_id,
              'site' || CAST(h % 13 AS VARCHAR) || '.example.com' AS host,
              '/p/' || CAST(h % 37 AS VARCHAR) ||
                CASE WHEN h % 4 IN (0, 1)
                  THEN '?id=' || CAST(h % 11 AS VARCHAR) ELSE '' END AS path
            FROM (SELECT doc_id,
                ((doc_id % 2147483648) * 2654435761) % 2147483647 AS h
              FROM documents)),
         r AS (SELECT 'site' || CAST(k AS VARCHAR) || '.example.com' AS host,
              t.r.rule AS rule, t.r.prefix AS prefix
            FROM (SELECT unnest(generate_series(0, 12)) AS k) g,
              unnest([
                {'rule': 'disallow',
                 'prefix': '/p/' || CAST(k * 7 % 37 AS VARCHAR)},
                {'rule': 'allow',
                 'prefix': '/p/' || CAST(k * 7 % 37 AS VARCHAR) || '?id='},
                {'rule': 'disallow',
                 'prefix': '/p/' || CAST(k * 11 % 37 AS VARCHAR)}]) AS t(r)
            ),
         j AS (SELECT doc_id, u.host, path, rule,
              CASE WHEN starts_with(path, prefix)
                THEN length(prefix) * 2
                  + CASE WHEN rule = 'allow' THEN 1 ELSE 0 END END AS mkey
            FROM u LEFT JOIN r ON r.host = u.host)
         SELECT doc_id, host, path,
           coalesce(arg_max(rule, mkey), 'allow') AS winning_rule,
           coalesce(arg_max(rule, mkey), 'allow') = 'allow' AS allowed
         FROM j GROUP BY doc_id, host, path ORDER BY doc_id""",
    // field split replay, pivoted per-field integer tfs, the identical
    // weighted-tf and saturation chains, floored micro contributions
    "q192_bm25f" ->
      """WITH d AS (SELECT doc_id,
              list_filter(string_split(text, ' '), x -> x <> '') AS w
            FROM documents),
         f AS (SELECT doc_id, w[1:2] AS title, w[8:29] AS body FROM d),
         lens AS (SELECT doc_id, CAST(len(title) AS DOUBLE) AS lt,
              CAST(len(body) AS DOUBLE) AS lb FROM f),
         stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs,
              avg(lt) AS avgt, avg(lb) AS avgb FROM lens),
         tk AS (SELECT doc_id, 't' AS field, unnest(title) AS token FROM f
                UNION ALL
                SELECT doc_id, 'b', unnest(body) FROM f),
         tf AS (SELECT doc_id, token,
              CAST(sum(CASE WHEN field = 't' THEN 1 ELSE 0 END) AS BIGINT)
                AS tft,
              CAST(sum(CASE WHEN field = 'b' THEN 1 ELSE 0 END) AS BIGINT)
                AS tfb
            FROM tk WHERE token IN ('vector','stream','filter','spark')
            GROUP BY doc_id, token),
         dfq AS (SELECT token, CAST(count(*) AS DOUBLE) AS df
                 FROM tf GROUP BY token),
         x AS (SELECT tf.doc_id,
              3.0 * tft / (0.25 + 0.75 * lt / avgt)
                + 1.0 * tfb / (0.25 + 0.75 * lb / avgb) AS wtf,
              df, n_docs
            FROM tf JOIN lens USING (doc_id) JOIN dfq USING (token), stats),
         sc AS (SELECT doc_id, CAST(sum(c6) AS BIGINT) AS score6 FROM (
              SELECT doc_id, CAST(floor(
                  ln((n_docs - df + 0.5)/(df + 0.5) + 1.0)
                  * wtf / (1.2 + wtf) * 1000000) AS BIGINT) AS c6
              FROM x) y GROUP BY doc_id)
         SELECT CAST(row_number() OVER (ORDER BY score6 DESC, doc_id)
             AS BIGINT) AS rank, doc_id, score6
         FROM sc ORDER BY score6 DESC, doc_id LIMIT 20""",
    // q164's pair fixture, class tags, minority-count cap per source,
    // id-hash keep order within each (source, class)
    "q191_length_debias" ->
      """WITH d AS (SELECT doc_id, source,
              list_filter(string_split(text, ' '), x -> x <> '') AS w
            FROM documents),
         p AS (SELECT doc_id AS pair_id, source,
              CAST(len(w[7 : 6 + CAST(10 + doc_id % 20 AS INT)]) AS BIGINT)
                AS len_chosen,
              CAST(len(w[7 : 6 + CAST(5 + (doc_id * 7) % 25 AS INT)])
                AS BIGINT) AS len_rejected
            FROM d),
         t AS (SELECT *, CASE WHEN len_chosen > len_rejected
                 THEN 'chosen_longer'
               WHEN len_chosen < len_rejected THEN 'rejected_longer'
               ELSE 'tie' END AS class FROM p),
         c AS (SELECT source, least(
              sum(CASE WHEN class = 'chosen_longer' THEN 1 ELSE 0 END),
              sum(CASE WHEN class = 'rejected_longer' THEN 1 ELSE 0 END))
                AS keep_n
            FROM t WHERE class <> 'tie' GROUP BY source),
         r AS (SELECT t.*, c.keep_n, row_number() OVER (
              PARTITION BY t.source, class ORDER BY
                ((pair_id % 2147483648) * 2654435761) % 2147483647, pair_id)
              AS rk
            FROM t JOIN c ON c.source = t.source)
         SELECT source, pair_id, len_chosen, len_rejected, class
         FROM r WHERE class = 'tie' OR rk <= keep_n
         ORDER BY source, pair_id""",
    // per-stratum stats, the same sqrt→micro-quantized weights, floored
    // shares + largest-remainder leftovers, id-hash draw order
    "q189_neyman_sample" ->
      """WITH s AS (SELECT source, count(*) AS nh,
              CAST(sum(n_chars) AS BIGINT) AS sx,
              CAST(sum(n_chars * n_chars) AS BIGINT) AS sx2
            FROM documents GROUP BY source),
         w AS (SELECT source, nh,
              CASE WHEN nh > 1 THEN
                CAST(floor(sqrt(greatest((CAST(sx2 AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / nh)
                  / (nh - 1), 0.0)) * 1000000) AS BIGINT) * nh
              ELSE 0 END AS a6
            FROM s),
         t AS (SELECT CAST(sum(a6) AS BIGINT) AS t,
               CAST(sum(nh) AS BIGINT) AS tn FROM w),
         al AS (SELECT source, nh, a6,
              CAST(floor((CASE WHEN t.t > 0 THEN a6 ELSE nh END) * 100
                / (CASE WHEN t.t > 0 THEN t.t ELSE t.tn END)) AS BIGINT)
                AS base,
              ((CASE WHEN t.t > 0 THEN a6 ELSE nh END) * 100)
                % (CASE WHEN t.t > 0 THEN t.t ELSE t.tn END) AS rem
            FROM w, t),
         lo AS (SELECT CAST(100 - sum(base) AS BIGINT) AS leftover FROM al),
         alloc AS (SELECT source,
              least(base + CASE WHEN rk <= lo.leftover THEN 1 ELSE 0 END,
                nh) AS n_h
            FROM (SELECT *, row_number() OVER
                    (ORDER BY rem DESC, source) AS rk FROM al) x, lo),
         draw AS (SELECT source, doc_id, CAST(row_number() OVER
              (PARTITION BY source ORDER BY
                ((doc_id % 2147483648) * 2654435761) % 2147483647, doc_id)
              AS BIGINT) AS rk
            FROM documents)
         SELECT d.source, doc_id, rk
         FROM draw d JOIN alloc a ON a.source = d.source
         WHERE rk <= a.n_h ORDER BY d.source, rk""",
    // link fixture replay (shared hosts, per-link anchor slices), term
    // counts, slot-wise conditional-min top-3, null-skipping concat
    "q188_anchor_index" ->
      """WITH d AS (SELECT doc_id,
              list_filter(string_split(text, ' '), x -> x <> '') AS w,
              ((doc_id % 2147483648) * 2654435761) % 2147483647 AS h
            FROM documents),
         l AS (SELECT doc_id,
              'site' || CAST((h + j.j * 5) % 13 AS VARCHAR)
                || '.example.com' AS host,
              coalesce(array_to_string(
                w[CAST(h % 7 + j.j * 4 + 1 AS INT)
                  : CAST(h % 7 + j.j * 4 + 3 AS INT)], ' '), '') AS anchor
            FROM d, unnest(generate_series(0, 2)) AS j(j)),
         l2 AS (SELECT * FROM l WHERE anchor <> ''),
         stats AS (SELECT host, count(*) AS n_links,
              CAST(count(DISTINCT doc_id) AS BIGINT) AS n_src_docs
            FROM l2 GROUP BY host),
         t AS (SELECT host, term, count(*) AS cnt FROM
                (SELECT host, unnest(list_filter(string_split(anchor, ' '),
                   x -> x <> '')) AS term FROM l2)
               GROUP BY host, term),
         rk AS (SELECT host, term, row_number() OVER (PARTITION BY host
              ORDER BY cnt DESC, term) AS rk FROM t),
         top AS (SELECT host,
              min(CASE WHEN rk = 1 THEN term END) AS t1,
              min(CASE WHEN rk = 2 THEN term END) AS t2,
              min(CASE WHEN rk = 3 THEN term END) AS t3
            FROM rk WHERE rk <= 3 GROUP BY host)
         SELECT host, n_links, n_src_docs,
           concat_ws(',', t1, t2, t3) AS top_terms
         FROM stats JOIN top USING (host) ORDER BY host""",
    // direct global row_number (equivalent to the bucket+offset rank:
    // the bucket is a key prefix, so the composed order IS the key
    // order), rank-window self-join, q26's exact-Jaccard convention
    "q187_sorted_neighborhood" ->
      """WITH docs AS (SELECT doc_id,
              list_filter(string_split(text, ' '), x -> x <> '') AS w
            FROM documents),
         k AS (SELECT doc_id,
              coalesce(array_to_string(w[1:3], ' '), '') AS bkey FROM docs),
         r AS (SELECT doc_id,
              row_number() OVER (ORDER BY bkey, doc_id) AS rk FROM k),
         cand AS (SELECT least(a.doc_id, b.doc_id) AS da,
              greatest(a.doc_id, b.doc_id) AS db
            FROM r a JOIN r b ON b.rk > a.rk AND b.rk <= a.rk + 4),
         sh AS (SELECT DISTINCT doc_id, s FROM (
            SELECT doc_id, unnest(CASE WHEN len(w) >= 3
              THEN list_transform(generate_series(1, len(w)-2),
                   i -> array_to_string(w[i:i+2], ' '))
              ELSE [coalesce(array_to_string(w, ' '), '')] END) AS s
            FROM docs) t),
         sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         pc AS (SELECT da, db, count(*) AS c FROM cand
                JOIN sh a ON a.doc_id = da
                JOIN sh b ON b.doc_id = db AND b.s = a.s
                GROUP BY da, db)
         SELECT da AS doc_a, db AS doc_b,
           floor(1.0*c/(sa.n + sb.n - c)*10000)/10000 AS jaccard
         FROM pc JOIN sizes sa ON da = sa.doc_id
                 JOIN sizes sb ON db = sb.doc_id
         WHERE floor(1.0*c/(sa.n + sb.n - c)*10000)/10000 >= 0.8
         ORDER BY doc_a, doc_b""",
    // fixture replay, both per-query rankings (system by score, ideal by
    // relevance), floored per-rank gains, integer metric ratios
    "q186_ir_metrics" ->
      """WITH r AS (SELECT doc_id, doc_id % 10 AS qid,
              (((doc_id * 1009 + doc_id % 10) % 2147483648) * 2654435761)
                % 2147483647 AS h
            FROM documents),
         g AS (SELECT doc_id, qid, rel, rel * 10 + (h % 997) % 15 AS score
            FROM (SELECT doc_id, qid, h,
                CASE WHEN h % 20 = 0 THEN 2 WHEN h % 20 <= 2 THEN 1
                  ELSE 0 END AS rel
              FROM r)),
         sys AS (SELECT qid, rel, row_number() OVER (PARTITION BY qid
              ORDER BY score DESC, doc_id) AS rk FROM g),
         s10 AS (SELECT qid,
              CAST(sum(CASE WHEN rel > 0 THEN 1 ELSE 0 END) AS BIGINT)
                AS rel_found,
              min(CASE WHEN rel > 0 THEN rk END) AS first_rel,
              CAST(sum(CAST(floor((power(2.0, rel) - 1.0) * 1000000
                / (ln(rk + 1.0)/ln(2))) AS BIGINT)) AS BIGINT) AS dcg6
            FROM sys WHERE rk <= 10 GROUP BY qid),
         ide AS (SELECT qid, rel, row_number() OVER (PARTITION BY qid
              ORDER BY rel DESC, doc_id) AS rk FROM g),
         i10 AS (SELECT qid,
              CAST(sum(CAST(floor((power(2.0, rel) - 1.0) * 1000000
                / (ln(rk + 1.0)/ln(2))) AS BIGINT)) AS BIGINT) AS idcg6
            FROM ide WHERE rk <= 10 GROUP BY qid),
         tot AS (SELECT qid,
              CAST(sum(CASE WHEN rel > 0 THEN 1 ELSE 0 END) AS BIGINT)
                AS n_relevant
            FROM g GROUP BY qid)
         SELECT tot.qid, n_relevant,
           CASE WHEN n_relevant > 0 THEN
             CAST(CAST(floor(rel_found * 1000000 / n_relevant) AS BIGINT)
               AS DOUBLE)/1e6 ELSE 0.0 END AS recall_10,
           CASE WHEN first_rel IS NOT NULL THEN
             CAST(CAST(floor(1000000 / first_rel) AS BIGINT) AS DOUBLE)/1e6
             ELSE 0.0 END AS mrr_10,
           CASE WHEN idcg6 > 0 THEN
             CAST(CAST(floor(dcg6 * 1000000 / idcg6) AS BIGINT)
               AS DOUBLE)/1e6 ELSE 0.0 END AS ndcg_10
         FROM tot JOIN s10 USING (qid) JOIN i10 USING (qid)
         ORDER BY qid""",
    // fixture replay (two folded-hash draws over shared difficulty),
    // discordant-cell counts, the all-integer chi-square decision
    "q184_mcnemar" ->
      """WITH t AS (SELECT source, h % 40 AS diff,
              (((h % 999983) * 48271) % 2147483647) % 100 AS ua,
              (((h % 999979) * 69621) % 2147483647) % 100 AS ub
            FROM (SELECT source,
                ((doc_id % 2147483648) * 2654435761) % 2147483647 AS h
              FROM documents)),
         o AS (SELECT source, ua < 75 - diff AS a_ok, ub < 70 - diff AS b_ok
               FROM t),
         a AS (SELECT source, count(*) AS n_tasks,
              CAST(sum(CASE WHEN a_ok AND b_ok THEN 1 ELSE 0 END) AS BIGINT)
                AS both_right,
              CAST(sum(CASE WHEN NOT a_ok AND NOT b_ok THEN 1 ELSE 0 END)
                AS BIGINT) AS both_wrong,
              CAST(sum(CASE WHEN a_ok AND NOT b_ok THEN 1 ELSE 0 END)
                AS BIGINT) AS a_only,
              CAST(sum(CASE WHEN NOT a_ok AND b_ok THEN 1 ELSE 0 END)
                AS BIGINT) AS b_only
            FROM o GROUP BY source),
         c AS (SELECT *, CASE WHEN a_only + b_only > 0
              THEN CAST(floor((abs(a_only - b_only) - 1)
                * (abs(a_only - b_only) - 1) * 1000000
                / (a_only + b_only)) AS BIGINT)
              ELSE 0 END AS chi6 FROM a)
         SELECT source, n_tasks, both_right, both_wrong, a_only, b_only,
           CAST(chi6 AS DOUBLE)/1e6 AS chi2,
           chi6 > 3841458 AS significant,
           CASE WHEN chi6 > 3841458
             THEN CASE WHEN a_only > b_only THEN 'A' ELSE 'B' END
             ELSE 'tie' END AS winner
         FROM c ORDER BY source""",
    // q168's ratings replay, folded-integer majority argmax, per-rater
    // observed/chance agreement and kappa from the quantized terms
    "q185_rater_drift" ->
      """WITH r AS (SELECT item_id, g.rater,
              CASE WHEN (h + g.rater*17) % 10 < 3
                THEN (h % 4 + 1 + (h % 97 + g.rater) % 3) % 4
                ELSE h % 4 END AS cat
            FROM (SELECT doc_id AS item_id,
                    ((doc_id % 2147483648) * 2654435761) % 2147483647 AS h
                  FROM documents),
              (SELECT unnest(generate_series(0, 4)) AS rater) g),
         cnt AS (SELECT item_id, cat, count(*) AS c FROM r
                 GROUP BY item_id, cat),
         maj AS (SELECT item_id, arg_max(cat, c * 1000 - cat) AS maj
                 FROM cnt GROUP BY item_id),
         j AS (SELECT r.*, maj.maj FROM r JOIN maj USING (item_id)),
         ni AS (SELECT count(*) AS n FROM maj),
         pr AS (SELECT rater, count(*) AS n_items,
              CAST(sum(CASE WHEN cat = maj THEN 1 ELSE 0 END) AS BIGINT)
                AS n_agree
            FROM j GROUP BY rater),
         rm AS (SELECT rater, cat, count(*) AS rc FROM j GROUP BY rater, cat),
         mm AS (SELECT maj AS cat, count(*) AS mc FROM maj GROUP BY maj),
         pe AS (SELECT rater,
              CAST(floor(CAST(sum(rc * mc) AS BIGINT) * 1000000
                / (n.n * n.n)) AS BIGINT) AS pe6
            FROM rm JOIN mm USING (cat), ni n GROUP BY rater, n.n),
         po AS (SELECT pr.rater, pr.n_items, pr.n_agree,
              CAST(floor(n_agree * 1000000 / pr.n_items) AS BIGINT) AS po6,
              coalesce(pe6, 0) AS pe6
            FROM pr LEFT JOIN pe ON pe.rater = pr.rater)
         SELECT rater, n_items, n_agree,
           CAST(po6 AS DOUBLE)/1e6 AS p_agree,
           CAST(pe6 AS DOUBLE)/1e6 AS p_chance,
           CAST(CAST(floor((po6 - pe6) * 1000000 / (1000000 - pe6))
             AS BIGINT) AS DOUBLE)/1e6 AS kappa
         FROM po ORDER BY rater""",
    // pooled trials, then the Wilson chain written in the identical
    // operation order (z and z·z as the same parsed literals)
    "q182_wilson_ci" ->
      """WITH r AS (SELECT source, 4 + h % 9 AS n,
              (h % 997) % (4 + h % 9 + 1) AS c
            FROM (SELECT source,
                ((doc_id % 2147483648) * 2654435761) % 2147483647 AS h
              FROM documents)),
         a AS (SELECT source, CAST(sum(n) AS BIGINT) AS trials,
              CAST(sum(c) AS BIGINT) AS successes
            FROM r GROUP BY source),
         w AS (SELECT source, trials, successes,
              successes * 1.0 / trials AS p,
              trials * 1.0 AS nn
            FROM a)
         SELECT source, trials, successes,
           CAST(floor(p * 1000000) AS DOUBLE)/1e6 AS acc,
           CAST(floor((p + (1.96*1.96)/(nn*2)
               - 1.96 * sqrt(p*(1.0-p)/nn + (1.96*1.96)/(nn*nn*4)))
             / (1.0 + (1.96*1.96)/nn) * 1000000) AS DOUBLE)/1e6 AS ci_lo,
           CAST(floor((p + (1.96*1.96)/(nn*2)
               + 1.96 * sqrt(p*(1.0-p)/nn + (1.96*1.96)/(nn*nn*4)))
             / (1.0 + (1.96*1.96)/nn) * 1000000) AS DOUBLE)/1e6 AS ci_hi
         FROM w ORDER BY source""",
    // the same md5-seeded Poisson(1) inverse-CDF weights, replica
    // accuracies as floored millionths, rank-5/rank-195 percentiles
    "q183_bootstrap_ci" ->
      """WITH r AS (SELECT doc_id AS task_id, source, 4 + h % 9 AS n,
              (h % 997) % (4 + h % 9 + 1) AS c
            FROM (SELECT doc_id, source,
                ((doc_id % 2147483648) * 2654435761) % 2147483647 AS h
              FROM documents)),
         e AS (SELECT source, task_id, n, c, g.r
            FROM r, (SELECT unnest(generate_series(0, 199)) AS r) g),
         u AS (SELECT source, r, n, c,
              CASE
                WHEN u6 < 367879 THEN 0 WHEN u6 < 735758 THEN 1
                WHEN u6 < 919698 THEN 2 WHEN u6 < 981011 THEN 3
                WHEN u6 < 996340 THEN 4 WHEN u6 < 999405 THEN 5
                WHEN u6 < 999916 THEN 6 WHEN u6 < 999989 THEN 7
                ELSE 8 END AS w
            FROM (SELECT *,
                CAST('0x' || substr(md5(CAST(task_id AS VARCHAR) || '|boot|'
                  || CAST(r AS VARCHAR)), 1, 8) AS BIGINT) % 1000000 AS u6
              FROM e)),
         rep AS (SELECT source, r, CAST(sum(w * c) AS BIGINT) AS sr,
              CAST(sum(w * n) AS BIGINT) AS tr
            FROM u GROUP BY source, r HAVING sum(w * n) > 0),
         rk AS (SELECT source, r,
              CAST(floor(sr * 1000000 / tr) AS BIGINT) AS acc6,
              row_number() OVER (PARTITION BY source
                ORDER BY CAST(floor(sr * 1000000 / tr) AS BIGINT), r) AS rk
            FROM rep),
         pt AS (SELECT source,
              CAST(CAST(floor(sum(c) * 1000000 / sum(n)) AS BIGINT)
                AS DOUBLE)/1e6 AS acc
            FROM r GROUP BY source)
         SELECT pt.source, acc,
           lo.v AS boot_lo, hi.v AS boot_hi
         FROM pt
           JOIN (SELECT source, CAST(acc6 AS DOUBLE)/1e6 AS v FROM rk
                 WHERE rk = 5) lo ON lo.source = pt.source
           JOIN (SELECT source, CAST(acc6 AS DOUBLE)/1e6 AS v FROM rk
                 WHERE rk = 195) hi ON hi.source = pt.source
         ORDER BY pt.source""",
    // page fixture replay, the same dotall/lazy strip chain, group
    // extraction for anchors, tag strip + squeeze, link-density floor
    "q181_html_extract" ->
      """WITH d AS (SELECT doc_id,
              list_filter(string_split(text, ' '), x -> x <> '') AS w,
              ((doc_id % 2147483648) * 2654435761) % 2147483647 AS h
            FROM documents),
         b AS (SELECT doc_id,
              '<html><head><title>' || coalesce(array_to_string(w[1:2], ' '), '')
              || '</title><style>p{margin:0}</style><script>var a=1;</script></head><body>'
              || CASE WHEN h % 3 = 0
                   THEN '<script type="text/javascript">trackPage();</script>'
                   ELSE '' END
              || '<h1>' || coalesce(array_to_string(w[3:4], ' '), '') || '</h1>'
              || CASE WHEN h % 4 = 0
                   THEN '<!-- draft ' || coalesce(array_to_string(w[5:5], ' '), '') || ' -->'
                   ELSE '' END
              || '<ul><li><a href="/a">' || coalesce(array_to_string(w[6:6], ' '), '')
              || '</a></li><li><a href="/b">' || coalesce(array_to_string(w[7:7], ' '), '')
              || '</a></li></ul><div><p>' || coalesce(array_to_string(w[8:19], ' '), '')
              || ' <a href="/c">' || coalesce(array_to_string(w[20:21], ' '), '')
              || '</a> ' || coalesce(array_to_string(w[22:29], ' '), '')
              || '</p></div></body></html>' AS html
            FROM d),
         ns AS (SELECT doc_id, regexp_replace(html,
              '(?s)(<script[^>]*>.*?</script>|<style[^>]*>.*?</style>|<!--.*?-->)',
              '', 'g') AS t FROM b),
         x AS (SELECT doc_id,
              regexp_extract(t, '(?s)<title>(.*?)</title>', 1) AS title,
              trim(regexp_replace(regexp_replace(t, '<[^>]*>', ' ', 'g'),
                ' +', ' ', 'g')) AS xt,
              regexp_extract_all(t, '(?s)<a [^>]*>(.*?)</a>', 1) AS anchors
            FROM ns)
         SELECT doc_id, title,
           CAST(length(xt) AS BIGINT) AS text_len,
           CAST(len(list_filter(string_split(xt, ' '), q -> q <> ''))
             AS BIGINT) AS n_words,
           CAST(len(anchors) AS BIGINT) AS n_links,
           CASE WHEN length(xt) > 0 THEN
             CAST(floor(len(array_to_string(anchors, '')) * 1000000
               / length(xt)) AS DOUBLE)/1e6 ELSE 0.0 END AS link_density,
           md5(xt) AS extracted_md5
         FROM x ORDER BY doc_id""",
    // candidate-piece enumeration via lateral unnest, top-K ∪ chars,
    // micro-nat scores over the selected vocabulary's own mass
    "q179_unigram_vocab" ->
      """WITH w AS (SELECT unnest(list_filter(string_split(text, ' '),
              x -> x <> '')) AS word FROM documents),
         pos AS (SELECT word, unnest(generate_series(1, length(word))) AS p
                 FROM w),
         cand AS (SELECT substr(word, p, t.k) AS piece
            FROM pos, unnest(generate_series(1,
              least(4, length(word) - p + 1))) AS t(k)),
         cnts AS (SELECT piece, count(*) AS cnt FROM cand GROUP BY piece),
         top AS (SELECT piece, cnt FROM cnts
                 ORDER BY cnt DESC, piece LIMIT 512),
         chars AS (SELECT piece, cnt FROM cnts WHERE length(piece) = 1),
         sel AS (SELECT piece, CAST(max(cnt) AS BIGINT) AS cnt FROM
                  (SELECT * FROM top UNION ALL SELECT * FROM chars)
                 GROUP BY piece),
         tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS tot FROM sel)
         SELECT piece, cnt,
           CAST(floor(ln(cnt * 1.0 / tot) * 1000000) AS BIGINT) AS score6
         FROM sel, tot ORDER BY piece""",
    // exact-by-construction: the incremental index's oracle IS brute
    // force, identical to q30's shape
    "q105_vector_index" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                    FROM embeddings),
         q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < 5),
         scored AS (SELECT q_id, vec_id,
              round(list_cosine_similarity(qv, v), 4) AS cos_sim
            FROM q JOIN e ON vec_id <> q_id),
         ranked AS (SELECT *, row_number() OVER (PARTITION BY q_id
              ORDER BY cos_sim DESC, vec_id) AS rn FROM scored)
         SELECT q_id, vec_id AS neighbor_id, CAST(rn AS BIGINT) AS rank, cos_sim
         FROM ranked WHERE rn <= 10 ORDER BY q_id, rank""",
    "q104_incremental_dedup" -> incrementalDedupSql,
    "q116_incremental_split" -> incrementalSplitSql,
    // RRF fusion replayed end-to-end: the same corpus-true BM25 (df over
    // all docs holding a query term, floored 1e-3), the same rounded
    // cosine ranking, per-side top-1000 cuts, then 1/(60+rank) summed
    // over a full outer join of the two candidate lists (integer ranks →
    // the double sums are bit-identical cross-engine, floored 1e-6)
    "q109_hybrid_retrieval" ->
      """WITH docs AS (SELECT doc_id,
              list_filter(string_split(text,' '), x -> x <> '') AS w
            FROM documents),
         stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs,
              avg(CAST(len(w) AS DOUBLE)) AS avgdl FROM docs),
         toks AS (SELECT doc_id, CAST(len(w) AS DOUBLE) AS dl,
              unnest(w) AS token FROM docs),
         qterms AS (SELECT DISTINCT doc_id AS q_id, token FROM toks
            WHERE doc_id IN (0, 1, 2)),
         tf AS (SELECT doc_id, token, CAST(count(*) AS DOUBLE) AS tf,
              max(dl) AS dl FROM toks
            WHERE token IN (SELECT DISTINCT token FROM qterms)
            GROUP BY doc_id, token),
         dft AS (SELECT token, CAST(count(*) AS DOUBLE) AS df
            FROM tf GROUP BY token),
         lex AS (SELECT q.q_id, t.doc_id,
              floor(sum(ln((n_docs - df + 0.5)/(df + 0.5) + 1.0) * tf * 2.2 /
                (tf + 1.2*(0.25 + 0.75*dl/avgdl)))*1000)/1000 AS lex_score
            FROM tf t JOIN qterms q USING (token) JOIN dft USING (token), stats
            WHERE t.doc_id <> q.q_id GROUP BY q.q_id, t.doc_id),
         lexr AS (SELECT q_id, doc_id, lex_rank FROM (
              SELECT *, row_number() OVER (PARTITION BY q_id
                ORDER BY lex_score DESC, doc_id) AS lex_rank FROM lex)
            WHERE lex_rank <= 1000),
         e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         qv AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id IN (0, 1, 2)),
         dense AS (SELECT q_id, vec_id AS doc_id,
              round(list_cosine_similarity(qv, v), 4) AS cos_sim
            FROM qv JOIN e ON vec_id <> q_id),
         denser AS (SELECT q_id, doc_id, dense_rank FROM (
              SELECT *, row_number() OVER (PARTITION BY q_id
                ORDER BY cos_sim DESC, doc_id) AS dense_rank FROM dense)
            WHERE dense_rank <= 1000),
         fused AS (SELECT coalesce(l.q_id, d.q_id) AS q_id,
              coalesce(l.doc_id, d.doc_id) AS doc_id,
              CAST(l.lex_rank AS BIGINT) AS lex_rank,
              CAST(d.dense_rank AS BIGINT) AS dense_rank,
              floor((coalesce(1.0/(60 + l.lex_rank), 0) +
                     coalesce(1.0/(60 + d.dense_rank), 0))*1e6)/1e6 AS rrf_score
            FROM lexr l FULL JOIN denser d
              ON l.q_id = d.q_id AND l.doc_id = d.doc_id)
         SELECT q_id, doc_id, lex_rank, dense_rank, rrf_score,
           CAST(rank AS BIGINT) AS rank FROM (
             SELECT *, row_number() OVER (PARTITION BY q_id
               ORDER BY rrf_score DESC, doc_id) AS rank FROM fused)
         WHERE rank <= 10 ORDER BY q_id, rank""",
    // content-defined chunking replayed position-by-position: the same
    // trailing-window portable hash (md5-prefix, as q101) decides the
    // same boundaries, then chunks assemble from the boundary list
    "q108_content_chunks" ->
      """WITH docs AS (SELECT doc_id,
              list_filter(string_split(text,' '), x -> x <> '') AS w
            FROM documents),
         based AS (SELECT doc_id, w, len(w) AS n FROM docs WHERE len(w) > 0),
         bl AS (SELECT doc_id, w, n,
              list_filter(generate_series(1, greatest(n - 1, 1)),
                i -> i <= n - 1 AND
                  CAST('0x' || substring(md5(array_to_string(
                    w[greatest(i - 2, 1):i], ' ')), 1, 8) AS BIGINT) % 8 = 0)
                AS bounds
            FROM based),
         se AS (SELECT doc_id, w,
              list_prepend(1, list_transform(bounds, b -> b + 1)) AS starts,
              list_append(bounds, n) AS ends
            FROM bl),
         chunks AS (SELECT doc_id, w, starts, ends,
              unnest(generate_series(1, len(starts))) AS i
            FROM se)
         SELECT doc_id, CAST(i - 1 AS BIGINT) AS chunk_ord,
           CAST(starts[i] AS BIGINT) AS start_tok,
           CAST(ends[i] - starts[i] + 1 AS BIGINT) AS n_toks,
           md5(array_to_string(w[starts[i]:ends[i]], ' ')) AS chunk_md5
         FROM chunks ORDER BY doc_id, chunk_ord""",
    // concat-and-cut sequence packing replayed with a single global-order
    // window (fine at oracle scale; the engine uses the range-bucketed
    // prefix sum) + the same row-local span arithmetic and token-slice md5
    "q107_pack_sequences" ->
      """WITH docs AS (SELECT doc_id,
              list_filter(string_split(text,' '), x -> x <> '') AS w
            FROM documents),
         counted AS (SELECT doc_id, w, CAST(len(w) AS BIGINT) AS n
            FROM docs WHERE len(w) > 0),
         placed AS (SELECT doc_id, w, n,
              CAST(sum(n) OVER (ORDER BY doc_id
                ROWS UNBOUNDED PRECEDING) - n AS BIGINT) AS gstart
            FROM counted),
         spans AS (SELECT doc_id, w, n, gstart,
              unnest(generate_series(gstart // 256, (gstart + n - 1) // 256))
                AS seq_id
            FROM placed),
         fields AS (SELECT seq_id, doc_id, w,
              greatest(seq_id * 256 - gstart, 0) AS doc_start,
              greatest(gstart - seq_id * 256, 0) AS seq_off,
              least((seq_id + 1) * 256, gstart + n)
                - greatest(seq_id * 256, gstart) AS seg_len
            FROM spans)
         SELECT CAST(seq_id AS BIGINT) AS seq_id, doc_id,
           CAST(doc_start AS BIGINT) AS doc_start,
           CAST(seq_off AS BIGINT) AS seq_off,
           CAST(seg_len AS BIGINT) AS seg_len,
           md5(array_to_string(
             w[CAST(doc_start + 1 AS INT):CAST(doc_start + seg_len AS INT)],
             ' ')) AS seg_md5
         FROM fields ORDER BY seq_id, doc_id""",
    // CCNet line-level policy replayed with a window: first occurrence
    // per segment key ordered by (doc_id, seg_ord) is the keeper; the
    // reassembled text is the ordered string_agg of kept segments
    "q106_line_dedup" ->
      """WITH docs AS (SELECT doc_id,
              list_filter(string_split(text,' '), x -> x <> '') AS w
            FROM documents),
         segs AS (SELECT doc_id,
              CAST((start - 1) // 12 AS BIGINT) AS seg_ord,
              array_to_string(w[start:start+11], ' ') AS seg
            FROM (SELECT doc_id, w,
                    unnest(generate_series(1, greatest(len(w), 1), 12)) AS start
                  FROM docs) t),
         keyed AS (SELECT doc_id, seg_ord, seg,
              row_number() OVER (PARTITION BY md5(seg)
                ORDER BY doc_id, seg_ord) AS rn
            FROM segs)
         SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_segs,
           CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           md5(coalesce(string_agg(CASE WHEN rn = 1 THEN seg END, ' '
             ORDER BY seg_ord), '')) AS kept_md5
         FROM keyed GROUP BY doc_id ORDER BY doc_id""",
    "q101_minhash_portable" -> minhashPortableSql,
    "q110_edit_verified_dups" -> editVerifiedSql,
    // per-source quality quota: the q32 quality formula ranked per source
    "q111_source_quota" ->
      s"""WITH $qualityCte
         SELECT source, doc_id, quality_score,
           CAST(src_rank AS BIGINT) AS src_rank FROM (
             SELECT *, row_number() OVER (PARTITION BY source
               ORDER BY quality_score DESC, doc_id) AS src_rank FROM q)
         WHERE src_rank <= 50 ORDER BY source, src_rank""",
    // global token-budget fill: one global-order running sum (fine at
    // oracle scale; the engine uses composite (quality, id-range) buckets)
    "q112_token_budget" ->
      s"""WITH $qualityCte
         SELECT doc_id, quality_score, CAST(nw AS BIGINT) AS n_toks,
           cum_toks FROM (
             SELECT doc_id, quality_score, nw,
               CAST(sum(nw) OVER (ORDER BY quality_score DESC, doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS cum_toks FROM q)
         WHERE cum_toks <= 20000 ORDER BY doc_id""",
    // the q26 pair chain + the q56 per-doc split on both members,
    // filtered to pairs whose members landed in different splits
    "q115_split_leakage" ->
      """WITH docs AS (SELECT doc_id,
              list_filter(string_split(text,' '), x -> x <> '') AS w
            FROM documents),
         sh AS (SELECT DISTINCT doc_id, s FROM (
            SELECT doc_id, unnest(CASE WHEN len(w) >= 3
              THEN list_transform(generate_series(1, len(w)-2),
                   i -> array_to_string(w[i:i+2], ' '))
              ELSE [array_to_string(w, ' ')] END) AS s
            FROM docs) t),
         sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         cm AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS c
            FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
            GROUP BY 1, 2),
         pairs AS (SELECT da AS doc_a, db AS doc_b,
                floor(1.0*c/(sa.n + sb.n - c)*10000)/10000 AS jaccard
            FROM cm JOIN sizes sa ON da = sa.doc_id
                    JOIN sizes sb ON db = sb.doc_id
            WHERE floor(1.0*c/(sa.n + sb.n - c)*10000)/10000 >= 0.8),
         sp AS (SELECT doc_id,
            CASE WHEN ((doc_id % 2147483648) * 2654435761) % 2147483647 % 100 < 80 THEN 'train'
                 WHEN ((doc_id % 2147483648) * 2654435761) % 2147483647 % 100 < 90 THEN 'val'
                 ELSE 'test' END AS split FROM documents)
         SELECT p.doc_a, p.doc_b, a.split AS split_a, b.split AS split_b,
                p.jaccard
         FROM pairs p JOIN sp a ON p.doc_a = a.doc_id
                      JOIN sp b ON p.doc_b = b.doc_id
         WHERE a.split <> b.split ORDER BY doc_a, doc_b""",
    // the q72 rule battery + exact-dup window + lang/quality/pii gates,
    // composed into one per-document audit with first-failing-gate
    "q114_curation_report" ->
      """WITH base AS (SELECT doc_id, lang, text, length(text) AS nc,
              list_filter(string_split(text,' '), x -> x <> '') AS w
            FROM documents),
         m AS (SELECT doc_id, lang, text, nc, len(w) AS nw,
              floor(1.0*length(replace(text,' ',''))/len(w)*10000)/10000 AS awl,
              floor((1.0 - 1.0*len(list_distinct(w))/len(w))*10000)/10000 AS dupf,
              floor(1.0*length(regexp_replace(text,'[^0-9]','','g'))/nc*10000)/10000 AS digr,
              floor(1.0*len(list_filter(w, x -> list_contains(
                ['the','a','of','and','to','in','is','on','for','with'], x)))/len(w)*10000)/10000 AS stopr,
              length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS np,
              len(list_filter(w, x -> x IN ('the','a','of','and','to','in','is','on','for','with'))) AS ns,
              min(doc_id) OVER (PARTITION BY md5(text)) AS keeper
            FROM base),
         g AS (SELECT doc_id,
              (keeper = doc_id) AS ge,
              (lang IN ('en','de','fr','es','ja')) AS gl,
              (nw >= 20 AND nw <= 100000 AND awl >= 3.0 AND awl <= 10.0
                AND stopr > 0 AND dupf <= 0.6 AND digr <= 0.1) AS gg,
              (floor((0.4*least(1.0, nw/50.0) + 0.3*(1.0 - np*1.0/nc)
                     + 0.3*least(1.0, ns*1.0/nw*5.0))*10000)/10000 >= 0.5) AS gq,
              (len(regexp_extract_all(text,
                '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) = 0) AS gp
            FROM m)
         SELECT doc_id,
           CAST(ge AS BIGINT) AS gate_exact, CAST(gl AS BIGINT) AS gate_lang,
           CAST(gg AS BIGINT) AS gate_gopher, CAST(gq AS BIGINT) AS gate_quality,
           CAST(gp AS BIGINT) AS gate_pii,
           CAST(ge AND gl AND gg AND gq AND gp AS BIGINT) AS keep,
           coalesce(CASE WHEN NOT ge THEN 'exact_dup' END,
                    CASE WHEN NOT gl THEN 'lang' END,
                    CASE WHEN NOT gg THEN 'gopher' END,
                    CASE WHEN NOT gq THEN 'quality' END,
                    CASE WHEN NOT gp THEN 'pii' END, '') AS first_fail
         FROM g ORDER BY doc_id""",
    // cluster-level split: the q64 component chain, then the q56 hash on
    // the cluster representative (singletons fall back to their own id)
    "q113_leak_safe_split" ->
      """WITH RECURSIVE
         docs AS (SELECT doc_id,
              list_filter(string_split(text,' '), x -> x <> '') AS w
            FROM documents),
         sh AS (SELECT DISTINCT doc_id, s FROM (
            SELECT doc_id, unnest(CASE WHEN len(w) >= 3
              THEN list_transform(generate_series(1, len(w)-2),
                   i -> array_to_string(w[i:i+2], ' '))
              ELSE [array_to_string(w, ' ')] END) AS s
            FROM docs) t),
         sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         cm AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS c
            FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
            GROUP BY 1, 2),
         pairs AS (SELECT da, db
            FROM cm JOIN sizes sa ON da = sa.doc_id
                    JOIN sizes sb ON db = sb.doc_id
            WHERE floor(1.0*c/(sa.n + sb.n - c)*10000)/10000 >= 0.8),
         edges AS (SELECT da AS a, db AS b FROM pairs
                   UNION SELECT db, da FROM pairs),
         reach(a, b) AS (SELECT a, b FROM edges
                   UNION SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
         clus AS (SELECT n.a AS doc_id, least(n.a, min(r.b)) AS cluster
            FROM (SELECT DISTINCT a FROM edges) n JOIN reach r ON r.a = n.a
            GROUP BY n.a)
         SELECT d.doc_id,
           CAST(coalesce(c.cluster, d.doc_id) AS BIGINT) AS cluster,
           CASE WHEN ((coalesce(c.cluster, d.doc_id) % 2147483648)
                      * 2654435761) % 2147483647 % 100 < 80 THEN 'train'
                WHEN ((coalesce(c.cluster, d.doc_id) % 2147483648)
                      * 2654435761) % 2147483647 % 100 < 90 THEN 'val'
                ELSE 'test' END AS split
         FROM documents d LEFT JOIN clus c ON d.doc_id = c.doc_id
         ORDER BY d.doc_id""",
    // the q88 skeleton with the HAVING bound raised from 2 to the
    // df-threshold ceil(0.006·N), N computed from the same table
    "q120_boilerplate_removal" ->
      """WITH d AS (SELECT doc_id,
              list_filter(string_split(text,' '), x -> x <> '') AS w
            FROM documents),
         dm AS (SELECT doc_id, w, len(w) AS len FROM d),
         st AS (SELECT doc_id, len, w,
              unnest(generate_series(1, greatest(len-7, 1))) AS i FROM dm),
         sp AS (SELECT doc_id, len, i,
              array_to_string(w[i:i+7], ' ') AS s FROM st),
         thr AS (SELECT greatest(2, CAST(ceil(0.006*count(*)) AS BIGINT)) AS m
              FROM documents),
         hot AS (SELECT s FROM sp, thr GROUP BY s, m
              HAVING count(DISTINCT doc_id) >= m),
         cov AS (SELECT DISTINCT doc_id, j FROM (
              SELECT doc_id, unnest(generate_series(i, least(i+7, len))) AS j
              FROM sp WHERE s IN (SELECT s FROM hot)) u),
         tp AS (SELECT doc_id, j, w[j] AS tok FROM (
              SELECT doc_id, w, unnest(generate_series(1, len)) AS j
              FROM dm WHERE len > 0) t),
         kept AS (SELECT tp.doc_id, CAST(count(*) AS BIGINT) AS n_kept,
              md5(string_agg(tok, ' ' ORDER BY j)) AS clean_md5
            FROM tp WHERE NOT EXISTS (SELECT 1 FROM cov
              WHERE cov.doc_id = tp.doc_id AND cov.j = tp.j)
            GROUP BY tp.doc_id)
         SELECT dm.doc_id, CAST(len AS BIGINT) AS n_tokens,
           CAST(len - coalesce(n_kept, 0) AS BIGINT) AS n_removed,
           coalesce(clean_md5, md5('')) AS clean_md5
         FROM dm LEFT JOIN kept ON dm.doc_id = kept.doc_id
         ORDER BY dm.doc_id""",
    // the q88 skeleton with the dup-hash set replaced by the benchmark
    // slice's distinct n-grams; corpus side excluded from the benchmark
    "q118_decontam_spans" ->
      """WITH d AS (SELECT doc_id,
              list_filter(string_split(text,' '), x -> x <> '') AS w
            FROM documents WHERE doc_id % 20 <> 0),
         dm AS (SELECT doc_id, w, len(w) AS len FROM d),
         st AS (SELECT doc_id, len, w,
              unnest(generate_series(1, greatest(len-7, 1))) AS i FROM dm),
         sp AS (SELECT doc_id, len, i,
              array_to_string(w[i:i+7], ' ') AS s FROM st),
         b AS (SELECT list_filter(string_split(text,' '), x -> x <> '') AS bw
            FROM documents WHERE doc_id % 20 = 0),
         bs AS (SELECT DISTINCT array_to_string(bw[i:i+7], ' ') AS s FROM (
              SELECT bw, unnest(generate_series(1, greatest(len(bw)-7, 1))) AS i
              FROM b) t),
         cov AS (SELECT DISTINCT doc_id, j FROM (
              SELECT doc_id, unnest(generate_series(i, least(i+7, len))) AS j
              FROM sp WHERE s IN (SELECT s FROM bs)) u),
         tp AS (SELECT doc_id, j, w[j] AS tok FROM (
              SELECT doc_id, w, unnest(generate_series(1, len)) AS j
              FROM dm WHERE len > 0) t),
         kept AS (SELECT tp.doc_id, CAST(count(*) AS BIGINT) AS n_kept,
              md5(string_agg(tok, ' ' ORDER BY j)) AS clean_md5
            FROM tp WHERE NOT EXISTS (SELECT 1 FROM cov
              WHERE cov.doc_id = tp.doc_id AND cov.j = tp.j)
            GROUP BY tp.doc_id)
         SELECT dm.doc_id, CAST(len AS BIGINT) AS n_tokens,
           CAST(len - coalesce(n_kept, 0) AS BIGINT) AS n_removed,
           coalesce(clean_md5, md5('')) AS clean_md5
         FROM dm LEFT JOIN kept ON dm.doc_id = kept.doc_id
         ORDER BY dm.doc_id""",
    // per-source floors (running sum per source), floor spend subtracted
    // from the global budget, complement filled by one global running sum
    "q117_fair_budget" ->
      s"""WITH $qualityCte,
         fl AS (SELECT doc_id, source, quality_score, nw,
              sum(nw) OVER (PARTITION BY source
                ORDER BY quality_score DESC, doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS src_cum
            FROM q),
         floor_set AS (SELECT doc_id, source, quality_score, nw
            FROM fl WHERE src_cum <= 500),
         spent AS (SELECT coalesce(sum(nw), 0) AS s FROM floor_set),
         rest AS (SELECT doc_id, source, quality_score, nw FROM q
            WHERE doc_id NOT IN (SELECT doc_id FROM floor_set)),
         fill AS (SELECT doc_id, source, quality_score, nw FROM (
              SELECT r.*, sum(nw) OVER (ORDER BY quality_score DESC, doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
              FROM rest r), spent
            WHERE cum <= 20000 - spent.s)
         SELECT doc_id, source, quality_score,
           CAST(nw AS BIGINT) AS n_toks, via FROM (
             SELECT *, 'floor' AS via FROM floor_set
             UNION ALL SELECT *, 'fill' AS via FROM fill)
         ORDER BY doc_id""",
    "q102_simhash_portable" -> simhashPortableSql,
    "q31_ann_lsh" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                     FROM embeddings),
         b AS (SELECT vec_id, v, ($lshBucketSql) AS bucket FROM e),
         q AS (SELECT vec_id AS q_id, v AS qv, bucket AS qb
               FROM b WHERE vec_id < 5),
         probes AS (SELECT q_id, qv, unnest($lshProbesSql) AS bucket FROM q),
         cand AS (SELECT DISTINCT p.q_id, p.qv, c.vec_id, c.v
                  FROM probes p JOIN b c USING (bucket)
                  WHERE c.vec_id <> p.q_id),
         scored AS (SELECT q_id, vec_id,
                      round(list_cosine_similarity(qv, v), 4) AS cos_sim
                    FROM cand),
         ranked AS (SELECT q_id, vec_id, cos_sim, row_number() OVER (
                      PARTITION BY q_id ORDER BY cos_sim DESC, vec_id) AS rn
                    FROM scored)
         SELECT q_id, vec_id AS neighbor_id, CAST(rn AS BIGINT) AS rank, cos_sim
         FROM ranked WHERE rn <= 10 ORDER BY q_id, rank""",
    // exact-by-construction IVF: the two-phase angular bound guarantees
    // brute-force-identical output, so the oracle IS brute force (no need
    // to replicate Lloyd iterations in SQL)
    "q59_ann_ivf" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                    FROM embeddings),
         q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < 5),
         scored AS (SELECT q_id, vec_id,
              round(list_cosine_similarity(qv, v), 4) AS cos_sim
            FROM q JOIN e ON vec_id <> q_id),
         ranked AS (SELECT *, row_number() OVER (PARTITION BY q_id
              ORDER BY cos_sim DESC, vec_id) AS rn FROM scored)
         SELECT q_id, vec_id AS neighbor_id, CAST(rn AS BIGINT) AS rank, cos_sim
         FROM ranked WHERE rn <= 10 ORDER BY q_id, rank""",
    "q37_multimodal_features" ->
      """WITH m AS (SELECT doc_id,
             ['image','audio','video'][CAST(doc_id % 3 AS INT) + 1] AS media_type,
             hex(encode(text)) AS hx,
             CAST(octet_length(encode(text)) AS BIGINT) AS n
           FROM documents),
         s AS (SELECT doc_id, media_type, n,
             list_aggregate(list_transform(generate_series(1, CAST(n AS INT)),
               i -> CAST(('0x' || substr(hx, 2*i-1, 2)) AS BIGINT)), 'sum') AS bsum
           FROM m)
         SELECT doc_id, media_type, n AS byte_len,
           CAST(64 + (n % 577) AS BIGINT) AS width,
           CAST(64 + ((n * 31) % 421) AS BIGINT) AS height,
           floor(bsum * 1.0 / n * 10000) / 10000 AS brightness
         FROM s ORDER BY doc_id""",
    "q25_dedup_exact" ->
      """SELECT min(doc_id) AS keep_id, count(*) AS copies
         FROM documents GROUP BY text ORDER BY keep_id""",
    "q26_dedup_jaccard" ->
      """WITH docs AS (SELECT doc_id,
              list_filter(string_split(text,' '), x -> x <> '') AS w
            FROM documents),
         sh AS (SELECT DISTINCT doc_id, s FROM (
            SELECT doc_id, unnest(CASE WHEN len(w) >= 3
              THEN list_transform(generate_series(1, len(w)-2),
                   i -> array_to_string(w[i:i+2], ' '))
              ELSE [array_to_string(w, ' ')] END) AS s
            FROM docs) t),
         sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         pairs AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS c
            FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
            GROUP BY 1, 2)
         SELECT da AS doc_a, db AS doc_b,
                floor(1.0*c/(sa.n + sb.n - c)*10000)/10000 AS jaccard
         FROM pairs JOIN sizes sa ON da = sa.doc_id
                    JOIN sizes sb ON db = sb.doc_id
         WHERE floor(1.0*c/(sa.n + sb.n - c)*10000)/10000 >= 0.8
         ORDER BY doc_a, doc_b""",
    "q64_dedup_clusters" ->
      """WITH RECURSIVE
         docs AS (SELECT doc_id,
              list_filter(string_split(text,' '), x -> x <> '') AS w
            FROM documents),
         sh AS (SELECT DISTINCT doc_id, s FROM (
            SELECT doc_id, unnest(CASE WHEN len(w) >= 3
              THEN list_transform(generate_series(1, len(w)-2),
                   i -> array_to_string(w[i:i+2], ' '))
              ELSE [array_to_string(w, ' ')] END) AS s
            FROM docs) t),
         sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         cm AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS c
            FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
            GROUP BY 1, 2),
         pairs AS (SELECT da, db
            FROM cm JOIN sizes sa ON da = sa.doc_id
                    JOIN sizes sb ON db = sb.doc_id
            WHERE floor(1.0*c/(sa.n + sb.n - c)*10000)/10000 >= 0.8),
         edges AS (SELECT da AS a, db AS b FROM pairs
                   UNION SELECT db, da FROM pairs),
         reach(a, b) AS (SELECT a, b FROM edges
                   UNION SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a)
         SELECT n.a AS doc_id, CAST(least(n.a, min(r.b)) AS BIGINT) AS cluster
         FROM (SELECT DISTINCT a FROM edges) n JOIN reach r ON r.a = n.a
         GROUP BY n.a ORDER BY doc_id""",
    "q29_embed_neardup" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                    FROM embeddings)
         SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
                round(list_cosine_similarity(a.v, b.v), 4) AS cos_sim
         FROM e a JOIN e b ON a.vec_id < b.vec_id
         WHERE round(list_cosine_similarity(a.v, b.v), 4) >= 0.45
         ORDER BY vec_a, vec_b""",
    "q30_ann_bruteforce" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                    FROM embeddings),
         q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < 5),
         scored AS (SELECT q_id, vec_id,
              round(list_cosine_similarity(qv, v), 4) AS cos_sim
            FROM q JOIN e ON vec_id <> q_id),
         ranked AS (SELECT *, row_number() OVER (PARTITION BY q_id
              ORDER BY cos_sim DESC, vec_id) AS rn FROM scored)
         SELECT q_id, vec_id AS neighbor_id, CAST(rn AS BIGINT) AS rank, cos_sim
         FROM ranked WHERE rn <= 10 ORDER BY q_id, rank""",
    "q32_text_quality" ->
      """WITH t AS (SELECT doc_id, text, length(text) AS nc,
              len(list_filter(string_split(text,' '), x -> x <> '')) AS nw,
              length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS np,
              length(regexp_replace(text, '[^0-9]', '', 'g')) AS nd,
              len(list_filter(string_split(text,' '),
                  x -> x IN ('the','a','of','and','to','in','is','on','for','with'))) AS ns
            FROM documents)
         SELECT doc_id, CAST(nc AS BIGINT) AS n_chars, CAST(nw AS BIGINT) AS n_words,
           floor(length(replace(text,' ',''))*1.0/nw*10000)/10000 AS avg_word_len,
           floor(np*1.0/nc*10000)/10000 AS punct_ratio,
           floor(nd*1.0/nc*10000)/10000 AS digit_ratio,
           floor(ns*1.0/nw*10000)/10000 AS stopword_ratio,
           floor((0.4*least(1.0, nw/50.0) + 0.3*(1.0 - np*1.0/nc)
                 + 0.3*least(1.0, ns*1.0/nw*5.0))*10000)/10000 AS quality_score
         FROM t ORDER BY doc_id""",
    "q33_text_langid" ->
      s"""WITH t AS (SELECT lang,
              list_filter(string_split(lower(text),' '), x -> x <> '') AS toks
            FROM documents),
         s AS (SELECT lang, $langScores FROM t),
         g AS (SELECT lang, greatest(s_en, s_es, s_fr, s_de, s_zh) AS best, *
               FROM s)
         SELECT lang, $langCase AS lang_id, count(*) AS cnt
         FROM g GROUP BY 1, 2 ORDER BY lang, lang_id""",
    "q34_text_tokens" ->
      """SELECT doc_id,
           CAST(len(list_filter(string_split(text,' '), x -> x <> '')) AS BIGINT) AS n_ws,
           CAST(len(regexp_extract_all(text,
             '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\r\f\x0B]')) AS BIGINT) AS n_bpe
         FROM documents ORDER BY doc_id""",
    "q35_text_fingerprint" ->
      """SELECT doc_id, CAST(list_reduce(
           list_prepend(CAST(0 AS BIGINT),
             list_transform(generate_series(1, length(text)),
               i -> CAST(ord(substr(text, i, 1)) AS BIGINT))),
           (a, x) -> (a*31 + x) % 2147483647) AS BIGINT) AS fp
         FROM documents ORDER BY doc_id""",
    "q49_normalize" ->
      """SELECT doc_id,
           md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS norm_md5,
           CAST(length(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS BIGINT) AS norm_len
         FROM documents ORDER BY doc_id""",
    "q50_vocab_top" ->
      """SELECT token, count(*) AS freq FROM (
           SELECT unnest(list_filter(string_split(text,' '), x -> x <> '')) AS token
           FROM documents) t
         GROUP BY token ORDER BY freq DESC, token LIMIT 20""",
    "q51_bigrams_top" ->
      """WITH docs AS (SELECT list_filter(string_split(text,' '), x -> x <> '') AS w
                       FROM documents)
         SELECT bigram, count(*) AS freq FROM (
           SELECT unnest(CASE WHEN len(w) >= 2
             THEN list_transform(generate_series(1, len(w)-1),
                  i -> array_to_string(w[i:i+1], ' '))
             ELSE [] END) AS bigram
           FROM docs) t
         GROUP BY bigram ORDER BY freq DESC, bigram LIMIT 20""",
    "q52_contamination" ->
      """WITH docs AS (SELECT doc_id,
              list_filter(string_split(text,' '), x -> x <> '') AS w
            FROM documents),
         sh AS (SELECT DISTINCT doc_id, s FROM (
            SELECT doc_id, unnest(CASE WHEN len(w) >= 8
              THEN list_transform(generate_series(1, len(w)-7),
                   i -> array_to_string(w[i:i+7], ' '))
              ELSE [array_to_string(w, ' ')] END) AS s
            FROM docs) t),
         bench AS (SELECT DISTINCT s FROM sh WHERE doc_id < 10),
         corpus AS (SELECT doc_id, s FROM sh WHERE doc_id >= 10)
         SELECT doc_id, count(*) AS n_shared_ngrams
         FROM corpus WHERE s IN (SELECT s FROM bench)
         GROUP BY doc_id ORDER BY doc_id""",
    // q52's shingle parity, aggregated on the BENCH side: per benchmark
    // doc, distinct grams + how many appear anywhere in the corpus slice
    "q119_benchmark_exposure" ->
      """WITH docs AS (SELECT doc_id,
              list_filter(string_split(text,' '), x -> x <> '') AS w
            FROM documents),
         sh AS (SELECT DISTINCT doc_id, s FROM (
            SELECT doc_id, unnest(CASE WHEN len(w) >= 8
              THEN list_transform(generate_series(1, len(w)-7),
                   i -> array_to_string(w[i:i+7], ' '))
              ELSE [array_to_string(w, ' ')] END) AS s
            FROM docs) t),
         bench AS (SELECT doc_id, s FROM sh WHERE doc_id < 10),
         corpus AS (SELECT DISTINCT s FROM sh WHERE doc_id >= 10)
         SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
           CAST(sum(CASE WHEN s IN (SELECT s FROM corpus)
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_exposed,
           floor(1.0*sum(CASE WHEN s IN (SELECT s FROM corpus)
                    THEN 1 ELSE 0 END)/count(*)*10000)/10000 AS exposure_frac
         FROM bench GROUP BY doc_id ORDER BY doc_id""",
    "q69_dup_spans" ->
      """WITH docs AS (SELECT doc_id,
              list_filter(string_split(text,' '), x -> x <> '') AS w
            FROM documents),
         sh AS (SELECT DISTINCT doc_id, s FROM (
            SELECT doc_id, unnest(CASE WHEN len(w) >= 8
              THEN list_transform(generate_series(1, len(w)-7),
                   i -> array_to_string(w[i:i+7], ' '))
              ELSE [array_to_string(w, ' ')] END) AS s
            FROM docs) t),
         c AS (SELECT s, count(*) AS ndocs FROM sh GROUP BY s)
         SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
           CAST(sum(CASE WHEN ndocs > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_spans,
           floor(1.0*sum(CASE WHEN ndocs > 1 THEN 1 ELSE 0 END)/count(*)*10000)/10000 AS dup_frac
         FROM sh JOIN c USING (s)
         GROUP BY doc_id ORDER BY doc_id""",
    "q88_span_removal" ->
      """WITH d AS (SELECT doc_id,
              list_filter(string_split(text,' '), x -> x <> '') AS w
            FROM documents),
         dm AS (SELECT doc_id, w, len(w) AS len FROM d),
         st AS (SELECT doc_id, len, w,
              unnest(generate_series(1, greatest(len-7, 1))) AS i FROM dm),
         sp AS (SELECT doc_id, len, i,
              array_to_string(w[i:i+7], ' ') AS s FROM st),
         dup AS (SELECT s FROM sp GROUP BY s
              HAVING count(DISTINCT doc_id) > 1),
         cov AS (SELECT DISTINCT doc_id, j FROM (
              SELECT doc_id, unnest(generate_series(i, least(i+7, len))) AS j
              FROM sp WHERE s IN (SELECT s FROM dup)) u),
         tp AS (SELECT doc_id, j, w[j] AS tok FROM (
              SELECT doc_id, w, unnest(generate_series(1, len)) AS j
              FROM dm WHERE len > 0) t),
         kept AS (SELECT tp.doc_id, CAST(count(*) AS BIGINT) AS n_kept,
              md5(string_agg(tok, ' ' ORDER BY j)) AS clean_md5
            FROM tp WHERE NOT EXISTS (SELECT 1 FROM cov
              WHERE cov.doc_id = tp.doc_id AND cov.j = tp.j)
            GROUP BY tp.doc_id)
         SELECT dm.doc_id, CAST(len AS BIGINT) AS n_tokens,
           CAST(len - coalesce(n_kept, 0) AS BIGINT) AS n_removed,
           coalesce(clean_md5, md5('')) AS clean_md5
         FROM dm LEFT JOIN kept ON dm.doc_id = kept.doc_id
         ORDER BY dm.doc_id""",
    "q70_lm_score" ->
      """WITH toks AS (SELECT doc_id,
              unnest(list_filter(string_split(text,' '), x -> x <> '')) AS token
            FROM documents),
         v AS (SELECT token, count(*) AS freq FROM toks GROUP BY token),
         t AS (SELECT CAST(sum(freq) AS DOUBLE) AS total FROM v)
         SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
           floor(-sum(ln(freq/total))/count(*)*1000)/1000 AS xent
         FROM toks JOIN v USING (token), t
         GROUP BY doc_id ORDER BY doc_id""",
    "q74_doc_chunks" ->
      """WITH d AS (SELECT doc_id,
              list_filter(string_split(text,' '), x -> x <> '') AS w
            FROM documents),
         c AS (SELECT doc_id, w,
              unnest(generate_series(1, greatest(len(w), 1), 24)) AS start
            FROM d)
         SELECT doc_id,
           CAST(floor((start-1)/24.0) AS BIGINT) AS chunk_ord,
           CAST(start AS BIGINT) AS start_tok,
           CAST(len(w[start:start+31]) AS BIGINT) AS chunk_tokens,
           md5(array_to_string(w[start:start+31], ' ')) AS chunk_md5
         FROM c ORDER BY doc_id, chunk_ord""",
    "q89_kmeans" -> kmeansOracle(8, 3, 64),
    "q90_bpe_merges" -> bpeOracle(8),
    "q91_dsir_weights" ->
      """WITH toks AS (SELECT doc_id, source IN ('src0','src1','src2') AS is_tgt,
              unnest(list_filter(string_split(text,' '), x -> x <> '')) AS token
            FROM documents),
         v AS (SELECT token, CAST(count(*) AS DOUBLE) AS c_raw,
              CAST(sum(CASE WHEN is_tgt THEN 1 ELSE 0 END) AS DOUBLE) AS c_tgt
            FROM toks GROUP BY token),
         s AS (SELECT sum(c_raw) AS n_raw, sum(c_tgt) AS n_tgt,
              CAST(count(*) AS DOUBLE) AS vs FROM v)
         SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
           floor(sum(ln(((c_tgt+1)/(n_tgt+vs)) / ((c_raw+1)/(n_raw+vs))))
             /count(*)*1000)/1000 AS dsir_logw
         FROM toks JOIN v USING (token), s
         GROUP BY doc_id ORDER BY doc_id""",
    "q92_bigram_lm" ->
      """WITH d AS (SELECT doc_id,
              list_filter(string_split(text,' '), x -> x <> '') AS w
            FROM documents),
         tr AS (SELECT doc_id, w[i] AS prev, w[i+1] AS cur FROM (
              SELECT doc_id, w, unnest(generate_series(1, len(w)-1)) AS i
              FROM d WHERE len(w) >= 2) t),
         uni AS (SELECT token, CAST(count(*) AS DOUBLE) AS c1 FROM (
              SELECT unnest(list_filter(string_split(text,' '), x -> x <> ''))
                AS token FROM documents) u GROUP BY token),
         tot AS (SELECT sum(c1) AS n FROM uni),
         bi AS (SELECT prev, cur, CAST(count(*) AS DOUBLE) AS c2
            FROM tr GROUP BY prev, cur),
         sc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
              floor(-sum(ln(0.5*c2/cp.c1 + 0.5*cc.c1/n))/count(*)*1000)/1000
                AS xent2
            FROM tr JOIN bi USING (prev, cur)
              JOIN uni cp ON cp.token = tr.prev
              JOIN uni cc ON cc.token = tr.cur, tot
            GROUP BY doc_id)
         SELECT d.doc_id, coalesce(n_bigrams, 0) AS n_bigrams,
           coalesce(xent2, 0.0) AS xent2
         FROM d LEFT JOIN sc USING (doc_id) ORDER BY doc_id""",
    // q92's xent chain + per-source rank; bucket = ((rank-1)*3) div n —
    // pure integer arithmetic, so the cut replays exactly cross-engine
    "q122_ppl_buckets" ->
      """WITH d AS (SELECT doc_id,
              list_filter(string_split(text,' '), x -> x <> '') AS w
            FROM documents),
         tr AS (SELECT doc_id, w[i] AS prev, w[i+1] AS cur FROM (
              SELECT doc_id, w, unnest(generate_series(1, len(w)-1)) AS i
              FROM d WHERE len(w) >= 2) t),
         uni AS (SELECT token, CAST(count(*) AS DOUBLE) AS c1 FROM (
              SELECT unnest(list_filter(string_split(text,' '), x -> x <> ''))
                AS token FROM documents) u GROUP BY token),
         tot AS (SELECT sum(c1) AS n FROM uni),
         bi AS (SELECT prev, cur, CAST(count(*) AS DOUBLE) AS c2
            FROM tr GROUP BY prev, cur),
         sc AS (SELECT doc_id,
              floor(-sum(ln(0.5*c2/cp.c1 + 0.5*cc.c1/n))/count(*)*1000)/1000
                AS xent2
            FROM tr JOIN bi USING (prev, cur)
              JOIN uni cp ON cp.token = tr.prev
              JOIN uni cc ON cc.token = tr.cur, tot
            GROUP BY doc_id),
         x AS (SELECT d.doc_id, coalesce(xent2, 0.0) AS xent2
            FROM d LEFT JOIN sc USING (doc_id)),
         s AS (SELECT x.doc_id, doc.source, x.xent2
            FROM x JOIN documents doc USING (doc_id)),
         r AS (SELECT doc_id, source, xent2,
              row_number() OVER (PARTITION BY source
                ORDER BY xent2, doc_id) AS src_rank,
              count(*) OVER (PARTITION BY source) AS n_src
            FROM s)
         SELECT doc_id, source, xent2, CAST(src_rank AS BIGINT) AS src_rank,
           CASE ((src_rank - 1) * 3) // n_src WHEN 0 THEN 'head'
             WHEN 1 THEN 'middle' ELSE 'tail' END AS bucket
         FROM r ORDER BY doc_id""",
    "q123_cluster_sample" ->
      s"""WITH km AS (${kmeansOracle(8, 3, 64)})
         SELECT vec_id, cluster, CAST(rn AS BIGINT) AS cluster_rank FROM (
           SELECT vec_id, cluster, row_number() OVER (PARTITION BY cluster
               ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn
           FROM km) t
         WHERE rn <= 10 ORDER BY vec_id""",
    // build the same PII payload from doc_id arithmetic, then re-scan it:
    // octet-validated IPv4 (the 999.x decoy must not count) and the Luhn
    // walk over extracted card candidates (odd docs' corrupted check
    // digit must fail) replayed digit-by-digit
    "q124_pii_validated" ->
      """WITH chk AS (SELECT doc_id, text, b15,
            list_sum(list_transform(generate_series(1, 15),
              i -> CASE WHEN (17 - i) % 2 = 0
                   THEN CASE WHEN CAST(substring(b15, i, 1) AS INT)*2 > 9
                        THEN CAST(substring(b15, i, 1) AS INT)*2 - 9
                        ELSE CAST(substring(b15, i, 1) AS INT)*2 END
                   ELSE CAST(substring(b15, i, 1) AS INT) END)) AS s15
          FROM (SELECT doc_id, text,
              lpad(CAST((doc_id*2654435761) % 1000000000000000 AS VARCHAR),
                15, '0') AS b15
            FROM documents) base),
         enr AS (SELECT doc_id,
            text || ' u' || doc_id || '@ex' || (doc_id % 7) || '.com 10.' ||
              (doc_id % 256) || '.' || ((doc_id*7) % 256) || '.' ||
              ((doc_id*13) % 256) ||
              ' 999.' || (doc_id % 256) || '.7.9 ' ||
              substring(d16, 1, 4) || ' ' || substring(d16, 5, 4) ||
              ' ' || substring(d16, 9, 4) || ' ' || substring(d16, 13, 4) ||
              CASE WHEN doc_id % 2 = 0 THEN ' ' ||
                lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-' ||
                lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0') || '-' ||
                lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END ||
              CASE WHEN doc_id % 3 = 0 THEN ' https://ex.org/p/' || doc_id
                ELSE '' END
              AS txt
          FROM (SELECT doc_id, text,
              b15 || CAST(CASE WHEN doc_id % 2 = 0
                  THEN (10 - s15 % 10) % 10
                  ELSE ((10 - s15 % 10) % 10 + 1) % 10 END AS VARCHAR) AS d16
            FROM chk) a)
         SELECT doc_id,
           CAST(len(regexp_extract_all(txt,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT)
             AS n_email,
           CAST(len(regexp_extract_all(txt,
             '\b(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])(\.(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])){3}\b'))
             AS BIGINT) AS n_ipv4,
           CAST(len(regexp_extract_all(txt,
             '\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b')) AS BIGINT) AS n_ssn,
           CAST(len(regexp_extract_all(txt, 'https?://[^\s]+')) AS BIGINT)
             AS n_url,
           CAST(len(regexp_extract_all(txt,
             '\b[0-9]{4}( [0-9]{4}){3}\b')) AS BIGINT) AS n_cc,
           CAST(len(list_filter(
             list_transform(regexp_extract_all(txt,
               '\b[0-9]{4}( [0-9]{4}){3}\b'),
               c -> list_sum(list_transform(generate_series(1, 16),
                 i -> CASE WHEN (17 - i) % 2 = 0
                      THEN CASE WHEN
                          CAST(substring(replace(c,' ',''), i, 1) AS INT)*2 > 9
                        THEN CAST(substring(replace(c,' ',''), i, 1) AS INT)*2 - 9
                        ELSE CAST(substring(replace(c,' ',''), i, 1) AS INT)*2
                        END
                      ELSE CAST(substring(replace(c,' ',''), i, 1) AS INT)
                      END))),
             s -> s % 10 = 0)) AS BIGINT) AS n_cc_valid
         FROM enr ORDER BY doc_id""",
    // novelty: distinct doc-grams hashed by the portable md5-prefix,
    // df on the hash, per-doc unshared fraction
    "q125_novelty" ->
      """WITH docs AS (SELECT doc_id,
              list_filter(string_split(text,' '), x -> x <> '') AS w
            FROM documents),
         sh AS (SELECT DISTINCT doc_id, s FROM (
            SELECT doc_id, unnest(CASE WHEN len(w) >= 3
              THEN list_transform(generate_series(1, len(w)-2),
                   i -> array_to_string(w[i:i+2], ' '))
              ELSE [array_to_string(w, ' ')] END) AS s
            FROM docs) t),
         hb AS (SELECT doc_id,
                  CAST('0x' || substring(md5(s),1,8) AS BIGINT) AS h
                FROM sh),
         dfreq AS (SELECT h, count(*) AS df FROM hb GROUP BY h),
         agg AS (SELECT doc_id, count(*) AS n_grams,
              sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS n_shared
            FROM hb JOIN dfreq USING (h) GROUP BY doc_id)
         SELECT doc_id, CAST(n_grams AS BIGINT) AS n_grams,
           CAST(n_shared AS BIGINT) AS n_shared,
           floor((n_grams - n_shared) * 1000000 / n_grams) / 1e6 AS novelty
         FROM agg ORDER BY doc_id""",
    "q126_triplets" ->
      """WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
                    FROM embeddings),
         q AS (SELECT vec_id AS q_id, label AS q_label, v AS qv
               FROM e WHERE vec_id < 8),
         scored AS (SELECT q_id, q_label, vec_id,
              CASE WHEN label = q_label THEN 1 ELSE 0 END AS same,
              round(list_cosine_similarity(qv, v), 4) AS cos_sim
            FROM q JOIN e ON vec_id <> q_id),
         ranked AS (SELECT *, row_number() OVER (PARTITION BY q_id, same
              ORDER BY cos_sim DESC, vec_id) AS rn FROM scored)
         SELECT q_id, q_label,
           max(CASE WHEN same = 1 THEN vec_id END) AS pos_id,
           max(CASE WHEN same = 1 THEN cos_sim END) AS pos_sim,
           max(CASE WHEN same = 0 THEN vec_id END) AS neg_id,
           max(CASE WHEN same = 0 THEN cos_sim END) AS neg_sim,
           round(max(CASE WHEN same = 1 THEN cos_sim END) -
                 max(CASE WHEN same = 0 THEN cos_sim END), 4) AS margin
         FROM ranked WHERE rn = 1 GROUP BY q_id, q_label ORDER BY q_id""",
    // waterfill replay: same ratio-ordered running sums, same greedy
    // prefix test, same ordered capped-spend accumulation
    "q127_epoch_schedule" ->
      """WITH c AS (SELECT source,
              CAST(sum(len(list_filter(string_split(text,' '), x -> x <> '')))
                AS BIGINT) AS n_toks
            FROM documents GROUP BY 1),
         b AS (SELECT source, n_toks,
              power(CAST(n_toks AS DOUBLE), 0.5) AS w,
              CAST(n_toks AS DOUBLE) * 4.0 AS cap
            FROM c),
         r AS (SELECT *, cap / w AS ratio FROM b),
         wn AS (SELECT *,
              coalesce(sum(cap) OVER (ORDER BY ratio, source
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0.0) AS pcap,
              coalesce(sum(w) OVER (ORDER BY ratio, source
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0.0) AS pw,
              sum(w) OVER (ORDER BY ratio, source
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS iw,
              sum(n_toks) OVER (ORDER BY ratio, source
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS itoks
            FROM r),
         t AS (SELECT max(iw) AS tot_w, max(itoks) AS tot_toks FROM wn),
         fl AS (SELECT wn.*, tot_w,
              CAST(tot_toks AS DOUBLE) * 3.0 AS budget,
              ratio * (tot_w - pw) <=
                CAST(tot_toks AS DOUBLE) * 3.0 - pcap AS capped
            FROM wn, t),
         fc AS (SELECT *,
              sum(CASE WHEN capped THEN cap ELSE 0.0 END)
                OVER (ORDER BY ratio, source
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cap_cum,
              sum(CASE WHEN capped THEN w ELSE 0.0 END)
                OVER (ORDER BY ratio, source
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS w_cum
            FROM fl),
         sp AS (SELECT max(cap_cum) AS cap_spent, max(w_cum) AS w_spent
            FROM fc),
         out AS (SELECT source, n_toks, capped,
              CAST(floor(CASE WHEN capped THEN cap
                ELSE (budget - cap_spent) / (tot_w - w_spent) * w END)
                AS BIGINT) AS alloc_toks
            FROM fc, sp)
         SELECT source, n_toks, capped, alloc_toks,
           floor(CAST(alloc_toks AS DOUBLE) / CAST(n_toks AS DOUBLE)
             * 10000) / 10000 AS epochs
         FROM out ORDER BY source""",
    "q93_hard_negatives" ->
      """WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
                    FROM embeddings),
         q AS (SELECT vec_id AS q_id, label AS q_label, v AS qv
               FROM e WHERE vec_id < 5),
         scored AS (SELECT q_id, q_label, vec_id, label,
              round(list_cosine_similarity(qv, v), 4) AS cos_sim
            FROM q JOIN e ON vec_id <> q_id AND label <> q_label),
         ranked AS (SELECT *, row_number() OVER (PARTITION BY q_id
              ORDER BY cos_sim DESC, vec_id) AS rn FROM scored)
         SELECT q_id, q_label, vec_id AS neighbor_id, label AS neg_label,
           CAST(rn AS BIGINT) AS rank, cos_sim
         FROM ranked WHERE rn <= 10 ORDER BY q_id, rank""",
    "q94_weighted_sample" ->
      """WITH m AS (SELECT max(CAST(n_chars AS DOUBLE)) AS w_max FROM documents),
         k AS (SELECT doc_id, CAST(n_chars AS DOUBLE) AS weight,
              floor(-ln((CAST(((doc_id % 2147483648)*2654435761) % 2147483647 AS DOUBLE) + 0.5)
                  / 2147483647.0)
                * w_max / CAST(n_chars AS DOUBLE) * 1e6) / 1e6 AS es_key
            FROM documents, m WHERE n_chars > 0)
         SELECT doc_id, weight, es_key FROM k
         ORDER BY es_key, doc_id LIMIT 50""",
    "q98_image_headers" ->
      """WITH p AS (
           SELECT doc_id,
             CAST(doc_id % 3 AS INT) AS fmt,
             1 + doc_id % 2000 AS w,
             1 + (doc_id * 7) % 1500 AS h,
             CAST((doc_id // 3) % 3 AS INT) AS v3,
             CAST((doc_id // 3) % 2 AS INT) AS v2,
             CAST(doc_id % 40 AS INT) AS pad
           FROM documents),
         hx AS (SELECT doc_id, fmt, pad,
           CASE fmt
             WHEN 0 THEN '89504E470D0A1A0A' || '0000000D' || '49484452'
               || lpad(to_hex(w), 8, '0') || lpad(to_hex(h), 8, '0') || '08'
               || lpad(to_hex(CASE v3 WHEN 0 THEN 0 WHEN 1 THEN 2 ELSE 6 END), 2, '0')
               || '000000'
             WHEN 1 THEN '474946383961'
               || lpad(to_hex(w % 256), 2, '0') || lpad(to_hex(w // 256), 2, '0')
               || lpad(to_hex(h % 256), 2, '0') || lpad(to_hex(h // 256), 2, '0')
               || 'F700003B'
             ELSE 'FFD8FFE1' || lpad(to_hex(8 + pad), 4, '0') || '457869660000'
               || repeat('00', pad)
               || 'FF' || CASE v2 WHEN 0 THEN 'C0' ELSE 'C2' END
               || lpad(to_hex(8 + 3 * (CASE v3 WHEN 0 THEN 1 ELSE 3 END)), 4, '0')
               || '08' || lpad(to_hex(h), 4, '0') || lpad(to_hex(w), 4, '0')
               || lpad(to_hex(CASE v3 WHEN 0 THEN 1 ELSE 3 END), 2, '0')
           END AS s
           FROM p)
         SELECT doc_id,
           CASE fmt WHEN 0 THEN 'png' WHEN 1 THEN 'gif' ELSE 'jpeg' END AS format,
           CASE fmt
             WHEN 0 THEN ('0x' || substr(s, 33, 8))::BIGINT
             WHEN 1 THEN ('0x' || substr(s, 15, 2) || substr(s, 13, 2))::BIGINT
             ELSE ('0x' || substr(s, 39 + 2*pad, 4))::BIGINT
           END AS width,
           CASE fmt
             WHEN 0 THEN ('0x' || substr(s, 41, 8))::BIGINT
             WHEN 1 THEN ('0x' || substr(s, 19, 2) || substr(s, 17, 2))::BIGINT
             ELSE ('0x' || substr(s, 35 + 2*pad, 4))::BIGINT
           END AS height,
           CASE fmt
             WHEN 0 THEN ('0x' || substr(s, 49, 2))::BIGINT
             WHEN 1 THEN ((('0x' || substr(s, 21, 2))::BIGINT // 16) % 8) + 1
             ELSE ('0x' || substr(s, 33 + 2*pad, 2))::BIGINT
           END AS bit_depth,
           CASE fmt
             WHEN 0 THEN CASE ('0x' || substr(s, 51, 2))::BIGINT
               WHEN 0 THEN 1 WHEN 2 THEN 3 WHEN 3 THEN 1 WHEN 4 THEN 2 ELSE 4 END
             WHEN 1 THEN 3
             ELSE ('0x' || substr(s, 43 + 2*pad, 2))::BIGINT
           END AS channels
         FROM hx ORDER BY doc_id""",
    // the conversation fixture's closed forms: turn roles (system prologue,
    // alternation, the mod-11 double-send override), per-turn word slices,
    // then the loss-mask arithmetic
    "q162_loss_mask" ->
      """WITH d AS (SELECT doc_id AS conv_id,
              list_filter(string_split(text, ' '), x -> x <> '') AS w,
              CAST(2 + doc_id % 5 AS INT) AS nt,
              doc_id % 3 = 0 AS sys,
              CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END AS so,
              doc_id % 11 = 0 AS dbl
            FROM documents),
         t AS (SELECT conv_id, nt, so, sys, dbl, w,
              unnest(generate_series(0, nt - 1)) AS tn FROM d),
         r AS (SELECT conv_id,
              CASE WHEN dbl AND tn = 2 THEN
                     CASE WHEN (1 - so) % 2 = 0 THEN 'user'
                          ELSE 'assistant' END
                   WHEN sys AND tn = 0 THEN 'system'
                   WHEN (tn - so) % 2 = 0 THEN 'user'
                   ELSE 'assistant' END AS role,
              len(w[tn*8+1 : tn*8+8]) AS n_tokens
            FROM t),
         agg AS (SELECT conv_id, count(*) AS n_turns,
              CAST(sum(n_tokens) AS BIGINT) AS content_tokens,
              CAST(sum(CASE WHEN role = 'assistant' THEN n_tokens
                            ELSE 0 END) AS BIGINT) AS trainable_tokens
            FROM r GROUP BY conv_id)
         SELECT conv_id, n_turns, content_tokens,
           n_turns * 4 AS overhead_tokens,
           content_tokens + n_turns * 4 AS total_tokens,
           trainable_tokens,
           floor(trainable_tokens * 1000000
             / (content_tokens + n_turns * 4)) / 1e6 AS trainable_frac
         FROM agg ORDER BY conv_id""",
    // same fixture replay + the lag-based alternation battery
    "q163_chat_audit" ->
      """WITH d AS (SELECT doc_id AS conv_id,
              list_filter(string_split(text, ' '), x -> x <> '') AS w,
              CAST(2 + doc_id % 5 AS INT) AS nt,
              doc_id % 3 = 0 AS sys,
              CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END AS so,
              doc_id % 11 = 0 AS dbl
            FROM documents),
         t AS (SELECT conv_id, nt, so, sys, dbl, w,
              unnest(generate_series(0, nt - 1)) AS tn FROM d),
         r AS (SELECT conv_id, tn,
              CASE WHEN dbl AND tn = 2 THEN
                     CASE WHEN (1 - so) % 2 = 0 THEN 'user'
                          ELSE 'assistant' END
                   WHEN sys AND tn = 0 THEN 'system'
                   WHEN (tn - so) % 2 = 0 THEN 'user'
                   ELSE 'assistant' END AS role,
              len(w[tn*8+1 : tn*8+8]) AS n_tokens
            FROM t),
         p AS (SELECT conv_id, tn, role, n_tokens,
              lag(role) OVER (PARTITION BY conv_id ORDER BY tn) AS prev
            FROM r),
         a AS (SELECT conv_id,
              max(CASE WHEN n_tokens = 0 THEN 1 ELSE 0 END) AS emp,
              min(CASE WHEN tn = 0 OR (role <> prev AND role <> 'system')
                       THEN 1 ELSE 0 END) AS alt,
              max(CASE WHEN role = 'system' AND tn > 0 THEN 1 ELSE 0 END)
                AS latesys,
              arg_min(role, tn) AS firstr,
              arg_max(role, tn) AS lastr
            FROM p GROUP BY conv_id)
         SELECT conv_id, emp = 1 AS has_empty,
           firstr IN ('system', 'user') AS starts_ok,
           latesys = 0 AS sys_only_first,
           alt = 1 AS alternates_ok,
           lastr = 'assistant' AS ends_assistant,
           CASE WHEN emp = 0 AND firstr IN ('system', 'user')
                 AND latesys = 0 AND alt = 1 AND lastr = 'assistant'
                THEN 'ok' ELSE 'bad' END AS verdict
         FROM a ORDER BY conv_id""",
    // ramp closed forms per 64-sample window: exact sums, sign-flip
    // counts, one IEEE sqrt, floor-quantized rms, silence verdicts
    "q165_audio_frames" ->
      """WITH p AS (SELECT doc_id,
              256 + (((doc_id * 31) % 512) + 512) % 512 AS n,
              (((doc_id * 17) % 4001) + 4001) % 4001 - 2000 AS base,
              1 + ((doc_id % 7) + 7) % 7 AS step
            FROM documents),
         i AS (SELECT doc_id, base, step,
              unnest(generate_series(CAST(0 AS BIGINT), n - 1)) AS ix
            FROM p),
         s AS (SELECT doc_id, ix // 64 AS w, base + ix * step AS v,
              CASE WHEN ix % 64 <> 0 AND
                   ((base + ix * step >= 0) <> (base + (ix-1) * step >= 0))
                   THEN 1 ELSE 0 END AS flip
            FROM i),
         a AS (SELECT doc_id, w AS win_ord, count(*) AS n_samples,
              CAST(sum(v) AS BIGINT) AS sum_l,
              CAST(sum(flip) AS BIGINT) AS zc,
              CAST(sum(v * v) AS BIGINT) AS ssq
            FROM s GROUP BY doc_id, w),
         r AS (SELECT doc_id, win_ord, n_samples, sum_l, zc,
              floor(sqrt(CAST(ssq AS DOUBLE) / n_samples) * 10000) / 10000
                AS rms
            FROM a)
         SELECT doc_id, win_ord, n_samples, sum_l, zc, rms,
           rms < 500.0 AS is_silence
         FROM r ORDER BY doc_id, win_ord""",
    // full RM3 replay: q76's BM25 base chain, top-10 fb docs, the
    // quantized feedback model, weight interpolation, and the
    // integer-weighted rerank — every ranking decision integer-exact
    "q167_rm3_rerank" ->
      """WITH docs AS (SELECT doc_id,
              list_filter(string_split(text,' '), x -> x <> '') AS w
            FROM documents),
         stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs,
              avg(CAST(len(w) AS DOUBLE)) AS avgdl FROM docs),
         toks AS (SELECT doc_id, len(w) AS dl, unnest(w) AS token FROM docs),
         tfq AS (SELECT doc_id, token, CAST(count(*) AS DOUBLE) AS tf,
              CAST(max(dl) AS DOUBLE) AS dl
            FROM toks WHERE token IN ('vector','stream','filter','spark')
            GROUP BY doc_id, token),
         dfq AS (SELECT token, CAST(count(*) AS DOUBLE) AS df
                 FROM tfq GROUP BY token),
         base AS (SELECT doc_id,
              floor(sum(ln((n_docs - df + 0.5)/(df + 0.5) + 1.0) * tf * 2.2 /
                (tf + 1.2*(0.25 + 0.75*dl/avgdl)))*1000)/1000 AS bm25
            FROM tfq JOIN dfq USING (token), stats GROUP BY doc_id),
         fb AS (SELECT doc_id FROM base ORDER BY bm25 DESC, doc_id LIMIT 10),
         fbt AS (SELECT token,
              CAST(sum(floor(tf * 1000000 / dl)) AS BIGINT) AS r6
            FROM (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf,
                    max(dl) AS dl
                  FROM toks WHERE doc_id IN (SELECT doc_id FROM fb)
                  GROUP BY doc_id, token)
            WHERE token NOT IN ('vector','stream','filter','spark')
            GROUP BY token),
         sel AS (SELECT token, r6 FROM (SELECT token, r6,
                row_number() OVER (ORDER BY r6 DESC, token) AS rn FROM fbt)
              WHERE rn <= 5),
         tot AS (SELECT CAST(sum(r6) AS BIGINT) AS s FROM sel),
         wexp AS (SELECT token, w6 FROM (
            SELECT unnest(['vector','stream','filter','spark']) AS token,
              CAST(125000 AS BIGINT) AS w6
            UNION ALL
            SELECT token, CAST(floor(500000 * r6 / s) AS BIGINT) AS w6
            FROM sel, tot) WHERE w6 > 0),
         tfe AS (SELECT doc_id, token, CAST(count(*) AS DOUBLE) AS tf,
              CAST(max(dl) AS DOUBLE) AS dl
            FROM toks WHERE token IN (SELECT token FROM wexp)
            GROUP BY doc_id, token),
         dfe AS (SELECT token, CAST(count(*) AS DOUBLE) AS df
                 FROM tfe GROUP BY token),
         c AS (SELECT doc_id, token,
              CAST(floor(ln((n_docs - df + 0.5)/(df + 0.5) + 1.0) * tf * 2.2 /
                (tf + 1.2*(0.25 + 0.75*dl/avgdl)) * 1000) AS BIGINT) AS c3
            FROM tfe JOIN dfe USING (token), stats),
         sc AS (SELECT doc_id, CAST(sum(w6 * c3) AS BIGINT) AS score6
            FROM c JOIN wexp USING (token) GROUP BY doc_id)
         SELECT CAST(row_number() OVER (ORDER BY score6 DESC, doc_id)
             AS BIGINT) AS rank, doc_id, score6
         FROM sc ORDER BY score6 DESC, doc_id LIMIT 20""",
    // ratings fixture replay (base cat + noise-flip rule), per-item Σc²,
    // the two floored-millionth agreement terms, and κ computed FROM the
    // quantized terms — identical integer decisions in both engines
    "q168_fleiss_kappa" ->
      """WITH r AS (SELECT source, item_id, g.rater,
              CASE WHEN (h + g.rater*17) % 10 < 3
                THEN (h % 4 + 1 + (h % 97 + g.rater) % 3) % 4
                ELSE h % 4 END AS cat
            FROM (SELECT source, doc_id AS item_id,
                    ((doc_id % 2147483648) * 2654435761) % 2147483647 AS h
                  FROM documents),
              (SELECT unnest(generate_series(0, 4)) AS rater) g),
         cnt AS (SELECT source, item_id, cat, count(*) AS c
                 FROM r GROUP BY source, item_id, cat),
         pi AS (SELECT source, item_id, CAST(sum(c*c) AS BIGINT) AS s2,
                  CAST(sum(c) AS BIGINT) AS n_i
                FROM cnt GROUP BY source, item_id),
         ps AS (SELECT source, count(*) AS n_items,
                  CAST(sum(s2) AS BIGINT) AS sum_s2, max(n_i) AS n_raters
                FROM pi GROUP BY source),
         ct AS (SELECT source, CAST(sum(cj*cj) AS BIGINT) AS sum_cj2 FROM
                  (SELECT source, cat, CAST(sum(c) AS BIGINT) AS cj
                   FROM cnt GROUP BY source, cat) GROUP BY source),
         j AS (SELECT ps.source, n_items, n_raters,
                 CAST(floor((sum_s2 - n_items*n_raters) * 1000000 /
                   (n_items*n_raters*(n_raters-1))) AS BIGINT) AS pbar6,
                 CAST(floor(sum_cj2 * 1000000 /
                   (n_items*n_raters*n_items*n_raters)) AS BIGINT) AS pe6
               FROM ps JOIN ct USING (source))
         SELECT source, n_items, n_raters,
           CAST(pbar6 AS DOUBLE)/1e6 AS p_bar,
           CAST(pe6 AS DOUBLE)/1e6 AS p_e,
           CAST(CAST(floor((pbar6-pe6)*1000000/(1000000-pe6)) AS BIGINT)
             AS DOUBLE)/1e6 AS kappa
         FROM j ORDER BY source""",
    // turns fixture replay incl. turn text, then the prompt-keyed argmax
    // with the folded (tokens desc, conv asc) BIGINT ordering
    "q166_prompt_dedup" ->
      """WITH d AS (SELECT doc_id AS conv_id,
              list_filter(string_split(text, ' '), x -> x <> '') AS w,
              CAST(2 + doc_id % 5 AS INT) AS nt,
              doc_id % 3 = 0 AS sys,
              CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END AS so,
              doc_id % 11 = 0 AS dbl
            FROM documents),
         t AS (SELECT conv_id, nt, so, sys, dbl, w,
              unnest(generate_series(0, nt - 1)) AS tn FROM d),
         r AS (SELECT conv_id, tn,
              CASE WHEN dbl AND tn = 2 THEN
                     CASE WHEN (1 - so) % 2 = 0 THEN 'user'
                          ELSE 'assistant' END
                   WHEN sys AND tn = 0 THEN 'system'
                   WHEN (tn - so) % 2 = 0 THEN 'user'
                   ELSE 'assistant' END AS role,
              array_to_string(w[tn*8+1 : tn*8+8], ' ') AS txt,
              len(w[tn*8+1 : tn*8+8]) AS n_tokens
            FROM t),
         pc AS (SELECT conv_id,
              arg_min(CASE WHEN role = 'user' THEN txt END,
                      CASE WHEN role = 'user' THEN tn END) AS prompt,
              CAST(sum(CASE WHEN role = 'assistant' THEN n_tokens
                            ELSE 0 END) AS BIGINT) AS at
            FROM r GROUP BY conv_id),
         g AS (SELECT md5(prompt) AS prompt_md5, count(*) AS n_convs,
              arg_max(conv_id, at * 1000000000000 - conv_id) AS keep_conv,
              CAST(max(at) AS BIGINT) AS kept_assistant_tokens
            FROM pc WHERE prompt IS NOT NULL GROUP BY md5(prompt))
         SELECT prompt_md5, n_convs, keep_conv, kept_assistant_tokens
         FROM g ORDER BY prompt_md5""",
    // preference-pair fixture closed forms + the per-source bias rollup
    "q164_pref_bias" ->
      """WITH d AS (SELECT doc_id, source,
              list_filter(string_split(text, ' '), x -> x <> '') AS w
            FROM documents),
         p AS (SELECT doc_id, source,
              len(w[7 : 6 + CAST(10 + doc_id % 20 AS INT)]) AS lc,
              len(w[7 : 6 + CAST(5 + (doc_id * 7) % 25 AS INT)]) AS lr
            FROM d),
         a AS (SELECT source, count(*) AS n_pairs,
              CAST(sum(CASE WHEN lc > lr THEN 1 ELSE 0 END) AS BIGINT)
                AS n_chosen_longer,
              CAST(sum(CASE WHEN lc = lr THEN 1 ELSE 0 END) AS BIGINT)
                AS n_ties,
              CAST(sum(lc - lr) AS BIGINT) AS sum_delta
            FROM p GROUP BY source)
         SELECT source, n_pairs, n_chosen_longer, n_ties,
           floor(n_chosen_longer * 1000000 / n_pairs) / 1e6
             AS frac_chosen_longer,
           floor(sum_delta * 1000000 / n_pairs) / 1e6 AS mean_delta
         FROM a ORDER BY source""",
    // full winnowing replay: same md5-prefix k-gram hashes, same window
    // slices, same rightmost-min tie rule, same df cap and pair join
    "q161_winnow_overlap" ->
      """WITH d AS (SELECT doc_id,
              list_filter(string_split(text, ' '), x -> x <> '') AS w
            FROM documents),
         g AS (SELECT doc_id,
             CASE WHEN len(w) >= 5
               THEN list_transform(generate_series(1, len(w) - 4), i ->
                 CAST(('0x' || substring(md5(array_to_string(w[i:i+4], ' ')),
                   1, 8)) AS BIGINT))
               ELSE [CAST(('0x' || substring(md5(array_to_string(w, ' ')),
                   1, 8)) AS BIGINT)]
             END AS hs
           FROM d WHERE len(w) > 0),
         s AS (SELECT doc_id, hs, len(hs) AS m FROM g),
         j AS (SELECT doc_id, hs, m,
             unnest(CASE WHEN m >= 4 THEN generate_series(1, m - 3)
                         ELSE [CAST(1 AS BIGINT)] END) AS jj
           FROM s),
         win AS (SELECT doc_id, hs, jj,
             hs[jj : jj + least(4, m) - 1] AS wv FROM j),
         sel AS (SELECT DISTINCT doc_id,
             hs[CAST(jj - 1 + list_max(list_filter(
               generate_series(1, len(wv)),
               p -> wv[p] = list_min(wv))) AS INT)] AS fp
           FROM win),
         rare AS (SELECT fp FROM sel GROUP BY fp
                  HAVING count(*) BETWEEN 2 AND 100),
         pr AS (SELECT doc_id, fp FROM sel
                WHERE fp IN (SELECT fp FROM rare))
         SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           count(*) AS n_shared
         FROM pr a JOIN pr b ON a.fp = b.fp AND a.doc_id < b.doc_id
         GROUP BY 1, 2 HAVING count(*) >= 3
         ORDER BY doc_a, doc_b""",
    // the animated-GIF container's closed forms: frame count, sub-block
    // size, per-frame geometry/timing, and the descriptor offset
    // 13 + f*(21+sub) + 8 (header 13, each prior frame 21+sub bytes, the
    // frame's own 8-byte graphic control extension before its descriptor)
    "q160_gif_frames" ->
      """WITH p AS (SELECT doc_id,
              CAST(1 + doc_id % 7 AS BIGINT) AS nf,
              10 + doc_id % 20 AS sub
            FROM documents),
         f AS (SELECT doc_id, nf, sub,
              unnest(generate_series(CAST(0 AS BIGINT), nf - 1)) AS fo
            FROM p)
         SELECT doc_id, CAST(nf AS INT) AS n_frames,
           CAST(fo AS INT) AS frame_ord,
           CAST((doc_id + 17*fo) % 100 AS INT) AS x_off,
           CAST((doc_id*5 + 11*fo) % 100 AS INT) AS y_off,
           CAST(1 + (doc_id + fo) % 64 AS INT) AS width,
           CAST(1 + (doc_id*7 + 3*fo) % 48 AS INT) AS height,
           CAST(2 + (doc_id + fo) % 30 AS INT) AS delay_cs,
           CAST(13 + fo*(21 + sub) + 8 AS INT) AS desc_offset
         FROM f WHERE fo % 2 = 0 ORDER BY doc_id, frame_ord""",
    "q99_pixel_decode" ->
      """SELECT doc_id,
           CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'bmp' END AS format,
           CAST(64 AS BIGINT) AS width, CAST(48 AS BIGINT) AS height,
           CAST((doc_id % 190 + 190) % 190 AS DOUBLE) + 31.5 AS mean_r,
           CAST(((doc_id * 7) % 200 + 200) % 200 AS DOUBLE) + 23.5 AS mean_g,
           CAST(((doc_id * 13) % 256 + 256) % 256 AS DOUBLE) AS mean_b
         FROM documents ORDER BY doc_id""",
    // WAV round-trip closed forms: the builder's parameters are pure
    // doc_id arithmetic (floorMod mirrored as ((x%n)+n)%n), channel L is
    // the ramp base + i*step, channel R its negation, so mean_l has the
    // arithmetic-series form and the RMS follows from the cubic
    // sum-of-squares identity. Every value the decoder emits must land on
    // these forms exactly — a missed pad byte or sign confusion shifts
    // every sample and fails the hash.
    "q100_audio_decode" ->
      """WITH p AS (SELECT doc_id,
              CASE ((doc_id % 4) + 4) % 4 WHEN 0 THEN 8000 WHEN 1 THEN 16000
                WHEN 2 THEN 22050 ELSE 44100 END AS rate,
              1 + ((doc_id % 2) + 2) % 2 AS channels,
              256 + (((doc_id * 31) % 512) + 512) % 512 AS n,
              (((doc_id * 17) % 4001) + 4001) % 4001 - 2000 AS base,
              1 + ((doc_id % 7) + 7) % 7 AS step
            FROM documents),
         f AS (SELECT doc_id, rate, channels, n, base, step,
              CAST(base AS DOUBLE) + step * (n - 1) / 2.0 AS mean_l,
              n * base * base + 2 * base * step * (n * (n - 1) // 2)
                + step * step * ((n - 1) * n * (2 * n - 1) // 6) AS sumsq
            FROM p)
         SELECT doc_id,
           CAST(rate AS BIGINT) AS sample_rate,
           CAST(channels AS BIGINT) AS channels,
           CAST(n AS BIGINT) AS n_frames,
           floor(n * 1000000.0 / rate) / 1000.0 AS duration_ms,
           mean_l,
           CASE WHEN channels = 2 THEN -mean_l ELSE mean_l END AS mean_r,
           floor(sqrt(CAST(sumsq AS DOUBLE) / n) * 10000) / 10000 AS rms
         FROM f ORDER BY doc_id""",
    "q95_bpe_encode" -> bpeEncodeOracle(8),
    "q129_bpe_compression" -> bpeCompressionOracle(8),
    "q132_pagerank" -> pageRankOracle(3),
    "q199_hits" -> hitsOracle(3),
    "q208_kcore" -> kCoreOracle(3, 16),
    "q200_mojibake" -> mojibakeOracle,
    "q204_unsafe_gate" -> unsafeGateOracle,
    // same boost fixture, same quality-score arithmetic as q32, then the
    // score-collapsed rank-sum with doubled tie half-credit
    // same planted snippet, same five millionth signals (LIKE-based
    // line predicates, regex keyword/camel counts), same composite
    "q227_code_detect" ->
      """WITH d AS (SELECT doc_id,
            CASE WHEN ((doc_id % 2147483648) * 2654435761)
                % 2147483647 % 5 = 0
              THEN text || chr(10) || 'def compute(x):' || chr(10)
                || '    return x * 2;' || chr(10) || 'class FooBar:'
                || chr(10) || '    val camelCaseVar = compute(42);'
              ELSE text END AS t2
          FROM documents),
        s AS (SELECT doc_id,
            greatest(length(t2), 1) AS nc,
            length(t2) - length(regexp_replace(t2,
              '[{}();=<>\[\]]', '', 'g')) AS sym,
            string_split(t2, chr(10)) AS lns,
            len(regexp_extract_all(t2,
              '\b(def|class|return|import|function|var|val|if|for|while)\b'))
              AS kw,
            len(regexp_extract_all(t2,
              '\b[a-z]+[A-Z][A-Za-z0-9]*\b')) AS camel
          FROM d),
        s2 AS (SELECT doc_id, nc, sym, kw, camel,
            greatest(len(lns), 1) AS nl,
            len(list_filter(lns, x -> x LIKE '%;')) AS nsemi,
            len(list_filter(lns, x -> x LIKE '  %'
              OR x LIKE chr(9) || '%')) AS nind
          FROM s),
        s3 AS (SELECT doc_id,
            (CAST(sym AS BIGINT) * 1000000) // nc AS sym6,
            (CAST(nsemi AS BIGINT) * 1000000) // nl AS semi6,
            (CAST(nind AS BIGINT) * 1000000) // nl AS ind6,
            kw, camel
          FROM s2),
        s4 AS (SELECT doc_id, sym6, semi6, ind6,
            least(1000000, (2*sym6 + 2*semi6 + ind6) // 5
              + least(CAST(kw AS BIGINT), 20) * 25000
              + least(CAST(camel AS BIGINT), 20) * 15000) AS code6
          FROM s3)
        SELECT doc_id, sym6, semi6, ind6, code6,
          CAST(code6 AS DOUBLE) / 1e6 AS code_score,
          code6 >= 300000 AS is_code
        FROM s4 ORDER BY doc_id""",
    "q228_lsh_tuning" -> lshTuningSql,
    // same md5-prefix affine family, counters from the per-key
    // pre-aggregate (additive, so exactly equal to per-row builds),
    // min over the d=4 probes, integer eps-bound
    "q229_countmin" ->
      """WITH kc AS (SELECT user_id AS key, CAST(count(*) AS BIGINT) AS cnt
            FROM events GROUP BY 1),
        hh AS (SELECT key, cnt,
            CAST('0x' || substr(md5(CAST(key AS VARCHAR)), 1, 8) AS BIGINT)
              AS h
          FROM kc),
        pr AS (SELECT key, cnt, j,
            ((h * (2*j + 3) + 7919*j + 1) % 2147483647) % 256 AS idx
          FROM hh, (SELECT unnest(generate_series(0, 3)) AS j) jj),
        co AS (SELECT j, idx, CAST(sum(cnt) AS BIGINT) AS c
          FROM pr GROUP BY 1, 2),
        tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_total FROM kc),
        top AS (SELECT key, cnt AS exact FROM kc
          ORDER BY cnt DESC, key LIMIT 20),
        est AS (SELECT t.key, t.exact, min(co.c) AS estimate
          FROM top t JOIN pr ON pr.key = t.key
          JOIN co ON co.j = pr.j AND co.idx = pr.idx
          GROUP BY 1, 2)
        SELECT key AS user_id, exact, estimate,
          estimate - exact AS overcount,
          (estimate - exact) * 256 <= 3 * n_total AS within_bound
        FROM est, tot ORDER BY exact DESC, user_id""",
    // q148's bucket rule, source as the sensitive attribute; entropy is
    // the row-local quantized-ln dot product, ln(3) threshold inlined
    "q230_l_diversity" ->
      """WITH st AS (SELECT CAST(min(n_chars) AS DOUBLE) AS lo,
            CAST(max(n_chars) AS DOUBLE) AS hi FROM documents),
        cell AS (SELECT lang,
            CASE WHEN hi = lo THEN CAST(0 AS BIGINT)
              ELSE CAST(least(greatest(floor(
                (CAST(n_chars AS DOUBLE) - lo) * 10 / (hi - lo)), 0.0), 9.0)
                AS BIGINT) END AS len_bucket,
            source, CAST(count(*) AS BIGINT) AS c
          FROM documents, st GROUP BY 1, 2, 3),
        cls AS (SELECT lang, len_bucket, CAST(sum(c) AS BIGINT) AS n,
            CAST(count(*) AS BIGINT) AS l_distinct,
            CAST(max(c) AS BIGINT) AS top_cnt
          FROM cell GROUP BY 1, 2),
        e AS (SELECT cell.lang, cell.len_bucket, c, n,
            CAST(floor(ln(CAST(c AS DOUBLE) / n) * 1000000) AS BIGINT) AS l6
          FROM cell JOIN cls USING (lang, len_bucket)),
        h AS (SELECT lang, len_bucket,
            CAST((-sum(c * l6)) // max(n) AS BIGINT) AS h6
          FROM e GROUP BY 1, 2)
        SELECT cls.lang, cls.len_bucket, n, l_distinct,
          CAST(floor(top_cnt * 1000000 / n) AS DOUBLE) / 1e6 AS top_share,
          CAST(h6 AS DOUBLE) / 1e6 AS entropy,
          l_distinct >= 3 AS distinct_ok,
          h6 >= 1098612 AS entropy_ok
        FROM cls JOIN h USING (lang, len_bucket)
        ORDER BY lang, len_bucket""",
    // top-(k+1) order statistics per source, per-row quantized ln,
    // exact Hill sum, one integer division; thin/degenerate tails NULL
    "q231_hill_tail" ->
      """WITH d AS (SELECT source, CAST(n_chars AS BIGINT) AS x, doc_id
            FROM documents WHERE n_chars >= 1),
        r AS (SELECT source, x, row_number() OVER (PARTITION BY source
            ORDER BY x DESC, doc_id) AS r FROM d),
        t AS (SELECT source, r, x,
            CAST(floor(ln(CAST(x AS DOUBLE)) * 1000000) AS BIGINT) AS t6
          FROM r WHERE r <= 11),
        a AS (SELECT source,
            sum(CASE WHEN r <= 10 THEN t6 ELSE 0 END) AS s6,
            max(CASE WHEN r = 11 THEN t6 END) AS tk6,
            max(CASE WHEN r = 11 THEN x END) AS x_k1
          FROM t GROUP BY 1),
        n AS (SELECT source, CAST(count(*) AS BIGINT) AS n
          FROM d GROUP BY 1)
        SELECT a.source, n.n, CAST(10 AS BIGINT) AS k,
          x_k1 AS x_threshold,
          CASE WHEN s6 - 10 * tk6 > 0
            THEN CAST(10000000000000 // (s6 - 10 * tk6) AS DOUBLE) / 1e6
          END AS alpha
        FROM a JOIN n USING (source) ORDER BY a.source""",
    // value-set-collapse midranks (exact doubled integers), Pearson
    // moments in HUGEINT (= the engine's DECIMAL(38,0) lift), identical
    // double division
    "q232_rank_corr" ->
      """WITH d AS (SELECT source AS g, CAST(n_chars AS BIGINT) AS va,
            CAST(len(list_distinct(list_filter(string_split(text, ' '),
              x -> x <> ''))) AS BIGINT) AS vb
          FROM documents),
        ga AS (SELECT g, va, CAST(count(*) AS BIGINT) AS c
          FROM d GROUP BY 1, 2),
        ra AS (SELECT g, va, 2 * (sum(c) OVER (PARTITION BY g ORDER BY va
            ROWS UNBOUNDED PRECEDING) - c) + c + 1 AS r2 FROM ga),
        gb AS (SELECT g, vb, CAST(count(*) AS BIGINT) AS c
          FROM d GROUP BY 1, 2),
        rb AS (SELECT g, vb, 2 * (sum(c) OVER (PARTITION BY g ORDER BY vb
            ROWS UNBOUNDED PRECEDING) - c) + c + 1 AS r2 FROM gb),
        j AS (SELECT d.g, ra.r2 AS ra2, rb.r2 AS rb2
          FROM d JOIN ra ON ra.g = d.g AND ra.va = d.va
                 JOIN rb ON rb.g = d.g AND rb.vb = d.vb),
        m AS (SELECT g, CAST(count(*) AS HUGEINT) AS n,
            sum(CAST(ra2 AS HUGEINT)) AS sa,
            sum(CAST(rb2 AS HUGEINT)) AS sb,
            sum(CAST(ra2 AS HUGEINT) * ra2) AS saa,
            sum(CAST(rb2 AS HUGEINT) * rb2) AS sbb,
            sum(CAST(ra2 AS HUGEINT) * rb2) AS sab
          FROM j GROUP BY 1)
        SELECT g AS source, CAST(n AS BIGINT) AS n,
          CASE WHEN CAST(n * saa - sa * sa AS DOUBLE) > 0
                AND CAST(n * sbb - sb * sb AS DOUBLE) > 0
            THEN CAST(floor(CAST(n * sab - sa * sb AS DOUBLE)
              / (sqrt(CAST(n * saa - sa * sa AS DOUBLE))
                 * sqrt(CAST(n * sbb - sb * sb AS DOUBLE)))
              * 1000000) AS DOUBLE) / 1e6
          END AS rho
        FROM m ORDER BY source""",
    // same pinned double chain inside ln, per-token millionth floor,
    // exact BIGINT dot product with the >= 0 clamp, directional table
    // joined to its transpose
    "q233_jsd_matrix" ->
      """WITH tk AS (SELECT source,
            unnest(list_filter(string_split(text, ' '), x -> x <> ''))
              AS tok
          FROM documents),
        c AS (SELECT source, tok, CAST(count(*) AS BIGINT) AS c
          FROM tk GROUP BY 1, 2),
        t AS (SELECT source, CAST(sum(c) AS BIGINT) AS t
          FROM c GROUP BY 1),
        a AS (SELECT c.source AS sa, tok, c.c AS ca, t.t AS ta
          FROM c JOIN t USING (source)),
        terms AS (SELECT a.sa, sb.source AS sb, a.ca, a.ta,
            sb.t AS tb, coalesce(b.c, 0) AS cb
          FROM a CROSS JOIN t sb
          LEFT JOIN c b ON b.source = sb.source AND b.tok = a.tok
          WHERE a.sa <> sb.source),
        l AS (SELECT sa, sb, ca, ta,
            CAST(floor(ln((2.0 * CAST(ca AS DOUBLE) * tb)
              / (CAST(ca AS DOUBLE) * tb + CAST(cb AS DOUBLE) * ta))
              * 1000000) AS BIGINT) AS l6
          FROM terms),
        dir AS (SELECT sa, sb,
            CAST(greatest(sum(ca * l6), 0) AS BIGINT) // max(ta) AS t6
          FROM l GROUP BY 1, 2)
        SELECT x.sa AS source_a, x.sb AS source_b,
          CAST((x.t6 + y.t6) // 2 AS DOUBLE) / 1e6 AS jsd
        FROM dir x JOIN dir y ON x.sa = y.sb AND x.sb = y.sa
        WHERE x.sa < x.sb ORDER BY source_a, source_b""",
    // the q206 fixture + score chain, descending cumulative TP/FP over
    // the collapsed score set, (J desc, threshold asc) top-1
    "q234_youden" ->
      """WITH d AS (SELECT doc_id, text,
            ((doc_id % 2147483648) * 2654435761) % 2147483647 AS h
          FROM documents),
        f AS (SELECT h % 2 = 0 AS pos,
            CASE WHEN h % 2 = 0 THEN text || ' of the is' ELSE text END
              AS text
          FROM d),
        t AS (SELECT pos, length(text) AS nc,
            len(list_filter(string_split(text,' '), x -> x <> '')) AS nw,
            length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS np,
            len(list_filter(string_split(text,' '),
                x -> x IN ('the','a','of','and','to','in','is','on','for','with')))
              AS ns
          FROM f),
        q AS (SELECT pos,
            floor((0.4*least(1.0, nw/50.0) + 0.3*(1.0 - np*1.0/nc)
                  + 0.3*least(1.0, ns*1.0/nw*5.0))*10000)/10000 AS s
          FROM t),
        g AS (SELECT s,
            CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS np,
            CAST(sum(CASE WHEN pos THEN 0 ELSE 1 END) AS BIGINT) AS nn
          FROM q GROUP BY s),
        cum AS (SELECT s,
            CAST(sum(np) OVER (ORDER BY s DESC
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS tp,
            CAST(sum(nn) OVER (ORDER BY s DESC
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS fp
          FROM g),
        tot AS (SELECT CAST(sum(np) AS BIGINT) AS n_pos,
            CAST(sum(nn) AS BIGINT) AS n_neg FROM g),
        j AS (SELECT s, tp, fp, n_pos, n_neg,
            tp * 1000000 // n_pos AS tpr6,
            fp * 1000000 // n_neg AS fpr6
          FROM cum, tot)
        SELECT s AS threshold, n_pos, n_neg, tp, fp,
          CAST(tpr6 AS DOUBLE) / 1e6 AS tpr,
          CAST(fpr6 AS DOUBLE) / 1e6 AS fpr,
          CAST(tpr6 - fpr6 AS DOUBLE) / 1e6 AS youden_j
        FROM j ORDER BY tpr6 - fpr6 DESC, s LIMIT 1""",
    // user lifetime spans, horizon censoring, collapsed-duration risk
    // sets, exact millionth steps, BIGINT cumulative
    "q235_hazard" ->
      """WITH sp AS (SELECT user_id, min(CAST(ts AS DATE)) AS f,
            max(CAST(ts AS DATE)) AS l
          FROM events GROUP BY 1),
        gm AS (SELECT max(CAST(ts AS DATE)) AS gmax FROM events),
        u AS (SELECT CAST(date_diff('day', f, l) AS BIGINT) AS dur,
            date_diff('day', l, gmax) >= 7 AS observed
          FROM sp, gm),
        g AS (SELECT dur, CAST(count(*) AS BIGINT) AS n_enter,
            CAST(sum(CASE WHEN observed THEN 1 ELSE 0 END) AS BIGINT)
              AS n_events
          FROM u GROUP BY 1),
        r AS (SELECT dur, n_events,
            CAST(sum(n_enter) OVER (ORDER BY dur DESC
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_risk
          FROM g),
        h AS (SELECT dur, n_risk, n_events,
            n_events * 1000000 // n_risk AS h6 FROM r),
        ch AS (SELECT dur, n_risk, n_events, h6,
            CAST(sum(h6) OVER (ORDER BY dur
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS ch6 FROM h)
        SELECT dur AS duration_days, n_risk, n_events,
          CAST(h6 AS DOUBLE) / 1e6 AS hazard,
          CAST(ch6 AS DOUBLE) / 1e6 AS cum_hazard
        FROM ch ORDER BY duration_days""",
    // same Lloyd chains per k, same sorted-distance silhouette floors
    "q249_silhouette" -> silhouetteOracle(Seq(2, 4, 8), 3, 64),

    // same order-statistic clips, rank-interval overlaps, nested-floor
    // millionth means
    "q251_winsorized" ->
      """WITH g AS (SELECT source AS _g, CAST(n_chars AS BIGINT) AS v,
            CAST(count(*) AS BIGINT) AS c
          FROM documents GROUP BY 1, 2),
        cum AS (SELECT _g, v, c,
            sum(c) OVER (PARTITION BY _g ORDER BY v
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
            sum(c) OVER (PARTITION BY _g) AS n
          FROM g),
        b AS (SELECT _g, CAST(max(n) AS BIGINT) AS n,
            CAST(max((5 * n) // 100) AS BIGINT) AS k,
            min(CASE WHEN cum > (5 * n) // 100 THEN v END) AS lo_clip,
            min(CASE WHEN cum > n - 1 - ((5 * n) // 100) THEN v END)
              AS hi_clip
          FROM cum GROUP BY _g),
        j AS (SELECT cum._g, b.n, b.k, b.lo_clip, b.hi_clip,
            cum.c * greatest(b.lo_clip, least(b.hi_clip, cum.v))
              AS clamped,
            greatest(0, least(cum.cum, b.n - b.k)
              - greatest(cum.cum - cum.c, b.k)) * cum.v AS kept
          FROM cum JOIN b ON cum._g = b._g),
        s AS (SELECT _g, max(n) AS n, max(k) AS n_clipped_per_end,
            max(lo_clip) AS lo_clip, max(hi_clip) AS hi_clip,
            CAST(sum(clamped) AS BIGINT) AS ws,
            CAST(sum(kept) AS BIGINT) AS ts
          FROM j GROUP BY _g)
        SELECT _g AS source, n, n_clipped_per_end, lo_clip, hi_clip,
          CAST((ws // n) * 1000000 + (ws % n) * 1000000 // n AS DOUBLE)
            / 1e6 AS winsorized_mean,
          CAST((ts // (n - 2 * n_clipped_per_end)) * 1000000
            + (ts % (n - 2 * n_clipped_per_end)) * 1000000
              // (n - 2 * n_clipped_per_end) AS DOUBLE) / 1e6
            AS trimmed_mean
        FROM s ORDER BY source""",

    // same half-unit median, second deviation collapse, quarter-unit
    // MAD, cross-multiplied 3.5-MAD census
    "q252_grouped_mad" ->
      """WITH t AS (SELECT event_type AS _g,
            CAST(floor(value * 100 + 0.5) AS BIGINT) AS v FROM events),
        g AS (SELECT _g, v, CAST(count(*) AS BIGINT) AS c
          FROM t GROUP BY 1, 2),
        cum AS (SELECT _g, v, c,
            sum(c) OVER (PARTITION BY _g ORDER BY v
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
            sum(c) OVER (PARTITION BY _g) AS n
          FROM g),
        m AS (SELECT _g, CAST(max(n) AS BIGINT) AS n,
            min(CASE WHEN cum > (n - 1) // 2 THEN v END) AS vlo,
            min(CASE WHEN cum > (n - 1) // 2 + 1 THEN v END) AS vhi
          FROM cum GROUP BY _g),
        med AS (SELECT _g, n,
            vlo * 2 + ((n - 1) % 2) * (coalesce(vhi, vlo) - vlo) AS med2
          FROM m),
        dv AS (SELECT g._g, abs(g.v * 2 - med.med2) AS d,
            CAST(sum(g.c) AS BIGINT) AS c
          FROM g JOIN med ON g._g = med._g GROUP BY 1, 2),
        cum2 AS (SELECT _g, d, c,
            sum(c) OVER (PARTITION BY _g ORDER BY d
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
            sum(c) OVER (PARTITION BY _g) AS n
          FROM dv),
        m2 AS (SELECT _g, CAST(max(n) AS BIGINT) AS n,
            min(CASE WHEN cum > (n - 1) // 2 THEN d END) AS vlo,
            min(CASE WHEN cum > (n - 1) // 2 + 1 THEN d END) AS vhi
          FROM cum2 GROUP BY _g),
        mad AS (SELECT _g,
            vlo * 2 + ((n - 1) % 2) * (coalesce(vhi, vlo) - vlo) AS mad_q
          FROM m2),
        cen AS (SELECT g._g,
            CAST(sum(CASE WHEN abs(g.v * 2 - med.med2) * 4 > mad.mad_q * 7
              THEN g.c ELSE 0 END) AS BIGINT) AS n_outliers
          FROM g JOIN med ON g._g = med._g JOIN mad ON g._g = mad._g
          GROUP BY g._g)
        SELECT med._g AS event_type, med.n,
          CAST(med2 AS DOUBLE) / 2 AS median,
          CAST(mad_q AS DOUBLE) / 4 AS mad, n_outliers
        FROM med JOIN mad ON med._g = mad._g JOIN cen ON med._g = cen._g
        ORDER BY event_type""",

    // same nested train slices, cumulative count tables, add-one JM
    // smoothing, per-transition millionth floors, and log-log LSQ
    "q250_loss_curve" ->
      """WITH b AS (SELECT doc_id,
            list_filter(string_split(text, ' '), x -> x <> '') AS w,
            ((doc_id % 2147483648) * 2654435761) % 2147483647 AS h
          FROM documents),
        bb AS (SELECT doc_id, w, h % 10 = 0 AS is_eval,
            (h // 10) % 5 AS slice FROM b),
        tr AS (SELECT slice, w FROM bb WHERE NOT is_eval),
        us AS (SELECT slice, token, CAST(count(*) AS BIGINT) AS c FROM
            (SELECT slice, unnest(w) AS token FROM tr) u GROUP BY 1, 2),
        cp AS (SELECT unnest(generate_series(1, 5)) AS cp),
        uc AS (SELECT cp, token, CAST(sum(c) AS BIGINT) AS c1
          FROM us JOIN cp ON us.slice < cp.cp GROUP BY 1, 2),
        bs AS (SELECT slice, prev, cur, CAST(count(*) AS BIGINT) AS c
          FROM (SELECT slice, w[i] AS prev, w[i+1] AS cur FROM
            (SELECT slice, w, unnest(generate_series(1, len(w)-1)) AS i
             FROM tr WHERE len(w) >= 2) t) p
          GROUP BY 1, 2, 3),
        bc AS (SELECT cp, prev, cur, CAST(sum(c) AS BIGINT) AS c2
          FROM bs JOIN cp ON bs.slice < cp.cp GROUP BY 1, 2, 3),
        tot AS (SELECT cp, CAST(sum(c1) AS BIGINT) AS n_tok,
            CAST(count(*) AS BIGINT) AS v FROM uc GROUP BY cp),
        ho AS (SELECT prev, cur, CAST(count(*) AS BIGINT) AS n_t FROM
            (SELECT w[i] AS prev, w[i+1] AS cur FROM
              (SELECT w, unnest(generate_series(1, len(w)-1)) AS i
               FROM bb WHERE is_eval AND len(w) >= 2) t) e
          GROUP BY 1, 2),
        sc AS (SELECT cp.cp, ho.n_t,
            coalesce(bc.c2, 0) AS c2, coalesce(up.c1, 0) AS c_prev,
            coalesce(ucu.c1, 0) AS c_cur, tot.n_tok, tot.v
          FROM ho CROSS JOIN cp
          LEFT JOIN bc ON bc.cp = cp.cp AND bc.prev = ho.prev
            AND bc.cur = ho.cur
          LEFT JOIN uc up ON up.cp = cp.cp AND up.token = ho.prev
          LEFT JOIN uc ucu ON ucu.cp = cp.cp AND ucu.token = ho.cur
          JOIN tot ON tot.cp = cp.cp),
        q AS (SELECT cp, n_t,
            CAST(floor(-ln(0.5 * (CASE WHEN c_prev > 0
                THEN CAST(c2 AS DOUBLE) / c_prev ELSE 0 END)
              + 0.5 * CAST(c_cur + 1 AS DOUBLE)
                / CAST(n_tok + v AS DOUBLE)) * 1000000) AS BIGINT) AS q6
          FROM sc),
        xe AS (SELECT cp, CAST(sum(n_t) AS BIGINT) AS n_trans,
            CAST(sum(n_t * q6) AS BIGINT) // CAST(sum(n_t) AS BIGINT)
              AS xent6
          FROM q GROUP BY cp),
        pts AS (SELECT
            CAST(floor(ln(CAST(n_tok AS DOUBLE)) * 1000) AS BIGINT) AS x,
            CAST(floor(ln(CAST(xent6 AS DOUBLE) / 1e6) * 1000) AS BIGINT)
              AS y
          FROM xe JOIN tot USING (cp)),
        mm AS (SELECT CAST(count(*) AS BIGINT) AS n,
            CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
            CAST(sum(x*x) AS BIGINT) AS sxx,
            CAST(sum(x*y) AS BIGINT) AS sxy,
            CAST(sum(y*y) AS BIGINT) AS syy FROM pts),
        ft AS (SELECT
            CAST(floor(CAST(n*sxy - sx*sy AS DOUBLE)
              / CAST(n*sxx - sx*sx AS DOUBLE) * 10000) AS DOUBLE) / 1e4
              AS slope,
            CAST(floor(CAST(n*sxy - sx*sy AS DOUBLE)
                * CAST(n*sxy - sx*sy AS DOUBLE)
              / (CAST(n*sxx - sx*sx AS DOUBLE)
                * CAST(n*syy - sy*sy AS DOUBLE)) * 1000000) AS DOUBLE)
              / 1e6 AS r2
          FROM mm)
        SELECT xe.cp AS checkpoint, tot.n_tok AS n_train_tokens,
          n_trans AS n_holdout_transitions,
          CAST(xent6 AS DOUBLE) / 1e6 AS xent, slope, r2
        FROM xe JOIN tot USING (cp) CROSS JOIN ft
        ORDER BY checkpoint""",

    // same censoring contract as q235, the product-limit fold replayed
    // as a recursive CTE over the duration value set
    "q246_kaplan_meier" ->
      """WITH RECURSIVE sp AS (SELECT user_id, min(CAST(ts AS DATE)) AS f,
            max(CAST(ts AS DATE)) AS l
          FROM events GROUP BY 1),
        gm AS (SELECT max(CAST(ts AS DATE)) AS gmax FROM events),
        u AS (SELECT CAST(date_diff('day', f, l) AS BIGINT) AS dur,
            date_diff('day', l, gmax) >= 7 AS observed
          FROM sp, gm),
        g AS (SELECT dur, CAST(count(*) AS BIGINT) AS n_enter,
            CAST(sum(CASE WHEN observed THEN 1 ELSE 0 END) AS BIGINT)
              AS n_events
          FROM u GROUP BY 1),
        r AS (SELECT dur, n_events,
            CAST(sum(n_enter) OVER (ORDER BY dur DESC
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_risk
          FROM g),
        rn AS (SELECT dur, n_risk, n_events,
            CAST(row_number() OVER (ORDER BY dur) AS BIGINT) AS i
          FROM r),
        km(i, dur, n_risk, n_events, s6) AS (
          SELECT i, dur, n_risk, n_events,
              1000000 * (n_risk - n_events) // n_risk
            FROM rn WHERE i = 1
          UNION ALL
          SELECT rn.i, rn.dur, rn.n_risk, rn.n_events,
              km.s6 * (rn.n_risk - rn.n_events) // rn.n_risk
            FROM rn JOIN km ON rn.i = km.i + 1)
        SELECT dur AS duration_days, n_risk, n_events,
          CAST(s6 AS DOUBLE) / 1e6 AS survival
        FROM km ORDER BY duration_days""",

    // same whitespace tokens, same fof counts, same integer correction
    "q247_chao1" ->
      """WITH t AS (SELECT source,
            unnest(list_filter(string_split(text, ' '), x -> x <> ''))
              AS w
          FROM documents),
        f AS (SELECT source, w, CAST(count(*) AS BIGINT) AS c
          FROM t GROUP BY 1, 2),
        s AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_tokens,
            CAST(count(*) AS BIGINT) AS d_observed,
            CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
            CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2
          FROM f GROUP BY source)
        SELECT source, n_tokens, d_observed, f1, f2,
          d_observed + CASE WHEN f2 > 0 THEN f1 * f1 // (2 * f2)
            ELSE f1 * (f1 - 1) // (2 * (f2 + 1)) END AS chao1,
          CAST((n_tokens - f1) * 1000000 // n_tokens AS DOUBLE) / 1e6
            AS coverage
        FROM s ORDER BY source""",

    // same sparse ratings rebuild, same co-rated pair relation and
    // nested-floor expectation, kappa from the two quantized values
    "q248_kappa_matrix" ->
      """WITH base0 AS (SELECT source, doc_id AS item_id FROM documents),
        r AS (SELECT source, item_id, rater,
            ((item_id % 2147483648) * 2654435761) % 2147483647 AS h
          FROM base0 CROSS JOIN
            (SELECT unnest(generate_series(0, 4)) AS rater)),
        rr AS (SELECT source, item_id, rater,
            CASE WHEN (h + rater * 17) % 10 < 3
              THEN (h % 4 + 1 + (h % 97 + rater) % 3) % 4
              ELSE h % 4 END AS cat
          FROM r WHERE (h + rater * 23) % 5 <> 0),
        p AS (SELECT a.source, a.item_id, a.rater AS ra, b.rater AS rb,
            a.cat AS ca, b.cat AS cb
          FROM rr a JOIN rr b ON a.source = b.source
            AND a.item_id = b.item_id AND a.rater < b.rater),
        pairs AS (SELECT source, ra, rb, CAST(count(*) AS BIGINT) AS n,
            CAST(sum(CASE WHEN ca = cb THEN 1 ELSE 0 END) AS BIGINT)
              AS agree
          FROM p GROUP BY 1, 2, 3),
        ma AS (SELECT source, ra, rb, ca AS cat,
            CAST(count(*) AS BIGINT) AS na FROM p GROUP BY 1, 2, 3, 4),
        mb AS (SELECT source, ra, rb, cb AS cat,
            CAST(count(*) AS BIGINT) AS nb FROM p GROUP BY 1, 2, 3, 4),
        xx AS (SELECT ma.source, ma.ra, ma.rb,
            CAST(sum(na * nb) AS BIGINT) AS x
          FROM ma JOIN mb ON ma.source = mb.source AND ma.ra = mb.ra
            AND ma.rb = mb.rb AND ma.cat = mb.cat
          GROUP BY 1, 2, 3),
        q AS (SELECT pairs.source, ra, rb, n,
            agree * 1000000 // n AS po6,
            ((coalesce(x, 0) // n) * 1000000
              + (coalesce(x, 0) % n) * 1000000 // n) // n AS pe6
          FROM pairs LEFT JOIN xx USING (source, ra, rb))
        SELECT source, ra AS rater_a, rb AS rater_b, n,
          CAST(po6 AS DOUBLE) / 1e6 AS p_obs,
          CAST(pe6 AS DOUBLE) / 1e6 AS p_exp,
          CASE WHEN pe6 < 1000000 THEN
            CAST((po6 - pe6) * 1000000 // (1000000 - pe6) AS DOUBLE) / 1e6
          END AS kappa
        FROM q ORDER BY source, rater_a, rater_b""",

    // same doubled-midrank chain in HUGEINT: rank2 = 2*cum - ct + 1,
    // 2U1 = sum(c*rank2) - n1(n1+1), 4Var = n1*n2*(N^3-N-T) // 3N(N-1),
    // z6 = floor((2U1 - n1n2)*1e6 / sqrt(4Var)), rb6 exact truncating
    "q253_mann_whitney" ->
      """WITH g AS (SELECT source AS gsrc, CAST(n_chars AS BIGINT) AS v,
            CAST(count(*) AS BIGINT) AS c FROM documents GROUP BY 1, 2),
        vals AS (SELECT v, CAST(sum(c) AS BIGINT) AS ct FROM g GROUP BY v),
        rk AS (SELECT v, ct, 2 * sum(ct) OVER (ORDER BY v
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - ct + 1
            AS rank2
          FROM vals),
        tie AS (SELECT CAST(sum(CAST(ct AS HUGEINT) * ct * ct - ct)
            AS HUGEINT) AS t FROM vals),
        na AS (SELECT CAST(sum(c) AS BIGINT) AS nall FROM g),
        per AS (SELECT gsrc, CAST(sum(c) AS BIGINT) AS n1,
            CAST(sum(c * rank2) AS BIGINT) AS r2
          FROM g JOIN rk USING (v) GROUP BY gsrc),
        st AS (SELECT gsrc, n1, nall - n1 AS n2,
            r2 - n1 * (n1 + 1) AS u2,
            CASE WHEN nall > 1 THEN CAST(n1 AS HUGEINT) * (nall - n1) *
              (CAST(nall AS HUGEINT) * nall * nall - nall
                - (SELECT t FROM tie))
              // (3 * CAST(nall AS HUGEINT) * (nall - 1)) END AS v4
          FROM per, na)
        SELECT gsrc AS source, n1 AS n_group, n2 AS n_rest, u2,
          CASE WHEN n2 > 0 AND v4 > 0 THEN
            CAST(floor(CAST(u2 - n1 * n2 AS DOUBLE) * 1e6
              / sqrt(CAST(v4 AS DOUBLE))) AS DOUBLE) / 1e6 END AS z,
          CASE WHEN n2 > 0 THEN
            CAST(CAST(u2 - n1 * n2 AS HUGEINT) * 1000000
              // (CAST(n1 AS HUGEINT) * n2) AS DOUBLE) / 1e6
          END AS rank_biserial,
          CASE WHEN n2 > 0 AND v4 > 0 THEN
            abs(floor(CAST(u2 - n1 * n2 AS DOUBLE) * 1e6
              / sqrt(CAST(v4 AS DOUBLE)))) > 1959964 END AS shifted
        FROM st ORDER BY source""",

    // same censoring reduction as q246, parity cohorts, the same
    // grid/descending-cumulative risk sets and quantized E6/V6 sums
    "q254_log_rank" ->
      """WITH sp AS (SELECT user_id, min(CAST(ts AS DATE)) AS f,
            max(CAST(ts AS DATE)) AS l
          FROM events GROUP BY 1),
        gm AS (SELECT max(CAST(ts AS DATE)) AS gmax FROM events),
        u AS (SELECT CASE WHEN user_id % 2 = 0 THEN 'cohort_even'
              ELSE 'cohort_odd' END AS g,
            CAST(date_diff('day', f, l) AS BIGINT) AS dur,
            date_diff('day', l, gmax) >= 7 AS obs
          FROM sp, gm),
        g2 AS (SELECT dur, g, CAST(count(*) AS BIGINT) AS enter,
            CAST(sum(CASE WHEN obs THEN 1 ELSE 0 END) AS BIGINT) AS ev
          FROM u GROUP BY 1, 2),
        gl AS (SELECT DISTINCT g FROM g2),
        vals AS (SELECT DISTINCT dur FROM g2),
        grid AS (SELECT vals.dur, gl.g, coalesce(g2.enter, 0) AS enter,
            coalesce(g2.ev, 0) AS ev
          FROM vals CROSS JOIN gl
          LEFT JOIN g2 ON g2.dur = vals.dur AND g2.g = gl.g),
        risk AS (SELECT dur, g, ev,
            sum(enter) OVER (PARTITION BY g ORDER BY dur DESC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS atrisk
          FROM grid),
        pd AS (SELECT dur, CAST(sum(atrisk) AS BIGINT) AS n,
            CAST(sum(ev) AS BIGINT) AS dd,
            CAST(sum(CASE WHEN g = 'cohort_even' THEN atrisk ELSE 0 END)
              AS BIGINT) AS na_,
            CAST(sum(CASE WHEN g = 'cohort_even' THEN ev ELSE 0 END)
              AS BIGINT) AS da
          FROM risk GROUP BY dur),
        terms AS (SELECT da, dd,
            CAST(dd AS HUGEINT) * na_ * 1000000 // n AS e6,
            CASE WHEN n > 1 THEN CAST(dd AS HUGEINT) * na_ * (n - na_)
              * (n - dd) * 1000000
              // (CAST(n AS HUGEINT) * n * (n - 1)) ELSE 0 END AS v6
          FROM pd),
        s AS (SELECT CAST(sum(e6) AS HUGEINT) AS e6s,
            CAST(sum(v6) AS HUGEINT) AS v6s,
            CAST(sum(da) AS BIGINT) AS oa,
            CAST(sum(dd) AS BIGINT) AS ot
          FROM terms),
        cnt AS (SELECT CAST(sum(CASE WHEN g = 'cohort_even' THEN 1
              ELSE 0 END) AS BIGINT) AS na2,
            CAST(sum(CASE WHEN g = 'cohort_odd' THEN 1 ELSE 0 END)
              AS BIGINT) AS nb2
          FROM u)
        SELECT 'cohort_even' AS group_a, 'cohort_odd' AS group_b,
          na2 AS n_a, nb2 AS n_b, oa AS events_a, ot AS events_total,
          CAST(e6s AS DOUBLE) / 1e6 AS expected_a,
          CASE WHEN v6s > 0 THEN
            CAST(CAST(oa * 1000000 - e6s AS HUGEINT)
              * (oa * 1000000 - e6s) // v6s AS DOUBLE) / 1e6 END AS chi2,
          CASE WHEN v6s > 0 THEN
            CAST(oa * 1000000 - e6s AS HUGEINT)
              * (oa * 1000000 - e6s) // v6s > 3841459 END AS significant
        FROM s, cnt""",

    // same value-set cells, one strict-x-dominance cells^2 join per
    // source, exact tie terms, one IEEE sqrt of the exact tie product
    "q255_kendall_tau" ->
      """WITH d2 AS (SELECT source, CAST(n_chars AS BIGINT) // 200 AS x,
            CAST(len(list_filter(string_split(text, ' '), s -> s <> ''))
              AS BIGINT) // 20 AS y
          FROM documents),
        cells AS (SELECT source, x, y, CAST(count(*) AS BIGINT) AS c
          FROM d2 GROUP BY 1, 2, 3),
        cd AS (SELECT a.source,
            CAST(sum(CASE WHEN a.y < b.y THEN a.c * b.c ELSE 0 END)
              AS BIGINT) AS nc,
            CAST(sum(CASE WHEN a.y > b.y THEN a.c * b.c ELSE 0 END)
              AS BIGINT) AS nd
          FROM cells a JOIN cells b
            ON a.source = b.source AND a.x < b.x
          GROUP BY 1),
        ng AS (SELECT source, CAST(sum(c) AS BIGINT) AS n
          FROM cells GROUP BY 1),
        tx AS (SELECT source,
            CAST(sum(tc * (tc - 1)) // 2 AS BIGINT) AS ties_x
          FROM (SELECT source, x, CAST(sum(c) AS BIGINT) AS tc
            FROM cells GROUP BY 1, 2) GROUP BY 1),
        ty AS (SELECT source,
            CAST(sum(tc * (tc - 1)) // 2 AS BIGINT) AS ties_y
          FROM (SELECT source, y, CAST(sum(c) AS BIGINT) AS tc
            FROM cells GROUP BY 1, 2) GROUP BY 1),
        j AS (SELECT ng.source, n, coalesce(nc, 0) AS concordant,
            coalesce(nd, 0) AS discordant, ties_x, ties_y,
            n * (n - 1) // 2 AS n0
          FROM ng LEFT JOIN cd USING (source)
            JOIN tx USING (source) JOIN ty USING (source))
        SELECT source, n, concordant, discordant, ties_x, ties_y,
          CASE WHEN n0 > ties_x AND n0 > ties_y THEN
            CAST(floor(CAST(concordant - discordant AS DOUBLE) * 1e6
              / sqrt(CAST(CAST(n0 - ties_x AS HUGEINT)
                * (n0 - ties_y) AS DOUBLE))) AS DOUBLE) / 1e6
          END AS tau
        FROM j ORDER BY source""",

    // same truncating slope6 pairs over the daily table, same pinned
    // lower-median rank on (slope6, xi, xj) / (lev6, day)
    "q256_theil_sen" ->
      """WITH daily AS (SELECT event_type AS k, CAST(ts AS DATE) AS day,
            CAST(count(*) AS BIGINT) AS cnt
          FROM events GROUP BY 1, 2),
        d2 AS (SELECT k, day, cnt,
            CAST(date_diff('day', DATE '1970-01-01', day) AS BIGINT) AS x
          FROM daily),
        pairs AS (SELECT a.k AS k, a.x AS xi, b.x AS xj,
            (b.cnt - a.cnt) * 1000000 // (b.x - a.x) AS slope6
          FROM d2 a JOIN d2 b ON a.k = b.k AND a.x < b.x),
        m AS (SELECT k, CAST(count(*) AS BIGINT) AS n_pairs
          FROM pairs GROUP BY k),
        pr AS (SELECT k, slope6, CAST(row_number() OVER (PARTITION BY k
            ORDER BY slope6, xi, xj) AS BIGINT) AS rn
          FROM pairs),
        med AS (SELECT pr.k, m.n_pairs, pr.slope6
          FROM pr JOIN m ON pr.k = m.k AND pr.rn = (m.n_pairs + 1) // 2),
        nd AS (SELECT k, CAST(count(*) AS BIGINT) AS n_days
          FROM d2 GROUP BY k),
        lv AS (SELECT d2.k AS k, cnt * 1000000 - med.slope6 * x AS lev6,
            day FROM d2 JOIN med ON d2.k = med.k),
        lr AS (SELECT k, lev6, CAST(row_number() OVER (PARTITION BY k
            ORDER BY lev6, day) AS BIGINT) AS rn
          FROM lv),
        ic AS (SELECT lr.k, lr.lev6
          FROM lr JOIN nd ON lr.k = nd.k AND lr.rn = (nd.n_days + 1) // 2)
        SELECT nd.k AS event_type, n_days,
          coalesce(n_pairs, 0) AS n_pairs,
          CAST(slope6 AS DOUBLE) / 1e6 AS slope_per_day,
          CAST(lev6 AS DOUBLE) / 1e6 AS level
        FROM nd LEFT JOIN med ON nd.k = med.k
          LEFT JOIN ic ON nd.k = ic.k
        ORDER BY event_type""",

    // same cell census, exact T*N and HUGEINT variance product, the
    // same one defined floor and one IEEE sqrt
    "q257_cochran_armitage" ->
      """WITH c AS (SELECT source, CAST(n_chars AS BIGINT) // 200 AS w,
            CAST(count(*) AS BIGINT) AS n,
            CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
              AS n1
          FROM documents GROUP BY 1, 2),
        s AS (SELECT source, CAST(sum(n) AS BIGINT) AS n,
            CAST(sum(n1) AS BIGINT) AS n_flag,
            CAST(sum(w * n) AS BIGINT) AS sw,
            CAST(sum(w * n1) AS BIGINT) AS sw1,
            CAST(sum(w * w * n) AS BIGINT) AS sww
          FROM c GROUP BY source),
        t AS (SELECT source, n, n_flag, n * sw1 - n_flag * sw AS tn,
            CAST(n_flag AS HUGEINT) * (n - n_flag) *
              (CAST(n AS HUGEINT) * sww - CAST(sw AS HUGEINT) * sw)
              // n AS v
          FROM s)
        SELECT source, n, n_flag, tn AS t_n,
          CASE WHEN v > 0 THEN CAST(floor(CAST(tn AS DOUBLE) * 1e6
            / sqrt(CAST(v AS DOUBLE))) AS DOUBLE) / 1e6 END AS z,
          CASE WHEN v > 0 THEN abs(floor(CAST(tn AS DOUBLE) * 1e6
            / sqrt(CAST(v AS DOUBLE)))) > 1959964 END AS trending
        FROM t ORDER BY source""",

    // same running-mean/min cumulative windows over the daily table,
    // delta6 = 0, lambda6 = 50000000
    "q258_page_hinkley" ->
      """WITH daily AS (SELECT event_type AS k, CAST(ts AS DATE) AS day,
            CAST(count(*) AS BIGINT) AS n
          FROM events GROUP BY 1, 2),
        w AS (SELECT k, day, n,
            CAST(row_number() OVER (PARTITION BY k ORDER BY day)
              AS BIGINT) AS t,
            CAST(sum(n) OVER (PARTITION BY k ORDER BY day
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS cum
          FROM daily),
        tm AS (SELECT k, day,
            n * 1000000 - (cum * 1000000 // t) AS term FROM w),
        mm AS (SELECT k, day, sum(term) OVER (PARTITION BY k ORDER BY day
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS m6
          FROM tm),
        ex AS (SELECT k, day, m6 - min(m6) OVER (PARTITION BY k
            ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS exc6
          FROM mm)
        SELECT k AS event_type, CAST(count(*) AS BIGINT) AS n_days,
          CAST(max(exc6) AS DOUBLE) / 1e6 AS max_excursion,
          min(CASE WHEN exc6 > 50000000 THEN day END) AS first_alarm,
          CASE WHEN min(CASE WHEN exc6 > 50000000 THEN day END) IS NULL
            THEN 'stable' ELSE 'drift' END AS verdict
        FROM ex GROUP BY k ORDER BY event_type""",

    // same two snapshot slices, same short-doc gram convention, same
    // row-local version Jaccard with the 1e-4 floor
    "q259_snapshot_diff" ->
      """WITH v1 AS (SELECT doc_id, text FROM documents
          WHERE doc_id % 10 <> 0),
        v2 AS (SELECT doc_id, CASE WHEN doc_id % 7 = 0
              THEN text || ' revision marker two' ELSE text END AS text
          FROM documents WHERE doc_id % 10 <> 3),
        j AS (SELECT coalesce(v1.doc_id, v2.doc_id) AS doc_id,
            v1.text AS t1, v2.text AS t2
          FROM v1 FULL JOIN v2 ON v1.doc_id = v2.doc_id),
        g AS (SELECT doc_id, t1, t2,
            list_filter(string_split(t1, ' '), x -> x <> '') AS w1,
            list_filter(string_split(t2, ' '), x -> x <> '') AS w2
          FROM j),
        g2 AS (SELECT doc_id, t1, t2,
            list_distinct(CASE WHEN len(w1) >= 3
              THEN list_transform(generate_series(1, len(w1) - 2),
                i -> array_to_string(w1[i:i+2], ' '))
              ELSE [array_to_string(w1, ' ')] END) AS sa,
            list_distinct(CASE WHEN len(w2) >= 3
              THEN list_transform(generate_series(1, len(w2) - 2),
                i -> array_to_string(w2[i:i+2], ' '))
              ELSE [array_to_string(w2, ' ')] END) AS sb
          FROM g),
        g3 AS (SELECT doc_id, t1, t2,
            len(list_filter(sa, x -> list_contains(sb, x))) AS inter,
            len(sa) AS la, len(sb) AS lb
          FROM g2)
        SELECT doc_id,
          CASE WHEN t1 IS NULL THEN 'added'
               WHEN t2 IS NULL THEN 'removed'
               WHEN t1 = t2 THEN 'unchanged'
               WHEN floor(1.0 * inter / (la + lb - inter) * 10000)
                 / 10000 >= 0.8 THEN 'minor_edit'
               ELSE 'rewrite' END AS status,
          CASE WHEN t1 IS NOT NULL AND t2 IS NOT NULL AND t1 <> t2
            THEN CAST(floor(1.0 * inter / (la + lb - inter) * 10000)
              / 10000 AS DOUBLE) END AS jaccard
        FROM g3 ORDER BY doc_id""",

    // same distinct (source, gram) relation (short-doc convention), same
    // gram-keyed intersections and integer-millionth divisions over the
    // dense pair spine
    "q261_source_containment" ->
      """WITH w0 AS (SELECT source,
            list_filter(string_split(text, ' '), x -> x <> '') AS w
          FROM documents),
        g AS (SELECT DISTINCT source AS s, gr FROM (
          SELECT source, unnest(CASE WHEN len(w) >= 3
              THEN list_transform(generate_series(1, len(w) - 2),
                i -> array_to_string(w[i:i+2], ' '))
              ELSE [array_to_string(w, ' ')] END) AS gr
          FROM w0) t),
        sz AS (SELECT s, CAST(count(*) AS BIGINT) AS n FROM g GROUP BY s),
        iv AS (SELECT a.s AS sa, b.s AS sb, CAST(count(*) AS BIGINT) AS i
          FROM g a JOIN g b ON a.gr = b.gr AND a.s < b.s
          GROUP BY 1, 2),
        sp AS (SELECT x.s AS sa, y.s AS sb, x.n AS na, y.n AS nb
          FROM sz x JOIN sz y ON x.s < y.s),
        j AS (SELECT sp.sa, sp.sb, na, nb, coalesce(i, 0) AS i
          FROM sp LEFT JOIN iv ON sp.sa = iv.sa AND sp.sb = iv.sb)
        SELECT sa AS source_a, sb AS source_b, na AS n_grams_a,
          nb AS n_grams_b, i AS n_shared,
          CAST(i * 1000000 // (na + nb - i) AS DOUBLE) / 1e6 AS jaccard,
          CAST(i * 1000000 // na AS DOUBLE) / 1e6 AS containment_a,
          CAST(i * 1000000 // nb AS DOUBLE) / 1e6 AS containment_b
        FROM j ORDER BY source_a, source_b""",

    // same doubled midranks per lang slice, HUGEINT term6/H6 chain,
    // the same explicit Wilson-Hilferty w*w*w cube
    "q262_kruskal_wallis" ->
      """WITH g AS (SELECT lang AS s, source AS grp, n_chars // 100 AS v,
            CAST(count(*) AS BIGINT) AS c FROM documents GROUP BY 1, 2, 3),
        vals AS (SELECT s, v, CAST(sum(c) AS BIGINT) AS ct
          FROM g GROUP BY 1, 2),
        rk AS (SELECT s, v, ct, 2 * sum(ct) OVER (PARTITION BY s ORDER BY v
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - ct + 1
            AS rank2
          FROM vals),
        ties AS (SELECT s, CAST(sum(CAST(ct AS HUGEINT) * ct * ct - ct)
              AS HUGEINT) AS t, CAST(sum(ct) AS BIGINT) AS nall
          FROM vals GROUP BY 1),
        per AS (SELECT g.s, g.grp, CAST(sum(c) AS BIGINT) AS n1,
            CAST(sum(c * rank2) AS BIGINT) AS r2
          FROM g JOIN rk ON g.s = rk.s AND g.v = rk.v GROUP BY 1, 2),
        t6 AS (SELECT s, grp,
            CAST(r2 AS HUGEINT) * r2 * 1000000 // (4 * n1) AS term6
          FROM per),
        ag AS (SELECT s, CAST(count(*) AS BIGINT) AS k,
            CAST(sum(term6) AS HUGEINT) AS sum6 FROM t6 GROUP BY 1),
        j AS (SELECT ag.s, k, nall,
            12 * sum6 // (CAST(nall AS HUGEINT) * (nall + 1))
              - 3 * (nall + 1) * 1000000 AS h6,
            CAST(nall AS HUGEINT) * nall * nall - nall - t AS denom,
            CAST(nall AS HUGEINT) * nall * nall - nall AS n3n
          FROM ag JOIN ties USING (s)),
        j2 AS (SELECT s, k, nall,
            CASE WHEN denom > 0 THEN h6 * n3n // denom END AS hadj6,
            CASE WHEN k >= 2 THEN 1.0 - 2.0 / (9.0 * (k - 1))
              + 1.6448536269514722 * sqrt(2.0 / (9.0 * (k - 1))) END AS wh
          FROM j),
        j3 AS (SELECT s, k, nall, hadj6,
            CASE WHEN k >= 2 THEN CAST(floor(
              CAST(k - 1 AS DOUBLE) * wh * wh * wh * 1e6) AS BIGINT)
            END AS crit6
          FROM j2)
        SELECT s AS lang, k, nall AS n,
          CAST(hadj6 AS DOUBLE) / 1e6 AS h,
          CAST(crit6 AS DOUBLE) / 1e6 AS crit_05,
          CASE WHEN hadj6 IS NOT NULL AND crit6 IS NOT NULL
            THEN hadj6 > crit6 END AS differs
        FROM j3 ORDER BY lang""",

    // same global value grid as q242's ksTest, per-cell quantized CDF
    // gap, gap6*dv integrated with lead() deltas
    "q263_wasserstein" ->
      """WITH g AS (SELECT source AS grp, CAST(n_chars AS BIGINT) AS v,
            CAST(count(*) AS BIGINT) AS c FROM documents GROUP BY 1, 2),
        vals AS (SELECT v, CAST(sum(c) AS BIGINT) AS ct FROM g GROUP BY 1),
        vc AS (SELECT v, ct, sum(ct) OVER (ORDER BY v
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumall,
            coalesce(lead(v) OVER (ORDER BY v) - v, 0) AS dv
          FROM vals),
        grps AS (SELECT grp, CAST(sum(c) AS BIGINT) AS n FROM g GROUP BY 1),
        na AS (SELECT CAST(sum(c) AS BIGINT) AS nall,
            max(v) - min(v) AS rng FROM g),
        grid AS (SELECT vc.v, vc.cumall, vc.dv, grps.grp, grps.n,
            coalesce(g.c, 0) AS c
          FROM vc CROSS JOIN grps
          LEFT JOIN g ON g.grp = grps.grp AND g.v = vc.v),
        cm AS (SELECT grp, n, v, dv, cumall,
            sum(c) OVER (PARTITION BY grp ORDER BY v
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
          FROM grid),
        fin AS (SELECT grp, n, nall - n AS nrest, dv, rng,
            CASE WHEN nall - n > 0 THEN abs(cum * 1000000 // n
              - (cumall - cum) * 1000000 // (nall - n)) END AS gap6
          FROM cm, na)
        SELECT grp AS source, max(n) AS n_group, max(nrest) AS n_rest,
          CAST(sum(gap6 * dv) AS DOUBLE) / 1e6 AS w1,
          CASE WHEN max(rng) > 0 THEN
            CAST(sum(gap6 * dv) // max(rng) AS DOUBLE) / 1e6 END AS w1_norm
        FROM fin GROUP BY grp ORDER BY source""",

    // same left-rank decile buckets over the corpus value set, +1/+10
    // Laplace shares, identical IEEE summands, clamp-then-floor
    "q264_psi_drift" ->
      """WITH g AS (SELECT source AS grp, CAST(n_chars AS BIGINT) AS v,
            CAST(count(*) AS BIGINT) AS c FROM documents GROUP BY 1, 2),
        vals AS (SELECT v, CAST(sum(c) AS BIGINT) AS ct FROM g GROUP BY 1),
        na AS (SELECT CAST(sum(c) AS BIGINT) AS nall FROM g),
        bk AS (SELECT v, ct, least(9, (sum(ct) OVER (ORDER BY v
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - ct)
              * 10 // nall) AS b
          FROM vals, na),
        base AS (SELECT b, CAST(sum(ct) AS BIGINT) AS nb FROM bk GROUP BY 1),
        gb AS (SELECT grp, b, CAST(sum(c) AS BIGINT) AS ngb
          FROM g JOIN bk USING (v) GROUP BY 1, 2),
        grps AS (SELECT grp, CAST(sum(c) AS BIGINT) AS n FROM g GROUP BY 1),
        spine AS (SELECT grps.grp, grps.n, base.b, base.nb, nall,
            coalesce(gb.ngb, 0) AS ngb
          FROM grps CROSS JOIN base
          LEFT JOIN gb ON gb.grp = grps.grp AND gb.b = base.b, na),
        sm AS (SELECT grp, max(n) AS n_group,
            floor(greatest(0.0, sum(
              (CAST(ngb + 1 AS DOUBLE) / (n + 10)
                - CAST(nb + 1 AS DOUBLE) / (nall + 10))
              * ln((CAST(ngb + 1 AS DOUBLE) / (n + 10))
                / (CAST(nb + 1 AS DOUBLE) / (nall + 10))))) * 1e6) / 1e6
              AS psi
          FROM spine GROUP BY grp)
        SELECT grp AS source, n_group, psi, psi > 0.2 AS action
        FROM sm ORDER BY source""",

    // same weighted doubled-midrank identity and in-block Lorenz
    // interpolation; the first block with cum >= m is located by a plain
    // min(CASE ...) over the strictly-increasing cum (no arg_min FILTER
    // — that construct proved version-sensitive across DuckDB builds,
    // round-10 verdict) and joined back for the in-block arithmetic.
    // Hashed columns are BIGINT millionths on BOTH sides (round-12
    // escalation): no float division anywhere in the contract. The
    // cumulative n/total columns come from windowed sum(BIGINT), which
    // DuckDB widens to HUGEINT (float64 through arrow) — cast back to
    // BIGINT in the final projection so the typed hash matches Spark's
    // int64 (round-12 verdict root cause).
    "q265_gini_tokens" ->
      """WITH d0 AS (SELECT source AS grp,
            CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
              AS BIGINT) AS v
          FROM documents),
        g AS (SELECT grp, v, CAST(count(*) AS BIGINT) AS c
          FROM d0 GROUP BY 1, 2),
        cm AS (SELECT grp, v, c,
            sum(c) OVER (PARTITION BY grp ORDER BY v
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
            sum(v * c) OVER (PARTITION BY grp ORDER BY v
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumx
          FROM g),
        tot AS (SELECT grp, max(cum) AS ntot, max(cumx) AS tt
          FROM cm GROUP BY 1),
        cuts AS (SELECT cm.grp, max(ntot) AS n, max(tt) AS total,
            CAST(sum(CAST(v AS HUGEINT) * c * (2 * cum - c + 1))
              AS HUGEINT) AS s1x2,
            min(CASE WHEN cum >= ntot // 2 THEN cum END) AS cut1,
            min(CASE WHEN cum >= ntot - ntot // 10 THEN cum END) AS cut2
          FROM cm JOIN tot ON cm.grp = tot.grp GROUP BY 1),
        agg AS (SELECT cuts.grp, n, total, s1x2,
            b1.cumx - b1.v * (b1.cum - n // 2) AS bhalf,
            b2.cumx - b2.v * (b2.cum - (n - n // 10)) AS below90
          FROM cuts
          LEFT JOIN cm b1 ON b1.grp = cuts.grp AND b1.cum = cuts.cut1
          LEFT JOIN cm b2 ON b2.grp = cuts.grp AND b2.cum = cuts.cut2)
        SELECT grp AS source,
          CAST(n AS BIGINT) AS n, CAST(total AS BIGINT) AS total,
          CASE WHEN total > 0 THEN
            CAST((s1x2 - (CAST(n AS HUGEINT) + 1) * total) * 1000000
              // (CAST(n AS HUGEINT) * total) AS BIGINT)
          END AS gini6,
          CASE WHEN total > 0 THEN
            CAST(CAST(bhalf AS HUGEINT) * 1000000 // total AS BIGINT)
          END AS bottom_half_share6,
          CASE WHEN total > 0 THEN
            CAST(CAST(total - below90 AS HUGEINT) * 1000000 // total
              AS BIGINT)
          END AS top_decile_share6
        FROM agg ORDER BY source""",

    // same chorded-ring fixture, same (deg,id) orientation, wedge join
    // and closing-edge join — every triangle counted once per vertex
    "q266_triangles" ->
      """WITH nn AS (SELECT count(*) AS n FROM documents),
        nodes AS (SELECT doc_id FROM documents),
        ring AS (SELECT doc_id AS src, (doc_id + 1) % n AS dst
          FROM nodes, nn),
        chords AS (SELECT doc_id AS src, (doc_id + 2) % n AS dst
          FROM nodes, nn
          WHERE (((doc_id % 2147483648) * 2654435761) % 2147483647)
            % 7 = 0),
        hub0 AS (SELECT doc_id AS src, (31*doc_id+7) % n AS d1,
            (17*doc_id+3) % n AS d2, (5*doc_id+11) % n AS d3
          FROM nodes, nn
          WHERE (((doc_id % 2147483648) * 2654435761) % 2147483647)
            % 3 = 0),
        hubs AS (SELECT src, unnest([d1, d2, d3]) AS dst FROM hub0),
        edges AS (SELECT DISTINCT src, dst FROM
            (SELECT src, dst FROM ring UNION ALL
             SELECT src, dst FROM chords UNION ALL
             SELECT src, dst FROM hubs)
          WHERE dst <> src),
        sym AS (SELECT DISTINCT src, dst FROM (
            SELECT src, dst FROM edges
            UNION ALL SELECT dst AS src, src AS dst FROM edges)),
        deg AS (SELECT src AS id, CAST(count(*) AS BIGINT) AS deg
          FROM sym GROUP BY 1),
        ori AS (SELECT s.src AS u, s.dst AS v, dv.deg AS dvv
          FROM sym s JOIN deg du ON s.src = du.id
            JOIN deg dv ON s.dst = dv.id
          WHERE du.deg < dv.deg
            OR (du.deg = dv.deg AND s.src < s.dst)),
        tri AS (SELECT a.u AS x, a.v AS y, b.v AS z
          FROM ori a JOIN ori b ON a.u = b.u
            AND (a.dvv < b.dvv OR (a.dvv = b.dvv AND a.v < b.v))
          JOIN ori c ON c.u = a.v AND c.v = b.v),
        pn AS (SELECT id, CAST(count(*) AS BIGINT) AS t FROM (
            SELECT x AS id FROM tri UNION ALL SELECT y FROM tri
            UNION ALL SELECT z FROM tri) GROUP BY 1)
        SELECT doc_id, coalesce(deg.deg, 0) AS degree,
          coalesce(pn.t, 0) AS triangles,
          CASE WHEN coalesce(deg.deg, 0) >= 2 THEN
            CAST(2 * coalesce(pn.t, 0) * 1000000
              // (deg.deg * (deg.deg - 1)) AS DOUBLE) / 1e6
          END AS clustering
        FROM nodes LEFT JOIN deg ON doc_id = deg.id
          LEFT JOIN pn ON doc_id = pn.id
        ORDER BY doc_id""",

    // same pair censuses over the dense margin spine, HUGEINT cell
    // terms, identical sqrt argument
    "q267_cramers_v" -> cramersOracle(Seq(
      ("source", "lang"), ("source", "len_bucket"),
      ("lang", "len_bucket"))),

    // same occupied-cell censuses, identical IEEE ratio/ln chains,
    // per-cell millionth floors then integer sums
    "q278_mutual_info" -> mutualInfoOracle(Seq(
      ("source", "lang"), ("source", "len_bucket"),
      ("lang", "len_bucket"))),

    "q320_theil_u" -> theilUOracle(Seq(
      ("source", "lang"), ("source", "len_bucket"),
      ("lang", "len_bucket"))),

    // same per-group x1e6 q/r-split S²/n terms (quantize-per-term then
    // integer-sum), same truncating F/eta2 divisions, same
    // Wilson–Hilferty cube for the chi2 gate
    "q279_anova" ->
      """WITH g AS (SELECT lang, source, CAST(n_chars AS BIGINT) AS v
            FROM documents),
        grp AS (SELECT lang, source, CAST(count(*) AS BIGINT) AS n,
            CAST(sum(v) AS BIGINT) AS s,
            CAST(sum(CAST(v AS HUGEINT) * v) AS HUGEINT) AS q
          FROM g GROUP BY 1, 2),
        t AS (SELECT lang, source, n, s, q,
            (CAST(s AS HUGEINT) * s // n) * 1000000
              + (CAST(s AS HUGEINT) * s % n) * 1000000 // n AS t6
          FROM grp),
        sl AS (SELECT lang, CAST(count(*) AS BIGINT) AS k,
            CAST(sum(n) AS BIGINT) AS n, CAST(sum(s) AS BIGINT) AS stot,
            CAST(sum(q) AS HUGEINT) AS q, CAST(sum(t6) AS HUGEINT) AS a6
          FROM t GROUP BY 1),
        c AS (SELECT lang, k, n, q, a6,
            (CAST(stot AS HUGEINT) * stot // n) * 1000000
              + (CAST(stot AS HUGEINT) * stot % n) * 1000000 // n AS c6
          FROM sl),
        f AS (SELECT lang, k, n, a6 - c6 AS ssb6,
            q * 1000000 - a6 AS ssw6, q * 1000000 - c6 AS sst6,
            k - 1 AS dfb, n - k AS dfw FROM c),
        r0 AS (SELECT lang, k, n, dfb,
            CASE WHEN dfb > 0 AND dfw > 0 AND ssw6 > 0 THEN
              ssb6 * dfw * 1000000 // (ssw6 * dfb) END AS f6,
            CASE WHEN sst6 > 0 THEN ssb6 * 1000000 // sst6 END AS eta6,
            CASE WHEN dfb >= 1 THEN 1.0 - 2.0 / (9.0 * CAST(dfb AS DOUBLE))
              + 1.6448536269514722
                * sqrt(2.0 / (9.0 * CAST(dfb AS DOUBLE))) END AS wh
          FROM f),
        r AS (SELECT lang, k, n, dfb, f6, eta6,
            CASE WHEN dfb >= 1 THEN CAST(floor(CAST(dfb AS DOUBLE)
              * wh * wh * wh * 1e6) AS BIGINT) END AS crit6
          FROM r0)
        SELECT lang, k, n, CAST(f6 AS DOUBLE) / 1e6 AS f_stat,
          CAST(eta6 AS DOUBLE) / 1e6 AS eta2,
          CASE WHEN f6 IS NOT NULL AND crit6 IS NOT NULL
            THEN f6 * dfb > crit6 END AS significant
        FROM r ORDER BY lang""",

    // same lower-median cut on the group value set, |v-m| re-census,
    // then the IDENTICAL exact F chain
    "q280_brown_forsythe" ->
      """WITH g0 AS (SELECT lang, source, CAST(n_chars AS BIGINT) AS v,
            CAST(count(*) AS BIGINT) AS c
          FROM documents GROUP BY 1, 2, 3),
        ng AS (SELECT lang, source, CAST(sum(c) AS BIGINT) AS ng
          FROM g0 GROUP BY 1, 2),
        cm AS (SELECT lang, source, v, c,
            sum(c) OVER (PARTITION BY lang, source ORDER BY v
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
          FROM g0),
        med AS (SELECT cm.lang, cm.source, min(v) AS m
          FROM cm JOIN ng ON cm.lang = ng.lang AND cm.source = ng.source
          WHERE cum >= (ng + 1) // 2 GROUP BY 1, 2),
        z AS (SELECT g0.lang, g0.source, abs(v - m) AS v,
            CAST(sum(c) AS BIGINT) AS c
          FROM g0 JOIN med ON g0.lang = med.lang AND g0.source = med.source
          GROUP BY 1, 2, 3),
        grp AS (SELECT lang, source, CAST(sum(c) AS BIGINT) AS n,
            CAST(sum(v * c) AS BIGINT) AS s,
            CAST(sum(CAST(v AS HUGEINT) * v * c) AS HUGEINT) AS q
          FROM z GROUP BY 1, 2),
        t AS (SELECT lang, source, n, s, q,
            (CAST(s AS HUGEINT) * s // n) * 1000000
              + (CAST(s AS HUGEINT) * s % n) * 1000000 // n AS t6
          FROM grp),
        sl AS (SELECT lang, CAST(count(*) AS BIGINT) AS k,
            CAST(sum(n) AS BIGINT) AS n, CAST(sum(s) AS BIGINT) AS stot,
            CAST(sum(q) AS HUGEINT) AS q, CAST(sum(t6) AS HUGEINT) AS a6
          FROM t GROUP BY 1),
        c AS (SELECT lang, k, n, q, a6,
            (CAST(stot AS HUGEINT) * stot // n) * 1000000
              + (CAST(stot AS HUGEINT) * stot % n) * 1000000 // n AS c6
          FROM sl),
        f AS (SELECT lang, k, n, a6 - c6 AS ssb6,
            q * 1000000 - a6 AS ssw6, q * 1000000 - c6 AS sst6,
            k - 1 AS dfb, n - k AS dfw FROM c),
        r0 AS (SELECT lang, k, n, dfb,
            CASE WHEN dfb > 0 AND dfw > 0 AND ssw6 > 0 THEN
              ssb6 * dfw * 1000000 // (ssw6 * dfb) END AS f6,
            CASE WHEN sst6 > 0 THEN ssb6 * 1000000 // sst6 END AS eta6,
            CASE WHEN dfb >= 1 THEN 1.0 - 2.0 / (9.0 * CAST(dfb AS DOUBLE))
              + 1.6448536269514722
                * sqrt(2.0 / (9.0 * CAST(dfb AS DOUBLE))) END AS wh
          FROM f),
        r AS (SELECT lang, k, n, dfb, f6, eta6,
            CASE WHEN dfb >= 1 THEN CAST(floor(CAST(dfb AS DOUBLE)
              * wh * wh * wh * 1e6) AS BIGINT) END AS crit6
          FROM r0)
        SELECT lang, k, n, CAST(f6 AS DOUBLE) / 1e6 AS w_stat,
          CAST(eta6 AS DOUBLE) / 1e6 AS eta2,
          CASE WHEN f6 IS NOT NULL AND crit6 IS NOT NULL
            THEN f6 * dfb > crit6 END AS significant
        FROM r ORDER BY lang""",

    // same exact moments, identical double chain (one sqrt), floor
    // quantization, thresholds compared on the quantized value
    "q281_cohens_d" ->
      """WITH g AS (SELECT source, CAST(count(*) AS BIGINT) AS n,
            CAST(sum(CAST(n_chars AS BIGINT)) AS BIGINT) AS s,
            CAST(sum(CAST(n_chars AS HUGEINT) * n_chars) AS HUGEINT) AS q
          FROM documents GROUP BY 1),
        t AS (SELECT CAST(sum(n) AS BIGINT) AS nall,
            CAST(sum(s) AS BIGINT) AS sall,
            CAST(sum(q) AS HUGEINT) AS qall FROM g),
        e AS (SELECT source, n, nall - n AS nr, s, sall - s AS sr,
            q, qall - q AS qr, nall FROM g, t WHERE nall - n > 0),
        v AS (SELECT source, n, nr, s, sr, nall,
            CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
              / CAST(n AS DOUBLE) AS vg,
            CAST(qr AS DOUBLE) - CAST(sr AS DOUBLE) * CAST(sr AS DOUBLE)
              / CAST(nr AS DOUBLE) AS vr FROM e),
        d AS (SELECT source, n, nall,
            CASE WHEN (vg + vr) / CAST(nall - 2 AS DOUBLE) > 0 THEN
              (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
                - CAST(sr AS DOUBLE) / CAST(nr AS DOUBLE))
              / sqrt((vg + vr) / CAST(nall - 2 AS DOUBLE)) END AS dd
          FROM v),
        q2 AS (SELECT source, n,
            CAST(floor(dd * 1e6) AS BIGINT) AS d6,
            CAST(floor(dd * (1.0 - 3.0
              / (4.0 * CAST(nall - 2 AS DOUBLE) - 1.0)) * 1e6)
              AS BIGINT) AS g6
          FROM d)
        SELECT source, n, d6 AS cohens_d6, g6 AS hedges_g6,
          CASE WHEN d6 IS NULL THEN NULL
            WHEN abs(d6) < 200000 THEN 'negligible'
            WHEN abs(d6) < 500000 THEN 'small'
            WHEN abs(d6) < 800000 THEN 'medium'
            ELSE 'large' END AS magnitude
        FROM q2 ORDER BY source""",

    // same two cumulative windows (global + per-group), same signed
    // dominance fold, one truncating division, Romano cuts on the
    // quantized value
    "q282_cliffs_delta" ->
      """WITH cells AS (SELECT source AS g, CAST(n_chars AS BIGINT) AS v,
            CAST(count(*) AS BIGINT) AS c FROM documents GROUP BY 1, 2),
        vals AS (SELECT v, CAST(sum(c) AS BIGINT) AS tot
          FROM cells GROUP BY 1),
        vc AS (SELECT v, tot, sum(tot) OVER (ORDER BY v
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumT
          FROM vals),
        na AS (SELECT CAST(sum(c) AS BIGINT) AS nall FROM cells),
        gn AS (SELECT g, CAST(sum(c) AS BIGINT) AS ng
          FROM cells GROUP BY 1),
        gc AS (SELECT g, v, c, sum(c) OVER (PARTITION BY g ORDER BY v
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumC
          FROM cells),
        j AS (SELECT gc.g, c, (cumT - tot) - (cumC - c) AS lo,
            (nall - cumT) - (gn.ng - cumC) AS hi
          FROM gc JOIN vc ON gc.v = vc.v
            JOIN gn ON gc.g = gn.g, na),
        agg AS (SELECT j.g, CAST(sum(CAST(c AS HUGEINT) * (lo - hi))
              AS HUGEINT) AS draw
          FROM j GROUP BY 1),
        r AS (SELECT agg.g, gn.ng, nall - gn.ng AS nr,
            draw * 1000000 // (CAST(gn.ng AS HUGEINT) * (nall - gn.ng))
              AS d6
          FROM agg JOIN gn ON agg.g = gn.g, na
          WHERE nall - gn.ng > 0)
        SELECT g AS source, ng AS n, CAST(d6 AS BIGINT) AS cliffs_delta6,
          CASE WHEN abs(d6) < 147000 THEN 'negligible'
            WHEN abs(d6) < 330000 THEN 'small'
            WHEN abs(d6) < 474000 THEN 'medium'
            ELSE 'large' END AS magnitude
        FROM r ORDER BY source""",

    // same q264 left-rank decile grid, per-shared-bucket floor'd
    // Bhattacharyya summands integer-summed, same two-level sqrt chain
    "q283_hellinger" ->
      """WITH g AS (SELECT source AS grp, CAST(n_chars AS BIGINT) AS v,
            CAST(count(*) AS BIGINT) AS c FROM documents GROUP BY 1, 2),
        vals AS (SELECT v, CAST(sum(c) AS BIGINT) AS ct FROM g GROUP BY 1),
        na AS (SELECT CAST(sum(c) AS BIGINT) AS nall FROM g),
        bk AS (SELECT v, least(9, (sum(ct) OVER (ORDER BY v
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - ct)
              * 10 // nall) AS b
          FROM vals, na),
        gb AS (SELECT grp, b, CAST(sum(c) AS BIGINT) AS ngb
          FROM g JOIN bk ON g.v = bk.v GROUP BY 1, 2),
        gn AS (SELECT grp, CAST(sum(ngb) AS BIGINT) AS ng
          FROM gb GROUP BY 1),
        pr AS (SELECT a.grp AS ga, bb.grp AS gb2,
            CAST(floor(sqrt((CAST(a.ngb AS DOUBLE)
                / CAST(an.ng AS DOUBLE))
              * (CAST(bb.ngb AS DOUBLE) / CAST(bn.ng AS DOUBLE))) * 1e6)
              AS BIGINT) AS cell6
          FROM gb a JOIN gb bb ON a.b = bb.b AND a.grp < bb.grp
            JOIN gn an ON a.grp = an.grp
            JOIN gn bn ON bb.grp = bn.grp),
        bcs AS (SELECT ga, gb2, CAST(sum(cell6) AS BIGINT) AS bc6
          FROM pr GROUP BY 1, 2),
        spine AS (SELECT a.grp AS ga, b.grp AS gb2
          FROM gn a JOIN gn b ON a.grp < b.grp),
        bc AS (SELECT spine.ga, spine.gb2, coalesce(bc6, 0) AS bc6
          FROM spine LEFT JOIN bcs
            ON spine.ga = bcs.ga AND spine.gb2 = bcs.gb2)
        SELECT ga AS group_a, gb2 AS group_b,
          CAST(least(bc6, 1000000) AS DOUBLE) / 1e6 AS bc,
          CAST(floor(sqrt(greatest(0.0,
            1.0 - CAST(bc6 AS DOUBLE) / 1e6)) * 1e6) AS BIGINT)
            / 1e6 AS hellinger
        FROM bc ORDER BY group_a, group_b""",

    // same lower-median cut on daily counts, tie days dropped, runs via
    // lag over the calendar, identical mu/sigma double chain
    "q284_runs_test" ->
      """WITH daily AS (SELECT event_type AS g, CAST(ts AS DATE) AS d,
            CAST(count(*) AS BIGINT) AS x FROM events GROUP BY 1, 2),
        mv AS (SELECT g, x, CAST(count(*) AS BIGINT) AS c
          FROM daily GROUP BY 1, 2),
        nd AS (SELECT g, CAST(sum(c) AS BIGINT) AS ndays
          FROM mv GROUP BY 1),
        cm AS (SELECT g, x, c, sum(c) OVER (PARTITION BY g ORDER BY x
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
          FROM mv),
        med AS (SELECT cm.g, min(x) AS m
          FROM cm JOIN nd ON cm.g = nd.g
          WHERE cum >= (ndays + 1) // 2 GROUP BY 1),
        sg AS (SELECT daily.g, d,
            CASE WHEN x > m THEN 1 ELSE -1 END AS sign
          FROM daily JOIN med ON daily.g = med.g WHERE x <> m),
        rr AS (SELECT g, sign,
            lag(sign) OVER (PARTITION BY g ORDER BY d) AS prev FROM sg),
        agg AS (SELECT g, CAST(count(*) AS BIGINT) AS n,
            CAST(sum(CASE WHEN sign = 1 THEN 1 ELSE 0 END) AS BIGINT)
              AS n1,
            CAST(sum(CASE WHEN sign = -1 THEN 1 ELSE 0 END) AS BIGINT)
              AS n2,
            CAST(sum(CASE WHEN prev IS NULL OR prev <> sign
              THEN 1 ELSE 0 END) AS BIGINT) AS r
          FROM rr GROUP BY 1),
        z AS (SELECT g, n, n1, n2, r,
            CASE WHEN n1 > 0 AND n2 > 0 AND
              (2.0 * n1 * n2 * (2.0 * n1 * n2 - n))
                / (CAST(n AS DOUBLE) * n * CAST(n - 1 AS DOUBLE)) > 0
            THEN CAST(floor((CAST(r AS DOUBLE)
              - (2.0 * n1 * n2 / CAST(n AS DOUBLE) + 1.0))
              / sqrt((2.0 * n1 * n2 * (2.0 * n1 * n2 - n))
                / (CAST(n AS DOUBLE) * n * CAST(n - 1 AS DOUBLE)))
              * 1e6) AS BIGINT) END AS z6
          FROM agg)
        SELECT g AS event_type, n AS n_days, n1 AS n_above,
          n2 AS n_below, r AS runs, CAST(z6 AS DOUBLE) / 1e6 AS z,
          CASE WHEN z6 IS NOT NULL THEN abs(z6) <= 1959964 END
            AS consistent_with_random
        FROM z ORDER BY event_type""",

    // same dense calendar spine, same n²-scaled exact mean-removal
    // identity, one truncating division per lag
    "q285_acf" ->
      """WITH d0 AS (SELECT event_type AS g, CAST(ts AS DATE) AS d,
            CAST(count(*) AS BIGINT) AS x FROM events GROUP BY 1, 2),
        span AS (SELECT g, min(d) AS dlo, max(d) AS dhi
          FROM d0 GROUP BY 1),
        spine AS (SELECT g, CAST(unnest(generate_series(dlo, dhi,
            INTERVAL 1 DAY)) AS DATE) AS d FROM span),
        daily AS (SELECT spine.g, spine.d, coalesce(x, 0) AS x,
            date_diff('day', dlo, spine.d) AS t
          FROM spine LEFT JOIN d0 ON spine.g = d0.g AND spine.d = d0.d
            JOIN span ON spine.g = span.g),
        st AS (SELECT g, CAST(count(*) AS BIGINT) AS n,
            CAST(sum(x) AS BIGINT) AS s,
            CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS q
          FROM daily GROUP BY 1),
        lg AS (SELECT g, t, x, k, t + k AS tj
          FROM daily, unnest(generate_series(1, 7)) AS u(k)),
        pr AS (SELECT lg.g, k,
            CAST(sum(CAST(lg.x AS HUGEINT) * tl.x) AS HUGEINT) AS p,
            CAST(sum(lg.x) AS BIGINT) AS h,
            CAST(sum(tl.x) AS BIGINT) AS t2
          FROM lg JOIN daily tl ON lg.g = tl.g AND lg.tj = tl.t
          GROUP BY 1, 2),
        r AS (SELECT pr.g, k, n,
            CAST(n AS HUGEINT) * n * p
              - CAST(n AS HUGEINT) * s * (h + t2)
              + (CAST(n AS HUGEINT) - k) * s * s AS num,
            CAST(n AS HUGEINT) * n * q
              - CAST(n AS HUGEINT) * s * s AS den
          FROM pr JOIN st ON pr.g = st.g)
        SELECT g AS event_type, k AS lag, n AS n_days,
          CASE WHEN den > 0 THEN
            CAST(num * 1000000 // den AS BIGINT) END AS acf6
        FROM r ORDER BY event_type, lag""",

    // same dense spine + cumulative prefix, exact x1e6 q/r-split gain
    // terms, max-then-join-back argmax (the q265-fix recipe), earliest
    // day tie-break
    "q286_changepoint" ->
      """WITH d0 AS (SELECT event_type AS g, CAST(ts AS DATE) AS d,
            CAST(count(*) AS BIGINT) AS x FROM events GROUP BY 1, 2),
        span AS (SELECT g, min(d) AS dlo, max(d) AS dhi
          FROM d0 GROUP BY 1),
        daily AS (SELECT spine.g, spine.d, coalesce(x, 0) AS x
          FROM (SELECT g, CAST(unnest(generate_series(dlo, dhi,
              INTERVAL 1 DAY)) AS DATE) AS d FROM span) spine
          LEFT JOIN d0 ON spine.g = d0.g AND spine.d = d0.d),
        cm AS (SELECT g, d, x,
            row_number() OVER (PARTITION BY g ORDER BY d) AS tau,
            sum(x) OVER (PARTITION BY g ORDER BY d
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sl
          FROM daily),
        tot AS (SELECT g, CAST(max(tau) AS BIGINT) AS n,
            CAST(max(sl) AS BIGINT) AS s FROM cm GROUP BY 1),
        gains AS (SELECT cm.g, d, tau, sl, s - sl AS sr, n - tau AS nr,
            n, s,
            ((CAST(sl AS HUGEINT) * sl // tau) * 1000000
              + (CAST(sl AS HUGEINT) * sl % tau) * 1000000 // tau)
            + ((CAST(s - sl AS HUGEINT) * (s - sl) // (n - tau)) * 1000000
              + (CAST(s - sl AS HUGEINT) * (s - sl) % (n - tau))
                * 1000000 // (n - tau))
            - ((CAST(s AS HUGEINT) * s // n) * 1000000
              + (CAST(s AS HUGEINT) * s % n) * 1000000 // n) AS g6
          FROM cm JOIN tot ON cm.g = tot.g WHERE tau < n),
        best AS (SELECT g, max(g6) AS gmax FROM gains GROUP BY 1),
        at1 AS (SELECT gains.g, min(d) AS change_day
          FROM gains JOIN best ON gains.g = best.g AND gains.g6 = best.gmax
          GROUP BY 1),
        res AS (SELECT gains.g, n AS n_days, at1.change_day, gmax,
            sl, tau, sr, nr
          FROM gains JOIN at1 ON gains.g = at1.g
              AND gains.d = at1.change_day
            JOIN best ON gains.g = best.g)
        SELECT g AS event_type, n_days, change_day,
          CAST(gmax AS DOUBLE) / 1e6 AS gain,
          CAST(CAST(sl AS HUGEINT) * 1000000 // tau AS DOUBLE) / 1e6
            AS mean_before,
          CAST(CAST(sr AS HUGEINT) * 1000000 // nr AS DOUBLE) / 1e6
            AS mean_after
        FROM res ORDER BY event_type""",

    // same doubled midranks over the global value set, same tie cube,
    // identical z double chain, unadjusted 1.959964 gate + m shipped
    "q287_dunn" ->
      """WITH g AS (SELECT source AS grp, CAST(n_chars AS BIGINT) AS v,
            CAST(count(*) AS BIGINT) AS c FROM documents GROUP BY 1, 2),
        vals AS (SELECT v, CAST(sum(c) AS BIGINT) AS ct FROM g GROUP BY 1),
        rk AS (SELECT v, 2 * sum(ct) OVER (ORDER BY v
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            - ct + 1 AS rank2 FROM vals),
        ties AS (SELECT CAST(sum(CAST(ct AS HUGEINT) * ct * ct - ct)
              AS HUGEINT) AS t,
            CAST(sum(ct) AS BIGINT) AS nall FROM vals),
        pg AS (SELECT grp, CAST(sum(c) AS BIGINT) AS n,
            CAST(sum(CAST(c AS HUGEINT) * rank2) AS HUGEINT) AS r2
          FROM g JOIN rk ON g.v = rk.v GROUP BY 1),
        kk AS (SELECT CAST(count(*) AS BIGINT) AS k FROM pg),
        pr AS (SELECT a.grp AS ga, b.grp AS gb, a.n AS na, b.n AS nb,
            a.r2 AS r2a, b.r2 AS r2b
          FROM pg a JOIN pg b ON a.grp < b.grp),
        z AS (SELECT ga, gb, na, nb,
            CASE WHEN CAST(nall AS DOUBLE) * CAST(nall + 1 AS DOUBLE)
                / 12.0 - CAST(t AS DOUBLE)
                / (12.0 * CAST(nall - 1 AS DOUBLE)) > 0
            THEN CAST(floor(
              (CAST(r2a AS DOUBLE) / (2.0 * CAST(na AS DOUBLE))
                - CAST(r2b AS DOUBLE) / (2.0 * CAST(nb AS DOUBLE)))
              / sqrt((CAST(nall AS DOUBLE) * CAST(nall + 1 AS DOUBLE)
                  / 12.0 - CAST(t AS DOUBLE)
                  / (12.0 * CAST(nall - 1 AS DOUBLE)))
                * (1.0 / CAST(na AS DOUBLE) + 1.0 / CAST(nb AS DOUBLE)))
              * 1e6) AS BIGINT) END AS z6, k
          FROM pr, ties, kk)
        SELECT ga AS group_a, gb AS group_b, na AS n_a, nb AS n_b,
          CAST(z6 AS DOUBLE) / 1e6 AS z,
          k * (k - 1) // 2 AS bonferroni_m,
          CASE WHEN z6 IS NOT NULL THEN abs(z6) > 1959964 END
            AS significant_unadj
        FROM z ORDER BY group_a, group_b""",

    // same exact counts, identical Wilson double chain (z constants
    // written as the same literal product), floor quantization
    "q288_wilson" ->
      """WITH g AS (SELECT source, CAST(count(*) AS BIGINT) AS n,
            CAST(sum(CASE WHEN n_chars >= 306 THEN 1 ELSE 0 END)
              AS BIGINT) AS s
          FROM documents GROUP BY 1),
        e AS (SELECT source, n, s,
            CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS p,
            1.0 + (1.959964 * 1.959964) / CAST(n AS DOUBLE) AS den,
            CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
              + (1.959964 * 1.959964) / (2.0 * CAST(n AS DOUBLE)) AS ctr,
            1.959964 * sqrt((CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                * (1.0 - CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                / CAST(n AS DOUBLE)
              + (1.959964 * 1.959964) / (4.0 * CAST(n AS DOUBLE)
                * CAST(n AS DOUBLE))) AS rad
          FROM g)
        SELECT source, n, s AS successes,
          floor(p * 1e6) / 1e6 AS p_hat,
          floor((ctr - rad) / den * 1e6) / 1e6 AS wilson_lo,
          floor((ctr + rad) / den * 1e6) / 1e6 AS wilson_hi
        FROM e ORDER BY source""",

    // same dense group x value grid, same doubled dominance fold, same
    // no-tie mu/sigma closed forms and floor'd z
    "q289_jonckheere" ->
      """WITH d0 AS (SELECT hour(ts) // 6 AS g,
            CAST(floor(value * 100) AS BIGINT) AS v FROM events),
        cells AS (SELECT g, v, CAST(count(*) AS BIGINT) AS c
          FROM d0 GROUP BY 1, 2),
        vals AS (SELECT DISTINCT v FROM cells),
        grps AS (SELECT DISTINCT g FROM cells),
        grid AS (SELECT grps.g, vals.v, coalesce(c, 0) AS c
          FROM grps CROSS JOIN vals
          LEFT JOIN cells ON grps.g = cells.g AND vals.v = cells.v),
        cum AS (SELECT g, v, c,
            sum(c) OVER (PARTITION BY g ORDER BY v
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - c AS lt
          FROM grid),
        j2 AS (SELECT CAST(sum(CAST(b.c AS HUGEINT)
              * (2 * a.lt + a.c)) AS HUGEINT) AS j2
          FROM cum a JOIN cum b ON a.v = b.v AND a.g < b.g),
        ns AS (SELECT CAST(sum(n) AS BIGINT) AS nall,
            CAST(count(*) AS BIGINT) AS k,
            CAST(sum(CAST(n AS HUGEINT) * n) AS HUGEINT) AS sn2,
            CAST(sum(CAST(n AS HUGEINT) * n * (2 * n + 3)) AS HUGEINT)
              AS sn23
          FROM (SELECT g, CAST(sum(c) AS BIGINT) AS n
            FROM cells GROUP BY 1)),
        r AS (SELECT k, nall, j2,
            (CAST(nall AS HUGEINT) * nall - sn2) // 2 AS mu2,
            (CAST(nall AS DOUBLE) * CAST(nall AS DOUBLE)
              * (2.0 * CAST(nall AS DOUBLE) + 3.0)
              - CAST(sn23 AS DOUBLE)) / 72.0 AS var FROM j2, ns),
        zz AS (SELECT k, nall, j2,
            CASE WHEN var > 0 THEN CAST(floor(
              (CAST(j2 AS DOUBLE) - CAST(mu2 AS DOUBLE))
                / (2.0 * sqrt(var)) * 1e6) AS BIGINT) END AS z6
          FROM r)
        SELECT k, nall AS n, CAST(j2 AS DOUBLE) / 2.0 AS j_stat,
          CAST(z6 AS DOUBLE) / 1e6 AS z,
          CASE WHEN z6 IS NOT NULL THEN abs(z6) > 1959964 END AS trend
        FROM zz ORDER BY k""",

    // same dense calendar spine, isodow grid, the IDENTICAL exact F
    // chain with slice = event_type / group = weekday, peak/trough by
    // max-then-join-back on exact x1e6 weekday means
    "q290_seasonality" ->
      """WITH d0 AS (SELECT event_type AS g, CAST(ts AS DATE) AS d,
            CAST(count(*) AS BIGINT) AS x FROM events GROUP BY 1, 2),
        span AS (SELECT g, min(d) AS dlo, max(d) AS dhi
          FROM d0 GROUP BY 1),
        daily AS (SELECT spine.g, spine.d, coalesce(x, 0) AS x,
            isodow(spine.d) AS wd
          FROM (SELECT g, CAST(unnest(generate_series(dlo, dhi,
              INTERVAL 1 DAY)) AS DATE) AS d FROM span) spine
          LEFT JOIN d0 ON spine.g = d0.g AND spine.d = d0.d),
        cells AS (SELECT g AS s, wd AS grp, x AS v,
            CAST(count(*) AS BIGINT) AS c FROM daily GROUP BY 1, 2, 3),
        grp AS (SELECT s, grp, CAST(sum(c) AS BIGINT) AS n,
            CAST(sum(v * c) AS BIGINT) AS sg,
            CAST(sum(CAST(v AS HUGEINT) * v * c) AS HUGEINT) AS q
          FROM cells GROUP BY 1, 2),
        t AS (SELECT s, n, sg, q,
            (CAST(sg AS HUGEINT) * sg // n) * 1000000
              + (CAST(sg AS HUGEINT) * sg % n) * 1000000 // n AS t6
          FROM grp),
        sl AS (SELECT s, CAST(count(*) AS BIGINT) AS k,
            CAST(sum(n) AS BIGINT) AS n, CAST(sum(sg) AS BIGINT) AS stot,
            CAST(sum(q) AS HUGEINT) AS q, CAST(sum(t6) AS HUGEINT) AS a6
          FROM t GROUP BY 1),
        c AS (SELECT s, k, n, q, a6,
            (CAST(stot AS HUGEINT) * stot // n) * 1000000
              + (CAST(stot AS HUGEINT) * stot % n) * 1000000 // n AS c6
          FROM sl),
        f AS (SELECT s, k, n, a6 - c6 AS ssb6,
            q * 1000000 - a6 AS ssw6, q * 1000000 - c6 AS sst6,
            k - 1 AS dfb, n - k AS dfw FROM c),
        r0 AS (SELECT s, k, n, dfb,
            CASE WHEN dfb > 0 AND dfw > 0 AND ssw6 > 0 THEN
              ssb6 * dfw * 1000000 // (ssw6 * dfb) END AS f6,
            CASE WHEN sst6 > 0 THEN ssb6 * 1000000 // sst6 END AS eta6,
            CASE WHEN dfb >= 1 THEN 1.0
              - 2.0 / (9.0 * CAST(greatest(dfb, 1) AS DOUBLE))
              + 1.6448536269514722 * sqrt(2.0
                / (9.0 * CAST(greatest(dfb, 1) AS DOUBLE))) END AS wh
          FROM f),
        r AS (SELECT s, k, n, dfb, f6, eta6,
            CASE WHEN dfb >= 1 THEN CAST(floor(
              CAST(greatest(dfb, 1) AS DOUBLE) * wh * wh * wh * 1e6)
              AS BIGINT) END AS crit6
          FROM r0),
        means AS (SELECT g AS s, wd, CAST(sum(x) AS BIGINT) AS sw,
            CAST(count(*) AS BIGINT) AS nw FROM daily GROUP BY 1, 2),
        m6 AS (SELECT s, wd,
            CAST(sw AS HUGEINT) * 1000000 // nw AS m6 FROM means),
        mx AS (SELECT s, max(m6) AS mmax, min(m6) AS mmin
          FROM m6 GROUP BY 1),
        peak AS (SELECT m6.s, min(wd) AS peak_weekday
          FROM m6 JOIN mx ON m6.s = mx.s AND m6.m6 = mx.mmax GROUP BY 1),
        trough AS (SELECT m6.s, min(wd) AS trough_weekday
          FROM m6 JOIN mx ON m6.s = mx.s AND m6.m6 = mx.mmin GROUP BY 1)
        SELECT r.s AS event_type, k, n, CAST(f6 AS DOUBLE) / 1e6 AS f_stat,
          CAST(eta6 AS DOUBLE) / 1e6 AS seasonal_strength,
          CASE WHEN f6 IS NOT NULL AND crit6 IS NOT NULL
            THEN f6 * dfb > crit6 END AS significant,
          peak_weekday, trough_weekday
        FROM r JOIN peak ON r.s = peak.s JOIN trough ON r.s = trough.s
        ORDER BY event_type""",

    // same dense day x treatment grid, per-day doubled midranks, exact
    // integer tie-corrected Q and W, WH cube gate
    "q291_friedman" ->
      """WITH d0 AS (SELECT event_type AS t, CAST(ts AS DATE) AS d,
            CAST(count(*) AS BIGINT) AS x FROM events GROUP BY 1, 2),
        days AS (SELECT DISTINCT d FROM d0),
        ts2 AS (SELECT DISTINCT t FROM d0),
        grid AS (SELECT ts2.t, days.d, coalesce(x, 0) AS x
          FROM days CROSS JOIN ts2
          LEFT JOIN d0 ON ts2.t = d0.t AND days.d = d0.d),
        pdv AS (SELECT d, x, CAST(count(*) AS BIGINT) AS ct
          FROM grid GROUP BY 1, 2),
        rk AS (SELECT d, x, 2 * sum(ct) OVER (PARTITION BY d ORDER BY x
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            - ct + 1 AS rank2 FROM pdv),
        r AS (SELECT grid.t, grid.d, rank2
          FROM grid JOIN rk ON grid.d = rk.d AND grid.x = rk.x),
        st AS (SELECT CAST(count(DISTINCT d) AS BIGINT) AS n,
            CAST(count(DISTINCT t) AS BIGINT) AS k,
            CAST(sum(CAST(rank2 AS HUGEINT) * rank2) AS HUGEINT) AS a2
          FROM r),
        pt AS (SELECT t, CAST(sum(rank2) AS BIGINT) AS r2
          FROM r GROUP BY 1),
        n2 AS (SELECT max(n) AS n, max(k) AS k, max(a2) AS a2,
            CAST(sum((CAST(r2 AS HUGEINT) - CAST(n AS HUGEINT) * (k + 1))
              * (CAST(r2 AS HUGEINT) - CAST(n AS HUGEINT) * (k + 1)))
              AS HUGEINT) AS n2
          FROM pt, st),
        dd AS (SELECT n, k, n2,
            a2 - CAST(n AS HUGEINT) * k * (k + 1) * (k + 1) AS dd
          FROM n2),
        q AS (SELECT n, k, n2, dd,
            CASE WHEN dd > 0 THEN (k - 1) * n2 * 1000000 // dd END AS q6,
            CASE WHEN dd > 0 THEN n2 * 1000000 // (dd * n) END AS w6,
            CASE WHEN k >= 2 THEN 1.0
              - 2.0 / (9.0 * CAST(greatest(k - 1, 1) AS DOUBLE))
              + 1.6448536269514722 * sqrt(2.0
                / (9.0 * CAST(greatest(k - 1, 1) AS DOUBLE))) END AS wh
          FROM dd),
        q2 AS (SELECT n, k, q6, w6,
            CASE WHEN k >= 2 THEN CAST(floor(
              CAST(greatest(k - 1, 1) AS DOUBLE) * wh * wh * wh * 1e6)
              AS BIGINT) END AS crit6
          FROM q)
        SELECT k, n AS n_days, CAST(q6 AS DOUBLE) / 1e6 AS friedman_q,
          CAST(w6 AS DOUBLE) / 1e6 AS kendalls_w,
          CASE WHEN q6 IS NOT NULL AND crit6 IS NOT NULL
            THEN q6 > crit6 END AS differs
        FROM q2 ORDER BY k""",

    // same spine, exact one-division dispersion/chi2, WH(n-1) gate
    "q292_dispersion" ->
      """WITH d0 AS (SELECT event_type AS g, CAST(ts AS DATE) AS d,
            CAST(count(*) AS BIGINT) AS x FROM events GROUP BY 1, 2),
        span AS (SELECT g, min(d) AS dlo, max(d) AS dhi
          FROM d0 GROUP BY 1),
        daily AS (SELECT spine.g, spine.d, coalesce(x, 0) AS x
          FROM (SELECT g, CAST(unnest(generate_series(dlo, dhi,
              INTERVAL 1 DAY)) AS DATE) AS d FROM span) spine
          LEFT JOIN d0 ON spine.g = d0.g AND spine.d = d0.d),
        st AS (SELECT g, CAST(count(*) AS BIGINT) AS n,
            CAST(sum(x) AS BIGINT) AS s,
            CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS q
          FROM daily GROUP BY 1),
        e AS (SELECT g, n, s,
            CAST(n AS HUGEINT) * q - CAST(s AS HUGEINT) * s AS num
          FROM st),
        r AS (SELECT g, n, s,
            CASE WHEN n > 1 AND s > 0 THEN
              num * 1000000 // ((n - 1) * s) END AS d6,
            CASE WHEN n > 1 AND s > 0 THEN
              num * 1000000 // s END AS chi6,
            CASE WHEN n >= 2 THEN 1.0
              - 2.0 / (9.0 * CAST(greatest(n - 1, 1) AS DOUBLE))
              + 1.6448536269514722 * sqrt(2.0
                / (9.0 * CAST(greatest(n - 1, 1) AS DOUBLE))) END AS wh
          FROM e),
        r2 AS (SELECT g, n, s, d6, chi6,
            CASE WHEN n >= 2 THEN CAST(floor(
              CAST(greatest(n - 1, 1) AS DOUBLE) * wh * wh * wh * 1e6)
              AS BIGINT) END AS crit6
          FROM r)
        SELECT g AS event_type, n AS n_days, s AS n_events,
          CAST(d6 AS DOUBLE) / 1e6 AS dispersion,
          CAST(chi6 AS DOUBLE) / 1e6 AS chi2,
          CASE WHEN chi6 IS NOT NULL AND crit6 IS NOT NULL
            THEN chi6 > crit6 END AS overdispersed
        FROM r2 ORDER BY event_type""",

    // same top-30 cut, integer-first frequencies, pure-integer word
    // moments, identical z chain, per-word floors integer-summed
    "q293_burrows_delta" ->
      """WITH toks AS (SELECT source AS g,
            unnest(list_filter(string_split(text, ' '), x -> x <> ''))
              AS w FROM documents),
        wc AS (SELECT g, w, CAST(count(*) AS BIGINT) AS c
          FROM toks GROUP BY 1, 2),
        tot AS (SELECT g, CAST(sum(c) AS BIGINT) AS t FROM wc GROUP BY 1),
        top AS (SELECT w FROM (SELECT w, CAST(sum(c) AS BIGINT) AS cw
          FROM wc GROUP BY 1 ORDER BY cw DESC, w LIMIT 30)),
        grid AS (SELECT tot.g, top.w, t, coalesce(c, 0) AS c
          FROM tot CROSS JOIN top
          LEFT JOIN wc ON tot.g = wc.g AND top.w = wc.w),
        f AS (SELECT g, w,
            CAST(c AS HUGEINT) * 1000000 // t AS f6 FROM grid),
        ws AS (SELECT w, CAST(count(*) AS BIGINT) AS k,
            CAST(sum(f6) AS BIGINT) AS s6,
            CAST(sum(CAST(f6 AS HUGEINT) * f6) AS HUGEINT) AS q6
          FROM f GROUP BY 1),
        wd AS (SELECT w, k, s6,
            CAST(k AS HUGEINT) * q6 - CAST(s6 AS HUGEINT) * s6 AS det
          FROM ws
          WHERE CAST(k AS HUGEINT) * q6 - CAST(s6 AS HUGEINT) * s6 > 0),
        z AS (SELECT f.w, g,
            (CAST(k AS DOUBLE) * CAST(f6 AS DOUBLE) - CAST(s6 AS DOUBLE))
              / sqrt(CAST(det AS DOUBLE)) AS z
          FROM f JOIN wd ON f.w = wd.w),
        pr AS (SELECT a.g AS ga, b.g AS gb,
            CAST(floor(abs(a.z - b.z) * 1e6) AS BIGINT) AS d6
          FROM z a JOIN z b ON a.w = b.w AND a.g < b.g),
        agg AS (SELECT ga, gb, CAST(count(*) AS BIGINT) AS m,
            CAST(sum(d6) AS BIGINT) AS s FROM pr GROUP BY 1, 2)
        SELECT ga AS group_a, gb AS group_b, m AS n_words,
          CAST(s // m AS BIGINT) AS delta6
        FROM agg ORDER BY group_a, group_b""",

    // same whitespace/regex token counts, exact sums, one truncating
    // division per ratio
    "q294_fertility" ->
      """WITH d AS (SELECT lang,
            CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
              AS BIGINT) AS w,
            CAST(len(regexp_extract_all(text,
              '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\r\f\x0B]')) AS BIGINT) AS st,
            CAST(length(text) AS BIGINT) AS ch
          FROM documents),
        g AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
            CAST(sum(w) AS BIGINT) AS words,
            CAST(sum(st) AS BIGINT) AS subtokens,
            CAST(sum(ch) AS BIGINT) AS chars
          FROM d GROUP BY 1)
        SELECT lang, n_docs, words, subtokens, chars,
          CASE WHEN words > 0 THEN CAST(CAST(subtokens AS HUGEINT)
            * 1000000 // words AS DOUBLE) / 1e6 END AS fertility,
          CASE WHEN subtokens > 0 THEN CAST(CAST(chars AS HUGEINT)
            * 1000000 // subtokens AS DOUBLE) / 1e6 END AS chars_per_token
        FROM g ORDER BY lang""",

    // the q72 gate chain feeding the same exact integer allocation:
    // keep6^2-weighted availability normalized to parts-per-1e9, one
    // clamp + one redistribution round, every step a truncating //
    "q295_mixture_alloc" ->
      """WITH d AS (SELECT source, doc_id, text, length(text) AS n_chars,
            list_filter(string_split(text, ' '), x -> x <> '') AS w
          FROM documents),
        m AS (SELECT source, doc_id, len(w) AS n_words,
            CAST(len(w) AS BIGINT) AS tok,
            floor(1.0*length(replace(text,' ',''))/len(w)*10000)/10000 AS awl,
            floor((1.0 - 1.0*len(list_distinct(w))/len(w))*10000)/10000 AS dupf,
            floor(1.0*length(regexp_replace(text,'[^0-9]','','g'))/n_chars*10000)/10000 AS digr,
            floor(1.0*len(list_filter(w, x -> list_contains(
              ['the','a','of','and','to','in','is','on','for','with'], x)))/len(w)*10000)/10000 AS stopr
          FROM d),
        r AS (SELECT source, tok,
            (n_words >= 20 AND n_words <= 100000) AND
            (awl >= 3.0 AND awl <= 10.0) AND (stopr > 0) AND
            (dupf <= 0.6) AND (digr <= 0.1) AS keep
          FROM m),
        per AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
            CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS kept,
            CAST(sum(CASE WHEN keep THEN tok ELSE 0 END) AS BIGINT) AS t
          FROM r GROUP BY 1),
        k AS (SELECT source, n_docs, kept, t,
            kept * 1000000 // n_docs AS keep6 FROM per),
        w2 AS (SELECT source, n_docs, keep6, t,
            CAST(keep6 AS HUGEINT) * keep6 * t AS w FROM k),
        tot AS (SELECT CAST(sum(t) AS BIGINT) AS tall,
            CAST(sum(w) AS HUGEINT) AS wall FROM w2),
        raw AS (SELECT source, n_docs, keep6, t, w,
            CAST(tall AS HUGEINT) * 500 // 1000 AS b,
            CASE WHEN wall > 0 THEN w * 1000000000 // wall ELSE 0 END AS w9,
            CAST(t AS HUGEINT) * 2000 // 1000 AS cap
          FROM w2, tot),
        a1 AS (SELECT source, n_docs, keep6, t, w, b, cap,
            b * w9 // 1000000000 AS raw,
            least(b * w9 // 1000000000, cap) AS a1,
            b * w9 // 1000000000 > cap AS capped1
          FROM raw),
        r2 AS (SELECT CAST(sum(a1) AS HUGEINT) AS alloc1,
            CAST(sum(CASE WHEN NOT capped1 THEN w ELSE 0 END) AS HUGEINT)
              AS wunc FROM a1),
        fin AS (SELECT source, n_docs, keep6, t, b, cap, a1, capped1,
            CASE WHEN capped1 THEN a1
              ELSE a1 + (b - alloc1)
                * (CASE WHEN wunc > 0 THEN w * 1000000000 // wunc
                   ELSE 0 END) // 1000000000 END AS a2
          FROM a1, r2)
        SELECT source, n_docs,
          CAST(keep6 AS DOUBLE) / 1e6 AS keep_rate,
          t AS tokens_avail, CAST(b AS BIGINT) AS budget_tokens,
          CAST(least(a2, cap) AS BIGINT) AS alloc_tokens,
          CASE WHEN t > 0 THEN CAST(least(a2, cap) * 1000000 // t
            AS DOUBLE) / 1e6 END AS epochs,
          a2 > cap OR capped1 AS capped
        FROM fin ORDER BY source""",

    // same 4-branch folded-hash outcome fixture, same per-model/per-task
    // censuses, HUGEINT Q arithmetic, Wilson-Hilferty gate compared on
    // BIGINT millionths (no float division anywhere in a hashed column)
    "q296_cochran_q" ->
      """WITH t AS (SELECT doc_id AS task_id, source,
            ((doc_id % 2147483648) * 2654435761) % 2147483647 AS h
          FROM documents),
        o AS (
          SELECT task_id, source, 'm0' AS mdl,
            (((h % 999983) * 48271) % 2147483647) % 100 < 78 - h % 40 AS ok
          FROM t
          UNION ALL SELECT task_id, source, 'm1',
            (((h % 999979) * 69621) % 2147483647) % 100 < 74 - h % 40
          FROM t
          UNION ALL SELECT task_id, source, 'm2',
            (((h % 999961) * 16807) % 2147483647) % 100 < 70 - h % 40
          FROM t
          UNION ALL SELECT task_id, source, 'm3',
            (((h % 999959) * 40692) % 2147483647) % 100 < 66 - h % 40
          FROM t),
        g AS (SELECT source, mdl,
            CAST(sum(CASE WHEN ok THEN 1 ELSE 0 END) AS BIGINT) AS gj
          FROM o GROUP BY 1, 2),
        l AS (SELECT source, task_id,
            CAST(sum(CASE WHEN ok THEN 1 ELSE 0 END) AS BIGINT) AS li
          FROM o GROUP BY 1, 2),
        tt AS (SELECT source, CAST(count(*) AS BIGINT) AS n,
            CAST(sum(li) AS BIGINT) AS t2, CAST(sum(li * li) AS BIGINT)
              AS l2
          FROM l GROUP BY 1),
        ks AS (SELECT source, CAST(count(*) AS BIGINT) AS k
          FROM g GROUP BY 1),
        sq AS (SELECT g.source, max(k) AS k, max(n) AS n, max(t2) AS t2,
            max(l2) AS l2,
            CAST(sum(CAST(k * gj - t2 AS HUGEINT) * (k * gj - t2))
              AS HUGEINT) AS s2
          FROM g JOIN tt ON g.source = tt.source
            JOIN ks ON g.source = ks.source
          GROUP BY 1),
        r AS (SELECT source, k, n,
            CAST(k AS HUGEINT) * (k * t2 - l2) AS den,
            CAST(k - 1 AS HUGEINT) * s2 * 1000000 AS num
          FROM sq),
        fin AS (SELECT source, k, n,
            CASE WHEN den > 0 THEN CAST(num // den AS BIGINT) END AS q6,
            CASE WHEN k >= 2 THEN 1.0 - 2.0 / (9.0 * (k - 1))
              + 1.6448536269514722 * sqrt(2.0 / (9.0 * (k - 1))) END AS wh
          FROM r)
        SELECT source, k, n AS n_tasks, q6,
          CASE WHEN q6 IS NOT NULL AND k >= 2 THEN
            q6 > CAST(floor((k - 1) * wh * wh * wh * 1e6) AS BIGINT)
          END AS differs
        FROM fin ORDER BY source""",

    // same whitespace token census; K6 = (sum c^2 - N) * 1e10 // N^2
    "q297_yule_k" ->
      """WITH toks AS (SELECT source,
            unnest(list_filter(string_split(text, ' '), x -> x <> ''))
              AS w
          FROM documents),
        wc AS (SELECT source, w, CAST(count(*) AS BIGINT) AS c
          FROM toks GROUP BY 1, 2),
        agg AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_tokens,
            CAST(count(*) AS BIGINT) AS n_types,
            CAST(sum(CAST(c AS HUGEINT) * c) AS HUGEINT) AS s2
          FROM wc GROUP BY 1)
        SELECT source, n_tokens, n_types,
          CASE WHEN n_tokens > 0 THEN
            CAST((s2 - n_tokens) * 10000000000
              // (CAST(n_tokens AS HUGEINT) * n_tokens) AS BIGINT)
          END AS yule_k6
        FROM agg ORDER BY source""",

    // same global doubled-median value-set cut, above/<= census per
    // source, Cramer-style margin chi-square cell terms, WH gate
    "q298_mood_median" ->
      """WITH cells AS (SELECT source AS g, CAST(n_chars AS BIGINT) AS v,
            CAST(count(*) AS BIGINT) AS c FROM documents GROUP BY 1, 2),
        vals AS (SELECT v, CAST(sum(c) AS BIGINT) AS ct
          FROM cells GROUP BY 1),
        na AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM cells),
        cm AS (SELECT v, sum(ct) OVER (ORDER BY v
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
          FROM vals),
        med AS (SELECT max(n) AS n,
            min(CASE WHEN cum > (n - 1) // 2 THEN v END) AS vlo,
            min(CASE WHEN cum > (n - 1) // 2 + 1 THEN v END) AS vhi
          FROM cm, na),
        m2 AS (SELECT n,
            vlo * 2 + ((n - 1) % 2) * (coalesce(vhi, vlo) - vlo) AS med2
          FROM med),
        bg AS (SELECT g,
            CAST(sum(CASE WHEN v * 2 > med2 THEN c ELSE 0 END) AS BIGINT)
              AS a,
            CAST(sum(c) AS BIGINT) AS ng
          FROM cells, m2 GROUP BY 1),
        t2 AS (SELECT CAST(sum(a) AS BIGINT) AS ta,
            CAST(sum(ng - a) AS BIGINT) AS tb,
            CAST(count(*) AS BIGINT) AS k FROM bg),
        ct AS (SELECT g,
            (CAST(a AS HUGEINT) * n - CAST(ta AS HUGEINT) * ng)
              * (CAST(a AS HUGEINT) * n - CAST(ta AS HUGEINT) * ng)
              * 1000000
              // nullif(CAST(n AS HUGEINT) * ta * ng, 0)
            + (CAST(ng - a AS HUGEINT) * n - CAST(tb AS HUGEINT) * ng)
              * (CAST(ng - a AS HUGEINT) * n - CAST(tb AS HUGEINT) * ng)
              * 1000000
              // nullif(CAST(n AS HUGEINT) * tb * ng, 0) AS c6,
            ta, tb, k, n, med2
          FROM bg, t2, m2),
        s AS (SELECT max(k) AS k, max(n) AS n, max(med2) AS med2,
            max(ta) AS ta, max(tb) AS tb,
            CAST(sum(c6) AS HUGEINT) AS chi6raw
          FROM ct),
        fin AS (SELECT k, n, med2,
            CASE WHEN ta > 0 AND tb > 0 THEN CAST(chi6raw AS BIGINT) END
              AS chi6,
            CASE WHEN k >= 2 THEN 1.0 - 2.0 / (9.0 * (k - 1))
              + 1.6448536269514722 * sqrt(2.0 / (9.0 * (k - 1))) END AS wh
          FROM s)
        SELECT k, n, med2 AS median_x2, chi6,
          CASE WHEN chi6 IS NOT NULL AND k >= 2 THEN
            chi6 > CAST(floor((k - 1) * wh * wh * wh * 1e6) AS BIGINT)
          END AS differs
        FROM fin""",

    // same dense daily spine, n-scaled integer DW identity, labels on
    // the quantized value
    "q299_durbin_watson" ->
      """WITH d0 AS (SELECT event_type AS g, CAST(ts AS DATE) AS d,
            CAST(count(*) AS BIGINT) AS x FROM events GROUP BY 1, 2),
        span AS (SELECT g, min(d) AS dlo, max(d) AS dhi
          FROM d0 GROUP BY 1),
        daily AS (SELECT spine.g, spine.d, coalesce(x, 0) AS x
          FROM (SELECT g, CAST(unnest(generate_series(dlo, dhi,
              INTERVAL 1 DAY)) AS DATE) AS d FROM span) spine
          LEFT JOIN d0 ON spine.g = d0.g AND spine.d = d0.d),
        lagd AS (SELECT g, x,
            lag(x) OVER (PARTITION BY g ORDER BY d) AS xp FROM daily),
        agg AS (SELECT g, CAST(count(*) AS BIGINT) AS n,
            CAST(sum(x) AS BIGINT) AS s,
            CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS q,
            CAST(sum(CASE WHEN xp IS NOT NULL THEN
              CAST(x - xp AS HUGEINT) * (x - xp) ELSE 0 END) AS HUGEINT)
              AS dd
          FROM lagd GROUP BY 1),
        r AS (SELECT g, n,
            CAST(n AS HUGEINT) * q - CAST(s AS HUGEINT) * s AS den,
            CAST(n AS HUGEINT) * dd * 1000000 AS num
          FROM agg),
        fin AS (SELECT g, n,
            CASE WHEN den > 0 THEN CAST(num // den AS BIGINT) END AS dw6
          FROM r)
        SELECT g AS event_type, n AS n_days, dw6,
          CASE WHEN dw6 IS NULL THEN NULL
            WHEN dw6 < 1000000 THEN 'strong_positive'
            WHEN dw6 < 1500000 THEN 'positive'
            WHEN dw6 <= 2500000 THEN 'none'
            WHEN dw6 <= 3000000 THEN 'negative'
            ELSE 'strong_negative' END AS reading
        FROM fin ORDER BY event_type""",

    // the q285 chain pivoted + the Durbin-Levinson recursion unrolled
    // in HUGEINT fixed point (generator-built, the k-core precedent)
    "q300_pacf" -> pacfOracle(7),

    // same folded doubled-midrank scores, same permutation moments and
    // quantize-then-sqrt z chain as the engine
    "q301_ansari_bradley" ->
      """WITH g AS (SELECT source AS grp, CAST(n_chars AS BIGINT) AS v,
            CAST(count(*) AS BIGINT) AS c FROM documents GROUP BY 1, 2),
        vals AS (SELECT v, CAST(sum(c) AS BIGINT) AS ct
          FROM g GROUP BY 1),
        na AS (SELECT CAST(sum(c) AS BIGINT) AS nall FROM g),
        sc AS (SELECT v, ct, 2 * sum(ct) OVER (ORDER BY v
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            - ct + 1 AS m2
          FROM vals),
        a AS (SELECT v, ct, nall + 1 - abs(m2 - (nall + 1)) AS a2
          FROM sc, na),
        tots AS (SELECT CAST(sum(ct * a2) AS BIGINT) AS t2,
            CAST(sum(CAST(ct AS HUGEINT) * a2 * a2) AS HUGEINT) AS q4
          FROM a),
        per AS (SELECT grp, CAST(sum(c) AS BIGINT) AS ng,
            CAST(sum(c * a2) AS BIGINT) AS s2
          FROM g JOIN a ON g.v = a.v GROUP BY 1),
        r AS (SELECT grp, ng, nall - ng AS nr, s2, t2, q4, nall
          FROM per, tots, na WHERE nall - ng > 0),
        vv AS (SELECT grp, ng, nr, s2, nall,
            CASE WHEN nall > 1 THEN CAST(ng AS HUGEINT) * nr
              * (CAST(nall AS HUGEINT) * q4 - CAST(t2 AS HUGEINT) * t2)
              // nullif(CAST(nall AS HUGEINT) * nall * (nall - 1), 0)
            END AS var4,
            CAST(nall AS HUGEINT) * s2 - CAST(ng AS HUGEINT) * t2 AS num
          FROM r),
        z AS (SELECT grp, ng, nr, s2,
            CASE WHEN var4 > 0 THEN CAST(floor(CAST(num AS DOUBLE) * 1e6
              / (CAST(nall AS DOUBLE) * sqrt(CAST(var4 AS DOUBLE))))
              AS BIGINT) END AS z6
          FROM vv)
        SELECT grp AS source, ng AS n_group, nr AS n_rest, s2 AS ab2,
          z6, CASE WHEN z6 IS NOT NULL THEN abs(z6) > 1959964 END
            AS spread_differs
        FROM z ORDER BY source""",

    // same frozen x1e6 constants, same daily census + calendar cum,
    // same min-CASE first-crossing cut; final LLR = the total sum
    "q302_sprt" ->
      """WITH daily AS (SELECT event_type AS g, CAST(ts AS DATE) AS d,
            CAST(count(*) AS BIGINT) AS n,
            CAST(sum(CASE WHEN value >= 100.0 THEN 1 ELSE 0 END)
              AS BIGINT) AS x
          FROM events GROUP BY 1, 2),
        cum AS (SELECT g, d, n, x,
            sum(x * 287682 + (n - x) * (-154151)) OVER (PARTITION BY g
              ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING
                AND CURRENT ROW) AS llr
          FROM daily),
        agg AS (SELECT g, CAST(count(*) AS BIGINT) AS n_days,
            CAST(sum(n) AS BIGINT) AS n_trials,
            CAST(sum(x) AS BIGINT) AS n_success,
            min(CASE WHEN llr >= 2944438 THEN d END) AS d1,
            min(CASE WHEN llr <= -2944439 THEN d END) AS d0,
            CAST(sum(x * 287682 + (n - x) * (-154151)) AS BIGINT)
              AS final_llr6
          FROM cum GROUP BY 1)
        SELECT g AS event_type, n_days, n_trials, n_success,
          CASE WHEN d1 IS NOT NULL AND (d0 IS NULL OR d1 <= d0)
              THEN 'accept_h1'
            WHEN d0 IS NOT NULL THEN 'accept_h0'
            ELSE 'continue' END AS decision,
          CASE WHEN d1 IS NOT NULL AND (d0 IS NULL OR d1 <= d0) THEN d1
            WHEN d0 IS NOT NULL THEN d0 END AS decision_day,
          final_llr6
        FROM agg ORDER BY event_type""",

    // same 4-branch fixture and censuses as q296; alpha6 one exact
    // HUGEINT division, labels compared on the quantized value
    "q303_kr20" ->
      """WITH t AS (SELECT doc_id AS task_id, source,
            ((doc_id % 2147483648) * 2654435761) % 2147483647 AS h
          FROM documents),
        o AS (
          SELECT task_id, source, 'm0' AS mdl,
            (((h % 999983) * 48271) % 2147483647) % 100 < 78 - h % 40 AS ok
          FROM t
          UNION ALL SELECT task_id, source, 'm1',
            (((h % 999979) * 69621) % 2147483647) % 100 < 74 - h % 40
          FROM t
          UNION ALL SELECT task_id, source, 'm2',
            (((h % 999961) * 16807) % 2147483647) % 100 < 70 - h % 40
          FROM t
          UNION ALL SELECT task_id, source, 'm3',
            (((h % 999959) * 40692) % 2147483647) % 100 < 66 - h % 40
          FROM t),
        g AS (SELECT source, mdl,
            CAST(sum(CASE WHEN ok THEN 1 ELSE 0 END) AS BIGINT) AS gj
          FROM o GROUP BY 1, 2),
        l AS (SELECT source, task_id,
            CAST(sum(CASE WHEN ok THEN 1 ELSE 0 END) AS BIGINT) AS li
          FROM o GROUP BY 1, 2),
        tt AS (SELECT source, CAST(count(*) AS BIGINT) AS n,
            CAST(sum(li) AS BIGINT) AS t2,
            CAST(sum(li * li) AS BIGINT) AS l2
          FROM l GROUP BY 1),
        sq AS (SELECT g.source, CAST(count(*) AS BIGINT) AS k,
            max(n) AS n, max(t2) AS t2, max(l2) AS l2,
            CAST(sum(CAST(gj AS HUGEINT) * (n - gj)) AS HUGEINT) AS sgq
          FROM g JOIN tt ON g.source = tt.source GROUP BY 1),
        r AS (SELECT source, k, n,
            CAST(n AS HUGEINT) * l2 - CAST(t2 AS HUGEINT) * t2 AS d, sgq
          FROM sq),
        fin AS (SELECT source, k, n,
            CASE WHEN k >= 2 AND d > 0 THEN
              CAST(CAST(k AS HUGEINT) * (d - sgq) * 1000000
                // ((k - 1) * d) AS BIGINT) END AS alpha6
          FROM r)
        SELECT source, k, n AS n_tasks, alpha6,
          CASE WHEN alpha6 IS NULL THEN NULL
            WHEN alpha6 >= 900000 THEN 'excellent'
            WHEN alpha6 >= 800000 THEN 'good'
            WHEN alpha6 >= 700000 THEN 'acceptable'
            ELSE 'questionable' END AS consistency
        FROM fin ORDER BY source""",

    // same 5-rater/4-cat fixture as q168; the Gwet chance model in one
    // exact HUGEINT division
    "q304_gwet_ac1" ->
      """WITH r AS (SELECT source, item_id, g.rater,
            CASE WHEN (h + g.rater*17) % 10 < 3
              THEN (h % 4 + 1 + (h % 97 + g.rater) % 3) % 4
              ELSE h % 4 END AS cat
          FROM (SELECT source, doc_id AS item_id,
                  ((doc_id % 2147483648) * 2654435761) % 2147483647 AS h
                FROM documents),
            (SELECT unnest(generate_series(0, 4)) AS rater) g),
        cnt AS (SELECT source, item_id, cat, CAST(count(*) AS BIGINT) AS c
          FROM r GROUP BY source, item_id, cat),
        pi AS (SELECT source, item_id,
            CAST(sum(c * (c - 1)) AS BIGINT) AS agree2,
            CAST(sum(c) AS BIGINT) AS n_i
          FROM cnt GROUP BY source, item_id),
        ps AS (SELECT source, CAST(count(*) AS BIGINT) AS n_items,
            CAST(sum(agree2) AS BIGINT) AS pan,
            max(n_i) AS n_raters, min(n_i) AS rmin
          FROM pi GROUP BY source),
        ct AS (SELECT source, cat, CAST(sum(c) AS BIGINT) AS cc
          FROM cnt GROUP BY source, cat),
        cs AS (SELECT source, CAST(count(*) AS BIGINT) AS q,
            CAST(sum(cc) AS BIGINT) AS nr,
            CAST(sum(CAST(cc AS HUGEINT) * cc) AS HUGEINT) AS cc2
          FROM ct GROUP BY source),
        j AS (SELECT ps.source, n_items, n_raters, rmin, pan, q, nr,
            CAST(nr AS HUGEINT) * nr - cc2 AS en,
            (q - 1) * CAST(nr AS HUGEINT) * nr AS ed,
            CAST(n_items AS HUGEINT) * n_raters * (n_raters - 1) AS pad
          FROM ps JOIN cs ON ps.source = cs.source)
        SELECT source, n_items, n_raters, q AS n_cats,
          CASE WHEN rmin = n_raters AND q >= 2 AND n_raters >= 2
              AND ed > en THEN
            CAST((CAST(pan AS HUGEINT) * ed - en * pad) * 1000000
              // (pad * (ed - en)) AS BIGINT) END AS ac1_6
        FROM j ORDER BY source""",

    // fold chain + evader alphabet + confusable-count char set are all
    // GENERATED from graft.functions.ConfusableTable / the shared
    // evader pair — the two sides share one table and cannot drift.
    // Every sum(BIGINT) is cast back to BIGINT (HUGEINT-widening class,
    // round-12 root cause).
    "q305_confusable_fold" -> {
      val allFrom = graft.functions.ConfusableTable.singleFrom +
        graft.functions.ConfusableTable.multi.map(_._1).mkString
      s"""WITH base AS (SELECT doc_id, source, text,
            ((doc_id % 2147483648) * 2654435761) % 2147483647 AS h
          FROM documents),
        rows_all AS (
          SELECT source, text, 'orig' AS variant FROM base
          UNION ALL
          SELECT source,
            translate(text, '${graft.operators.TextAnalysis.EvaderLatin}',
              '${graft.operators.TextAnalysis.EvaderCyrillic}') AS text,
            'evader' AS variant FROM base WHERE h % 10 < 3),
        f AS (SELECT source, variant, text,
            ${graft.functions.ConfusableTable.oracleSql("text")} AS fold,
            CAST(length(text)
              - length(translate(text, '$allFrom', '')) AS BIGINT)
              AS n_confusable
          FROM rows_all)
        SELECT source, CAST(count(*) AS BIGINT) AS n_rows,
          CAST(sum(CASE WHEN variant = 'evader' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_evaders,
          CAST(sum(CASE WHEN n_confusable > 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_conf_rows,
          CAST(sum(n_confusable) AS BIGINT) AS n_confusable,
          CAST(count(DISTINCT text) AS BIGINT) AS distinct_text,
          CAST(count(DISTINCT fold) AS BIGINT) AS distinct_fold,
          CAST(count(DISTINCT text) - count(DISTINCT fold) AS BIGINT)
            AS fold_collisions
        FROM f GROUP BY source ORDER BY source"""
    },

    // the q242 value-set grid with the ECDF gap carried as the exact
    // common-denominator integer dint = cum*m - cumrest*n; ONE floor
    "q306_cvm_test" ->
      """WITH g AS (SELECT source AS gsrc, CAST(n_chars AS BIGINT) AS v,
            CAST(count(*) AS BIGINT) AS c
          FROM documents GROUP BY source, n_chars),
        vals AS (SELECT v, CAST(sum(c) AS BIGINT) AS ct FROM g GROUP BY v),
        vc AS (SELECT v, ct, sum(ct) OVER (ORDER BY v
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumall
          FROM vals),
        grp AS (SELECT gsrc, CAST(sum(c) AS BIGINT) AS n FROM g
          GROUP BY gsrc),
        na AS (SELECT CAST(sum(c) AS BIGINT) AS nall FROM g),
        grid AS (SELECT grp.gsrc, vc.v, vc.ct, vc.cumall, grp.n,
            coalesce(g.c, 0) AS c
          FROM vc CROSS JOIN grp
          LEFT JOIN g ON g.gsrc = grp.gsrc AND g.v = vc.v),
        cum AS (SELECT gsrc, v, ct, n, cumall,
            sum(c) OVER (PARTITION BY gsrc ORDER BY v
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
          FROM grid),
        dd AS (SELECT gsrc, n, (SELECT nall FROM na) - n AS nrest, ct,
            CAST(cum AS HUGEINT) * ((SELECT nall FROM na) - n)
              - CAST(cumall - cum AS HUGEINT) * n AS dint
          FROM cum),
        agg AS (SELECT gsrc, max(n) AS n_group, max(nrest) AS n_rest,
            CAST(sum(CAST(ct AS HUGEINT) * dint * dint) AS HUGEINT)
              AS sd2,
            max(n + nrest) AS nall FROM dd GROUP BY gsrc),
        fin AS (SELECT gsrc, n_group, n_rest,
            CASE WHEN n_rest > 0 THEN CAST(sd2 * 1000000
              // (CAST(nall AS HUGEINT) * nall * n_group * n_rest)
              AS BIGINT) END AS cvm6
          FROM agg)
        SELECT gsrc AS source, n_group, n_rest, cvm6,
          CASE WHEN n_rest > 0 THEN cvm6 > 461000 END AS differs
        FROM fin ORDER BY source""",

    // same grid/dint; D+ and D- exact integer maxima, one floor on the
    // sum, 1.747-band critical value via one IEEE sqrt
    "q307_kuiper" ->
      """WITH g AS (SELECT source AS gsrc, CAST(n_chars AS BIGINT) AS v,
            CAST(count(*) AS BIGINT) AS c
          FROM documents GROUP BY source, n_chars),
        vals AS (SELECT v, CAST(sum(c) AS BIGINT) AS ct FROM g GROUP BY v),
        vc AS (SELECT v, ct, sum(ct) OVER (ORDER BY v
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumall
          FROM vals),
        grp AS (SELECT gsrc, CAST(sum(c) AS BIGINT) AS n FROM g
          GROUP BY gsrc),
        na AS (SELECT CAST(sum(c) AS BIGINT) AS nall FROM g),
        grid AS (SELECT grp.gsrc, vc.v, vc.cumall, grp.n,
            coalesce(g.c, 0) AS c
          FROM vc CROSS JOIN grp
          LEFT JOIN g ON g.gsrc = grp.gsrc AND g.v = vc.v),
        cum AS (SELECT gsrc, v, n, cumall,
            sum(c) OVER (PARTITION BY gsrc ORDER BY v
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
          FROM grid),
        dd AS (SELECT gsrc, n, (SELECT nall FROM na) - n AS nrest,
            CAST(cum AS HUGEINT) * ((SELECT nall FROM na) - n)
              - CAST(cumall - cum AS HUGEINT) * n AS dint
          FROM cum),
        agg AS (SELECT gsrc, max(n) AS n_group, max(nrest) AS n_rest,
            greatest(max(dint), 0) AS dp, greatest(max(-dint), 0) AS dm
          FROM dd GROUP BY gsrc),
        fin AS (SELECT gsrc, n_group, n_rest,
            CASE WHEN n_rest > 0 THEN CAST(dp * 1000000
              // (CAST(n_group AS HUGEINT) * n_rest) AS BIGINT) END
              AS dplus6,
            CASE WHEN n_rest > 0 THEN CAST(dm * 1000000
              // (CAST(n_group AS HUGEINT) * n_rest) AS BIGINT) END
              AS dminus6,
            CASE WHEN n_rest > 0 THEN CAST((dp + dm) * 1000000
              // (CAST(n_group AS HUGEINT) * n_rest) AS BIGINT) END
              AS v6,
            CASE WHEN n_rest > 0 THEN CAST(floor(1747000.0 *
              sqrt((n_group + n_rest)::DOUBLE
                / (n_group * n_rest)::DOUBLE)) AS BIGINT) END AS crit6
          FROM agg)
        SELECT gsrc AS source, n_group, n_rest, dplus6, dminus6, v6,
          crit6, v6 > crit6 AS differs
        FROM fin ORDER BY source""",

    // the q291 friedman grid/rank chain + the name-order index j;
    // L2 exact, z via one IEEE sqrt on exact n(k^2-1)
    "q308_page_trend" ->
      """WITH d0 AS (SELECT event_type AS t, CAST(ts AS DATE) AS d,
            CAST(count(*) AS BIGINT) AS x FROM events GROUP BY 1, 2),
        days AS (SELECT DISTINCT d FROM d0),
        ts2 AS (SELECT DISTINCT t FROM d0),
        grid AS (SELECT ts2.t, days.d, coalesce(x, 0) AS x
          FROM days CROSS JOIN ts2
          LEFT JOIN d0 ON ts2.t = d0.t AND days.d = d0.d),
        pdv AS (SELECT d, x, CAST(count(*) AS BIGINT) AS ct
          FROM grid GROUP BY 1, 2),
        rk AS (SELECT d, x, 2 * sum(ct) OVER (PARTITION BY d ORDER BY x
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            - ct + 1 AS rank2 FROM pdv),
        r AS (SELECT grid.t, grid.d, rank2
          FROM grid JOIN rk ON grid.d = rk.d AND grid.x = rk.x),
        st AS (SELECT CAST(count(DISTINCT d) AS BIGINT) AS n,
            CAST(count(DISTINCT t) AS BIGINT) AS k FROM r),
        pt AS (SELECT t, CAST(sum(rank2) AS BIGINT) AS r2
          FROM r GROUP BY 1),
        ord AS (SELECT t, CAST(row_number() OVER (ORDER BY t) AS BIGINT)
            AS j FROM ts2),
        l AS (SELECT CAST(sum(j * r2) AS BIGINT) AS l2
          FROM pt JOIN ord USING (t)),
        f AS (SELECT n, k, l2,
            n * k * (k + 1) * (k + 1) // 2 AS e2 FROM l, st),
        z AS (SELECT n, k, l2,
            CASE WHEN k >= 3 AND n >= 1 THEN CAST(floor(
              CAST(l2 - e2 AS DOUBLE) * 6e6
              / (CAST(k AS DOUBLE) * (k + 1)
                * sqrt(CAST(n * (k * k - 1) AS DOUBLE)))) AS BIGINT) END
              AS page_z6
          FROM f)
        SELECT k, n AS n_days, l2, page_z6,
          CASE WHEN page_z6 IS NULL THEN NULL
            WHEN page_z6 > 1644854 THEN 'increasing'
            WHEN page_z6 < -1644854 THEN 'decreasing'
            ELSE 'none' END AS trend
        FROM z""",

    // the q168 fixture + census; kfree6 = one truncating division on
    // the SAME quantized pbar6 (the double-floor contract)
    "q309_randolph_kappa" ->
      """WITH r AS (SELECT source, item_id, g.rater,
              CASE WHEN (h + g.rater*17) % 10 < 3
                THEN (h % 4 + 1 + (h % 97 + g.rater) % 3) % 4
                ELSE h % 4 END AS cat
            FROM (SELECT source, doc_id AS item_id,
                    ((doc_id % 2147483648) * 2654435761) % 2147483647 AS h
                  FROM documents),
              (SELECT unnest(generate_series(0, 4)) AS rater) g),
         cnt AS (SELECT source, item_id, cat, count(*) AS c
                 FROM r GROUP BY source, item_id, cat),
         pi AS (SELECT source, item_id, CAST(sum(c*c) AS BIGINT) AS s2,
                  CAST(sum(c) AS BIGINT) AS n_i
                FROM cnt GROUP BY source, item_id),
         ps AS (SELECT source, CAST(count(*) AS BIGINT) AS n_items,
                  CAST(sum(s2) AS BIGINT) AS sum_s2,
                  max(n_i) AS n_raters, min(n_i) AS rmin
                FROM pi GROUP BY source),
         qs AS (SELECT source, CAST(count(DISTINCT cat) AS BIGINT)
                  AS n_cats FROM cnt GROUP BY source),
         j AS (SELECT ps.source, n_items, n_raters, rmin, n_cats,
                 CAST(floor((sum_s2 - n_items*n_raters) * 1000000 /
                   (n_items*n_raters*(n_raters-1))) AS BIGINT) AS pbar6
               FROM ps JOIN qs USING (source))
         SELECT source, n_items, n_raters, n_cats, pbar6,
           CASE WHEN rmin = n_raters AND n_cats >= 2 AND n_raters >= 2
             THEN (pbar6 * n_cats - 1000000) // (n_cats - 1) END
             AS kfree6
         FROM j ORDER BY source""",

    // fixture replay (same idHash + decorrelated second fold), occupied
    // cells + i<j pair spine, per-pair floored terms, WH(df) gate
    "q310_bowker" ->
      """WITH p AS (SELECT doc_id AS task_id, source,
            ((doc_id % 2147483648) * 2654435761) % 2147483647 AS h
          FROM documents),
        pc AS (SELECT task_id, source, h % 4 AS ca,
            ((h % 999983) * 48271) % 2147483647 % 20 AS u FROM p),
        ab AS (SELECT source, ca AS cat_a,
            CASE WHEN u < 3 THEN (ca + 1) % 4
              WHEN u = 3 THEN (ca + 3) % 4 ELSE ca END AS cat_b
          FROM pc),
        cells AS (SELECT source, cat_a AS i, cat_b AS j,
            CAST(count(*) AS BIGINT) AS c FROM ab GROUP BY 1, 2, 3),
        srcs AS (SELECT DISTINCT source FROM documents),
        spine AS (SELECT source, a.i, b.j FROM srcs,
            unnest(generate_series(0, 3)) a(i),
            unnest(generate_series(0, 3)) b(j)
          WHERE a.i < b.j),
        terms AS (SELECT spine.source,
            coalesce(cij.c, 0) AS nij, coalesce(cji.c, 0) AS nji
          FROM spine
          LEFT JOIN cells cij ON cij.source = spine.source
            AND cij.i = spine.i AND cij.j = spine.j
          LEFT JOIN cells cji ON cji.source = spine.source
            AND cji.i = spine.j AND cji.j = spine.i),
        t6 AS (SELECT source, nij + nji AS tot,
            CASE WHEN nij + nji > 0 THEN
              CAST(CAST(nij - nji AS HUGEINT) * (nij - nji) * 1000000
                // (nij + nji) AS BIGINT) ELSE 0 END AS t6
          FROM terms),
        agg AS (SELECT source,
            CAST(sum(CASE WHEN tot > 0 THEN 1 ELSE 0 END) AS BIGINT)
              AS df,
            CAST(sum(t6) AS BIGINT) AS chi2_6,
            CAST(sum(tot) AS BIGINT) AS n_discordant
          FROM t6 GROUP BY source),
        wh AS (SELECT source, df, chi2_6, n_discordant,
            CAST(greatest(df, 1) AS DOUBLE) AS nu FROM agg),
        wh2 AS (SELECT source, df, chi2_6, n_discordant, nu,
            1.0 - 2.0/(9.0*nu)
              + 1.6448536269514722 * sqrt(2.0/(9.0*nu)) AS w FROM wh)
        SELECT source, df, n_discordant,
          CASE WHEN df >= 1 THEN chi2_6 END AS chi2_6,
          CASE WHEN df >= 1
            THEN CAST(floor(nu * w * w * w * 1e6) AS BIGINT) END
            AS crit6,
          CASE WHEN df >= 1 THEN
            chi2_6 > CAST(floor(nu * w * w * w * 1e6) AS BIGINT) END
            AS asymmetric
        FROM wh2 ORDER BY source""",

    // the q266 fixture edges + symmetrized degrees; the correlation
    // closed-forms to one HUGEINT division
    "q311_assortativity" ->
      """WITH nn AS (SELECT count(*) AS n FROM documents),
        nodes AS (SELECT doc_id FROM documents),
        ring AS (SELECT doc_id AS src, (doc_id + 1) % n AS dst
          FROM nodes, nn),
        chords AS (SELECT doc_id AS src, (doc_id + 2) % n AS dst
          FROM nodes, nn
          WHERE (((doc_id % 2147483648) * 2654435761) % 2147483647)
            % 7 = 0),
        hub0 AS (SELECT doc_id AS src, (31*doc_id+7) % n AS d1,
            (17*doc_id+3) % n AS d2, (5*doc_id+11) % n AS d3
          FROM nodes, nn
          WHERE (((doc_id % 2147483648) * 2654435761) % 2147483647)
            % 3 = 0),
        hubs AS (SELECT src, unnest([d1, d2, d3]) AS dst FROM hub0),
        edges AS (SELECT DISTINCT src, dst FROM
            (SELECT src, dst FROM ring UNION ALL
             SELECT src, dst FROM chords UNION ALL
             SELECT src, dst FROM hubs)
          WHERE dst <> src),
        sym AS (SELECT DISTINCT src, dst FROM (
            SELECT src, dst FROM edges
            UNION ALL SELECT dst AS src, src AS dst FROM edges)),
        deg AS (SELECT src AS id, CAST(count(*) AS BIGINT) AS deg
          FROM sym GROUP BY 1),
        e AS (SELECT du.deg AS a, dv.deg AS b
          FROM sym s JOIN deg du ON s.src = du.id
            JOIN deg dv ON s.dst = dv.id),
        ag AS (SELECT CAST(count(*) AS BIGINT) AS m,
            (SELECT CAST(count(*) AS BIGINT) FROM deg) AS n_nodes,
            CAST(sum(CAST(a AS HUGEINT) * b) AS HUGEINT) AS aa,
            CAST(sum(a + b) AS BIGINT) AS bb,
            CAST(sum(CAST(a AS HUGEINT) * a + CAST(b AS HUGEINT) * b)
              AS HUGEINT) AS cc
          FROM e)
        SELECT m // 2 AS n_edges, n_nodes,
          CASE WHEN 2 * CAST(m AS HUGEINT) * cc
              - CAST(bb AS HUGEINT) * bb > 0
            THEN CAST((4 * CAST(m AS HUGEINT) * aa
                - CAST(bb AS HUGEINT) * bb) * 1000000
              // (2 * CAST(m AS HUGEINT) * cc
                - CAST(bb AS HUGEINT) * bb) AS BIGINT) END AS assort6
        FROM ag""",

    // the q285 ACF chain verbatim, then the portmanteau fold: per-lag
    // floored t_k = acf6^2 div (n-k), one final floor (the documented
    // double-floor contract), WH(7) gate
    "q312_ljung_box" ->
      """WITH d0 AS (SELECT event_type AS g, CAST(ts AS DATE) AS d,
            CAST(count(*) AS BIGINT) AS x FROM events GROUP BY 1, 2),
        span AS (SELECT g, min(d) AS dlo, max(d) AS dhi
          FROM d0 GROUP BY 1),
        spine AS (SELECT g, CAST(unnest(generate_series(dlo, dhi,
            INTERVAL 1 DAY)) AS DATE) AS d FROM span),
        daily AS (SELECT spine.g, spine.d, coalesce(x, 0) AS x,
            date_diff('day', dlo, spine.d) AS t
          FROM spine LEFT JOIN d0 ON spine.g = d0.g AND spine.d = d0.d
            JOIN span ON spine.g = span.g),
        st AS (SELECT g, CAST(count(*) AS BIGINT) AS n,
            CAST(sum(x) AS BIGINT) AS s,
            CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS q
          FROM daily GROUP BY 1),
        lg AS (SELECT g, t, x, k, t + k AS tj
          FROM daily, unnest(generate_series(1, 7)) AS u(k)),
        pr AS (SELECT lg.g, k,
            CAST(sum(CAST(lg.x AS HUGEINT) * tl.x) AS HUGEINT) AS p,
            CAST(sum(lg.x) AS BIGINT) AS h,
            CAST(sum(tl.x) AS BIGINT) AS t2
          FROM lg JOIN daily tl ON lg.g = tl.g AND lg.tj = tl.t
          GROUP BY 1, 2),
        r AS (SELECT pr.g, k, n,
            CAST(n AS HUGEINT) * n * p
              - CAST(n AS HUGEINT) * s * (h + t2)
              + (CAST(n AS HUGEINT) - k) * s * s AS num,
            CAST(n AS HUGEINT) * n * q
              - CAST(n AS HUGEINT) * s * s AS den
          FROM pr JOIN st ON pr.g = st.g),
        a AS (SELECT g, k, n, CASE WHEN den > 0 THEN
            CAST(num * 1000000 // den AS BIGINT) END AS acf6 FROM r),
        tt AS (SELECT g, n, CASE WHEN acf6 IS NOT NULL AND n > k
            THEN acf6 * acf6 // (n - k) END AS tk FROM a),
        ag AS (SELECT g, max(n) AS n_days,
            CAST(sum(CASE WHEN tk IS NULL THEN 1 ELSE 0 END) AS BIGINT)
              AS nulls,
            CAST(sum(tk) AS BIGINT) AS stt FROM tt GROUP BY g),
        fin AS (SELECT g, n_days,
            CASE WHEN nulls = 0 AND n_days > 7 THEN
              CAST(CAST(n_days AS HUGEINT) * (n_days + 2) * stt
                // 1000000 AS BIGINT) END AS lb_q6,
            CAST(floor(7.0 * (1.0 - 2.0/63.0
              + 1.6448536269514722 * sqrt(2.0/63.0))
              * (1.0 - 2.0/63.0 + 1.6448536269514722 * sqrt(2.0/63.0))
              * (1.0 - 2.0/63.0 + 1.6448536269514722 * sqrt(2.0/63.0))
              * 1e6) AS BIGINT) AS crit6
          FROM ag)
        SELECT g AS event_type, n_days, lb_q6, crit6,
          CASE WHEN lb_q6 IS NOT NULL THEN lb_q6 > crit6 END
            AS autocorrelated
        FROM fin ORDER BY event_type""",

    // dense spine + lag/lead strict-extrema census; z via one IEEE
    // sqrt; ties break neither way (the strict convention)
    "q313_turning_points" ->
      """WITH d0 AS (SELECT event_type AS g, CAST(ts AS DATE) AS d,
            CAST(count(*) AS BIGINT) AS x FROM events GROUP BY 1, 2),
        span AS (SELECT g, min(d) AS dlo, max(d) AS dhi
          FROM d0 GROUP BY 1),
        daily AS (SELECT spine.g, spine.d, coalesce(x, 0) AS x
          FROM (SELECT g, CAST(unnest(generate_series(dlo, dhi,
              INTERVAL 1 DAY)) AS DATE) AS d FROM span) spine
          LEFT JOIN d0 ON spine.g = d0.g AND spine.d = d0.d),
        trip AS (SELECT g, x,
            lag(x) OVER (PARTITION BY g ORDER BY d) AS p,
            lead(x) OVER (PARTITION BY g ORDER BY d) AS f
          FROM daily),
        mk AS (SELECT g, CASE WHEN p IS NOT NULL AND f IS NOT NULL
            AND ((p < x AND x > f) OR (p > x AND x < f))
            THEN 1 ELSE 0 END AS turn FROM trip),
        ag AS (SELECT g, CAST(count(*) AS BIGINT) AS n_days,
            CAST(sum(turn) AS BIGINT) AS n_turns FROM mk GROUP BY g)
        SELECT g AS event_type, n_days, n_turns,
          CASE WHEN n_days >= 4 THEN CAST(floor(
            CAST(3 * n_turns - 2 * (n_days - 2) AS DOUBLE) * 1e6
            / sqrt(CAST(16 * n_days - 29 AS DOUBLE) / 10.0)) AS BIGINT)
            END AS tp_z6,
          CASE WHEN n_days >= 4 THEN abs(CAST(floor(
            CAST(3 * n_turns - 2 * (n_days - 2) AS DOUBLE) * 1e6
            / sqrt(CAST(16 * n_days - 29 AS DOUBLE) / 10.0)) AS BIGINT))
            > 1959964 END AS nonrandom
        FROM ag ORDER BY event_type""",

    // dense spine + cumulative partial sums; n*S_t exact integer, one
    // division; fixed 463000 level-stationarity constant
    "q314_kpss" ->
      """WITH d0 AS (SELECT event_type AS g, CAST(ts AS DATE) AS d,
            CAST(count(*) AS BIGINT) AS x FROM events GROUP BY 1, 2),
        span AS (SELECT g, min(d) AS dlo, max(d) AS dhi
          FROM d0 GROUP BY 1),
        daily AS (SELECT spine.g, spine.d, coalesce(x, 0) AS x
          FROM (SELECT g, CAST(unnest(generate_series(dlo, dhi,
              INTERVAL 1 DAY)) AS DATE) AS d FROM span) spine
          LEFT JOIN d0 ON spine.g = d0.g AND spine.d = d0.d),
        cm AS (SELECT g, x,
            row_number() OVER (PARTITION BY g ORDER BY d) AS t,
            sum(x) OVER (PARTITION BY g ORDER BY d
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
          FROM daily),
        st AS (SELECT g, CAST(count(*) AS BIGINT) AS n,
            CAST(sum(x) AS BIGINT) AS s,
            CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS q
          FROM daily GROUP BY 1),
        ns AS (SELECT cm.g, n, s, q,
            CAST(n AS HUGEINT) * cum - CAST(t AS HUGEINT) * s AS nst
          FROM cm JOIN st ON cm.g = st.g),
        ag AS (SELECT g, max(n) AS n_days,
            CAST(sum(nst * nst) AS HUGEINT) AS ss,
            max(CAST(n AS HUGEINT) * q - CAST(s AS HUGEINT) * s) AS den
          FROM ns GROUP BY g),
        fin AS (SELECT g, n_days,
            CASE WHEN n_days >= 2 AND den > 0 THEN
              CAST(ss * 1000000 // (CAST(n_days AS HUGEINT) * n_days
                * den) AS BIGINT) END AS kpss6
          FROM ag)
        SELECT g AS event_type, n_days, kpss6,
          CASE WHEN kpss6 IS NOT NULL THEN kpss6 > 463000 END
            AS nonstationary
        FROM fin ORDER BY event_type""",

    // the q266 DIRECTED edge fixture (no symmetrization); mutual count
    // via one reversed-key self-join, one division per statistic
    "q315_reciprocity" ->
      """WITH nn AS (SELECT count(*) AS n FROM documents),
        nodes AS (SELECT doc_id FROM documents),
        ring AS (SELECT doc_id AS src, (doc_id + 1) % n AS dst
          FROM nodes, nn),
        chords AS (SELECT doc_id AS src, (doc_id + 2) % n AS dst
          FROM nodes, nn
          WHERE (((doc_id % 2147483648) * 2654435761) % 2147483647)
            % 7 = 0),
        hub0 AS (SELECT doc_id AS src, (31*doc_id+7) % n AS d1,
            (17*doc_id+3) % n AS d2, (5*doc_id+11) % n AS d3
          FROM nodes, nn
          WHERE (((doc_id % 2147483648) * 2654435761) % 2147483647)
            % 3 = 0),
        hubs AS (SELECT src, unnest([d1, d2, d3]) AS dst FROM hub0),
        edges AS (SELECT DISTINCT src, dst FROM
            (SELECT src, dst FROM ring UNION ALL
             SELECT src, dst FROM chords UNION ALL
             SELECT src, dst FROM hubs)
          WHERE dst <> src),
        mu AS (SELECT CAST(count(*) AS BIGINT) AS mu
          FROM edges a JOIN edges b
            ON a.src = b.dst AND a.dst = b.src),
        ag AS (SELECT CAST(count(*) AS BIGINT) AS m,
            (SELECT mu FROM mu) AS mu,
            (SELECT CAST(n AS HUGEINT) * (n - 1) FROM nn) AS np
          FROM edges)
        SELECT m AS n_edges, mu AS n_mutual,
          CASE WHEN m > 0 THEN mu * 1000000 // m END AS r6,
          CASE WHEN m > 0 AND CAST(m AS HUGEINT) * (np - m) > 0 THEN
            CAST((CAST(mu AS HUGEINT) * np - CAST(m AS HUGEINT) * m)
              * 1000000 // (CAST(m AS HUGEINT) * (np - m)) AS BIGINT)
            END AS rho6
        FROM ag""",

    // two deterministic per-source ranking windows, the max-rank
    // census + depth-10 spine, exact 9^k/10^k rational weights with
    // per-depth floors
    "q316_rbo" ->
      """WITH base AS (SELECT source, doc_id,
            CAST(n_chars AS BIGINT) AS nc,
            CAST(len(list_filter(string_split(text, ' '),
              x -> x <> '')) AS BIGINT) AS nw
          FROM documents),
        a AS (SELECT source, doc_id, ra FROM (SELECT source, doc_id,
            row_number() OVER (PARTITION BY source
              ORDER BY nc DESC, doc_id) AS ra FROM base)
          WHERE ra <= 10),
        b AS (SELECT source, doc_id, rb FROM (SELECT source, doc_id,
            row_number() OVER (PARTITION BY source
              ORDER BY nw DESC, doc_id) AS rb FROM base)
          WHERE rb <= 10),
        cen AS (SELECT a.source, greatest(ra, rb) AS m,
            CAST(count(*) AS BIGINT) AS c
          FROM a JOIN b ON a.source = b.source AND a.doc_id = b.doc_id
          GROUP BY 1, 2),
        spine AS (SELECT s.source, w.d, w.p9, w.p10
          FROM (SELECT DISTINCT source FROM documents) s,
            (VALUES (1, 1, 10), (2, 9, 100), (3, 81, 1000),
              (4, 729, 10000), (5, 6561, 100000), (6, 59049, 1000000),
              (7, 531441, 10000000), (8, 4782969, 100000000),
              (9, 43046721, 1000000000),
              (10, 387420489, 10000000000)) w(d, p9, p10)),
        j AS (SELECT spine.source, d, p9, p10, coalesce(c, 0) AS c
          FROM spine LEFT JOIN cen ON cen.source = spine.source
            AND cen.m = spine.d),
        cm AS (SELECT source, d, p9, p10,
            sum(c) OVER (PARTITION BY source ORDER BY d
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ov
          FROM j)
        SELECT source, CAST(max(ov) AS BIGINT) AS n_common,
          CAST(sum(ov * p9 * 1000000 // (d * p10)) AS BIGINT) AS rbo6
        FROM cm GROUP BY source ORDER BY source""",

    // dense spine, global doubled midranks from the value census, one
    // calendar cumulative (2U_t = R2_t - t(n+1)); earliest-argmax via
    // max-then-join-back; floored-ln40 integer significance gate
    "q317_pettitt" ->
      """WITH d0 AS (SELECT event_type AS g, CAST(ts AS DATE) AS d,
            CAST(count(*) AS BIGINT) AS x FROM events GROUP BY 1, 2),
        span AS (SELECT g, min(d) AS dlo, max(d) AS dhi
          FROM d0 GROUP BY 1),
        daily AS (SELECT spine.g, spine.d, coalesce(x, 0) AS x
          FROM (SELECT g, CAST(unnest(generate_series(dlo, dhi,
              INTERVAL 1 DAY)) AS DATE) AS d FROM span) spine
          LEFT JOIN d0 ON spine.g = d0.g AND spine.d = d0.d),
        cen AS (SELECT g, x, CAST(count(*) AS BIGINT) AS ct
          FROM daily GROUP BY 1, 2),
        rk AS (SELECT g, x, 2 * sum(ct) OVER (PARTITION BY g ORDER BY x
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            - ct + 1 AS r2 FROM cen),
        st AS (SELECT g, CAST(count(*) AS BIGINT) AS n
          FROM daily GROUP BY 1),
        u AS (SELECT daily.g, d,
            row_number() OVER (PARTITION BY daily.g ORDER BY d) AS t,
            sum(r2) OVER (PARTITION BY daily.g ORDER BY d
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rs
          FROM daily JOIN rk ON daily.g = rk.g AND daily.x = rk.x),
        u2 AS (SELECT u.g, d, rs - CAST(t AS HUGEINT) * (n + 1) AS u2v,
            n FROM u JOIN st ON u.g = st.g WHERE t < n),
        km AS (SELECT g, max(n) AS n_days, max(abs(u2v)) AS k2
          FROM u2 GROUP BY g),
        at AS (SELECT u2.g, min(d) AS cp_day FROM u2
          JOIN km ON u2.g = km.g AND abs(u2.u2v) = km.k2 GROUP BY u2.g)
        SELECT km.g AS event_type, n_days, CAST(k2 AS BIGINT) AS k2,
          cp_day,
          3 * CAST(k2 AS HUGEINT) * k2 * 1000000 > 2 * 3688879
            * (CAST(n_days AS HUGEINT) * n_days * n_days
              + CAST(n_days AS HUGEINT) * n_days) AS significant
        FROM km LEFT JOIN at ON km.g = at.g ORDER BY event_type""",

    // fixture replay (idHash + decorrelated fold, planted positive
    // shift), zero-diff drop, |d| value-set doubled midranks, exact
    // E2/12Var chain, one IEEE sqrt
    "q318_wilcoxon" ->
      """WITH p AS (SELECT source,
            ((h % 999979) * 69621) % 2147483647 AS u, h
          FROM (SELECT doc_id, source,
              ((doc_id % 2147483648) * 2654435761) % 2147483647 AS h
            FROM documents)),
        sc AS (SELECT source, h % 1000000 AS a6,
            h % 1000000 + CASE WHEN u % 40 = 0 THEN 0
              WHEN u % 5 < 3 THEN u % 30000
              ELSE -(u % 20000) END AS b6 FROM p),
        d AS (SELECT source, b6 - a6 AS dd, abs(b6 - a6) AS ad
          FROM sc WHERE b6 - a6 <> 0),
        cen AS (SELECT source, ad, CAST(count(*) AS BIGINT) AS ct,
            CAST(sum(CASE WHEN dd > 0 THEN 1 ELSE 0 END) AS BIGINT)
              AS pos
          FROM d GROUP BY 1, 2),
        rk AS (SELECT source, ad, ct, pos,
            2 * sum(ct) OVER (PARTITION BY source ORDER BY ad
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              - ct + 1 AS r2 FROM cen),
        ag AS (SELECT source, CAST(sum(ct) AS BIGINT) AS n_pairs,
            CAST(sum(pos * r2) AS BIGINT) AS w2,
            CAST(sum(ct*ct*ct - ct) AS BIGINT) AS tie
          FROM rk GROUP BY source),
        fin AS (SELECT source, n_pairs, w2,
            n_pairs * (n_pairs + 1) // 2 AS e2,
            2 * CAST(n_pairs AS HUGEINT) * (n_pairs + 1)
              * (2 * n_pairs + 1) - tie AS var12 FROM ag),
        z AS (SELECT source, n_pairs, w2,
            CASE WHEN n_pairs > 0 AND var12 > 0 THEN
              CAST(floor(CAST(w2 - e2 AS DOUBLE) * 1e6
                / sqrt(CAST(var12 AS DOUBLE) / 12.0)) AS BIGINT) END
              AS z6
          FROM fin)
        SELECT source, n_pairs, w2, z6,
          CASE WHEN z6 IS NOT NULL THEN abs(z6) > 1959964 END
            AS shifted
        FROM z ORDER BY source""",

    // one (source, x, y) cell census; the pair join runs on the
    // bounded cell grid; doubled-pair tie masses from the margins
    "q319_ordinal_assoc" ->
      """WITH b AS (SELECT source, n_chars // 200 AS x,
            CAST(len(list_filter(string_split(text, ' '),
              t -> t <> '')) AS BIGINT) // 30 AS y
          FROM documents),
        cells AS (SELECT source, x, y, CAST(count(*) AS BIGINT) AS n
          FROM b GROUP BY 1, 2, 3),
        pr AS (SELECT a.source,
            CAST(sum(CASE WHEN a.y < c.y
              THEN CAST(a.n AS HUGEINT) * c.n ELSE 0 END) AS HUGEINT)
              AS cc,
            CAST(sum(CASE WHEN a.y > c.y
              THEN CAST(a.n AS HUGEINT) * c.n ELSE 0 END) AS HUGEINT)
              AS dd
          FROM cells a JOIN cells c
            ON a.source = c.source AND a.x < c.x
          GROUP BY a.source),
        xm AS (SELECT source, CAST(sum(CAST(nx AS HUGEINT) * (nx - 1))
            AS HUGEINT) AS txall
          FROM (SELECT source, x, CAST(sum(n) AS BIGINT) AS nx
            FROM cells GROUP BY 1, 2) GROUP BY source),
        ym AS (SELECT source, CAST(sum(CAST(ny AS HUGEINT) * (ny - 1))
            AS HUGEINT) AS tyall
          FROM (SELECT source, y, CAST(sum(n) AS BIGINT) AS ny
            FROM cells GROUP BY 1, 2) GROUP BY source),
        bo AS (SELECT source, CAST(sum(n) AS BIGINT) AS n_docs,
            CAST(sum(CAST(n AS HUGEINT) * (n - 1)) AS HUGEINT) AS tboth
          FROM cells GROUP BY source),
        j AS (SELECT bo.source, n_docs,
            coalesce(cc, 0) * 2 AS c2, coalesce(dd, 0) * 2 AS d2,
            tyall - tboth AS ty2, txall - tboth AS tx2
          FROM bo LEFT JOIN pr ON bo.source = pr.source
            JOIN xm ON bo.source = xm.source
            JOIN ym ON bo.source = ym.source)
        SELECT source, n_docs, CAST(c2 AS BIGINT) AS c2,
          CAST(d2 AS BIGINT) AS d2,
          CASE WHEN c2 + d2 > 0 THEN
            CAST((c2 - d2) * 1000000 // (c2 + d2) AS BIGINT) END
            AS gamma6,
          CASE WHEN c2 + d2 + ty2 > 0 THEN
            CAST((c2 - d2) * 1000000 // (c2 + d2 + ty2) AS BIGINT) END
            AS dyx6,
          CASE WHEN c2 + d2 + tx2 > 0 THEN
            CAST((c2 - d2) * 1000000 // (c2 + d2 + tx2) AS BIGINT) END
            AS dxy6
        FROM j ORDER BY source""",

    // same distinct (order, brand) baskets, basket-keyed pair join,
    // integer confidence/lift with the HUGEINT product
    "q268_basket_pairs" ->
      """WITH b AS (SELECT DISTINCT l.l_orderkey AS bk, p.p_brand AS item
          FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
        nb AS (SELECT CAST(count(DISTINCT bk) AS BIGINT) AS nb FROM b),
        supp AS (SELECT item, CAST(count(*) AS BIGINT) AS s
          FROM b GROUP BY 1),
        co AS (SELECT x.item AS item_a, y.item AS item_b,
            CAST(count(*) AS BIGINT) AS support
          FROM b x JOIN b y ON x.bk = y.bk AND x.item < y.item
          GROUP BY 1, 2 HAVING count(*) >= 3),
        j AS (SELECT co.item_a, co.item_b, co.support, sa.s AS supp_a,
            sb.s AS supp_b, nb,
            CAST(co.support AS HUGEINT) * nb * 1000000
              // (CAST(sa.s AS HUGEINT) * sb.s) AS lift6
          FROM co JOIN supp sa ON co.item_a = sa.item
            JOIN supp sb ON co.item_b = sb.item, nb)
        SELECT item_a, item_b, support, supp_a, supp_b,
          CAST(support * 1000000 // supp_a AS DOUBLE) / 1e6 AS conf_a_b,
          CAST(support * 1000000 // supp_b AS DOUBLE) / 1e6 AS conf_b_a,
          CAST(lift6 AS DOUBLE) / 1e6 AS lift,
          lift6 > 1000000 AS positive
        FROM j ORDER BY item_a, item_b""",

    // same prediction fixture as q174, same quantized interval means,
    // suffix-min window + per-bin max = the max-min PAV closed form
    "q269_isotonic" ->
      """WITH p AS (SELECT doc_id AS pred_id, source,
            ((doc_id % 2147483648) * 2654435761) % 2147483647
              % 1000001 AS conf6,
            ((((doc_id % 2147483648) * 2654435761) % 2147483647
              % 999983) * 48271) % 2147483647 % 1000000 AS u2
          FROM documents),
        b AS (SELECT source, least(conf6 // 50000, 19) AS bin,
            CAST(count(*) AS BIGINT) AS n,
            CAST(sum(CASE WHEN u2 * 5 < conf6 * 4 THEN 1 ELSE 0 END)
              AS BIGINT) AS pos
          FROM p GROUP BY 1, 2),
        pref AS (SELECT source, bin, n, pos,
            sum(n) OVER (PARTITION BY source ORDER BY bin
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cn,
            sum(pos) OVER (PARTITION BY source ORDER BY bin
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cp
          FROM b),
        iv AS (SELECT l.source, l.bin AS i, h.bin AS j,
            (h.cp - (l.cp - l.pos)) * 1000000
              // (h.cn - (l.cn - l.n)) AS m6
          FROM pref l JOIN pref h
            ON l.source = h.source AND l.bin <= h.bin),
        sm AS (SELECT source, i, j, min(m6) OVER (PARTITION BY source, i
            ORDER BY j DESC
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sm
          FROM iv),
        fit AS (SELECT source, j AS bin, max(sm) AS fit6
          FROM sm GROUP BY 1, 2)
        SELECT b.source AS source, b.bin AS bin, n, pos AS n_correct,
          CAST(pos * 1000000 // n AS DOUBLE) / 1e6 AS raw_rate,
          CAST(fit6 AS DOUBLE) / 1e6 AS fitted_rate
        FROM b JOIN fit ON b.source = fit.source AND b.bin = fit.bin
        ORDER BY b.source, b.bin""",

    // the closed-form cell grid (constant 8x8 cells survive the codec
    // round trip and average-pool back exactly), same dHash bits and
    // hi/lo packing, then BRUTE-FORCE all pairs — if the engine's
    // banded join dropped one true pair, this hash mismatches
    "q270_image_phash" ->
      """WITH ids AS (SELECT doc_id FROM documents),
        cells AS (SELECT doc_id, cx, cy,
            CASE WHEN doc_id % 4 <> 0 AND cx = 8
                AND cy = 2 * (doc_id % 4) THEN 255
              ELSE (((doc_id // 4 * 8191 + cy * 73 + cx) % 2147483647)
                  * 2654435761 % 2147483647)
                * (((doc_id // 4 * 8191 + cy * 73 + cx) % 2147483647)
                  * 2654435761 % 2147483647)
                % 2147483647 % 200
            END AS v
          FROM ids, generate_series(0, 8) t1(cx),
            generate_series(0, 7) t2(cy)),
        bits AS (SELECT a.doc_id, a.cy AS r, a.cx AS x,
            CASE WHEN b.v > a.v THEN 1 ELSE 0 END AS bit
          FROM cells a JOIN cells b ON a.doc_id = b.doc_id
            AND a.cy = b.cy AND b.cx = a.cx + 1
          WHERE a.cx < 8),
        packed AS (SELECT doc_id,
            CAST(sum(CASE WHEN r < 4
              THEN bit * (1::BIGINT << ((r % 4) * 8 + x))
              ELSE 0 END) AS BIGINT) AS hi,
            CAST(sum(CASE WHEN r >= 4
              THEN bit * (1::BIGINT << ((r % 4) * 8 + x))
              ELSE 0 END) AS BIGINT) AS lo
          FROM bits GROUP BY 1)
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
          CAST(bit_count(xor(a.hi, b.hi))
            + bit_count(xor(a.lo, b.lo)) AS BIGINT) AS hamming
        FROM packed a JOIN packed b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) <= 3
        ORDER BY doc_a, doc_b""",

    // closed-form frame amplitudes (energy compare == amp compare for
    // nonneg constant frames), same bit/packing chain, brute-force
    // pairs at Hamming <= 6 — checks the 8-band join's completeness
    "q271_audio_fingerprint" ->
      """WITH ids AS (SELECT doc_id FROM documents),
        amps AS (SELECT doc_id, f,
            CASE WHEN doc_id % 4 <> 0 AND f = 16 * (doc_id % 4) THEN 6000
              ELSE (((doc_id // 4 * 8191 + f * 127 + 5) % 2147483647)
                  * 2654435761 % 2147483647)
                * (((doc_id // 4 * 8191 + f * 127 + 5) % 2147483647)
                  * 2654435761 % 2147483647)
                % 2147483647 % 4000
            END AS amp
          FROM ids, generate_series(0, 64) t(f)),
        bits AS (SELECT a.doc_id, a.f AS b,
            CASE WHEN n.amp > a.amp THEN 1 ELSE 0 END AS bit
          FROM amps a JOIN amps n ON a.doc_id = n.doc_id
            AND n.f = a.f + 1
          WHERE a.f < 64),
        packed AS (SELECT doc_id,
            CAST(sum(CASE WHEN b < 32
              THEN bit * (1::BIGINT << b) ELSE 0 END) AS BIGINT) AS hi,
            CAST(sum(CASE WHEN b >= 32
              THEN bit * (1::BIGINT << (b - 32)) ELSE 0 END) AS BIGINT)
              AS lo
          FROM bits GROUP BY 1)
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
          CAST(bit_count(xor(a.hi, b.hi))
            + bit_count(xor(a.lo, b.lo)) AS BIGINT) AS hamming
        FROM packed a JOIN packed b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) <= 6
        ORDER BY doc_a, doc_b""",

    // same daily collapse, the fold replayed as a recursive CTE with
    // identical truncating divisions (// toward zero, negatives incl.)
    "q272_holt_trend" ->
      """WITH RECURSIVE daily AS (SELECT event_type AS k,
            CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS x
          FROM events GROUP BY 1, 2),
        nd AS (SELECT k, day, x, CAST(row_number() OVER (PARTITION BY k
            ORDER BY day) AS BIGINT) AS rn
          FROM daily),
        hw AS (
          SELECT k, rn, x * 1000000 AS l6, CAST(0 AS BIGINT) AS b6,
            CAST(0 AS BIGINT) AS sae, CAST(0 AS BIGINT) AS nerr
          FROM nd WHERE rn = 1
          UNION ALL
          SELECT n.k, n.rn,
            (n.x * 1000000 + 4 * (h.l6 + h.b6)) // 5 AS l6,
            ((n.x * 1000000 + 4 * (h.l6 + h.b6)) // 5
              - h.l6 + 9 * h.b6) // 10 AS b6,
            h.sae + abs(n.x * 1000000 - h.l6 - h.b6) AS sae,
            h.nerr + 1 AS nerr
          FROM hw h JOIN nd n ON n.k = h.k AND n.rn = h.rn + 1),
        last AS (SELECT k, max(rn) AS n_days FROM hw GROUP BY 1),
        fin AS (SELECT hw.k, last.n_days, hw.l6, hw.b6, hw.sae, hw.nerr
          FROM hw JOIN last ON hw.k = last.k AND hw.rn = last.n_days)
        SELECT k AS event_type, n_days,
          CAST(l6 AS DOUBLE) / 1e6 AS level,
          CAST(b6 AS DOUBLE) / 1e6 AS trend,
          CAST(l6 + b6 AS DOUBLE) / 1e6 AS forecast_next,
          CASE WHEN nerr > 0 THEN
            CAST(sae // nerr AS DOUBLE) / 1e6 END AS mae
        FROM fin ORDER BY event_type""",

    // the same aggregate over the ORIGINAL parquet — a hash match means
    // the ORC write/read preserved rows, partition keys, and values
    "q273_orc_roundtrip" ->
      """SELECT l_returnflag, l_linestatus,
          CAST(count(*) AS BIGINT) AS n_rows,
          CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
          min(l_orderkey) AS min_orderkey,
          max(l_orderkey) AS max_orderkey
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 23:59:59'
        GROUP BY 1, 2 ORDER BY 1, 2""",

    // same per-row quantization, BIGINT (label, dim) sums, HUGEINT
    // dot/norms, identical sqrt-product cosine
    "q274_centroid_drift" ->
      """WITH comp AS (SELECT label,
            CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000)
              AS BIGINT) AS q6,
            unnest(generate_series(1, len(embedding))) AS dim
          FROM embeddings),
        bl AS (SELECT label, dim, CAST(sum(q6) AS BIGINT) AS cl,
            CAST(count(*) AS BIGINT) AS nv
          FROM comp GROUP BY 1, 2),
        g AS (SELECT dim, CAST(sum(cl) AS BIGINT) AS cg
          FROM bl GROUP BY 1),
        agg AS (SELECT label, max(nv) AS n_vecs,
            CAST(sum(CAST(cl AS HUGEINT) * cg) AS HUGEINT) AS dot,
            CAST(sum(CAST(cl AS HUGEINT) * cl) AS HUGEINT) AS na,
            CAST(sum(CAST(cg AS HUGEINT) * cg) AS HUGEINT) AS nb
          FROM bl JOIN g USING (dim) GROUP BY 1),
        fin AS (SELECT label, n_vecs,
            CASE WHEN na > 0 AND nb > 0 THEN
              CAST(floor(CAST(dot AS DOUBLE)
                / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE)))
                * 1e6) AS BIGINT) END AS cos6
          FROM agg)
        SELECT label, n_vecs,
          CAST(cos6 AS DOUBLE) / 1e6 AS cos_to_global,
          CASE WHEN cos6 IS NOT NULL THEN cos6 < 980000 END AS drifted
        FROM fin ORDER BY label""",

    // same per-stratum census, HUGEINT E6/V6, the same units-cancelling
    // chi2_6 = D^2 div sum(V6) and MH odds-ratio fold
    "q275_cmh_test" ->
      """WITH cells AS (SELECT lang,
            CAST(sum(CASE WHEN doc_id % 2 = 0 AND n_chars > 306
              THEN 1 ELSE 0 END) AS BIGINT) AS a,
            CAST(sum(CASE WHEN doc_id % 2 = 0 AND n_chars <= 306
              THEN 1 ELSE 0 END) AS BIGINT) AS b,
            CAST(sum(CASE WHEN doc_id % 2 <> 0 AND n_chars > 306
              THEN 1 ELSE 0 END) AS BIGINT) AS c,
            CAST(sum(CASE WHEN doc_id % 2 <> 0 AND n_chars <= 306
              THEN 1 ELSE 0 END) AS BIGINT) AS d
          FROM documents GROUP BY 1),
        st AS (SELECT lang, a, b, c, d, a + b + c + d AS n,
            CAST(a + b AS HUGEINT) * (a + c) * 1000000
              // (a + b + c + d) AS e6,
            CASE WHEN a + b + c + d > 1 THEN
              CAST(a + b AS HUGEINT) * (c + d) * (a + c) * (b + d)
                * 1000000 // (CAST(a + b + c + d AS HUGEINT)
                  * (a + b + c + d) * (a + b + c + d - 1))
            ELSE 0 END AS v6,
            CAST(a AS HUGEINT) * d * 1000000 // (a + b + c + d) AS num6,
            CAST(b AS HUGEINT) * c * 1000000 // (a + b + c + d) AS den6
          FROM cells),
        agg AS (SELECT CAST(count(*) AS BIGINT) AS n_strata,
            CAST(sum(n) AS BIGINT) AS n,
            CAST(sum(a * 1000000) AS HUGEINT) AS sa6,
            CAST(sum(e6) AS HUGEINT) AS se6,
            CAST(sum(v6) AS HUGEINT) AS sv6,
            CAST(sum(num6) AS HUGEINT) AS snum6,
            CAST(sum(den6) AS HUGEINT) AS sden6
          FROM st),
        fin AS (SELECT n_strata, n,
            CASE WHEN sv6 > 0 THEN
              (sa6 - se6) * (sa6 - se6) // sv6 END AS chi6,
            snum6, sden6
          FROM agg)
        SELECT n_strata, n, CAST(chi6 AS DOUBLE) / 1e6 AS chi2,
          CASE WHEN sden6 > 0 THEN
            CAST(snum6 * 1000000 // sden6 AS DOUBLE) / 1e6 END AS or_mh,
          CASE WHEN chi6 IS NOT NULL THEN chi6 > 3841459 END
            AS significant
        FROM fin""",

    // same integer-string first digits, pinned Benford constants,
    // dense spine, TV fold
    "q276_benford" ->
      """WITH dg AS (SELECT l_returnflag AS g,
            CASE WHEN CAST(floor(abs(l_extendedprice)) AS BIGINT) >= 1
              THEN CAST(substr(CAST(CAST(floor(abs(l_extendedprice))
                AS BIGINT) AS VARCHAR), 1, 1) AS INT) END AS d
          FROM lineitem),
        counted AS (SELECT g, CAST(count(*) AS BIGINT) AS rows_all,
            CAST(sum(CASE WHEN d IS NULL THEN 1 ELSE 0 END) AS BIGINT)
              AS n_excluded
          FROM dg GROUP BY 1),
        census AS (SELECT g, d, CAST(count(*) AS BIGINT) AS c
          FROM dg WHERE d IS NOT NULL GROUP BY 1, 2),
        bf AS (SELECT unnest([1,2,3,4,5,6,7,8,9]) AS d,
            unnest([301029,176091,124938,96910,79181,66946,57991,51152,
              45757]) AS p6),
        spine AS (SELECT counted.g, counted.n_excluded,
            rows_all - n_excluded AS n, bf.d, bf.p6,
            coalesce(census.c, 0) AS c
          FROM counted CROSS JOIN bf
          LEFT JOIN census ON census.g = counted.g AND census.d = bf.d),
        sp2 AS (SELECT g, n_excluded, n, d, p6, c,
            CASE WHEN n > 0 THEN c * 1000000 // n ELSE 0 END AS share6
          FROM spine),
        tv AS (SELECT g, CAST(sum(abs(share6 - p6)) AS BIGINT) // 2
            AS tv6
          FROM sp2 GROUP BY 1)
        SELECT sp2.g AS l_returnflag, sp2.d AS digit, sp2.n,
          sp2.n_excluded, sp2.c AS n_digit,
          CAST(share6 AS DOUBLE) / 1e6 AS obs_share,
          CAST(p6 AS DOUBLE) / 1e6 AS benford_share,
          CAST(tv6 AS DOUBLE) / 1e6 AS tv,
          tv6 > 50000 AS suspect
        FROM sp2 JOIN tv ON sp2.g = tv.g
        ORDER BY sp2.g, sp2.d""",

    // the q64 cluster chain + the survivor-on-cluster-id join (cluster
    // id IS the min member) and the size census
    "q277_dedup_roi" ->
      """WITH RECURSIVE
        docs AS (SELECT doc_id,
            list_filter(string_split(text,' '), x -> x <> '') AS w
          FROM documents),
        sh AS (SELECT DISTINCT doc_id, s FROM (
          SELECT doc_id, unnest(CASE WHEN len(w) >= 3
            THEN list_transform(generate_series(1, len(w)-2),
                 i -> array_to_string(w[i:i+2], ' '))
            ELSE [array_to_string(w, ' ')] END) AS s
          FROM docs) t),
        sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        cm AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS c
          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
        pairs AS (SELECT da, db
          FROM cm JOIN sizes sa ON da = sa.doc_id
                  JOIN sizes sb ON db = sb.doc_id
          WHERE floor(1.0*c/(sa.n + sb.n - c)*10000)/10000 >= 0.8),
        edges AS (SELECT da AS a, db AS b FROM pairs
                  UNION SELECT db, da FROM pairs),
        reach(a, b) AS (SELECT a, b FROM edges
                  UNION SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
        cl AS (SELECT n.a AS doc_id,
            CAST(least(n.a, min(r.b)) AS BIGINT) AS cluster
          FROM (SELECT DISTINCT a FROM edges) n JOIN reach r ON r.a = n.a
          GROUP BY n.a),
        words AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS nw FROM docs),
        lab AS (SELECT w.doc_id, coalesce(cl.cluster, w.doc_id) AS cluster,
            w.nw
          FROM words w LEFT JOIN cl ON w.doc_id = cl.doc_id),
        per AS (SELECT lab.cluster, CAST(count(*) AS BIGINT) AS s,
            CAST(sum(lab.nw) AS BIGINT) AS total_w, max(sv.nw) AS surv_w
          FROM lab JOIN words sv ON lab.cluster = sv.doc_id
          GROUP BY 1),
        cw AS (SELECT CAST(sum(nw) AS BIGINT) AS corpus_w FROM words)
        SELECT s AS cluster_size, CAST(count(*) AS BIGINT) AS n_clusters,
          CAST(sum(s) AS BIGINT) AS n_docs,
          CAST(sum(s - 1) AS BIGINT) AS n_dup_docs,
          CAST(sum(total_w) AS BIGINT) AS words_total,
          CAST(sum(total_w - surv_w) AS BIGINT) AS words_saved,
          CASE WHEN corpus_w > 0 THEN
            CAST(sum(total_w - surv_w) * 1000000 // corpus_w AS DOUBLE)
              / 1e6 END AS saved_share
        FROM per, cw GROUP BY s, corpus_w ORDER BY cluster_size""",

    // same planted anomalies (combining acute / ZWSP / curly quotes),
    // utf8proc NFC == java.text.Normalizer NFC (both UAX#15), same
    // strip/standardize classes with the 'g' flag, md5 over the bytes
    "q260_normalize_text" ->
      """WITH inj AS (SELECT doc_id,
            CASE WHEN doc_id % 11 = 0 THEN chr(8220) ELSE '' END ||
            CASE WHEN doc_id % 7 = 0 THEN chr(8203) ELSE '' END ||
            text ||
            CASE WHEN doc_id % 5 = 0 THEN ' cafe' || chr(769) ELSE '' END ||
            CASE WHEN doc_id % 11 = 0 THEN chr(8221) ELSE '' END AS t
          FROM documents),
        norm AS (SELECT doc_id, t,
            regexp_replace(
              regexp_replace(
                regexp_replace(
                  regexp_replace(nfc_normalize(t),
                    '[' || chr(8203) || chr(8204) || chr(8205)
                      || chr(65279) || chr(173) || ']', '', 'g'),
                  '[' || chr(8216) || chr(8217) || ']', '''', 'g'),
                '[' || chr(8220) || chr(8221) || ']', '"', 'g'),
              '[' || chr(8211) || chr(8212) || ']', '-', 'g') AS clean
          FROM inj)
        SELECT doc_id, clean <> t AS changed,
          CAST(length(t) AS BIGINT) AS n_chars_before,
          CAST(length(clean) AS BIGINT) AS n_chars_after,
          md5(clean) AS clean_md5
        FROM norm ORDER BY doc_id""",

    // q148's bucket rule, dense class x source grid with absent-cell
    // global mass, exact BIGINT TV numerator, one integer division
    "q236_t_closeness" ->
      """WITH st AS (SELECT CAST(min(n_chars) AS DOUBLE) AS lo,
            CAST(max(n_chars) AS DOUBLE) AS hi FROM documents),
        cell AS (SELECT lang,
            CASE WHEN hi = lo THEN CAST(0 AS BIGINT)
              ELSE CAST(least(greatest(floor(
                (CAST(n_chars AS DOUBLE) - lo) * 10 / (hi - lo)), 0.0), 9.0)
                AS BIGINT) END AS len_bucket,
            source, CAST(count(*) AS BIGINT) AS c
          FROM documents, st GROUP BY 1, 2, 3),
        cls AS (SELECT lang, len_bucket, CAST(sum(c) AS BIGINT) AS n
          FROM cell GROUP BY 1, 2),
        gsrc AS (SELECT source, CAST(sum(c) AS BIGINT) AS g
          FROM cell GROUP BY 1),
        nt AS (SELECT CAST(sum(c) AS BIGINT) AS nn FROM cell),
        grid AS (SELECT cls.lang, cls.len_bucket, cls.n, gsrc.source,
            gsrc.g, coalesce(cell.c, 0) AS c, nn
          FROM cls CROSS JOIN gsrc
          LEFT JOIN cell ON cell.lang = cls.lang
            AND cell.len_bucket = cls.len_bucket
            AND cell.source = gsrc.source,
          nt),
        agg AS (SELECT lang, len_bucket, max(n) AS n, max(nn) AS nn,
            CAST(sum(abs(c * nn - g * n)) AS BIGINT) AS num
          FROM grid GROUP BY 1, 2)
        SELECT lang, len_bucket, n,
          CAST(num * 1000000 // (2 * n * nn) AS DOUBLE) / 1e6 AS tv,
          num * 1000000 // (2 * n * nn) <= 300000 AS t_ok
        FROM agg ORDER BY lang, len_bucket""",
    // collapsed daily table, calendar-bounded pair join, exact S and
    // tie-corrected Var numerator, identical IEEE z chain
    "q237_mann_kendall" ->
      """WITH daily AS (SELECT event_type AS k, CAST(ts AS DATE) AS day,
            CAST(count(*) AS BIGINT) AS cnt
          FROM events GROUP BY 1, 2),
        s AS (SELECT a.k,
            CAST(sum(CASE WHEN b.cnt > a.cnt THEN 1
              WHEN b.cnt < a.cnt THEN -1 ELSE 0 END) AS BIGINT) AS s
          FROM daily a JOIN daily b ON a.k = b.k AND a.day < b.day
          GROUP BY 1),
        n AS (SELECT k, CAST(count(*) AS BIGINT) AS n
          FROM daily GROUP BY 1),
        ties AS (SELECT k,
            CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tsum
          FROM (SELECT k, cnt, CAST(count(*) AS BIGINT) AS t
            FROM daily GROUP BY 1, 2) x GROUP BY 1),
        j AS (SELECT n.k, n.n, coalesce(s.s, 0) AS s,
            n.n * (n.n - 1) * (2 * n.n + 5) - tsum AS v18
          FROM n LEFT JOIN s ON s.k = n.k JOIN ties ON ties.k = n.k),
        z AS (SELECT k, n, s, v18,
            CASE WHEN v18 > 0 THEN CAST(floor(
              CAST(CASE WHEN s > 0 THEN s - 1
                WHEN s < 0 THEN s + 1 ELSE 0 END AS DOUBLE)
              / sqrt(CAST(v18 AS DOUBLE) / 18.0) * 1000000) AS BIGINT)
            END AS z6
          FROM j)
        SELECT k AS event_type, n AS n_days, s AS s_stat, v18,
          CAST(z6 AS DOUBLE) / 1e6 AS z,
          CASE WHEN z6 IS NULL OR abs(z6) < 1960000 THEN 'none'
            WHEN s > 0 THEN 'increasing' ELSE 'decreasing' END AS trend
        FROM z ORDER BY event_type""",
    // the q64 recursive component chain + EVERY intra-cluster pair LEFT
    // joined to the common-shingle table (chained pairs may share zero)
    "q241_chain_audit" ->
      """WITH RECURSIVE
        docs AS (SELECT doc_id,
             list_filter(string_split(text,' '), x -> x <> '') AS w
           FROM documents),
        sh AS (SELECT DISTINCT doc_id, s FROM (
           SELECT doc_id, unnest(CASE WHEN len(w) >= 3
             THEN list_transform(generate_series(1, len(w)-2),
                  i -> array_to_string(w[i:i+2], ' '))
             ELSE [array_to_string(w, ' ')] END) AS s
           FROM docs) t),
        sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        cm AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS c
           FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
           GROUP BY 1, 2),
        ep AS (SELECT da, db
           FROM cm JOIN sizes sa ON da = sa.doc_id
                   JOIN sizes sb ON db = sb.doc_id
           WHERE floor(1.0*c/(sa.n + sb.n - c)*10000)/10000 >= 0.8),
        edges AS (SELECT da AS a, db AS b FROM ep
                  UNION SELECT db, da FROM ep),
        reach(a, b) AS (SELECT a, b FROM edges
                  UNION SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
        clu AS (SELECT n.a AS doc_id,
             CAST(least(n.a, min(r.b)) AS BIGINT) AS cluster
           FROM (SELECT DISTINCT a FROM edges) n JOIN reach r ON r.a = n.a
           GROUP BY n.a),
        ksz AS (SELECT cluster, CAST(count(*) AS BIGINT) AS size
           FROM clu GROUP BY 1 HAVING count(*) <= 100),
        mm AS (SELECT clu.doc_id, clu.cluster, ksz.size
           FROM clu JOIN ksz USING (cluster)),
        pp AS (SELECT a.cluster, a.size, a.doc_id AS da, b.doc_id AS db
           FROM mm a JOIN mm b
           ON a.cluster = b.cluster AND a.doc_id < b.doc_id),
        jj AS (SELECT pp.cluster, pp.size,
            CAST(coalesce(cm.c, 0) * 10000
              // (sa.n + sb.n - coalesce(cm.c, 0)) AS BIGINT) AS j4
          FROM pp LEFT JOIN cm ON cm.da = pp.da AND cm.db = pp.db
          JOIN sizes sa ON sa.doc_id = pp.da
          JOIN sizes sb ON sb.doc_id = pp.db),
        agg AS (SELECT cluster, max(size) AS size,
            CAST(count(*) AS BIGINT) AS n_pairs,
            CAST(min(j4) AS BIGINT) AS minj4,
            CAST(sum(j4) AS BIGINT) AS sumj4,
            CAST(sum(CASE WHEN j4 >= 8000 THEN 1 ELSE 0 END) AS BIGINT)
              AS n_edges
          FROM jj GROUP BY 1)
        SELECT cluster, size, n_pairs,
          CAST(minj4 AS DOUBLE) / 1e4 AS min_jaccard,
          CAST(sumj4 * 100 // n_pairs AS DOUBLE) / 1e6 AS avg_jaccard,
          CAST(n_edges * 1000000 // n_pairs AS DOUBLE) / 1e6 AS frac_edges,
          minj4 < 8000 AS chained
        FROM agg ORDER BY cluster""",
    // same split, smoothed model grid, BIGINT dot products, row_number
    // argmax, integer accuracy
    "q240_nb_classifier" ->
      """WITH tk AS (SELECT doc_id, source,
            ((doc_id % 2147483648) * 2654435761) % 2147483647 % 2 = 0
              AS tr,
            unnest(list_filter(string_split(text, ' '), x -> x <> ''))
              AS tok
          FROM documents),
        cells AS (SELECT source, tok, CAST(count(*) AS BIGINT) AS c
          FROM tk WHERE tr GROUP BY 1, 2),
        tot AS (SELECT source, CAST(sum(c) AS BIGINT) AS t
          FROM cells GROUP BY 1),
        vn AS (SELECT CAST(count(DISTINCT tok) AS BIGINT) AS v FROM cells),
        vocab AS (SELECT DISTINCT tok FROM cells),
        model AS (SELECT tot.source AS model, vocab.tok,
            CAST(floor(ln(CAST(coalesce(cells.c, 0) + 1 AS DOUBLE)
              / CAST(tot.t + vn.v AS DOUBLE)) * 1000000) AS BIGINT) AS l6
          FROM tot CROSS JOIN vocab
          LEFT JOIN cells ON cells.source = tot.source
            AND cells.tok = vocab.tok, vn),
        dp AS (SELECT source, CAST(count(DISTINCT doc_id) AS BIGINT) AS nd
          FROM tk WHERE tr GROUP BY 1),
        ntr AS (SELECT CAST(sum(nd) AS BIGINT) AS ntr FROM dp),
        prior AS (SELECT source AS model,
            CAST(floor(ln(CAST(nd AS DOUBLE) / CAST(ntr AS DOUBLE))
              * 1000000) AS BIGINT) AS p6
          FROM dp, ntr),
        ttf AS (SELECT doc_id, source, tok, CAST(count(*) AS BIGINT) AS tf
          FROM tk WHERE NOT tr GROUP BY 1, 2, 3),
        sc AS (SELECT ttf.doc_id, ttf.source, model.model,
            CAST(sum(tf * l6) AS BIGINT) AS s6
          FROM ttf JOIN model ON model.tok = ttf.tok GROUP BY 1, 2, 3),
        sc2 AS (SELECT sc.doc_id, sc.source, sc.model, s6 + p6 AS score6
          FROM sc JOIN prior USING (model)),
        pred AS (SELECT doc_id, source, model, row_number()
            OVER (PARTITION BY doc_id ORDER BY score6 DESC, model) AS rn
          FROM sc2),
        agg AS (SELECT source, CAST(count(*) AS BIGINT) AS n_test,
            CAST(sum(CASE WHEN model = source THEN 1 ELSE 0 END)
              AS BIGINT) AS n_correct
          FROM pred WHERE rn = 1 GROUP BY 1)
        SELECT source, n_test, n_correct,
          CAST(n_correct * 1000000 // n_test AS DOUBLE) / 1e6 AS accuracy
        FROM agg ORDER BY source""",
    // exact BIGINT smoothed ratio into one double ln per (doc, term),
    // |Q|-bounded integer sums, deterministic top-k
    "q239_ql_dirichlet" ->
      """WITH w AS (SELECT doc_id,
            list_filter(string_split(text, ' '), x -> x <> '') AS w
          FROM documents),
        st AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS dl FROM w),
        ct AS (SELECT CAST(sum(dl) AS BIGINT) AS ctot FROM st),
        tk AS (SELECT doc_id, unnest(w) AS token FROM w),
        qt AS (SELECT doc_id, token FROM tk
          WHERE token IN ('vector', 'stream', 'filter', 'spark')),
        tf AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
          FROM qt GROUP BY 1, 2),
        cf AS (SELECT token, CAST(count(*) AS BIGINT) AS cf
          FROM qt GROUP BY 1),
        grid AS (SELECT st.doc_id, st.dl, cf.token, cf.cf,
            coalesce(tf.tf, 0) AS tf, ctot
          FROM st CROSS JOIN cf
          LEFT JOIN tf ON tf.doc_id = st.doc_id AND tf.token = cf.token,
          ct),
        l AS (SELECT doc_id,
            CAST(floor(ln(CAST(tf * ctot + 2000 * cf AS DOUBLE)
              / CAST((dl + 2000) * ctot AS DOUBLE)) * 1000000) AS BIGINT)
              AS l6,
            tf
          FROM grid),
        sc AS (SELECT doc_id, CAST(sum(l6) AS BIGINT) AS score6,
            CAST(sum(CASE WHEN tf > 0 THEN 1 ELSE 0 END) AS BIGINT)
              AS n_hit
          FROM l GROUP BY 1),
        top AS (SELECT doc_id, n_hit, score6 FROM sc
          ORDER BY score6 DESC, doc_id LIMIT 20)
        SELECT row_number() OVER (ORDER BY score6 DESC, doc_id) AS rank,
          doc_id, n_hit, CAST(score6 AS DOUBLE) / 1e6 AS ql_score
        FROM top ORDER BY rank""",
    // weight-collapsed value sets, ceiling-rank k = ceil(q*W), min over
    // the cumulative -- all BIGINT
    "q238_weighted_quantiles" ->
      """WITH d AS (SELECT source, CAST(n_chars AS BIGINT) AS v,
            CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
              AS BIGINT) AS wt
          FROM documents WHERE len(list_filter(string_split(text, ' '),
            x -> x <> '')) > 0),
        g AS (SELECT source, v, CAST(sum(wt) AS BIGINT) AS c
          FROM d GROUP BY 1, 2),
        cum AS (SELECT source, v, c,
            CAST(sum(c) OVER (PARTITION BY source ORDER BY v
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cw,
            CAST(sum(c) OVER (PARTITION BY source) AS BIGINT) AS w
          FROM g)
        SELECT source, max(w) AS w_total,
          min(CASE WHEN cw >= (1 * w + 3) // 4 THEN v END) AS p25,
          min(CASE WHEN cw >= (1 * w + 1) // 2 THEN v END) AS p50,
          min(CASE WHEN cw >= (9 * w + 9) // 10 THEN v END) AS p90
        FROM cum GROUP BY source ORDER BY source""",
    // same freq-of-freq collapse, same closed-form tied-rank Gini fold
    // and salt arithmetic per relation
    "q225_key_skew" ->
      """WITH c1 AS (SELECT user_id AS k, CAST(count(*) AS BIGINT) AS c
            FROM events GROUP BY 1),
        f1 AS (SELECT c, CAST(count(*) AS BIGINT) AS m FROM c1 GROUP BY c),
        w1 AS (SELECT c, m, coalesce(sum(m) OVER (ORDER BY c
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS r
          FROM f1),
        t1 AS (SELECT CAST(sum(m) AS BIGINT) AS nk,
            CAST(sum(c*m) AS BIGINT) AS s, CAST(max(c) AS BIGINT) AS topc
          FROM f1),
        g1 AS (SELECT nk, s, topc,
            CAST(sum(c*m*(2*r + m - nk)) AS BIGINT) AS gnum
          FROM w1, t1 GROUP BY nk, s, topc),
        c2 AS (SELECT event_type AS k, CAST(count(*) AS BIGINT) AS c
            FROM events GROUP BY 1),
        f2 AS (SELECT c, CAST(count(*) AS BIGINT) AS m FROM c2 GROUP BY c),
        w2 AS (SELECT c, m, coalesce(sum(m) OVER (ORDER BY c
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS r
          FROM f2),
        t2 AS (SELECT CAST(sum(m) AS BIGINT) AS nk,
            CAST(sum(c*m) AS BIGINT) AS s, CAST(max(c) AS BIGINT) AS topc
          FROM f2),
        g2 AS (SELECT nk, s, topc,
            CAST(sum(c*m*(2*r + m - nk)) AS BIGINT) AS gnum
          FROM w2, t2 GROUP BY nk, s, topc),
        c3 AS (SELECT l_orderkey AS k, CAST(count(*) AS BIGINT) AS c
            FROM lineitem GROUP BY 1),
        f3 AS (SELECT c, CAST(count(*) AS BIGINT) AS m FROM c3 GROUP BY c),
        w3 AS (SELECT c, m, coalesce(sum(m) OVER (ORDER BY c
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS r
          FROM f3),
        t3 AS (SELECT CAST(sum(m) AS BIGINT) AS nk,
            CAST(sum(c*m) AS BIGINT) AS s, CAST(max(c) AS BIGINT) AS topc
          FROM f3),
        g3 AS (SELECT nk, s, topc,
            CAST(sum(c*m*(2*r + m - nk)) AS BIGINT) AS gnum
          FROM w3, t3 GROUP BY nk, s, topc),
        u AS (
          SELECT 'events.user_id' AS relation, * FROM g1
          UNION ALL SELECT 'events.event_type', * FROM g2
          UNION ALL SELECT 'lineitem.l_orderkey', * FROM g3)
        SELECT relation, nk AS n_keys, s AS n_rows, topc AS top_count,
          CAST((topc*1000000)//s AS DOUBLE)/1e6 AS top_share,
          CAST((gnum*1000000)//(nk*s) AS DOUBLE)/1e6 AS gini,
          CAST(greatest(1, (topc*32 + s - 1)//s) AS BIGINT)
            AS salt_factor,
          CASE WHEN topc*32 > s THEN 'salt' ELSE 'even' END AS verdict
        FROM u ORDER BY relation""",
    // same ceiling-rank k, same order-statistic threshold and holdout
    // census over the collapsed value table
    "q226_conformal" ->
      """WITH d AS (SELECT source, CAST(n_chars AS BIGINT) AS v,
            ((doc_id % 2147483648) * 2654435761) % 2147483647 % 2 = 0
              AS cal
          FROM documents),
        g AS (SELECT source, v,
            CAST(sum(CASE WHEN cal THEN 1 ELSE 0 END) AS BIGINT) AS cc,
            CAST(sum(CASE WHEN cal THEN 0 ELSE 1 END) AS BIGINT) AS tc
          FROM d GROUP BY source, v),
        cum AS (SELECT source, v, cc, tc,
            sum(cc) OVER (PARTITION BY source ORDER BY v
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
            sum(cc) OVER (PARTITION BY source) AS n
          FROM g),
        f AS (SELECT source, CAST(max(n) AS BIGINT) AS n_cal,
            CAST(max(least(n, ((n + 1) * 9 + 9) // 10)) AS BIGINT) AS k,
            min(CASE WHEN cum >= least(n, ((n + 1) * 9 + 9) // 10)
              AND n > 0 THEN v END) AS qhat
          FROM cum GROUP BY source),
        cov AS (SELECT g.source, CAST(sum(tc) AS BIGINT) AS n_test,
            CAST(sum(CASE WHEN g.v <= f.qhat THEN tc ELSE 0 END)
              AS BIGINT) AS covd
          FROM g JOIN f ON g.source = f.source GROUP BY g.source)
        SELECT f.source, n_cal, k, qhat, n_test,
          CASE WHEN n_test > 0
            THEN CAST((covd * 1000000) // n_test AS DOUBLE) / 1e6
          END AS coverage
        FROM f JOIN cov ON f.source = cov.source ORDER BY f.source""",
    // same daily counts, same integer millionth CUSUM recurrence
    // replayed as a recursive CTE, same k/h tuning
    "q223_cusum" ->
      """WITH RECURSIVE dc AS (SELECT event_type, CAST(ts AS DATE) AS day,
              CAST(count(*) AS BIGINT) AS n
            FROM events GROUP BY event_type, CAST(ts AS DATE)),
        m AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
              CAST(sum(n) AS BIGINT) AS s
            FROM dc GROUP BY event_type),
        mm AS (SELECT event_type, n_days,
              (s * 1000000) // n_days AS mu6,
              ((s * 1000000) // n_days) // 10 AS k6,
              5 * ((s * 1000000) // n_days) AS h6
            FROM m),
        r AS (SELECT dc.event_type, day, n, row_number() OVER
              (PARTITION BY dc.event_type ORDER BY day) AS rn
            FROM dc),
        e AS (SELECT r.event_type, r.day, r.rn,
              greatest(0, r.n * 1000000 - mm.mu6 - mm.k6) AS sp,
              greatest(0, mm.mu6 - r.n * 1000000 - mm.k6) AS sn
            FROM r JOIN mm ON r.event_type = mm.event_type WHERE rn = 1
          UNION ALL
          SELECT r.event_type, r.day, r.rn,
              greatest(0, e.sp + r.n * 1000000 - mm.mu6 - mm.k6),
              greatest(0, e.sn + mm.mu6 - r.n * 1000000 - mm.k6)
            FROM r JOIN e ON r.event_type = e.event_type
              AND r.rn = e.rn + 1
            JOIN mm ON mm.event_type = r.event_type),
        a AS (SELECT e.event_type,
              CAST(max(greatest(sp, sn)) AS BIGINT) AS mx,
              min(CASE WHEN greatest(sp, sn) > mm.h6 THEN day END)
                AS first_alarm
            FROM e JOIN mm ON e.event_type = mm.event_type
            GROUP BY e.event_type)
        SELECT mm.event_type, mm.n_days,
          CAST(mm.mu6 AS DOUBLE) / 1e6 AS mean_daily,
          CAST(a.mx AS DOUBLE) / 1e6 AS cusum_max, a.first_alarm,
          CASE WHEN a.first_alarm IS NULL THEN 'stable' ELSE 'alarm' END
            AS verdict
        FROM mm JOIN a ON mm.event_type = a.event_type
        ORDER BY mm.event_type""",
    // same value-set collapse, same quarter-unit quartile staging and
    // integer 8x fence comparisons over the collapsed table
    "q221_length_fences" ->
      """WITH t AS (SELECT source, CAST(len(list_filter(
              string_split(text, ' '), x -> x <> '')) AS BIGINT) AS v
            FROM documents),
        g AS (SELECT source, v, CAST(count(*) AS BIGINT) AS c
          FROM t GROUP BY source, v),
        cum AS (SELECT source, v, c,
            sum(c) OVER (PARTITION BY source ORDER BY v
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
            sum(c) OVER (PARTITION BY source) AS n
          FROM g),
        f AS (SELECT source, CAST(max(n) AS BIGINT) AS n,
            min(CASE WHEN cum > (1*(n-1))//4 THEN v END) AS lo_q1,
            min(CASE WHEN cum > (1*(n-1))//4 + 1 THEN v END) AS hi_q1,
            min(CASE WHEN cum > (2*(n-1))//4 THEN v END) AS lo_med,
            min(CASE WHEN cum > (2*(n-1))//4 + 1 THEN v END) AS hi_med,
            min(CASE WHEN cum > (3*(n-1))//4 THEN v END) AS lo_q3,
            min(CASE WHEN cum > (3*(n-1))//4 + 1 THEN v END) AS hi_q3
          FROM cum GROUP BY source),
        q AS (SELECT source, n,
            lo_q1*4 + ((1*(n-1))%4) * (coalesce(hi_q1,lo_q1)-lo_q1)
              AS q1q,
            lo_med*4 + ((2*(n-1))%4) * (coalesce(hi_med,lo_med)-lo_med)
              AS medq,
            lo_q3*4 + ((3*(n-1))%4) * (coalesce(hi_q3,lo_q3)-lo_q3)
              AS q3q
          FROM f),
        q2 AS (SELECT source, n, q1q, medq, q3q, q3q - q1q AS iqrq
          FROM q),
        cen AS (SELECT g.source,
            CAST(sum(CASE WHEN g.v*8 < q2.q1q*2 - q2.iqrq*3
              THEN g.c ELSE 0 END) AS BIGINT) AS n_low,
            CAST(sum(CASE WHEN g.v*8 > q2.q3q*2 + q2.iqrq*3
              THEN g.c ELSE 0 END) AS BIGINT) AS n_high
          FROM g JOIN q2 ON g.source = q2.source GROUP BY g.source)
        SELECT q2.source, n, CAST(q1q AS DOUBLE)/4 AS q1,
          CAST(medq AS DOUBLE)/4 AS median, CAST(q3q AS DOUBLE)/4 AS q3,
          CAST(iqrq AS DOUBLE)/4 AS iqr, n_low, n_high,
          CAST(((n_low + n_high) * 1000000) // n AS DOUBLE)/1e6
            AS outlier_frac
        FROM q2 JOIN cen ON q2.source = cen.source ORDER BY q2.source""",
    // same half-up cent quantization, same integer rank interpolation
    // per quantile over the per-type value set
    "q222_value_quantiles" ->
      """WITH t AS (SELECT event_type,
            CAST(floor(value * 100 + 0.5) AS BIGINT) AS v FROM events),
        g AS (SELECT event_type, v, CAST(count(*) AS BIGINT) AS c
          FROM t GROUP BY event_type, v),
        cum AS (SELECT event_type, v, c,
            sum(c) OVER (PARTITION BY event_type ORDER BY v
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
            sum(c) OVER (PARTITION BY event_type) AS n
          FROM g),
        f AS (SELECT event_type, CAST(max(n) AS BIGINT) AS n,
            min(CASE WHEN cum > (1*(n-1))//2 THEN v END) AS lo50,
            min(CASE WHEN cum > (1*(n-1))//2 + 1 THEN v END) AS hi50,
            min(CASE WHEN cum > (9*(n-1))//10 THEN v END) AS lo90,
            min(CASE WHEN cum > (9*(n-1))//10 + 1 THEN v END) AS hi90,
            min(CASE WHEN cum > (99*(n-1))//100 THEN v END) AS lo99,
            min(CASE WHEN cum > (99*(n-1))//100 + 1 THEN v END) AS hi99
          FROM cum GROUP BY event_type)
        SELECT event_type, n,
          CAST(lo50*2 + ((1*(n-1))%2) * (coalesce(hi50,lo50)-lo50)
            AS DOUBLE)/2 AS p50_cents,
          CAST(lo90*10 + ((9*(n-1))%10) * (coalesce(hi90,lo90)-lo90)
            AS DOUBLE)/10 AS p90_cents,
          CAST(lo99*100 + ((99*(n-1))%100) * (coalesce(hi99,lo99)-lo99)
            AS DOUBLE)/100 AS p99_cents
        FROM f ORDER BY event_type""",
    // same dense shard x group grid, same millionth share quantization
    // and integer TV fold
    "q219_shard_mix" ->
      """WITH a AS (
          SELECT 'hash' AS scheme,
            CAST(((doc_id % 2147483648) * 2654435761) % 2147483647 % 8
              AS BIGINT) AS shard, source FROM documents
          UNION ALL
          SELECT 'modulo', doc_id % 20, source FROM documents),
        o AS (SELECT scheme, shard, source AS g,
            CAST(count(*) AS BIGINT) AS o
          FROM a GROUP BY scheme, shard, source),
        st AS (SELECT scheme, shard, CAST(sum(o) AS BIGINT) AS t
          FROM o GROUP BY scheme, shard),
        gt AS (SELECT scheme, g, CAST(sum(o) AS BIGINT) AS gn
          FROM o GROUP BY scheme, g),
        gg AS (SELECT scheme, CAST(sum(gn) AS BIGINT) AS gtot
          FROM gt GROUP BY scheme),
        grid AS (SELECT st.scheme, st.shard, st.t, gt.g, gt.gn, gg.gtot
          FROM st JOIN gt ON st.scheme = gt.scheme
            JOIN gg ON st.scheme = gg.scheme),
        cells AS (SELECT grid.scheme, grid.shard, grid.t,
            coalesce(o.o, 0) AS oo,
            (coalesce(o.o, 0) * 1000000) // grid.t AS p6,
            (grid.gn * 1000000) // grid.gtot AS q6
          FROM grid LEFT JOIN o ON o.scheme = grid.scheme
            AND o.shard = grid.shard AND o.g = grid.g),
        m AS (SELECT scheme, shard, CAST(max(t) AS BIGINT) AS n_docs,
            CAST(sum(CASE WHEN oo > 0 THEN 1 ELSE 0 END) AS BIGINT)
              AS n_groups,
            CAST(sum(abs(p6 - q6)) // 2 AS DOUBLE) / 1e6 AS tv,
            CAST(max(p6) AS DOUBLE) / 1e6 AS top_share
          FROM cells GROUP BY scheme, shard)
        SELECT scheme, shard, n_docs, n_groups, tv, top_share,
          CASE WHEN tv >= 0.25 THEN 'skewed' ELSE 'mixed' END AS verdict
        FROM m ORDER BY scheme, shard""",
    // same truncation cap, same CASE-threshold bucket ceilings, same
    // millionth-floored waste fractions
    "q220_padding_waste" ->
      """WITH t AS (SELECT least(CAST(len(list_filter(
              string_split(text, ' '), x -> x <> '')) AS BIGINT), 128)
            AS tk FROM documents),
        b AS (SELECT tk,
            CASE WHEN tk <= 16 THEN 16 WHEN tk <= 32 THEN 32
                 WHEN tk <= 64 THEN 64 ELSE 128 END AS bucket
          FROM t),
        g AS (SELECT CAST(bucket AS BIGINT) AS bucket,
            CAST(count(*) AS BIGINT) AS n_docs,
            CAST(sum(tk) AS BIGINT) AS n_tokens,
            CAST(sum(bucket - tk) AS BIGINT) AS n_pad_bucketed,
            CAST(sum(128 - tk) AS BIGINT) AS n_pad_naive
          FROM b GROUP BY 1)
        SELECT bucket, n_docs, n_tokens, n_pad_bucketed, n_pad_naive,
          CAST((n_pad_bucketed * 1000000)
            // (n_tokens + n_pad_bucketed) AS DOUBLE) / 1e6 AS waste,
          CAST((n_pad_naive * 1000000)
            // (n_tokens + n_pad_naive) AS DOUBLE) / 1e6 AS waste_naive
        FROM g ORDER BY bucket""",
    // same planted perturbations, same two blocking passes, same
    // levenshtein band and integer milli-bit weight fold
    "q218_record_linkage" ->
      """WITH c AS (SELECT c_custkey, c_name, c_mktsegment, c_acctbal,
            c_nationkey,
            ((c_custkey % 2147483648) * 2654435761) % 2147483647 AS h
          FROM customer),
        dm AS (SELECT c_custkey + 10000000 AS d_id,
            substring(c_name, 1, 8 + CAST(h % 4 + 6 AS INT))
              || CAST((CAST(substring(c_name, 9 + CAST(h % 4 + 6 AS INT),
                   1) AS INT) + 1) % 10 AS VARCHAR)
              || substring(c_name, 10 + CAST(h % 4 + 6 AS INT)) AS d_name,
            CASE WHEN h % 7 = 0 THEN 'XXXSEG' ELSE c_mktsegment END
              AS d_seg,
            c_acctbal + CASE WHEN h % 5 = 0 THEN 3.5 ELSE 0.25 END
              AS d_bal,
            c_nationkey AS d_nat
          FROM c WHERE h % 3 = 0),
        df AS (SELECT c_custkey + 20000000 AS d_id,
            'Customer#' || lpad(CAST(999999999 - c_custkey AS VARCHAR),
              9, '0') AS d_name,
            c_mktsegment AS d_seg, c_acctbal + 100.0 AS d_bal,
            c_nationkey AS d_nat
          FROM c WHERE h % 3 = 1),
        d AS (SELECT * FROM dm UNION ALL SELECT * FROM df),
        cand AS (
          SELECT c.c_custkey, c.c_name, c.c_mktsegment, c.c_acctbal,
            d.d_id, d.d_name, d.d_seg, d.d_bal
          FROM c JOIN d
            ON CAST(c.c_nationkey AS VARCHAR) || ':'
                 || substring(c.c_name, 10, 7)
             = CAST(d.d_nat AS VARCHAR) || ':'
                 || substring(d.d_name, 10, 7)
          UNION
          SELECT c.c_custkey, c.c_name, c.c_mktsegment, c.c_acctbal,
            d.d_id, d.d_name, d.d_seg, d.d_bal
          FROM c JOIN d
            ON CAST(c.c_nationkey AS VARCHAR) || ':'
                 || substring(c.c_name, 10, 5)
                 || ':' || substring(c.c_name, 17, 2)
             = CAST(d.d_nat AS VARCHAR) || ':'
                 || substring(d.d_name, 10, 5)
                 || ':' || substring(d.d_name, 17, 2)),
        scored AS (SELECT d_id, c_custkey,
            levenshtein(c_name, d_name) <= 1 AS name_agree,
            c_mktsegment = d_seg AS seg_agree,
            abs(c_acctbal - d_bal) <= 1.0 AS bal_agree
          FROM cand),
        w AS (SELECT d_id, c_custkey, name_agree, seg_agree, bal_agree,
            CAST(CASE WHEN name_agree THEN 5000 ELSE -3000 END
              + CASE WHEN seg_agree THEN 1500 ELSE -1200 END
              + CASE WHEN bal_agree THEN 1800 ELSE -1500 END AS BIGINT)
              AS score
          FROM scored)
        SELECT d_id, c_custkey, name_agree, seg_agree, bal_agree, score,
          CASE WHEN score >= 5000 THEN 'match'
               WHEN score < 0 THEN 'non_match'
               ELSE 'possible' END AS verdict
        FROM w ORDER BY d_id, c_custkey""",
    // same census, same integer EM rounds unrolled as HUGEINT CTEs
    "q218b_linkage_em" -> linkageEmOracle(3),

    // same value-set grid ECDFs, same two-floor millionth D, same
    // IEEE-sqrt critical band
    "q242_ks_test" ->
      """WITH g AS (SELECT source AS gsrc, CAST(n_chars AS BIGINT) AS v,
            CAST(count(*) AS BIGINT) AS c
          FROM documents GROUP BY source, n_chars),
        vals AS (SELECT v, CAST(sum(c) AS BIGINT) AS ct FROM g GROUP BY v),
        vc AS (SELECT v, ct, sum(ct) OVER (ORDER BY v
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumall
          FROM vals),
        grp AS (SELECT gsrc, CAST(sum(c) AS BIGINT) AS n FROM g
          GROUP BY gsrc),
        na AS (SELECT CAST(sum(c) AS BIGINT) AS nall FROM g),
        grid AS (SELECT grp.gsrc, vc.v, vc.cumall, grp.n,
            coalesce(g.c, 0) AS c
          FROM vc CROSS JOIN grp
          LEFT JOIN g ON g.gsrc = grp.gsrc AND g.v = vc.v),
        cum AS (SELECT gsrc, v, n, cumall,
            sum(c) OVER (PARTITION BY gsrc ORDER BY v
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
          FROM grid),
        dd AS (SELECT gsrc, v, n, (SELECT nall FROM na) - n AS nrest,
            CASE WHEN (SELECT nall FROM na) - n > 0 THEN
              abs(cum * 1000000 // n - (cumall - cum) * 1000000
                // ((SELECT nall FROM na) - n)) END AS d6
          FROM cum),
        dm AS (SELECT gsrc, max(n) AS n_group, max(nrest) AS n_rest,
            max(d6) AS d6 FROM dd GROUP BY gsrc),
        av AS (SELECT dd.gsrc, min(dd.v) AS at_value
          FROM dd JOIN dm ON dd.gsrc = dm.gsrc AND dd.d6 = dm.d6
          GROUP BY dd.gsrc)
        SELECT dm.gsrc AS source, n_group, n_rest, at_value,
          CAST(d6 AS DOUBLE) / 1e6 AS d_stat,
          CASE WHEN n_rest > 0 THEN CAST(floor(1358000.0 *
            sqrt((n_group + n_rest)::DOUBLE / (n_group * n_rest)::DOUBLE))
            AS DOUBLE) / 1e6 END AS crit_05,
          d6 > CAST(floor(1358000.0 *
            sqrt((n_group + n_rest)::DOUBLE / (n_group * n_rest)::DOUBLE))
            AS BIGINT) AS drifted
        FROM dm LEFT JOIN av ON dm.gsrc = av.gsrc ORDER BY dm.gsrc""",

    // same slice pseudo p-values, same cross-multiplied step-up
    "q243_bh_fdr" ->
      """WITH s AS (SELECT source, lang,
            CAST(min(doc_id) AS BIGINT) AS test_id,
            CAST(count(*) AS BIGINT) AS n_docs
          FROM documents GROUP BY source, lang),
        t AS (SELECT test_id,
            CASE WHEN n_docs % 7 = 0
              THEN ((test_id % 2147483648) * 2654435761) % 2147483647
                % 1000
              ELSE ((test_id % 2147483648) * 2654435761) % 2147483647
                % 1000000 END AS p6
          FROM s),
        rk AS (SELECT test_id, p6,
            CAST(row_number() OVER (ORDER BY p6, test_id) AS BIGINT)
              AS rank,
            CAST(count(*) OVER () AS BIGINT) AS m
          FROM t),
        k AS (SELECT coalesce(max(CASE WHEN p6 * 100 * m
            <= rank * 5 * 1000000 THEN rank END), 0) AS kstar FROM rk)
        SELECT test_id, p6, rank, m,
          rank <= (SELECT kstar FROM k) AS discovery
        FROM rk ORDER BY rank""",

    // the q113 component chain with the split CASE replaced by mod-k
    "q244_leak_folds" ->
      """WITH RECURSIVE
         docs AS (SELECT doc_id,
              list_filter(string_split(text,' '), x -> x <> '') AS w
            FROM documents),
         sh AS (SELECT DISTINCT doc_id, s FROM (
            SELECT doc_id, unnest(CASE WHEN len(w) >= 3
              THEN list_transform(generate_series(1, len(w)-2),
                   i -> array_to_string(w[i:i+2], ' '))
              ELSE [array_to_string(w, ' ')] END) AS s
            FROM docs) t),
         sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         cm AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS c
            FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
            GROUP BY 1, 2),
         pairs AS (SELECT da, db
            FROM cm JOIN sizes sa ON da = sa.doc_id
                    JOIN sizes sb ON db = sb.doc_id
            WHERE floor(1.0*c/(sa.n + sb.n - c)*10000)/10000 >= 0.8),
         edges AS (SELECT da AS a, db AS b FROM pairs
                   UNION SELECT db, da FROM pairs),
         reach(a, b) AS (SELECT a, b FROM edges
                   UNION SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
         clus AS (SELECT n.a AS doc_id, least(n.a, min(r.b)) AS cluster
            FROM (SELECT DISTINCT a FROM edges) n JOIN reach r ON r.a = n.a
            GROUP BY n.a)
         SELECT d.doc_id,
           CAST(coalesce(c.cluster, d.doc_id) AS BIGINT) AS cluster,
           CAST(((coalesce(c.cluster, d.doc_id) % 2147483648)
                 * 2654435761) % 2147483647 % 5 AS BIGINT) AS fold
         FROM documents d LEFT JOIN clus c ON d.doc_id = c.doc_id
         ORDER BY d.doc_id""",

    // same sparse ratings rebuild, same per-unit quantization, same
    // nested-floor expected disagreement, alpha from the two quantized
    // values
    "q245_krippendorff" ->
      """WITH base AS (SELECT source, doc_id AS item_id FROM documents),
        r AS (SELECT source, item_id, rater,
            ((item_id % 2147483648) * 2654435761) % 2147483647 AS h
          FROM base CROSS JOIN
            (SELECT unnest(generate_series(0, 4)) AS rater)),
        rr AS (SELECT source, item_id, rater,
            CASE WHEN (h + rater * 17) % 10 < 3
              THEN (h % 4 + 1 + (h % 97 + rater) % 3) % 4
              ELSE h % 4 END AS cat
          FROM r WHERE (h + rater * 23) % 5 <> 0),
        cnt AS (SELECT source, item_id, cat, CAST(count(*) AS BIGINT) AS c
          FROM rr GROUP BY 1, 2, 3),
        per AS (SELECT source, item_id, CAST(sum(c) AS BIGINT) AS m,
            CAST(sum(c * c) AS BIGINT) AS s2
          FROM cnt GROUP BY 1, 2 HAVING sum(c) >= 2),
        dop AS (SELECT source, CAST(sum(m) AS BIGINT) AS n,
            CAST(count(*) AS BIGINT) AS n_units,
            CAST(sum((m * m - s2) * 1000000 // (m - 1)) AS BIGINT)
              AS dusum
          FROM per GROUP BY source),
        d_o AS (SELECT source, n, n_units, dusum // n AS do6 FROM dop),
        inc AS (SELECT cnt.source, cnt.item_id, cnt.cat, cnt.c
          FROM cnt JOIN per ON cnt.source = per.source
            AND cnt.item_id = per.item_id),
        nc AS (SELECT source, cat, CAST(sum(c) AS BIGINT) AS nc
          FROM inc GROUP BY 1, 2),
        dep AS (SELECT nc.source,
            CAST(sum(nc * (n - nc)) AS BIGINT) AS x, max(n) AS n
          FROM nc JOIN d_o ON nc.source = d_o.source GROUP BY nc.source),
        d_e AS (SELECT source,
            ((x // n) * 1000000 + (x % n) * 1000000 // n) // (n - 1)
              AS de6 FROM dep)
        SELECT d_o.source, n_units, d_o.n AS n_ratings,
          CAST(do6 AS DOUBLE) / 1e6 AS d_obs,
          CAST(de6 AS DOUBLE) / 1e6 AS d_exp,
          CASE WHEN de6 > 0
            THEN CAST((de6 - do6) * 1000000 // de6 AS DOUBLE) / 1e6
          END AS alpha
        FROM d_o JOIN d_e ON d_o.source = d_e.source
        ORDER BY d_o.source""",

    // same first-touch mins, same floor-ms quantization, same exact
    // integer rank interpolation over the (step, lat_ms -> n) value set
    "q217_conversion_lag" ->
      """WITH ft AS (SELECT user_id, event_type, min(ts) AS t
          FROM events WHERE event_type IN ('view', 'click', 'purchase')
          GROUP BY user_id, event_type),
       u AS (
         SELECT 'view->click' AS step,
           (epoch_us(c.t) - epoch_us(v.t)) // 1000 AS lat_ms
         FROM ft v JOIN ft c ON v.user_id = c.user_id
           AND v.event_type = 'view' AND c.event_type = 'click'
         WHERE c.t >= v.t
         UNION ALL
         SELECT 'click->purchase',
           (epoch_us(p.t) - epoch_us(c.t)) // 1000
         FROM ft c JOIN ft p ON c.user_id = p.user_id
           AND c.event_type = 'click' AND p.event_type = 'purchase'
         WHERE p.t >= c.t),
       g AS (SELECT step, lat_ms, CAST(count(*) AS BIGINT) AS cnt
         FROM u GROUP BY step, lat_ms),
       c AS (SELECT step, lat_ms, cnt,
           sum(cnt) OVER (PARTITION BY step ORDER BY lat_ms
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
           sum(cnt) OVER (PARTITION BY step) AS n
         FROM g),
       q AS (SELECT step, CAST(max(n) AS BIGINT) AS n,
           min(CASE WHEN cum > (n - 1) // 2 THEN lat_ms END) AS vlo50,
           min(CASE WHEN cum > (n - 1) // 2 + 1 THEN lat_ms END) AS vhi50,
           min(CASE WHEN cum > (9 * (n - 1)) // 10 THEN lat_ms END)
             AS vlo90,
           min(CASE WHEN cum > (9 * (n - 1)) // 10 + 1 THEN lat_ms END)
             AS vhi90
         FROM c GROUP BY step)
       SELECT step, n,
         CAST(vlo50 * 10 + 5 * ((n - 1) % 2)
           * (coalesce(vhi50, vlo50) - vlo50) AS DOUBLE) / 10000
           AS p50_sec,
         CAST(vlo90 * 10 + ((9 * (n - 1)) % 10)
           * (coalesce(vhi90, vlo90) - vlo90) AS DOUBLE) / 10000
           AS p90_sec
       FROM q ORDER BY step""",
    // the SCD2 outcome replayed as set algebra: changed keys emit a
    // closed row + an open SEG row, everyone else stays open-unchanged
    "q215_scd2" ->
      """WITH c AS (SELECT c_custkey, c_mktsegment, c_nationkey,
            ((c_custkey % 2147483648) * 2654435761) % 2147483647 AS h
          FROM customer),
         changed AS (SELECT * FROM c WHERE h % 4 = 0)
         SELECT c_custkey, c_mktsegment, c_nationkey,
           DATE '2024-01-01' AS valid_from,
           CAST(NULL AS DATE) AS valid_to, true AS is_current
         FROM c WHERE h % 4 <> 0
         UNION ALL
         SELECT c_custkey, c_mktsegment, c_nationkey,
           DATE '2024-01-01', DATE '2024-02-01', false
         FROM changed
         UNION ALL
         SELECT c_custkey, 'SEG' || CAST(h % 5 AS VARCHAR), c_nationkey,
           DATE '2024-02-01', CAST(NULL AS DATE), true
         FROM changed
         ORDER BY c_custkey, valid_from""",
    // brute-force directional containment over string shingle sets —
    // the prefix filter is an optimization, not a semantic
    "q214_containment" ->
      """WITH docs AS (SELECT doc_id,
              list_filter(string_split(text,' '), x -> x <> '') AS w
            FROM documents),
         sh AS (SELECT DISTINCT doc_id, s FROM (
            SELECT doc_id, unnest(CASE WHEN len(w) >= 3
              THEN list_transform(generate_series(1, len(w)-2),
                   i -> array_to_string(w[i:i+2], ' '))
              ELSE [array_to_string(w, ' ')] END) AS s
            FROM docs) t),
         sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         pairs AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS c
            FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id <> b.doc_id
            GROUP BY 1, 2)
         SELECT da AS doc_a, db AS doc_b,
                floor(1.0*c/sa.n*10000)/10000 AS containment
         FROM pairs JOIN sizes sa ON da = sa.doc_id
         WHERE floor(1.0*c/sa.n*10000)/10000 >= 0.9
         ORDER BY doc_a, doc_b""",
    // same epoch-week fold, first-touch cohorts, and millionth division
    "q213_retention" ->
      """WITH uw AS (SELECT DISTINCT user_id AS u,
            (CAST(ts AS DATE) - DATE '1970-01-01') // 7 AS w
          FROM events),
         fw AS (SELECT u, CAST(min(w) AS BIGINT) AS cw FROM uw GROUP BY u),
         ch AS (SELECT cw, CAST(count(*) AS BIGINT) AS cohort_size
                FROM fw GROUP BY cw),
         cells AS (SELECT fw.cw, uw.w - fw.cw AS week_offset,
              CAST(count(*) AS BIGINT) AS n_active
            FROM uw JOIN fw ON uw.u = fw.u
            GROUP BY fw.cw, uw.w - fw.cw)
         SELECT cells.cw AS cohort_week, week_offset, n_active,
           cohort_size,
           CAST((n_active * 1000000) // cohort_size AS DOUBLE) / 1e6
             AS retention
         FROM cells JOIN ch ON ch.cw = cells.cw
         ORDER BY cohort_week, week_offset""",
    // same daily counts, same exact BIGINT moment folds and verdicts
    "q207_dispersion" ->
      """WITH dc AS (SELECT event_type, CAST(ts AS DATE) AS day,
              CAST(count(*) AS BIGINT) AS n
            FROM events GROUP BY event_type, CAST(ts AS DATE)),
         m AS (SELECT event_type, CAST(count(*) AS BIGINT) AS d,
              CAST(sum(n) AS BIGINT) AS s, CAST(sum(n*n) AS BIGINT) AS q
            FROM dc GROUP BY event_type),
         f AS (SELECT event_type, d, s, q,
              CASE WHEN d > 1 AND s > 0
                THEN ((d*q - s*s) * 1000000) // (s * (d - 1)) END AS fano6
            FROM m)
         SELECT event_type, d AS n_days, s AS n_events,
           CAST((s * 1000000) // d AS DOUBLE) / 1e6 AS mean_daily,
           CASE WHEN d > 1 THEN
             CAST(((d*q - s*s) * 1000000) // (d * (d - 1)) AS DOUBLE) / 1e6
           END AS variance,
           CAST(fano6 AS DOUBLE) / 1e6 AS fano,
           CASE WHEN fano6 IS NULL THEN NULL
                WHEN fano6 < 700000 THEN 'regular'
                WHEN fano6 > 1500000 THEN 'bursty'
                ELSE 'poisson' END AS verdict
         FROM f ORDER BY event_type""",
    // same sentence-izing fixture (index-driven), vowel-group syllable
    // heuristic, integer ratio staging, and double score arithmetic
    "q205_readability" ->
      """WITH d0 AS (SELECT doc_id,
            list_filter(string_split(text, ' '), x -> x <> '') AS w0,
            text AS orig
          FROM documents),
       f AS (SELECT doc_id, CASE WHEN len(w0) >= 1
            THEN array_to_string(list_transform(
              generate_series(1, len(w0)),
              i -> CASE WHEN i % 12 = 0 THEN w0[i] || '.'
                   ELSE w0[i] END), ' ')
            ELSE orig END AS text
          FROM d0),
       t AS (SELECT doc_id, text,
            list_filter(string_split(lower(text), ' '), x -> x <> '') AS w
          FROM f),
       s AS (SELECT doc_id,
            CAST(len(w) AS BIGINT) AS n_words,
            CAST(greatest(1, len(regexp_extract_all(text, '[.!?]+')))
              AS BIGINT) AS n_sentences,
            CAST(coalesce(list_sum(list_transform(w, x ->
              greatest(1, len(regexp_extract_all(x, '[aeiouy]+'))))), 0)
              AS BIGINT) AS n_syllables
          FROM t),
       r AS (SELECT doc_id, n_words, n_sentences, n_syllables,
            (n_words * 1000000) // n_sentences AS wps6,
            CASE WHEN n_words > 0
              THEN (n_syllables * 1000000) // n_words ELSE 0 END AS spw6
          FROM s),
       q AS (SELECT doc_id, n_words, n_sentences, n_syllables, wps6, spw6,
            floor((206.835 - 1.015 * (CAST(wps6 AS DOUBLE) / 1e6)
              - 84.6 * (CAST(spw6 AS DOUBLE) / 1e6)) * 10000) / 10000
              AS flesch
          FROM r)
       SELECT doc_id, n_words, n_sentences, n_syllables,
         CAST(wps6 AS DOUBLE) / 1e6 AS words_per_sentence,
         CAST(spw6 AS DOUBLE) / 1e6 AS syllables_per_word,
         flesch,
         CASE WHEN flesch >= 70.0 THEN 'easy'
              WHEN flesch >= 50.0 THEN 'standard'
              ELSE 'difficult' END AS band
       FROM q ORDER BY doc_id""",
    // same fixture and score collapse as q206; descending cumulative
    // TP/FP over the value set, per-threshold millionth precision
    "q216_pr_auc" ->
      """WITH d AS (SELECT doc_id, text,
            ((doc_id % 2147483648) * 2654435761) % 2147483647 AS h
          FROM documents),
       f AS (SELECT h % 2 = 0 AS pos,
            CASE WHEN h % 2 = 0 THEN text || ' of the is' ELSE text END
              AS text
          FROM d),
       t AS (SELECT pos, length(text) AS nc,
            len(list_filter(string_split(text,' '), x -> x <> '')) AS nw,
            length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS np,
            len(list_filter(string_split(text,' '),
                x -> x IN ('the','a','of','and','to','in','is','on','for','with')))
              AS ns
          FROM f),
       q AS (SELECT pos,
            floor((0.4*least(1.0, nw/50.0) + 0.3*(1.0 - np*1.0/nc)
                  + 0.3*least(1.0, ns*1.0/nw*5.0))*10000)/10000 AS s
          FROM t),
       g AS (SELECT s,
            CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS npos,
            CAST(sum(CASE WHEN pos THEN 0 ELSE 1 END) AS BIGINT) AS nneg
          FROM q GROUP BY s),
       c AS (SELECT s, npos, nneg,
            CAST(sum(npos) OVER (ORDER BY s DESC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS tp,
            CAST(sum(nneg) OVER (ORDER BY s DESC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS fp
          FROM g),
       p AS (SELECT npos, nneg, (tp * 1000000) // (tp + fp) AS prec6
          FROM c)
       SELECT CAST(sum(npos) AS BIGINT) AS n_pos,
         CAST(sum(nneg) AS BIGINT) AS n_neg,
         CAST(CAST(sum(npos * prec6) AS BIGINT)
           // CAST(sum(npos) AS BIGINT) AS DOUBLE) / 1e6 AS ap
       FROM p""",
    "q206_rank_auc" ->
      """WITH d AS (SELECT doc_id, text,
            ((doc_id % 2147483648) * 2654435761) % 2147483647 AS h
          FROM documents),
       f AS (SELECT h % 2 = 0 AS pos,
            CASE WHEN h % 2 = 0 THEN text || ' of the is' ELSE text END
              AS text
          FROM d),
       t AS (SELECT pos, length(text) AS nc,
            len(list_filter(string_split(text,' '), x -> x <> '')) AS nw,
            length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS np,
            len(list_filter(string_split(text,' '),
                x -> x IN ('the','a','of','and','to','in','is','on','for','with')))
              AS ns
          FROM f),
       q AS (SELECT pos,
            floor((0.4*least(1.0, nw/50.0) + 0.3*(1.0 - np*1.0/nc)
                  + 0.3*least(1.0, ns*1.0/nw*5.0))*10000)/10000 AS s
          FROM t),
       g AS (SELECT s,
            CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS npos,
            CAST(sum(CASE WHEN pos THEN 0 ELSE 1 END) AS BIGINT) AS nneg
          FROM q GROUP BY s),
       c AS (SELECT s, npos, nneg,
            CAST(coalesce(sum(nneg) OVER (ORDER BY s
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS below_n
          FROM g),
       u AS (SELECT CAST(sum(npos) AS BIGINT) AS tp,
            CAST(sum(nneg) AS BIGINT) AS tn,
            CAST(sum(npos * (2*below_n + nneg)) AS BIGINT) AS u2
          FROM c)
       SELECT tp AS n_pos, tn AS n_neg,
         CAST(u2 * 1000000 // (2*tp*tn) AS DOUBLE)/1e6 AS auc
       FROM u""",
    // the oracle never sees the CSV: it recomputes the corruption slice
    // from the same row-key hash and aggregates the complement
    "q211_csv_roundtrip" ->
      """WITH k AS (SELECT l_returnflag,
            CAST(l_quantity AS BIGINT) AS q,
            ((((l_orderkey*10 + l_linenumber) % 2147483648) * 2654435761)
              % 2147483647) % 29 = 0 AS bad
          FROM lineitem),
       m AS (SELECT CAST(sum(CASE WHEN bad THEN 1 ELSE 0 END) AS BIGINT)
            AS n_malformed FROM k)
       SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_rows,
         CAST(sum(q) AS BIGINT) AS sum_qty, n_malformed
       FROM k, m WHERE NOT bad
       GROUP BY l_returnflag, n_malformed ORDER BY l_returnflag""",
    // same payload bytes from doc_id arithmetic, histogram counts as a
    // (doc, byte-value) table, same prefix block and integer cos²
    "q210_binary_neardup" ->
      """WITH nf AS (SELECT greatest(25, count(*) // 20) AS f
          FROM documents),
       d AS (SELECT doc_id,
            ((doc_id % 2147483648) * 2654435761) % 2147483647 AS h
          FROM documents),
       p AS (SELECT doc_id, h % nf.f AS fam, h // nf.f AS v
          FROM d, nf),
       bytes AS (SELECT doc_id, g.j,
            (CASE WHEN g.j < 8 THEN
               ((fam // (CASE g.j % 4 WHEN 0 THEN 1 WHEN 1 THEN 256
                         WHEN 2 THEN 65536 ELSE 16777216 END)) % 256
                 + g.j*17) % 256
             ELSE (fam*31 + g.j*17) % 256 END +
             CASE WHEN g.j = 16 + v % 7 OR g.j = 32 + v % 11
                    OR g.j = 48 + v % 13
               THEN v % 5 + 1 ELSE 0 END) % 256 AS bv
          FROM p CROSS JOIN
            (SELECT unnest(generate_series(0, 63)) AS j) g),
       blk AS (SELECT doc_id,
            array_to_string(list_transform(generate_series(0, 7),
              j -> printf('%02x', CAST(
                ((fam // (CASE j % 4 WHEN 0 THEN 1 WHEN 1 THEN 256
                          WHEN 2 THEN 65536 ELSE 16777216 END)) % 256
                  + j*17) % 256 AS BIGINT))),
              '') AS block
          FROM p),
       cnt AS (SELECT doc_id, bv, CAST(count(*) AS BIGINT) AS c
          FROM bytes GROUP BY doc_id, bv),
       nrm AS (SELECT doc_id, CAST(sum(c*c) AS BIGINT) AS n2 FROM cnt
          GROUP BY doc_id),
       pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM blk a JOIN blk b
            ON a.block = b.block AND a.doc_id < b.doc_id),
       dots AS (SELECT pr.doc_a, pr.doc_b,
            CAST(sum(ca.c * cb.c) AS BIGINT) AS dot
          FROM pairs pr
          JOIN cnt ca ON ca.doc_id = pr.doc_a
          JOIN cnt cb ON cb.doc_id = pr.doc_b AND cb.bv = ca.bv
          GROUP BY pr.doc_a, pr.doc_b)
       SELECT dots.doc_a, dots.doc_b, dot,
         CAST((dot*dot*1000000) // (na.n2 * nb.n2) AS DOUBLE)/1e6 AS cos2
       FROM dots
       JOIN nrm na ON na.doc_id = dots.doc_a
       JOIN nrm nb ON nb.doc_id = dots.doc_b
       WHERE (dot*dot*1000000) // (na.n2 * nb.n2) >= 900000
       ORDER BY doc_a, doc_b""",
    // same per-type millionth-quantized logs, BIGINT dot products, and
    // integer divisions on both gram orders
    "q209_entropy" ->
      """WITH dw AS (SELECT source,
            list_filter(string_split(text, ' '), x -> x <> '') AS w
          FROM documents),
       u AS (SELECT source, unnest(w) AS g FROM dw),
       uc AS (SELECT source, g, CAST(count(*) AS BIGINT) AS c FROM u
              GROUP BY source, g),
       ut AS (SELECT source, CAST(sum(c) AS BIGINT) AS tt,
              CAST(count(*) AS BIGINT) AS v FROM uc GROUP BY source),
       uh AS (SELECT uc.source,
            CAST(sum(c * CAST(floor(ln(CAST(c AS DOUBLE) / tt) * 1000000)
              AS BIGINT)) AS BIGINT) AS s
          FROM uc JOIN ut ON uc.source = ut.source GROUP BY uc.source),
       u6 AS (SELECT ut.source, tt AS n_tokens, v AS vocab,
            (-s) // tt AS h1_6
          FROM uh JOIN ut ON uh.source = ut.source),
       b AS (SELECT source, unnest(CASE WHEN len(w) >= 2
            THEN list_transform(generate_series(1, len(w)-1),
                 i -> array_to_string(w[i:i+1], ' '))
            ELSE [] END) AS g
          FROM dw),
       bc AS (SELECT source, g, CAST(count(*) AS BIGINT) AS c FROM b
              GROUP BY source, g),
       bt AS (SELECT source, CAST(sum(c) AS BIGINT) AS tt FROM bc
              GROUP BY source),
       bh AS (SELECT bc.source,
            CAST(sum(c * CAST(floor(ln(CAST(c AS DOUBLE) / tt) * 1000000)
              AS BIGINT)) AS BIGINT) AS s
          FROM bc JOIN bt ON bc.source = bt.source GROUP BY bc.source),
       b6 AS (SELECT bt.source, (-s) // tt AS h2_6
          FROM bh JOIN bt ON bh.source = bt.source)
       SELECT u6.source, n_tokens, vocab,
         CAST(h1_6 AS DOUBLE) / 1e6 AS h_unigram,
         CAST(h2_6 AS DOUBLE) / 1e6 AS h_bigram,
         CAST(h2_6 - h1_6 AS DOUBLE) / 1e6 AS h_cond,
         CASE WHEN h1_6 > 0 THEN
           CAST(1000000 - (greatest(h2_6 - h1_6, 0) * 1000000) // h1_6
             AS DOUBLE) / 1e6
         END AS redundancy
       FROM u6 JOIN b6 ON u6.source = b6.source ORDER BY u6.source""",
    // same word counts, frequency-of-frequencies, r+1 self-join, and
    // exact BIGINT millionth divisions
    "q203_good_turing" ->
      """WITH dw AS (SELECT list_filter(string_split(text, ' '),
              x -> x <> '') AS w
            FROM documents),
         toks AS (SELECT unnest(CASE WHEN len(w) >= 2
              THEN list_transform(generate_series(1, len(w)-1),
                   i -> array_to_string(w[i:i+1], ' '))
              ELSE [] END) AS g
            FROM dw),
         freq AS (SELECT g, CAST(count(*) AS BIGINT) AS c FROM toks
                  GROUP BY g),
         fof AS (SELECT c AS r, CAST(count(*) AS BIGINT) AS n_r FROM freq
                 GROUP BY c),
         tot AS (SELECT CAST(sum(c) AS BIGINT) AS n_tokens,
             CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1
           FROM freq)
         SELECT f.r, f.n_r,
           CAST(coalesce(n2.n_r, 0) AS BIGINT) AS n_r_next,
           CAST(((f.r + 1) * coalesce(n2.n_r, 0) * 1000000) // f.n_r
             AS DOUBLE) / 1e6 AS r_star,
           CAST((n1 * 1000000) // n_tokens AS DOUBLE) / 1e6 AS p0
         FROM fof f LEFT JOIN fof n2 ON f.r + 1 = n2.r
         CROSS JOIN tot
         WHERE f.r <= 10 ORDER BY f.r""",
    // same checkpoints (max-id thresholds), first-occurrence vocab
    // accounting, and quantized log-log moments as the operator
    "q202_heaps_fit" ->
      """WITH pd AS (SELECT doc_id AS id,
              CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
                AS BIGINT) AS nt
            FROM documents),
         fo AS (SELECT w, min(id) AS fd FROM (
              SELECT doc_id AS id,
                unnest(list_filter(string_split(text, ' '), x -> x <> ''))
                  AS w
              FROM documents) GROUP BY w),
         fv AS (SELECT fd, CAST(count(*) AS BIGINT) AS nv FROM fo
                GROUP BY fd),
         mx AS (SELECT max(id) AS mx FROM pd),
         ck AS (SELECT c, (mx.mx * c) // 10 AS thresh
            FROM (SELECT unnest(generate_series(1, 10)) AS c), mx),
         toks AS (SELECT ck.c, ck.thresh,
              CAST(sum(pd.nt) AS BIGINT) AS n_tokens
            FROM pd JOIN ck ON pd.id <= ck.thresh GROUP BY ck.c, ck.thresh),
         typs AS (SELECT ck.c, CAST(sum(fv.nv) AS BIGINT) AS n_types
            FROM fv JOIN ck ON fv.fd <= ck.thresh GROUP BY ck.c),
         pts AS (SELECT toks.c, thresh, n_tokens, n_types,
              CAST(floor(ln(CAST(n_tokens AS DOUBLE)) * 1000) AS BIGINT)
                AS x,
              CAST(floor(ln(CAST(n_types AS DOUBLE)) * 1000) AS BIGINT)
                AS y
            FROM toks JOIN typs ON toks.c = typs.c),
         m AS (SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x*x) AS BIGINT) AS sxx,
             CAST(sum(x*y) AS BIGINT) AS sxy,
             CAST(sum(y*y) AS BIGINT) AS syy
           FROM pts),
         fit AS (SELECT
             CASE WHEN n*sxx - sx*sx <> 0 THEN
               floor(CAST(n*sxy - sx*sy AS DOUBLE)
                 / CAST(n*sxx - sx*sx AS DOUBLE) * 10000) / 1e4
             END AS beta,
             CASE WHEN n*sxx - sx*sx <> 0 THEN
               floor((CAST(sy AS DOUBLE)
                   - CAST(n*sxy - sx*sy AS DOUBLE)
                     / CAST(n*sxx - sx*sx AS DOUBLE) * CAST(sx AS DOUBLE))
                 / CAST(n*1000 AS DOUBLE) * 10000) / 1e4
             END AS ln_k,
             CASE WHEN n*sxx - sx*sx <> 0 AND n*syy - sy*sy <> 0 THEN
               floor(CAST(n*sxy - sx*sy AS DOUBLE)
                   * CAST(n*sxy - sx*sy AS DOUBLE)
                 / (CAST(n*sxx - sx*sx AS DOUBLE)
                   * CAST(n*syy - sy*sy AS DOUBLE))
                 * 1000000) / 1e6
             END AS r2
           FROM m)
         SELECT CAST(c AS BIGINT) AS checkpoint, thresh, n_tokens,
           n_types, beta, ln_k, r2
         FROM pts, fit ORDER BY checkpoint""",
    // the same dyadic halving recurrence, driven by a recursive CTE
    // joining day-rank r to r−1 per event type
    "q201_ewma_trend" ->
      """WITH RECURSIVE dc AS (SELECT event_type, CAST(ts AS DATE) AS day,
              CAST(count(*) AS BIGINT) AS n
            FROM events GROUP BY event_type, CAST(ts AS DATE)),
         r AS (SELECT event_type, day, n, row_number() OVER
              (PARTITION BY event_type ORDER BY day) AS rn FROM dc),
         e AS (SELECT event_type, day, n, rn, n * 1000000 AS s
               FROM r WHERE rn = 1
               UNION ALL
               SELECT r.event_type, r.day, r.n, r.rn,
                 (r.n * 1000000 + e.s) // 2
               FROM r JOIN e ON r.event_type = e.event_type
                 AND r.rn = e.rn + 1)
         SELECT event_type, day, n, CAST(s AS BIGINT) AS ewma6,
           CAST(s AS DOUBLE) / 1e6 AS ewma
         FROM e ORDER BY event_type, day""",
    // the portable-hash permutation replayed exactly: same md5-prefix
    // hash, same shard routing, same within-shard (key, id) rank
    "q137_epoch_order" ->
      """WITH d AS (SELECT doc_id,
              CAST('0x' || substring(md5('42:' || CAST(doc_id AS VARCHAR)),
                1, 8) AS BIGINT) AS skey
            FROM documents),
         s AS (SELECT doc_id, skey, skey % 8 AS shard FROM d),
         r AS (SELECT doc_id, shard,
             CAST(row_number() OVER (PARTITION BY shard
               ORDER BY skey, doc_id) AS BIGINT) AS pos_in_shard
           FROM s)
         SELECT doc_id, shard, pos_in_shard,
           (pos_in_shard - 1) * 8 + shard AS global_pos
         FROM r ORDER BY global_pos""",
    // anchor-chained first-touch funnel: each step's earliest qualifying
    // time strictly after the previous anchor
    "q159_funnel" ->
      """WITH v AS (SELECT user_id, min(ts) AS t1 FROM events
           WHERE event_type = 'view' GROUP BY 1),
         c AS (SELECT e.user_id, min(ts) AS t2 FROM events e
           JOIN v ON e.user_id = v.user_id
           WHERE event_type = 'click' AND ts > t1 GROUP BY 1),
         p AS (SELECT e.user_id, min(ts) AS t3 FROM events e
           JOIN c ON e.user_id = c.user_id
           WHERE event_type = 'purchase' AND ts > t2 GROUP BY 1),
         n AS (SELECT (SELECT count(*) FROM v) AS n1,
             (SELECT count(*) FROM c) AS n2,
             (SELECT count(*) FROM p) AS n3)
         SELECT CAST(1 AS BIGINT) AS step, 'view' AS event_type,
           n1 AS n_users, 1.0 AS conversion FROM n
         UNION ALL SELECT 2, 'click', n2, floor(n2*1000000/n1)/1e6 FROM n
         UNION ALL SELECT 3, 'purchase', n3, floor(n3*1000000/n2)/1e6 FROM n
         ORDER BY step""",
    // per-column aggregates replayed, numeric vs string min/max split so
    // no number-to-text formatting is compared
    "q156_profile" ->
      """SELECT 'l_orderkey' AS col_name, count(*) AS n_rows,
           CAST(sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END)
             AS BIGINT) AS n_null,
           floor(sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END)
             * 1000000 / count(*)) / 1e6 AS null_frac,
           count(DISTINCT l_orderkey) AS n_distinct,
           floor(CAST(min(l_orderkey) AS DOUBLE) * 10000) / 1e4 AS min_num,
           floor(CAST(max(l_orderkey) AS DOUBLE) * 10000) / 1e4 AS max_num,
           CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
         FROM lineitem
         UNION ALL
         SELECT 'l_quantity', count(*),
           CAST(sum(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END)
             AS BIGINT),
           floor(sum(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END)
             * 1000000 / count(*)) / 1e6,
           count(DISTINCT l_quantity),
           floor(CAST(min(l_quantity) AS DOUBLE) * 10000) / 1e4,
           floor(CAST(max(l_quantity) AS DOUBLE) * 10000) / 1e4,
           CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR)
         FROM lineitem
         UNION ALL
         SELECT 'l_returnflag', count(*),
           CAST(sum(CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END)
             AS BIGINT),
           floor(sum(CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END)
             * 1000000 / count(*)) / 1e6,
           count(DISTINCT l_returnflag),
           CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
           min(l_returnflag), max(l_returnflag)
         FROM lineitem
         UNION ALL
         SELECT 'l_shipdate', count(*),
           CAST(sum(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END)
             AS BIGINT),
           floor(sum(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END)
             * 1000000 / count(*)) / 1e6,
           count(DISTINCT l_shipdate),
           CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
           min(strftime(l_shipdate, '%Y-%m-%d %H:%M:%S')),
           max(strftime(l_shipdate, '%Y-%m-%d %H:%M:%S'))
         FROM lineitem
         ORDER BY col_name""",
    // every rule replayed with the same counting conventions (unique:
    // all members of >1 groups; FK: nulls exempt, anti-join orphans)
    "q157_dq_checks" ->
      """WITH nn AS (SELECT 'orders.o_orderkey not_null' AS rule,
             count(*) AS n_checked,
             CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END)
               AS BIGINT) AS n_violations
           FROM orders),
         uq AS (SELECT 'orders.o_orderkey unique',
             CAST(sum(n) AS BIGINT),
             CAST(sum(CASE WHEN n > 1 THEN n ELSE 0 END) AS BIGINT)
           FROM (SELECT o_orderkey, count(*) AS n FROM orders
                 GROUP BY o_orderkey)),
         pos AS (SELECT 'orders.o_totalprice positive', count(*),
             CAST(sum(CASE WHEN o_totalprice > 0 THEN 0 ELSE 1 END)
               AS BIGINT)
           FROM orders),
         acc AS (SELECT 'orders.o_orderstatus accepted', count(*),
             CAST(sum(CASE WHEN o_orderstatus IN ('O','F','P')
               THEN 0 ELSE 1 END) AS BIGINT)
           FROM orders),
         rc AS (SELECT 'orders.o_custkey refs customer',
             (SELECT count(*) FROM orders WHERE o_custkey IS NOT NULL),
             (SELECT count(*) FROM orders o
              WHERE o_custkey IS NOT NULL AND NOT EXISTS
                (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))),
         rl AS (SELECT 'lineitem.l_orderkey refs orders',
             (SELECT count(*) FROM lineitem WHERE l_orderkey IS NOT NULL),
             (SELECT count(*) FROM lineitem l
              WHERE l_orderkey IS NOT NULL AND NOT EXISTS
                (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))),
         u AS (SELECT * FROM nn UNION ALL SELECT * FROM uq
           UNION ALL SELECT * FROM pos UNION ALL SELECT * FROM acc
           UNION ALL SELECT * FROM rc UNION ALL SELECT * FROM rl)
         SELECT rule, n_checked, n_violations,
           n_violations = 0 AS passed
         FROM u ORDER BY rule""",
    // spine = generate_series over the min/max day; zero-count days are
    // explicit is_gap rows
    "q158_partition_gaps" ->
      """WITH b AS (SELECT CAST(min(CAST(o_orderdate AS DATE)) AS DATE)
               AS lo,
             CAST(max(CAST(o_orderdate AS DATE)) AS DATE) AS hi
           FROM orders),
         spine AS (SELECT CAST(unnest(generate_series(lo, hi,
             INTERVAL 1 DAY)) AS DATE) AS day FROM b),
         c AS (SELECT CAST(o_orderdate AS DATE) AS day,
             count(*) AS n_rows
           FROM orders GROUP BY 1)
         SELECT CAST(s.day AS VARCHAR) AS day,
           COALESCE(c.n_rows, 0) AS n_rows,
           COALESCE(c.n_rows, 0) = 0 AS is_gap
         FROM spine s LEFT JOIN c USING (day) ORDER BY day""",
    // q140's LM chain at k=1 + prob gate, joined back onto every doc's
    // contexts; all counts exact, one floored ratio
    "q155_memorization_risk" ->
      """WITH d AS (SELECT doc_id,
              list_filter(string_split(text, ' '), x -> x <> '') AS w
            FROM documents),
         p AS (SELECT doc_id,
              unnest(list_transform(generate_series(1, len(w) - 2),
                j -> array_to_string(w[j:j+1], ' ') || chr(1) || w[j+2]))
                AS s
            FROM d WHERE len(w) > 2),
         ps AS (SELECT doc_id, string_split(s, chr(1))[1] AS ctx,
                  string_split(s, chr(1))[2] AS next_tok
                FROM p),
         c AS (SELECT ctx, next_tok, CAST(count(*) AS BIGINT) AS n_obs
           FROM ps GROUP BY 1, 2),
         sup AS (SELECT ctx, CAST(sum(n_obs) AS BIGINT) AS t
           FROM c GROUP BY 1 HAVING sum(n_obs) >= 8),
         r AS (SELECT c.ctx, c.next_tok, c.n_obs, sup.t,
             CAST(row_number() OVER (PARTITION BY c.ctx
               ORDER BY c.n_obs DESC, c.next_tok) AS BIGINT) AS rank
           FROM c JOIN sup USING (ctx)),
         lm AS (SELECT ctx, next_tok AS top_next FROM r
           WHERE rank = 1
             AND floor(n_obs * 1000000 / t) / 1e6 >= 0.9),
         jj AS (SELECT ps.doc_id, ps.ctx, ps.next_tok, lm.top_next
           FROM ps LEFT JOIN lm USING (ctx))
         SELECT doc_id, count(*) AS n_ctx,
           CAST(sum(CASE WHEN top_next IS NOT NULL THEN 1 ELSE 0 END)
             AS BIGINT) AS n_predictable,
           CAST(sum(CASE WHEN next_tok = top_next THEN 1 ELSE 0 END)
             AS BIGINT) AS n_following,
           floor(sum(CASE WHEN next_tok = top_next THEN 1 ELSE 0 END)
             * 1000000 / count(*)) / 1e6 AS risk
         FROM jj GROUP BY doc_id ORDER BY doc_id""",
    // the q137 per-shard window discipline over both orderings; waste
    // accounting is pure BIGINT
    "q153_batch_waste" ->
      """WITH b AS (SELECT doc_id,
              CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
                AS BIGINT) AS len,
              CAST('0x' || substring(md5('b:' || CAST(doc_id AS VARCHAR)),
                1, 8) AS BIGINT) AS skey
            FROM documents),
         s AS (SELECT doc_id, len, skey, skey % 8 AS shard FROM b),
         h AS (SELECT shard, len, CAST((row_number() OVER (
               PARTITION BY shard ORDER BY skey, doc_id) - 1) // 32
               AS BIGINT) AS batch
           FROM s),
         hb AS (SELECT shard, batch, count(*) AS n, max(len) AS mx,
             CAST(sum(len) AS BIGINT) AS sm
           FROM h GROUP BY shard, batch),
         ha AS (SELECT 'hashed' AS strategy, shard,
             count(*) AS n_batches, CAST(sum(sm) AS BIGINT) AS total_tokens,
             CAST(sum(n * mx - sm) AS BIGINT) AS total_waste
           FROM hb GROUP BY shard),
         o AS (SELECT shard, len, CAST((row_number() OVER (
               PARTITION BY shard ORDER BY len DESC, doc_id) - 1) // 32
               AS BIGINT) AS batch
           FROM s),
         ob AS (SELECT shard, batch, count(*) AS n, max(len) AS mx,
             CAST(sum(len) AS BIGINT) AS sm
           FROM o GROUP BY shard, batch),
         oa AS (SELECT 'sorted' AS strategy, shard,
             count(*) AS n_batches, CAST(sum(sm) AS BIGINT) AS total_tokens,
             CAST(sum(n * mx - sm) AS BIGINT) AS total_waste
           FROM ob GROUP BY shard),
         u AS (SELECT * FROM ha UNION ALL SELECT * FROM oa)
         SELECT strategy, shard, n_batches, total_tokens, total_waste,
           floor(total_waste * 1000000 / (total_tokens + total_waste)) / 1e6
             AS waste_frac
         FROM u ORDER BY strategy, shard""",
    // per-source component sums are exact BIGINTs (1e-6-quantized
    // components); cosine runs on the integer-valued centroid arrays
    "q154_source_map" ->
      """WITH j AS (SELECT d.source, e.embedding
            FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id),
         x AS (SELECT source,
             unnest(range(1, len(embedding) + 1)) AS pos,
             CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000)
               AS BIGINT) AS iv
           FROM j),
         sums AS (SELECT source, pos, CAST(sum(iv) AS BIGINT) AS s
           FROM x GROUP BY source, pos),
         cent AS (SELECT source, list(CAST(s AS DOUBLE) ORDER BY pos) AS cv
           FROM sums GROUP BY source),
         cnt AS (SELECT source, count(*) AS n FROM j GROUP BY source),
         c AS (SELECT cent.source, cv, n FROM cent JOIN cnt USING (source))
         SELECT a.source AS source_a, b.source AS source_b,
           a.n AS n_a, b.n AS n_b,
           round(list_cosine_similarity(a.cv, b.cv), 4) AS cos_sim
         FROM c a JOIN c b ON a.source < b.source
         ORDER BY source_a, source_b""",
    // exact BIGINT pair/unigram margins; each PMI is one identical
    // row-local double chain, top-k compares those doubles
    "q152_collocations" ->
      """WITH d AS (SELECT
              list_filter(string_split(text, ' '), x -> x <> '') AS w
            FROM documents),
         p AS (SELECT unnest(list_transform(generate_series(1, len(w) - 1),
                j -> w[j] || chr(1) || w[j+1])) AS s
            FROM d WHERE len(w) >= 2),
         ps AS (SELECT string_split(s, chr(1))[1] AS w1,
                  string_split(s, chr(1))[2] AS w2
                FROM p),
         pc AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12
           FROM ps GROUP BY 1, 2 HAVING count(*) >= 5),
         u AS (SELECT unnest(w) AS t FROM d),
         uc AS (SELECT t, CAST(count(*) AS BIGINT) AS c
           FROM u GROUP BY 1),
         nn AS (SELECT CAST(sum(greatest(len(w) - 1, 0)) AS BIGINT) AS n2
           FROM d),
         sc AS (SELECT w1, w2, c12, u1.c AS c1, u2.c AS c2,
             ln(CAST(c12 AS DOUBLE) * n2
               / (CAST(u1.c AS DOUBLE) * u2.c)) AS pmi
           FROM pc JOIN uc u1 ON u1.t = w1 JOIN uc u2 ON u2.t = w2, nn)
         SELECT w1, w2, c12, c1, c2,
           floor(pmi * 10000) / 1e4 AS pmi
         FROM sc ORDER BY sc.pmi DESC, w1, w2 LIMIT 50""",
    // the 3 MMR rounds unrolled: every argmax compares the same integer
    // rel − max-penalty both engines compute
    "q151_mmr_select" ->
      """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
            FROM embeddings),
         q AS (SELECT vec_id AS q_id, v AS qv FROM v WHERE vec_id < 4),
         c AS (SELECT q_id, v.vec_id, v.v AS dv,
             CAST(round(list_cosine_similarity(qv, v.v) * 10000) AS BIGINT)
               AS rel
           FROM v JOIN q ON v.vec_id <> q_id),
         w1 AS (SELECT q_id, vec_id, dv, rel, CAST(0 AS BIGINT) AS pen
           FROM (SELECT *, row_number() OVER (PARTITION BY q_id
               ORDER BY rel DESC, vec_id) AS rn FROM c) t
           WHERE rn = 1),
         p2 AS (SELECT c.q_id, c.vec_id, c.dv, c.rel,
             CAST(round(list_cosine_similarity(c.dv, w1.dv) * 10000)
               AS BIGINT) AS pen
           FROM c JOIN w1 ON c.q_id = w1.q_id AND c.vec_id <> w1.vec_id),
         w2 AS (SELECT q_id, vec_id, dv, rel, pen
           FROM (SELECT *, row_number() OVER (PARTITION BY q_id
               ORDER BY rel - pen DESC, vec_id) AS rn FROM p2) t
           WHERE rn = 1),
         p3 AS (SELECT c.q_id, c.vec_id, c.rel,
             greatest(
               CAST(round(list_cosine_similarity(c.dv, w1.dv) * 10000)
                 AS BIGINT),
               CAST(round(list_cosine_similarity(c.dv, w2.dv) * 10000)
                 AS BIGINT)) AS pen
           FROM c JOIN w1 ON c.q_id = w1.q_id
           JOIN w2 ON c.q_id = w2.q_id
           WHERE c.vec_id <> w1.vec_id AND c.vec_id <> w2.vec_id),
         w3 AS (SELECT q_id, vec_id, rel, pen
           FROM (SELECT *, row_number() OVER (PARTITION BY q_id
               ORDER BY rel - pen DESC, vec_id) AS rn FROM p3) t
           WHERE rn = 1),
         allw AS (
           SELECT q_id, CAST(1 AS BIGINT) AS step, vec_id, rel, pen FROM w1
           UNION ALL
           SELECT q_id, CAST(2 AS BIGINT), vec_id, rel, pen FROM w2
           UNION ALL
           SELECT q_id, CAST(3 AS BIGINT), vec_id, rel, pen FROM w3)
         SELECT q_id, step, vec_id AS doc_id,
           rel / 10000.0 AS relevance, pen / 10000.0 AS redundancy,
           CAST(rel - pen AS DOUBLE) / 20000.0 AS mmr
         FROM allw ORDER BY q_id, step""",
    // integer-quantized ranking + exact running token sums; the greedy
    // cut is a monotone integer predicate
    "q150_context_assembly" ->
      """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
            FROM embeddings),
         q AS (SELECT vec_id AS q_id, v AS qv FROM v WHERE vec_id < 8),
         tk AS (SELECT doc_id AS vec_id,
             CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
               AS BIGINT) AS n_tokens
           FROM documents),
         sc AS (SELECT q_id, v.vec_id,
             CAST(round(list_cosine_similarity(qv, v.v) * 10000) AS BIGINT)
               AS isim,
             n_tokens
           FROM v JOIN q ON v.vec_id <> q_id
           JOIN tk ON tk.vec_id = v.vec_id
           WHERE n_tokens > 0),
         r AS (SELECT *, CAST(row_number() OVER (PARTITION BY q_id
               ORDER BY isim DESC, vec_id) AS BIGINT) AS rank,
             CAST(sum(n_tokens) OVER (PARTITION BY q_id
               ORDER BY isim DESC, vec_id ROWS UNBOUNDED PRECEDING)
               AS BIGINT) AS cum_tokens
           FROM sc)
         SELECT q_id, rank, vec_id AS doc_id, isim / 10000.0 AS cos_sim,
           n_tokens, cum_tokens
         FROM r WHERE rank <= 256 AND cum_tokens <= 256
         ORDER BY q_id, rank""",
    // exact BIGINT class counts; the bucket rule is q146's
    "q148_k_anonymity" ->
      """WITH st AS (SELECT CAST(min(n_chars) AS DOUBLE) AS lo,
              CAST(max(n_chars) AS DOUBLE) AS hi FROM documents)
         SELECT lang, source,
           CASE WHEN hi = lo THEN CAST(0 AS BIGINT)
             ELSE CAST(least(greatest(floor(
               (CAST(n_chars AS DOUBLE) - lo) * 10 / (hi - lo)), 0.0), 9.0)
               AS BIGINT) END AS len_bucket,
           count(*) AS group_size,
           count(*) < 5 AS at_risk
         FROM documents, st
         GROUP BY 1, 2, 3 ORDER BY lang, source, len_bucket""",
    // every float input is an exact BIGINT margin; both engines run the
    // identical per-row double chain, ranking compares those doubles
    "q149_log_odds" ->
      """WITH tk AS (SELECT source,
              unnest(list_filter(string_split(text, ' '), x -> x <> ''))
                AS term
            FROM documents),
         c AS (SELECT source, term, CAST(count(*) AS BIGINT) AS csw
           FROM tk GROUP BY 1, 2),
         s AS (SELECT source, CAST(sum(csw) AS BIGINT) AS ns
           FROM c GROUP BY 1),
         tt AS (SELECT term, CAST(sum(csw) AS BIGINT) AS fw
           FROM c GROUP BY 1),
         nnn AS (SELECT CAST(sum(csw) AS BIGINT) AS nn FROM c),
         sc AS (SELECT c.source, c.term, csw, fw, ns,
             CAST(fw AS DOUBLE) * 500.0 / CAST(nn AS DOUBLE) AS aw,
             CAST(fw - csw AS DOUBLE) AS crw,
             CAST(nn - ns AS DOUBLE) AS nr
           FROM c JOIN s USING (source) JOIN tt USING (term), nnn),
         z AS (SELECT source, term, csw, fw,
             (ln((csw + aw) / (ns + 500.0 - csw - aw))
              - ln((crw + aw) / (nr + 500.0 - crw - aw)))
             / sqrt(1.0 / (csw + aw) + 1.0 / (crw + aw)) AS z
           FROM sc),
         r AS (SELECT *, CAST(row_number() OVER (PARTITION BY source
               ORDER BY z DESC, term) AS BIGINT) AS rank
           FROM z)
         SELECT source, rank, term, csw AS n_in, fw - csw AS n_out,
           floor(z * 10000) / 1e4 AS z
         FROM r WHERE rank <= 5 ORDER BY source, rank""",
    // q126's quantized-cosine window pattern: neighbor sets deterministic
    // under the integer sim, agreement divides exact longs
    "q145_label_agreement" ->
      """WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
            FROM embeddings),
         q AS (SELECT vec_id AS q_id, label AS q_label, v AS qv
           FROM e WHERE vec_id % 10 = 0),
         sc AS (SELECT q_id, q_label, vec_id, label,
             CAST(round(list_cosine_similarity(qv, v) * 10000) AS BIGINT)
               AS isim
           FROM q JOIN e ON vec_id <> q_id),
         r AS (SELECT *, row_number() OVER (PARTITION BY q_id
               ORDER BY isim DESC, vec_id) AS rn FROM sc),
         a AS (SELECT q_id, q_label, count(*) AS kk,
             CAST(sum(CASE WHEN label = q_label THEN 1 ELSE 0 END)
               AS BIGINT) AS n_same
           FROM r WHERE rn <= 8 GROUP BY 1, 2)
         SELECT q_id, CAST(q_label AS BIGINT) AS q_label, n_same,
           floor(n_same * 10000 / kk) / 1e4 AS agreement,
           n_same * 4 <= kk AS suspect
         FROM a ORDER BY q_id""",
    // exact-integer contingency margins; expected/contrib divide the
    // identical longs in double space
    // q147b: exact inputs + TRUE contract literals — DuckDB has no
    // deflate, so the oracle replays the exact side (UTF-8 byte count)
    // and pins every Spark-computed contract boolean at TRUE.
    "q147b_compress_contract" ->
      """SELECT doc_id,
         CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
         TRUE AS ratio_in_band, TRUE AS overhead_ok,
         TRUE AS ratio_consistent
         FROM documents ORDER BY doc_id""",

    "q146_source_balance" ->
      """WITH st AS (SELECT CAST(min(n_chars) AS DOUBLE) AS lo,
              CAST(max(n_chars) AS DOUBLE) AS hi, count(*) AS n
            FROM documents),
         cells AS (SELECT source,
             CASE WHEN hi = lo THEN CAST(0 AS BIGINT)
               ELSE CAST(least(greatest(floor(
                 (CAST(n_chars AS DOUBLE) - lo) * 5 / (hi - lo)), 0.0), 4.0)
                 AS BIGINT) END AS bucket,
             count(*) AS obs
           FROM documents, st GROUP BY 1, 2),
         rt AS (SELECT source, CAST(sum(obs) AS BIGINT) AS rt
           FROM cells GROUP BY 1),
         ct AS (SELECT bucket, CAST(sum(obs) AS BIGINT) AS ct
           FROM cells GROUP BY 1),
         spine AS (SELECT source, rt, bucket, ct FROM rt CROSS JOIN ct),
         j AS (SELECT s.source, s.bucket, COALESCE(c.obs, 0) AS n_obs,
             s.rt, s.ct
           FROM spine s LEFT JOIN cells c
             ON c.source = s.source AND c.bucket = s.bucket)
         SELECT source, bucket, CAST(n_obs AS BIGINT) AS n_obs, rt, ct,
           floor(CAST(rt * ct AS DOUBLE) / CAST(n AS DOUBLE) * 10000) / 1e4
             AS expected,
           floor((CAST(n_obs AS DOUBLE)
               - CAST(rt * ct AS DOUBLE) / CAST(n AS DOUBLE))
             * (CAST(n_obs AS DOUBLE)
               - CAST(rt * ct AS DOUBLE) / CAST(n AS DOUBLE))
             / (CAST(rt * ct AS DOUBLE) / CAST(n AS DOUBLE)) * 10000) / 1e4
             AS chi2_contrib
         FROM j, st ORDER BY source, bucket""",
    // per-(model, token) log terms quantized to integer millionths, so
    // each matrix cell is an exact BIGINT dot product in both engines
    "q144_source_affinity" ->
      """WITH tk AS (SELECT source,
              unnest(list_filter(string_split(text, ' '), x -> x <> ''))
                AS tok
            FROM documents),
         cc AS (SELECT source, tok, CAST(count(*) AS BIGINT) AS c
           FROM tk GROUP BY 1, 2),
         tt AS (SELECT source, CAST(sum(c) AS BIGINT) AS t
           FROM cc GROUP BY 1),
         vv AS (SELECT count(DISTINCT tok) AS v FROM cc),
         models AS (SELECT cc.source AS model_source, tok,
             CAST(floor(ln((c + 1) / CAST(t + v AS DOUBLE)) * 1000000)
               AS BIGINT) AS l
           FROM cc JOIN tt USING (source), vv),
         defaults AS (SELECT source AS model_source,
             CAST(floor(ln(1.0 / CAST(t + v AS DOUBLE)) * 1000000)
               AS BIGINT) AS l0
           FROM tt, vv),
         pairs AS (SELECT e.source AS eval_source, d.model_source,
             e.c * COALESCE(m.l, d.l0) AS term, e.c AS cs
           FROM cc e CROSS JOIN defaults d
           LEFT JOIN models m ON m.model_source = d.model_source
             AND m.tok = e.tok),
         h AS (SELECT eval_source, model_source,
             CAST(sum(term) AS BIGINT) AS sterm,
             CAST(sum(cs) AS BIGINT) AS ts
           FROM pairs GROUP BY 1, 2),
         slf AS (SELECT eval_source, sterm AS sself FROM h
           WHERE eval_source = model_source)
         SELECT eval_source, model_source, ts AS n_tokens,
           floor(-CAST(sterm AS DOUBLE) / CAST(ts * 1000000 AS DOUBLE)
             * 10000) / 1e4 AS h,
           floor(CAST(sself - sterm AS DOUBLE)
             / CAST(ts * 1000000 AS DOUBLE) * 10000) / 1e4 AS excess
         FROM h JOIN slf USING (eval_source)
         ORDER BY eval_source, model_source""",
    // cosines quantized to integer 1e-4 BEFORE any ranking or sum, so
    // the whole mining decision is integer arithmetic in both engines
    "q141_bitext_margin" ->
      """WITH e AS (SELECT d.doc_id, d.lang, CAST(e.embedding AS DOUBLE[]) AS v
            FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id),
         s AS (SELECT doc_id AS src_id, v AS sv FROM e WHERE lang = 'en'),
         t AS (SELECT doc_id AS tgt_id, v AS tv FROM e WHERE lang <> 'en'),
         p AS (SELECT src_id, tgt_id,
             CAST(round(list_cosine_similarity(sv, tv) * 10000) AS BIGINT)
               AS isim
           FROM s, t),
         f AS (SELECT *, row_number() OVER (PARTITION BY src_id
               ORDER BY isim DESC, tgt_id) AS rf FROM p),
         b AS (SELECT src_id, tgt_id, isim, row_number() OVER (
               PARTITION BY tgt_id ORDER BY isim DESC, src_id) AS rb FROM p),
         fa AS (SELECT src_id, CAST(sum(isim) AS BIGINT) AS sum_fwd,
              count(*) AS cnt_f,
              max(CASE WHEN rf = 1 THEN tgt_id END) AS tgt_id,
              CAST(max(CASE WHEN rf = 1 THEN isim END) AS BIGINT)
                AS best_isim
            FROM f WHERE rf <= 4 GROUP BY src_id),
         ba AS (SELECT tgt_id, CAST(sum(isim) AS BIGINT) AS sum_bwd,
              count(*) AS cnt_b
            FROM b WHERE rb <= 4 GROUP BY tgt_id)
         SELECT src_id, tgt_id, best_isim / 10000.0 AS cos_sim,
           floor(best_isim * (cnt_f + cnt_b) * 10000.0
             / (sum_fwd + sum_bwd)) / 1e4 AS margin
         FROM fa JOIN ba USING (tgt_id)
         WHERE best_isim > 0
           AND best_isim * (cnt_f + cnt_b) >= sum_fwd + sum_bwd
         ORDER BY src_id""",
    // the q72 gate chain + the q32 quality chain feeding one sweep;
    // thresholds are the same decimal literals both engines parse to
    // identical doubles
    "q142_score_sweep" ->
      """WITH d AS (SELECT doc_id, text, length(text) AS nc,
              list_filter(string_split(text, ' '), x -> x <> '') AS w
            FROM documents),
         m AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS nw,
             length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS np,
             len(list_filter(w, x -> list_contains(
               ['the','a','of','and','to','in','is','on','for','with'], x)))
               AS ns,
             floor(1.0*length(replace(text,' ',''))/len(w)*10000)/10000
               AS awl,
             floor((1.0 - 1.0*len(list_distinct(w))/len(w))*10000)/10000
               AS dupf,
             floor(1.0*length(regexp_replace(text,'[^0-9]','','g'))/nc
               *10000)/10000 AS digr,
             floor(1.0*len(list_filter(w, x -> list_contains(
               ['the','a','of','and','to','in','is','on','for','with'], x)))
               /len(w)*10000)/10000 AS stopr,
             nc
           FROM d),
         q AS (SELECT doc_id, nw,
             floor((0.4*least(1.0, nw/50.0) + 0.3*(1.0 - np*1.0/nc)
                   + 0.3*least(1.0, ns*1.0/nw*5.0))*10000)/10000 AS qs,
             CASE WHEN nw >= 20 AND nw <= 100000 AND awl >= 3.0
                   AND awl <= 10.0 AND stopr > 0 AND dupf <= 0.6
                   AND digr <= 0.1 THEN 1 ELSE 0 END AS keep
           FROM m),
         tot AS (SELECT CAST(sum(keep) AS BIGINT) AS total_keep,
             count(*) AS total_docs FROM q),
         x AS (SELECT qs, nw, keep,
             CAST(unnest([0.0,0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9])
               AS DOUBLE) AS threshold
           FROM q),
         sw AS (SELECT threshold, count(*) AS n_selected,
             CAST(sum(nw) AS BIGINT) AS sel_tokens,
             CAST(sum(keep) AS BIGINT) AS n_keep_sel
           FROM x WHERE qs >= threshold GROUP BY threshold)
         SELECT threshold, n_selected, sel_tokens,
           floor(n_selected * 1000000 / total_docs) / 1e6 AS frac_selected,
           floor(n_keep_sel * 1000000 / n_selected) / 1e6
             AS precision_vs_gate,
           floor(n_keep_sel * 1000000 / total_keep) / 1e6 AS recall_vs_gate
         FROM sw, tot ORDER BY threshold""",
    // ln values quantized to integer thousandths per type, so every
    // regression moment is an exact BIGINT; the closed forms then divide
    // identical longs in double space
    "q143_zipf_fit" ->
      """WITH toks AS (SELECT
              unnest(list_filter(string_split(text, ' '), x -> x <> ''))
                AS token
            FROM documents),
         freq AS (SELECT token, CAST(count(*) AS BIGINT) AS freq
           FROM toks GROUP BY token),
         vocab AS (SELECT count(*) AS n_types,
             CAST(sum(freq) AS BIGINT) AS n_tokens FROM freq),
         top AS (SELECT token, freq FROM freq
           ORDER BY freq DESC, token LIMIT 1000),
         xy AS (SELECT
             CAST(floor(ln(CAST(row_number() OVER (
               ORDER BY freq DESC, token) AS DOUBLE)) * 1000) AS BIGINT)
               AS x,
             CAST(floor(ln(CAST(freq AS DOUBLE)) * 1000) AS BIGINT) AS y
           FROM top),
         m AS (SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x*x) AS BIGINT) AS sxx,
             CAST(sum(x*y) AS BIGINT) AS sxy,
             CAST(sum(y*y) AS BIGINT) AS syy
           FROM xy)
         SELECT n AS n_top, n_types, n_tokens,
           floor(CAST(n*sxy - sx*sy AS DOUBLE)
             / CAST(n*sxx - sx*sx AS DOUBLE) * 10000) / 1e4 AS slope,
           floor((CAST(sy AS DOUBLE)
               - CAST(n*sxy - sx*sy AS DOUBLE)
                 / CAST(n*sxx - sx*sx AS DOUBLE) * CAST(sx AS DOUBLE))
             / CAST(n*1000 AS DOUBLE) * 10000) / 1e4 AS intercept,
           floor(CAST(n*sxy - sx*sy AS DOUBLE) * CAST(n*sxy - sx*sy AS DOUBLE)
             / (CAST(n*sxx - sx*sx AS DOUBLE) * CAST(n*syy - sy*sy AS DOUBLE))
             * 1000000) / 1e6 AS r2
         FROM m, vocab""",
    // ranking compares the identical full-precision double product in
    // both engines (exact-long divisions and one ln); emitted score is
    // floor-quantized
    "q139_cluster_keywords" ->
      """WITH a AS (SELECT e.label, d.text
            FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id),
         toks AS (SELECT label,
              unnest(list_filter(string_split(text, ' '), x -> x <> ''))
                AS term
            FROM a),
         tf AS (SELECT label, term, CAST(count(*) AS BIGINT) AS c
           FROM toks GROUP BY 1, 2),
         pl AS (SELECT label, CAST(sum(c) AS BIGINT) AS t
           FROM tf GROUP BY 1),
         dfx AS (SELECT term, CAST(count(*) AS BIGINT) AS df
           FROM tf GROUP BY 1),
         nl AS (SELECT count(DISTINCT label) AS nl FROM embeddings),
         sc AS (SELECT tf.label, tf.term, c, df, t,
             (c / t) * ln((1 + nl) / (1 + df)) AS score
           FROM tf JOIN pl USING (label) JOIN dfx USING (term), nl),
         r AS (SELECT *, CAST(row_number() OVER (PARTITION BY label
               ORDER BY score DESC, term) AS BIGINT) AS rank
           FROM sc)
         SELECT CAST(label AS BIGINT) AS label, rank, term, c AS tf,
           df AS n_clusters, floor(score * 1000000) / 1e6 AS score
         FROM r WHERE rank <= 5 ORDER BY label, rank""",
    // same 1-based slices as q125's shingle idiom; the chr(1) separator
    // survives because whitespace-split tokens cannot contain it
    "q140_ngram_lm" ->
      """WITH d AS (SELECT
              list_filter(string_split(text, ' '), x -> x <> '') AS w
            FROM documents),
         p AS (SELECT unnest(list_transform(generate_series(1, len(w) - 2),
                j -> array_to_string(w[j:j+1], ' ') || chr(1) || w[j+2]))
                AS s
            FROM d WHERE len(w) > 2),
         ps AS (SELECT string_split(s, chr(1))[1] AS ctx,
                  string_split(s, chr(1))[2] AS next_tok
                FROM p),
         c AS (SELECT ctx, next_tok, CAST(count(*) AS BIGINT) AS n_obs
           FROM ps GROUP BY 1, 2),
         sup AS (SELECT ctx, CAST(sum(n_obs) AS BIGINT) AS t
           FROM c GROUP BY 1 HAVING sum(n_obs) >= 4),
         r AS (SELECT c.ctx, c.next_tok, c.n_obs, sup.t,
             CAST(row_number() OVER (PARTITION BY c.ctx
               ORDER BY c.n_obs DESC, c.next_tok) AS BIGINT) AS rank
           FROM c JOIN sup USING (ctx))
         SELECT ctx, rank, next_tok, n_obs, t AS ctx_count,
           floor(n_obs * 1000000 / t) / 1e6 AS prob
         FROM r WHERE rank <= 3 ORDER BY ctx, rank""",
    // exact-identity entropy H = ln N − (Σ c·ln c)/N so both engines do
    // the same float ops; all fractions floor-quantized
    "q138_dataset_card" ->
      """WITH t AS (SELECT source, lang, text,
              CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
                AS BIGINT) AS tok
            FROM documents),
         base AS (SELECT source, count(*) AS n_docs,
             CAST(sum(tok) AS BIGINT) AS n_tokens,
             CAST(sum(len(text)) AS BIGINT) AS n_chars,
             count(DISTINCT md5(text)) AS n_distinct
           FROM t GROUP BY source),
         sl AS (SELECT source, lang, CAST(count(*) AS BIGINT) AS c
           FROM t GROUP BY source, lang),
         langs AS (SELECT source, count(*) AS n_langs,
             sum(c * ln(c)) AS clnc, sum(c) AS nd
           FROM sl GROUP BY source),
         tot AS (SELECT CAST(sum(tok) AS BIGINT) AS total_tokens FROM t)
         SELECT b.source, b.n_docs, b.n_tokens, b.n_chars,
           floor(b.n_tokens * 1000000 / total_tokens) / 1e6 AS token_share,
           floor(b.n_tokens * 1000 / b.n_docs) / 1e3 AS avg_tokens,
           floor((b.n_docs - b.n_distinct) * 1000000 / b.n_docs) / 1e6
             AS dup_rate,
           l.n_langs,
           floor((ln(CAST(nd AS DOUBLE)) - clnc / nd) * 1000000) / 1e6
             AS lang_entropy
         FROM base b JOIN langs l USING (source), tot
         ORDER BY b.source""",
    // q80's KL chain + the multiplicative-weights update; the KL input to
    // exp() is 1e-3-quantized, so both engines exponentiate identical
    // doubles
    "q136_doremi_weights" ->
      """WITH toks AS (SELECT source,
              unnest(list_filter(string_split(text,' '), x -> x <> ''))
                AS token
            FROM documents),
         g AS (SELECT source, token, CAST(count(*) AS DOUBLE) AS c
            FROM toks GROUP BY 1, 2),
         gt AS (SELECT source, sum(c) AS gt FROM g GROUP BY 1),
         f AS (SELECT token, sum(c) AS f FROM g GROUP BY 1),
         ct AS (SELECT sum(f) AS ct FROM f),
         kl AS (SELECT g.source, CAST(sum(c) AS BIGINT) AS n_tokens,
             floor(greatest(0.0, sum((c/gt)*ln((c/gt)/(f/ct))))*1000)/1000
               AS kl
           FROM g JOIN gt USING (source) JOIN f USING (token), ct
           GROUP BY g.source),
         tt AS (SELECT CAST(sum(n_tokens) AS DOUBLE) AS tt FROM kl),
         sc AS (SELECT source, n_tokens, n_tokens / tt AS share,
                  (n_tokens / tt) * exp(1.0 * kl) AS u, kl
                FROM kl, tt),
         su AS (SELECT sum(u) AS su FROM sc)
         SELECT source, n_tokens,
           floor(share * 10000) / 10000 AS share,
           kl AS excess,
           floor(u / su * 10000) / 10000 AS weight
         FROM sc, su ORDER BY source""",
    "q135_shard_manifest" ->
      """WITH d AS (SELECT
              ((doc_id % 2147483648) * 2654435761) % 2147483647 % 8
                AS shard,
              doc_id,
              CAST(len(list_filter(string_split(text,' '), x -> x <> ''))
                AS BIGINT) AS n_toks,
              CAST(len(text) AS BIGINT) AS nc,
              CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)
                || ':' || text), 1, 8) AS BIGINT) AS h
            FROM documents)
         SELECT shard, count(*) AS n_docs,
           CAST(sum(n_toks) AS BIGINT) AS n_tokens,
           CAST(sum(nc) AS BIGINT) AS n_chars,
           min(doc_id) AS min_id, max(doc_id) AS max_id,
           CAST(sum(h) AS BIGINT) AS checksum
         FROM d GROUP BY shard ORDER BY shard""",
    "q134_snapshot_drift" ->
      """WITH b AS (SELECT CAST(n_chars AS DOUBLE) AS score FROM documents
              WHERE doc_id % 2 = 0),
         a AS (SELECT CAST(n_chars AS DOUBLE) AS score FROM documents
              WHERE doc_id % 7 <> 0),
         st AS (SELECT min(score) AS lo, max(score) AS hi FROM b),
         tot AS (SELECT (SELECT count(*) FROM b) AS nb,
                        (SELECT count(*) FROM a) AS na),
         bb AS (SELECT CASE WHEN hi = lo THEN CAST(0 AS BIGINT)
                  ELSE CAST(least(greatest(
                    floor((score - lo) * 10 / (hi - lo)), 0.0), 9.0)
                    AS BIGINT) END AS bucket FROM b, st),
         ab AS (SELECT CASE WHEN hi = lo THEN CAST(0 AS BIGINT)
                  ELSE CAST(least(greatest(
                    floor((score - lo) * 10 / (hi - lo)), 0.0), 9.0)
                    AS BIGINT) END AS bucket FROM a, st),
         cb AS (SELECT bucket, count(*) AS n_before FROM bb GROUP BY bucket),
         ca AS (SELECT bucket, count(*) AS n_after FROM ab GROUP BY bucket),
         spine AS (SELECT unnest(generate_series(0, 9)) AS bucket),
         j AS (SELECT s.bucket, COALESCE(cb.n_before, 0) AS n_before,
                 COALESCE(ca.n_after, 0) AS n_after
               FROM spine s LEFT JOIN cb USING (bucket)
               LEFT JOIN ca USING (bucket)),
         pq AS (SELECT bucket, n_before, n_after,
             (n_before + 0.5) / (nb + 5.0) AS p,
             (n_after + 0.5) / (na + 5.0) AS q
           FROM j, tot)
         SELECT bucket, n_before, n_after,
           floor(p * 1000000) / 1e6 AS p,
           floor(q * 1000000) / 1e6 AS q,
           floor((p - q) * ln(p / q) * 10000) / 1e4 AS psi
         FROM pq ORDER BY bucket""",
    "q133_seqlen_fit" ->
      """WITH d AS (SELECT CAST(len(list_filter(string_split(text,' '),
              x -> x <> '')) AS BIGINT) AS tok FROM documents),
         x AS (SELECT tok, CAST(unnest([64, 128, 256, 512]) AS BIGINT)
                 AS seq_len FROM d),
         agg AS (SELECT seq_len, count(*) AS n_docs,
             CAST(sum(tok) AS BIGINT) AS total_tokens,
             CAST(sum(greatest(tok - seq_len, 0)) AS BIGINT)
               AS trunc_tokens,
             CAST(sum(seq_len - least(tok, seq_len)) AS BIGINT)
               AS pad_tokens,
             CAST(sum(CASE WHEN tok <= seq_len THEN 1 ELSE 0 END) AS BIGINT)
               AS n_fit
           FROM x GROUP BY seq_len)
         SELECT seq_len, n_docs, total_tokens, trunc_tokens, pad_tokens,
           floor(trunc_tokens * 1000000 / total_tokens) / 1e6 AS trunc_frac,
           floor(pad_tokens * 1000000 / (n_docs * seq_len)) / 1e6
             AS pad_frac,
           floor(n_fit * 1000000 / n_docs) / 1e6 AS fit_frac
         FROM agg ORDER BY seq_len""",
    // CMS replayed as a join (the engine's literal-array lookup and this
    // join compute the same depth×width counters); admission + exact
    // rescan identical
    "q130_heavy_hitters" ->
      """WITH docs AS (SELECT list_filter(string_split(text,' '),
              x -> x <> '') AS w FROM documents),
         occ AS (SELECT unnest(CASE WHEN len(w) >= 3
              THEN list_transform(generate_series(1, len(w)-2),
                   i -> array_to_string(w[i:i+2], ' '))
              ELSE [array_to_string(w, ' ')] END) AS s
            FROM docs),
         hb AS (SELECT s,
                  CAST('0x' || substring(md5(s),1,8) AS BIGINT) AS b
                FROM occ),
         bk AS (SELECT s, i,
                  ((2*i+3)*b + 7919*i + 1) % 2147483647 % 8192 AS bucket
                FROM hb, generate_series(0,3) t(i)),
         grid AS (SELECT i, bucket, count(*) AS c
                  FROM bk GROUP BY i, bucket),
         est AS (SELECT s, min(c) AS cms_est
                 FROM bk JOIN grid USING (i, bucket) GROUP BY s),
         exact AS (SELECT s, count(*) AS cnt FROM occ GROUP BY s)
         SELECT e.s AS gram, x.cnt, e.cms_est
         FROM est e JOIN exact x USING (s)
         WHERE e.cms_est >= 6 AND x.cnt >= 6
         ORDER BY cnt DESC, gram""",
    // fixture rebuilt from doc_id arithmetic, then the same extract →
    // normalize → registered-domain fold → rollup → verdict chain
    "q131_domain_stats" ->
      """WITH f AS (SELECT doc_id, text || ' ' ||
              CASE WHEN doc_id % 2 = 0 THEN 'https://' ELSE 'http://' END ||
              CASE WHEN doc_id % 3 = 0 THEN 'www.' ELSE '' END ||
              'site' || CAST(doc_id % 23 AS VARCHAR) || '.' ||
              (['com','org','net','io'])[CAST(doc_id % 4 AS INT) + 1] ||
              CASE WHEN doc_id % 7 = 0 THEN ':8080' ELSE '' END ||
              '/p/' || CAST(doc_id AS VARCHAR) ||
              CASE WHEN doc_id % 5 = 0
                THEN ' https://ads.spamhub.biz/x' || CAST(doc_id AS VARCHAR)
                ELSE '' END AS t
            FROM documents),
         u AS (SELECT doc_id,
                 unnest(regexp_extract_all(t, 'https?://[^\s]+')) AS url
               FROM f),
         h AS (SELECT doc_id, split_part(split_part(
                 regexp_replace(url, '^https?://', ''), '/', 1), ':', 1)
                 AS host FROM u),
         d AS (SELECT doc_id, array_to_string(w[len(w)-1:], '.') AS domain
               FROM (SELECT doc_id, string_split(
                   lower(regexp_replace(host, '^www\.', '')), '.') AS w
                 FROM h)),
         agg AS (SELECT domain, count(*) AS n_urls,
                   count(DISTINCT doc_id) AS n_docs
                 FROM d GROUP BY domain)
         SELECT domain, n_urls, n_docs,
           domain IN ('spamhub.biz', 'malware.net') AS blocked,
           CASE WHEN domain IN ('spamhub.biz', 'malware.net') THEN 'drop'
                WHEN n_docs >= 5 THEN 'keep'
                ELSE 'review' END AS verdict
         FROM agg ORDER BY domain""",
    "q128_dim_energy" ->
      """WITH e AS (SELECT vec_id,
              list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
            FROM embeddings),
         c AS (SELECT unnest([4, 8, 16, 32, 64]) AS cutoff),
         r AS (SELECT cutoff,
              CAST(floor(CASE WHEN t = 0 THEN 0.0 ELSE s / t END * 1000000)
                AS BIGINT) AS q6
            FROM (SELECT c.cutoff,
                list_sum(list_transform(v[1:c.cutoff], x -> x*x)) AS s,
                list_sum(list_transform(v, x -> x*x)) AS t
              FROM e CROSS JOIN c) x)
         SELECT CAST(cutoff AS INT) AS cutoff,
           CAST(count(*) AS BIGINT) AS n_vecs,
           CAST(sum(q6) // count(*) AS DOUBLE) / 1e6 AS avg_energy
         FROM r GROUP BY cutoff ORDER BY cutoff""",
    "q96_logreg_quality" -> logregOracle(3, 1.0,
      "source IN ('src0','src1','src2','src3','src4')"),
    "q97_text_embed" ->
      """WITH d AS (SELECT doc_id,
              list_filter(string_split(text,' '), x -> x <> '') AS w
            FROM documents),
         th AS (SELECT doc_id, len(w) AS n, list_transform(w, t ->
              list_reduce(list_prepend(CAST(0 AS BIGINT),
                list_transform(generate_series(1, length(t)),
                  i -> CAST(ord(substr(t, i, 1)) AS BIGINT))),
                (a, x) -> (a*31 + x) % 2147483647)) AS hs
            FROM d),
         e AS (SELECT doc_id, n, list_transform(generate_series(0, 15), j ->
              coalesce(list_sum(list_transform(hs, h ->
                CASE WHEN bit_count(h*2654435761 + j*2246822519) % 2 = 0
                     THEN 1 ELSE -1 END)), 0)) AS emb
            FROM th)
         SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
           CAST(emb[1] AS BIGINT) AS e0, CAST(emb[2] AS BIGINT) AS e1,
           CAST(emb[3] AS BIGINT) AS e2, CAST(emb[4] AS BIGINT) AS e3,
           round(sqrt(list_sum(list_transform(emb,
             x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)))), 4) AS emb_norm
         FROM e ORDER BY doc_id""",
    "q73_embed_project" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         p AS (SELECT vec_id, list_transform(generate_series(0, 15), j ->
               list_sum(list_transform(generate_series(1, len(v)), i ->
                 v[i] * (CASE WHEN bit_count(i*2654435761 + j*2246822519) % 2 = 0
                         THEN 1.0 ELSE -1.0 END)))) AS pr
            FROM e)
         SELECT vec_id,
           round(pr[1], 4) AS p0, round(pr[2], 4) AS p1,
           round(pr[3], 4) AS p2, round(pr[4], 4) AS p3,
           round(sqrt(list_sum(list_transform(pr, x -> x*x))), 4) AS proj_norm
         FROM p ORDER BY vec_id""",
    "q72_gopher_filter" ->
      """WITH d AS (SELECT doc_id, text, length(text) AS n_chars,
              list_filter(string_split(text,' '), x -> x <> '') AS w
            FROM documents),
         m AS (SELECT doc_id, len(w) AS n_words,
              floor(1.0*length(replace(text,' ',''))/len(w)*10000)/10000 AS awl,
              floor((1.0 - 1.0*len(list_distinct(w))/len(w))*10000)/10000 AS dupf,
              floor(1.0*length(regexp_replace(text,'[^0-9]','','g'))/n_chars*10000)/10000 AS digr,
              floor(1.0*len(list_filter(w, x -> list_contains(
                ['the','a','of','and','to','in','is','on','for','with'], x)))/len(w)*10000)/10000 AS stopr
            FROM d),
         r AS (SELECT doc_id, concat_ws(',',
              CASE WHEN NOT (n_words >= 20 AND n_words <= 100000) THEN 'word_count' END,
              CASE WHEN NOT (awl >= 3.0 AND awl <= 10.0) THEN 'word_length' END,
              CASE WHEN NOT (stopr > 0) THEN 'stopword' END,
              CASE WHEN NOT (dupf <= 0.6) THEN 'repetition' END,
              CASE WHEN NOT (digr <= 0.1) THEN 'digits' END) AS reject_reasons
            FROM m)
         SELECT doc_id, CAST(reject_reasons = '' AS BIGINT) AS keep, reject_reasons
         FROM r ORDER BY doc_id""",
    "q71_shard_stats" ->
      """SELECT CAST(((doc_id % 2147483648)*2654435761)%2147483647%16 AS BIGINT) AS shard,
           count(*) AS n_docs,
           CAST(sum(len(list_filter(string_split(text,' '), x -> x <> ''))) AS BIGINT) AS n_tokens,
           CAST(sum(n_chars) AS BIGINT) AS n_chars,
           CAST(min(doc_id) AS BIGINT) AS min_doc,
           CAST(max(doc_id) AS BIGINT) AS max_doc
         FROM documents GROUP BY 1 ORDER BY shard""",
    "q53_pii_scan" ->
      """SELECT doc_id,
           CAST(len(regexp_extract_all(text,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_email,
           CAST(len(regexp_extract_all(text,
             '\+?[0-9][0-9 ()-]{7,}[0-9]')) AS BIGINT) AS n_phone,
           CAST(len(regexp_extract_all(text, '[0-9]{6,}')) AS BIGINT) AS n_digit_run
         FROM documents ORDER BY doc_id""",
    "q56_train_split" ->
      """SELECT CASE WHEN ((doc_id % 2147483648) * 2654435761) % 2147483647 % 100 < 80 THEN 'train'
                   WHEN ((doc_id % 2147483648) * 2654435761) % 2147483647 % 100 < 90 THEN 'val'
                   ELSE 'test' END AS split,
           count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS n_chars
         FROM documents GROUP BY 1 ORDER BY split""",
    "q57_class_weights" ->
      """WITH c AS (SELECT lang, count(*) AS cnt FROM documents GROUP BY lang),
           t AS (SELECT CAST(sum(cnt) AS BIGINT) AS total,
                        count(*) AS k FROM c)
         SELECT lang, cnt,
           floor(1.0*total/(k*cnt)*10000)/10000 AS weight
         FROM c, t ORDER BY lang""",
    "q58_token_packing" ->
      """WITH d AS (SELECT doc_id,
              CAST(len(list_filter(string_split(text,' '), x -> x <> '')) AS BIGINT) AS n_tokens
            FROM documents),
           cum AS (SELECT doc_id, n_tokens,
              sum(n_tokens) OVER (ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tokens
            FROM d)
         SELECT CAST(floor((cum_tokens - 1) / 2000) AS BIGINT) AS shard,
           count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS n_tokens
         FROM cum GROUP BY 1 ORDER BY shard""",
    "q36_binary_meta" ->
      """SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
           md5(text) AS content_md5
         FROM documents ORDER BY doc_id""",
    "q61_stratified_sample" ->
      """SELECT lang, count(*) AS n_kept FROM documents
         WHERE ((doc_id % 2147483648) * 2654435761) % 2147483647 % 100
               < (CASE WHEN lang = 'en' THEN 40 ELSE 80 END)
         GROUP BY lang ORDER BY lang""",
    "q62_quality_deciles" ->
      """SELECT lang, CAST(decile AS BIGINT) AS decile, count(*) AS n,
           CAST(max(n_chars) AS BIGINT) AS max_chars,
           max(floor(pr * 10000) / 10000) AS max_pr
         FROM (SELECT lang, n_chars,
                 ntile(10) OVER (PARTITION BY lang
                   ORDER BY n_chars, doc_id) AS decile,
                 percent_rank() OVER (PARTITION BY lang
                   ORDER BY n_chars, doc_id) AS pr
               FROM documents) t
         GROUP BY lang, decile ORDER BY lang, decile""",
    // survivors = everything except non-representative cluster members;
    // clusters replicated via the same recursive-CTE reachability as q64
    "q66_dedup_survivors" ->
      """WITH RECURSIVE
         docs AS (SELECT doc_id,
              list_filter(string_split(text,' '), x -> x <> '') AS w
            FROM documents),
         sh AS (SELECT DISTINCT doc_id, s FROM (
            SELECT doc_id, unnest(CASE WHEN len(w) >= 3
              THEN list_transform(generate_series(1, len(w)-2),
                   i -> array_to_string(w[i:i+2], ' '))
              ELSE [array_to_string(w, ' ')] END) AS s
            FROM docs) t),
         sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         cm AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS c
            FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
            GROUP BY 1, 2),
         pairs AS (SELECT da, db
            FROM cm JOIN sizes sa ON da = sa.doc_id
                    JOIN sizes sb ON db = sb.doc_id
            WHERE floor(1.0*c/(sa.n + sb.n - c)*10000)/10000 >= 0.8),
         edges AS (SELECT da AS a, db AS b FROM pairs
                   UNION SELECT db, da FROM pairs),
         reach(a, b) AS (SELECT a, b FROM edges
                   UNION SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
         clusters AS (SELECT n.a AS doc_id, least(n.a, min(r.b)) AS cluster
            FROM (SELECT DISTINCT a FROM edges) n JOIN reach r ON r.a = n.a
            GROUP BY n.a)
         SELECT d.doc_id FROM documents d
         LEFT JOIN clusters c ON d.doc_id = c.doc_id
         WHERE c.cluster IS NULL OR c.cluster = d.doc_id
         ORDER BY d.doc_id""",
    // the q66 component chain re-ranked per cluster by (n_chars desc, id)
    "q121_survivors_best" ->
      """WITH RECURSIVE
         docs AS (SELECT doc_id,
              list_filter(string_split(text,' '), x -> x <> '') AS w
            FROM documents),
         sh AS (SELECT DISTINCT doc_id, s FROM (
            SELECT doc_id, unnest(CASE WHEN len(w) >= 3
              THEN list_transform(generate_series(1, len(w)-2),
                   i -> array_to_string(w[i:i+2], ' '))
              ELSE [array_to_string(w, ' ')] END) AS s
            FROM docs) t),
         sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         cm AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS c
            FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
            GROUP BY 1, 2),
         pairs AS (SELECT da, db
            FROM cm JOIN sizes sa ON da = sa.doc_id
                    JOIN sizes sb ON db = sb.doc_id
            WHERE floor(1.0*c/(sa.n + sb.n - c)*10000)/10000 >= 0.8),
         edges AS (SELECT da AS a, db AS b FROM pairs
                   UNION SELECT db, da FROM pairs),
         reach(a, b) AS (SELECT a, b FROM edges
                   UNION SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
         clusters AS (SELECT n.a AS doc_id, least(n.a, min(r.b)) AS cluster
            FROM (SELECT DISTINCT a FROM edges) n JOIN reach r ON r.a = n.a
            GROUP BY n.a),
         ranked AS (SELECT c.doc_id,
              row_number() OVER (PARTITION BY c.cluster
                ORDER BY d.n_chars DESC, c.doc_id) AS rn
            FROM clusters c JOIN documents d ON d.doc_id = c.doc_id)
         SELECT d.doc_id FROM documents d
         LEFT JOIN ranked r ON d.doc_id = r.doc_id
         WHERE r.rn IS NULL OR r.rn = 1
         ORDER BY d.doc_id""",
    "q67_repetition" ->
      """WITH docs AS (SELECT doc_id,
              list_filter(string_split(text,' '), x -> x <> '') AS w
            FROM documents),
         t AS (SELECT doc_id, len(w) AS nw, w,
              CASE WHEN len(w) >= 2
                THEN list_transform(generate_series(1, len(w)-1),
                     i -> w[i] || ' ' || w[i+1])
                ELSE CAST([] AS VARCHAR[]) END AS bg
            FROM docs)
         SELECT doc_id, CAST(nw AS BIGINT) AS n_words,
           CASE WHEN nw > 0
             THEN floor((1.0 - 1.0*len(list_distinct(w))/nw)*10000)/10000
             ELSE 0.0 END AS dup_word_frac,
           CASE WHEN len(bg) > 0
             THEN floor((1.0 - 1.0*len(list_distinct(bg))/len(bg))*10000)/10000
             ELSE 0.0 END AS dup_bigram_frac
         FROM t ORDER BY doc_id""",
    "q68_embed_quant" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                    FROM embeddings),
         s AS (SELECT vec_id, v,
              list_max(list_transform(v, x -> abs(x)))/127 AS scale FROM e),
         c AS (SELECT vec_id, v, scale,
              list_transform(v, x -> CAST(floor(x/scale + 0.5) AS BIGINT)) AS codes
            FROM s WHERE scale > 0)
         SELECT vec_id, round(scale, 6) AS scale_r,
           CAST(list_sum(codes) AS BIGINT) AS code_sum,
           round(list_sum(list_transform(generate_series(1, len(v)),
               i -> (v[i] - codes[i]*scale)*(v[i] - codes[i]*scale)))/len(v), 6)
             AS mse_r
         FROM c ORDER BY vec_id""",
    // bloom prefilter is exact-output (false positives removed by the
    // verify semi-join), so the oracle is plain exact decontamination
    "q75_contamination_bloom" ->
      """WITH docs AS (SELECT doc_id,
              list_filter(string_split(text,' '), x -> x <> '') AS w
            FROM documents),
         sh AS (SELECT DISTINCT doc_id, s FROM (
            SELECT doc_id, unnest(CASE WHEN len(w) >= 6
              THEN list_transform(generate_series(1, len(w)-5),
                   i -> array_to_string(w[i:i+5], ' '))
              ELSE [array_to_string(w, ' ')] END) AS s
            FROM docs) t),
         bench AS (SELECT DISTINCT s FROM sh WHERE doc_id % 20 = 0),
         corpus AS (SELECT doc_id, s FROM sh WHERE doc_id % 20 <> 0)
         SELECT doc_id, count(*) AS n_shared_ngrams
         FROM corpus WHERE s IN (SELECT s FROM bench)
         GROUP BY doc_id ORDER BY doc_id""",
    "q76_bm25" ->
      """WITH docs AS (SELECT doc_id,
              list_filter(string_split(text,' '), x -> x <> '') AS w
            FROM documents),
         stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs,
              avg(CAST(len(w) AS DOUBLE)) AS avgdl FROM docs),
         toks AS (SELECT doc_id, CAST(len(w) AS DOUBLE) AS dl,
              unnest(w) AS token FROM docs),
         tf AS (SELECT doc_id, token, CAST(count(*) AS DOUBLE) AS tf,
              max(dl) AS dl
            FROM toks WHERE token IN ('vector','stream','filter','spark')
            GROUP BY doc_id, token),
         dft AS (SELECT token, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY token)
         SELECT doc_id, CAST(count(*) AS BIGINT) AS n_terms,
           floor(sum(ln((n_docs - df + 0.5)/(df + 0.5) + 1.0) * tf * 2.2 /
             (tf + 1.2*(0.25 + 0.75*dl/avgdl)))*1000)/1000 AS bm25
         FROM tf JOIN dft USING (token), stats
         GROUP BY doc_id ORDER BY doc_id""",
    // exact-by-construction candidates (q29) -> the oracle is brute force
    "q77_semantic_dedup" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                    FROM embeddings),
         p AS (SELECT a.vec_id AS va, b.vec_id AS vb
               FROM e a JOIN e b ON a.vec_id < b.vec_id
               WHERE round(list_cosine_similarity(a.v, b.v), 4) >= 0.45)
         SELECT vb AS vec_id, min(va) AS dup_of,
           CAST(count(*) AS BIGINT) AS n_smaller_dups
         FROM p GROUP BY vb ORDER BY vec_id""",
    "q78_pii_redact" ->
      """WITH seeded AS (SELECT doc_id,
             CASE WHEN doc_id % 7 = 0 THEN text || ' contact u' || doc_id
                 || '@ex.org tel +1 (555) 010-'
                 || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                 || ' acct ' || CAST(doc_id*1000003 + 123456 AS VARCHAR)
               ELSE text END AS text
           FROM documents),
         s1 AS (SELECT doc_id, text, regexp_replace(text,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS r1
           FROM seeded),
         s2 AS (SELECT *, regexp_replace(r1,
             '\+?[0-9][0-9 ()-]{7,}[0-9]', '<PHONE>', 'g') AS r2 FROM s1),
         s3 AS (SELECT *, regexp_replace(r2, '[0-9]{6,}', '<ID>', 'g') AS r3 FROM s2)
         SELECT doc_id, r3 AS red_text,
           CAST(len(regexp_extract_all(text,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_email,
           CAST(len(regexp_extract_all(r1,
             '\+?[0-9][0-9 ()-]{7,}[0-9]')) AS BIGINT) AS n_phone,
           CAST(len(regexp_extract_all(r2, '[0-9]{6,}')) AS BIGINT) AS n_id
         FROM s3 ORDER BY doc_id""",
    "q79_tfidf_top" ->
      """WITH toks AS (SELECT doc_id,
              unnest(list_filter(string_split(text,' '), x -> x <> '')) AS term
            FROM documents),
         tf AS (SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf
            FROM toks GROUP BY 1, 2),
         df AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY 1),
         n AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents),
         s AS (SELECT doc_id, term, floor(tf*ln(n_docs/df)*1000)/1000 AS tfidf
            FROM tf JOIN df USING (term), n),
         r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
              ORDER BY tfidf DESC, term) AS rank FROM s)
         SELECT doc_id, CAST(rank AS BIGINT) AS rank, term, tfidf
         FROM r WHERE rank <= 3 ORDER BY doc_id, rank""",
    "q80_source_kl" ->
      """WITH toks AS (SELECT source,
              unnest(list_filter(string_split(text,' '), x -> x <> '')) AS token
            FROM documents),
         g AS (SELECT source, token, CAST(count(*) AS DOUBLE) AS c
            FROM toks GROUP BY 1, 2),
         gt AS (SELECT source, sum(c) AS gt FROM g GROUP BY 1),
         f AS (SELECT token, sum(c) AS f FROM g GROUP BY 1),
         ct AS (SELECT sum(f) AS ct FROM f)
         SELECT g.source, CAST(sum(c) AS BIGINT) AS n_tokens,
           floor(greatest(0.0, sum((c/gt)*ln((c/gt)/(f/ct))))*1000)/1000 AS kl
         FROM g JOIN gt USING (source) JOIN f USING (token), ct
         GROUP BY g.source ORDER BY source""",
    "q81_fixed_sample" ->
      """SELECT doc_id, lang, CAST(rn AS BIGINT) AS sample_rank FROM (
           SELECT doc_id, lang, row_number() OVER (PARTITION BY lang
             ORDER BY ((doc_id % 2147483648)*2654435761)%2147483647, doc_id) AS rn
           FROM documents) t
         WHERE rn <= 20 ORDER BY lang, sample_rank""",
    "q82_vocab_coverage" ->
      """WITH toks AS (SELECT
              unnest(list_filter(string_split(text,' '), x -> x <> '')) AS token
            FROM documents),
         v AS (SELECT token, count(*) AS freq FROM toks GROUP BY 1),
         t AS (SELECT CAST(sum(freq) AS DOUBLE) AS total FROM v),
         r AS (SELECT freq, row_number() OVER (ORDER BY freq DESC, token) AS rank
            FROM v),
         cum AS (SELECT rank, sum(freq) OVER (ORDER BY rank
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM r),
         c AS (SELECT unnest([5, 15, 30]) AS top_n)
         SELECT CAST(top_n AS BIGINT) AS top_n,
           CAST(max(cum) AS BIGINT) AS covered_tokens,
           floor(max(cum)/total*10000)/10000 AS covered_frac
         FROM cum JOIN c ON rank <= top_n, t
         GROUP BY top_n, total ORDER BY top_n""",
    "q83_label_outliers" ->
      """WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
            FROM embeddings),
         u AS (SELECT label, i, avg(v[i]) AS m
            FROM e, unnest(generate_series(1, len(v))) AS t(i)
            GROUP BY 1, 2),
         c AS (SELECT label, list(m ORDER BY i) AS cv FROM u GROUP BY 1),
         s AS (SELECT e.label, vec_id,
              round(list_cosine_similarity(v, cv), 4) AS cos_c
            FROM e JOIN c USING (label)),
         r AS (SELECT *, row_number() OVER (PARTITION BY label
              ORDER BY cos_c, vec_id) AS rn FROM s)
         SELECT CAST(label AS BIGINT) AS label, vec_id,
           CAST(rn AS BIGINT) AS rank, cos_c
         FROM r WHERE rn <= 5 ORDER BY label, rank""",
    "q84_ann_pq" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
            FROM embeddings),
         eu AS (SELECT vec_id, v, list_transform(v, x ->
              x / sqrt(list_sum(list_transform(v, y -> y*y)))) AS u FROM e),
         cb AS (SELECT c.vec_id AS cid, j, c.u[j*4+1 : j*4+4] AS cbv
            FROM eu c, unnest(generate_series(0, 15)) AS t(j)
            WHERE c.vec_id < 16),
         encd AS (SELECT eu.vec_id, cb.j, cb.cid,
              round(list_sum(list_transform(generate_series(1, 4),
                i -> (eu.u[cb.j*4+i] - cb.cbv[i]) * (eu.u[cb.j*4+i] - cb.cbv[i]))), 6) AS d2
            FROM eu, cb),
         enc AS (SELECT vec_id, j, cid FROM (
              SELECT *, row_number() OVER (PARTITION BY vec_id, j
                ORDER BY d2, cid) AS rn FROM encd) t WHERE rn = 1),
         q AS (SELECT vec_id AS q_id, v AS qv, u AS qu FROM eu WHERE vec_id < 5),
         lut AS (SELECT q_id, j, cid,
              round(list_sum(list_transform(generate_series(1, 4),
                i -> (qu[j*4+i] - cbv[i]) * (qu[j*4+i] - cbv[i]))), 6) AS d
            FROM q, cb),
         adc AS (SELECT q_id, vec_id, round(sum(d), 6) AS adc
            FROM enc JOIN lut USING (j, cid)
            WHERE vec_id <> q_id GROUP BY 1, 2),
         short AS (SELECT q_id, vec_id FROM (
              SELECT *, row_number() OVER (PARTITION BY q_id
                ORDER BY adc, vec_id) AS srn FROM adc) t WHERE srn <= 80),
         rr AS (SELECT s.q_id, s.vec_id,
              round(list_cosine_similarity(q.qv, e.v), 4) AS cos_sim
            FROM short s JOIN e USING (vec_id) JOIN q ON s.q_id = q.q_id),
         ranked AS (SELECT *, row_number() OVER (PARTITION BY q_id
              ORDER BY cos_sim DESC, vec_id) AS rn FROM rr)
         SELECT q_id, vec_id AS neighbor_id, CAST(rn AS BIGINT) AS rank, cos_sim
         FROM ranked WHERE rn <= 10 ORDER BY q_id, rank""",
    "q85_mixture_weights" ->
      """WITH c AS (SELECT source,
              CAST(sum(len(list_filter(string_split(text,' '), x -> x <> '')))
                AS BIGINT) AS n_tokens
            FROM documents GROUP BY 1),
         p AS (SELECT source, n_tokens,
              power(CAST(n_tokens AS DOUBLE), 0.5) AS p FROM c),
         t AS (SELECT sum(p) AS tp FROM p)
         SELECT source, n_tokens, floor(p/tp*10000)/10000 AS weight
         FROM p, t ORDER BY source""",
    "q86_boilerplate" ->
      """WITH docs AS (SELECT doc_id,
              list_filter(string_split(text,' '), x -> x <> '') AS w
            FROM documents),
         sh AS (SELECT DISTINCT doc_id, s FROM (
            SELECT doc_id, unnest(CASE WHEN len(w) >= 3
              THEN list_transform(generate_series(1, len(w)-2),
                   i -> array_to_string(w[i:i+2], ' '))
              ELSE [array_to_string(w, ' ')] END) AS s
            FROM docs) t),
         sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shingles
            FROM sh GROUP BY 1),
         common AS (SELECT s FROM sh GROUP BY s HAVING count(*) >= 20),
         b AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_boiler
            FROM sh WHERE s IN (SELECT s FROM common) GROUP BY 1)
         SELECT doc_id, n_shingles, coalesce(n_boiler, 0) AS n_boiler,
           floor(1.0*coalesce(n_boiler, 0)/n_shingles*10000)/10000 AS boiler_frac
         FROM sizes LEFT JOIN b USING (doc_id) ORDER BY doc_id""",
    "q87_source_overlap" ->
      """WITH docs AS (SELECT doc_id, source,
              list_filter(string_split(text,' '), x -> x <> '') AS w
            FROM documents),
         sh AS (SELECT DISTINCT source, s FROM (
            SELECT source, unnest(CASE WHEN len(w) >= 3
              THEN list_transform(generate_series(1, len(w)-2),
                   i -> array_to_string(w[i:i+2], ' '))
              ELSE [array_to_string(w, ' ')] END) AS s
            FROM docs) t)
         SELECT a.source AS source_a, b.source AS source_b,
           CAST(count(*) AS BIGINT) AS n_shared
         FROM sh a JOIN sh b ON a.s = b.s AND a.source < b.source
         GROUP BY 1, 2 ORDER BY source_a, source_b"""
  )
}
