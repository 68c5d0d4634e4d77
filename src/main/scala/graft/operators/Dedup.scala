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
  def ngramJaccardPairs(df: DataFrame, n: Int = 3, threshold: Double = 0.8): DataFrame = {
    // persist the shingle index: it feeds candidate generation (both join
    // sides) and verification (both sides) — materializing once replaces 4
    // recomputations, and the cache boundary also pins Catalyst's inferred
    // not-null constraints ABOVE it (otherwise constraint propagation
    // substitutes the whole shingle expression into a pre-repartition
    // filter and re-evaluates it per row on the unsplit scan; measured 8×
    // on the local corpus). At 100 TB this is the operator's working set —
    // exactly what you'd persist or checkpoint before a multi-pass join.
    val docs = shingleArrays(df, n).withColumn("n_sh", size(col("sh")))
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
    verifyJaccard(cands, docs, threshold)
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
    val pairs = ngramJaccardPairs(df, n, threshold).select(col("doc_a"), col("doc_b"))
    val edges = pairs
      .union(pairs.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var labels = edges.select(col("doc_a").as("doc_id")).distinct()
      .withColumn("label", col("doc_id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var converged = false
    var i = 0
    while (!converged && i < maxIters) {
      val nbrMin = edges
        .join(labels.select(col("doc_id").as("doc_b"), col("label").as("nl")), "doc_b")
        .groupBy(col("doc_a")).agg(min(col("nl")).as("mn"))
      // the old label rides along so the convergence probe is a filter on
      // this frame, not an extra join; each round's frame is persisted and
      // the superseded one dropped — the loop holds two label sets, ever
      val next = labels.withColumnRenamed("label", "old")
        .join(nbrMin.withColumnRenamed("doc_a", "doc_id"), Seq("doc_id"), "left")
        .select(col("doc_id"),
          least(col("old"), coalesce(col("mn"), col("old"))).as("label"),
          col("old"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // full count, not limit(1): the probe doubles as the materializer
      // that fills next's cache end-to-end, making the unpersist of the
      // previous round safe (a partial materialization would cascade
      // recomputes up the unpersisted chain)
      val changed = next.filter(col("label") =!= col("old")).count()
      labels.unpersist(blocking = false)
      labels = next.select(col("doc_id"), col("label"))
      converged = changed == 0L
      i += 1
    }
    edges.unpersist(blocking = false)
    labels.select(col("doc_id"), col("label").as("cluster"))
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
    val rows = k / bands
    // persisted for the same reasons as in ngramJaccardPairs: signature
    // build + two verification joins all read the shingle index
    val docs = shingleArrays(df, n)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val sigCols = (0 until k).map(i =>
      array_min(transform(col("sh"), s => xxhash64(lit(i), s))).as(s"h$i"))
    val sig = docs.select(col("doc_id") +: sigCols: _*)

    val bandStructs = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        xxhash64((b * rows until (b + 1) * rows).map(i => col(s"h$i")): _*).as("bkey"))
    }
    val buckets = sig.select(col("doc_id"), explode(array(bandStructs: _*)).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bkey").as("bkey"))

    val cands = buckets.as("a").join(buckets.as("b"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey")
          && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()

    verifyJaccard(cands, docs, threshold)
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

  /** Embedding-cosine near-duplicates, exact, as a block-nested-loop self
    * join: vectors are packed into id-ranged blocks (one flat primitive
    * array per block), block pairs are joined and each pair compared in a
    * tight JVM loop. Exactly the plan you want at scale — work is spread
    * over (n/blockSize)²/2 independent block-pair tasks, memory per task is
    * two blocks, and the inner loop is allocation-free (the naive
    * row-pair `zip_with` formulation is ~30× slower: higher-order
    * expressions don't codegen and allocate per pair).
    * Similarity.lshTopK remains the sub-quadratic approximate path.
    */
  def embeddingNearDups(emb: DataFrame, threshold: Double,
      blockSize: Int = 256): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._

    val packed = emb.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
      .groupByKey { case (id, _) => (id / blockSize).toInt }
      .mapGroups { (block: Int, it: Iterator[(Long, Array[Float])]) =>
        val rows = it.toArray.sortBy(_._1)
        val n = rows.length
        val dim = if (n == 0) 0 else rows.head._2.length
        val ids = new Array[Long](n)
        val flat = new Array[Double](n * dim)
        val norms = new Array[Double](n)
        var i = 0
        while (i < n) {
          ids(i) = rows(i)._1
          val v = rows(i)._2
          var k = 0
          var sq = 0.0
          while (k < dim) {
            val x = v(k).toDouble
            flat(i * dim + k) = x
            sq += x * x
            k += 1
          }
          norms(i) = math.sqrt(sq)
          i += 1
        }
        (block, dim, ids, flat, norms)
      }
      .toDF("block", "dim", "ids", "flat", "norms")

    val pairs = packed.as("a").join(packed.as("b"),
        col("a.block") <= col("b.block"))
      .select(
        (col("a.block") === col("b.block")).as("same"),
        col("a.dim").as("dim"),
        col("a.ids").as("aIds"), col("a.flat").as("aFlat"), col("a.norms").as("aNorms"),
        col("b.ids").as("bIds"), col("b.flat").as("bFlat"), col("b.norms").as("bNorms"))
      // spread block pairs across tasks (the block join itself is tiny)
      .repartition(col("aIds"), col("bIds"))

    val preFilter = threshold - 1e-4 // cheap bound; exact round only near it
    pairs.flatMap { row =>
      val same = row.getBoolean(0)
      val dim = row.getInt(1)
      val aIds = row.getSeq[Long](2).toArray
      val aFlat = row.getSeq[Double](3).toArray
      val aNorms = row.getSeq[Double](4).toArray
      val bIds = row.getSeq[Long](5).toArray
      val bFlat = row.getSeq[Double](6).toArray
      val bNorms = row.getSeq[Double](7).toArray
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
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
            if (q >= threshold) out += ((aIds(i), bIds(j), q))
          }
          j += 1
        }
        i += 1
      }
      out
    }.toDF("vec_a", "vec_b", "cos_sim")
  }
}
