package graft.operators

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.table.MergeTable

/** A persistent, incrementally-maintained IVF vector index — ANN as a
  * TABLE, not a job: centroids are trained ONCE (bounded-sample Lloyd,
  * the Faiss recipe) on the initial corpus and persisted; every later
  * batch of vectors is assigned to its nearest stored centroid in one
  * row-local broadcast pass and APPENDED — no retraining, no re-assign
  * of existing vectors, no full-corpus touch. At 100 TB this is the only
  * viable maintenance shape: ingest cost is O(delta · nlist) row-local
  * flops plus one table commit.
  *
  * Queries stay EXACT forever: [[Similarity.ivfExactRank]]'s two-phase
  * angular bound derives each cell's radius from the stored
  * member↔centroid similarities at query time, so drifted data (new
  * vectors far from any trained centroid) only WIDENS radii — the bound
  * loses pruning power, never correctness. Centroid staleness is a
  * performance dial, not a recall risk — the exactness proof at
  * ivfExactRank's doc applies verbatim because it never assumes centroid
  * optimality.
  *
  * The dial's maintenance action is [[recluster]] — the IVF analog of
  * merge-on-read compaction (the reference sets exactly such a
  * threshold for its delete-file debt, README.md:307; centroid-radius
  * debt is the same shape): retrain from a bounded fresh sample of the
  * CURRENT corpus, re-assign every vector in one row-local broadcast
  * pass (O(N·nlist) flops, one scan, no pairwise work), and publish the
  * new (centroids, vectors) PAIR as a new index GENERATION behind an
  * atomically-flipped `CURRENT` pointer. The pair must swap together —
  * mixing one generation's cells with another's centroids would break
  * the radius geometry the exactness bound is computed from — so the
  * generation directory, not the table version, is the swap unit.
  * Readers holding the previous generation keep a consistent pair
  * mid-swap (time travel across the swap = [[VectorIndex.open]] at an
  * explicit generation); superseded generations are retained until the
  * caller GCs them. Single-maintainer contract, like compaction:
  * ingest pauses for the swap (a batch appended to the old generation
  * after recluster's read would be silently absent from the new one —
  * [[addBatch]] guards by refusing stale-generation writes).
  *
  * Both members are engine tables: atomic commits, batchId-idempotent
  * replay (streaming-checkpoint safe), time travel (query the index AS
  * OF an ingest point by opening the tables at a version), change feed.
  *   - `centroids` — (cent_id, cv: array<double>), nlist rows, written
  *     once per generation
  *   - `vectors`   — (vec_id, v: array<double>, cell, csim): the
  *     assignment rows ivfExactRank consumes directly
  */
final class VectorIndex private[operators] (
    val root: String,
    val generation: Int,
    val centroids: MergeTable,
    val vectors: MergeTable,
    val nlist: Int) {

  private def centArr(spark: SparkSession): Array[(Int, Array[Double])] = {
    import spark.implicits._
    centroids.read(spark).select(col("cent_id"), col("cv"))
      .as[(Int, Array[Double])].collect().sortBy(_._1)
  }

  /** Assign `vecs` (vec_id, embedding) to their nearest stored centroid
    * and append to the index. Idempotent under `batchId` replay.
    * Refuses to write through a handle whose generation has been
    * superseded by [[recluster]] — the batch would land invisibly in an
    * abandoned generation; reopen (or use recluster's returned handle).
    */
  def addBatch(vecs: DataFrame, batchId: Option[String] = None): Unit = {
    val cur = VectorIndex.currentGeneration(root)
    require(cur == generation,
      s"stale index handle: generation $generation superseded by $cur " +
        s"(recluster happened); reopen VectorIndex at $root")
    val spark = vecs.sparkSession
    val assigned = Similarity.assignCells(Similarity.asDouble(vecs), centArr(spark))
    vectors.appendAll(assigned, batchId)
  }

  /** Exact top-k cosine neighbors for `queries` (vec_id, embedding) over
    * everything indexed so far — same output contract as
    * [[Similarity.ivfTopKExact]] / brute force (self-pairs excluded).
    */
  def query(queries: DataFrame, k: Int, nProbe: Int = 4): DataFrame = {
    val (assigned, q, qcell) = queryInputs(queries)
    Similarity.ivfExactRank(assigned, q, qcell, k, nProbe,
      col("vec_id") =!= col("q_id"), broadcastQueries = true)
      .select(col("q_id"), col("vec_id").as("neighbor_id"),
        col("rank").cast("long").as("rank"), col("cos_sim"))
  }

  private def queryInputs(queries: DataFrame)
      : (DataFrame, DataFrame, DataFrame) = {
    val spark = queries.sparkSession
    import spark.implicits._
    val cents = centArr(spark).toSeq.toDF("cent_id", "cv")
    val assigned = vectors.read(spark)
      .select(col("vec_id"), col("v"), col("cell"), col("csim"))
    val q = Similarity.asDouble(queries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    val qcell = q.crossJoin(broadcast(cents))
      .withColumn("qsim",
        graft.functions.GraftFunctions.cosineSim(spark, col("qv"), col("cv")))
      .select(col("q_id"), col("cent_id").as("cell"), col("qsim"))
    (assigned, q, qcell)
  }

  /** Measured pruning power of the index for this query batch: the
    * fraction of (query, corpus-vector) pairs the exact two-phase bound
    * actually scores (1.0 = degraded to brute force). Computed from
    * [[Similarity.ivfCandidateCells]] — the PRODUCTION candidate set,
    * not a replica — so the number is the real work saved. This is the
    * drift gauge: when it climbs toward 1, [[recluster]] restores it.
    */
  def scoredFraction(queries: DataFrame, k: Int, nProbe: Int = 4): Double = {
    val (assigned, q, qcell) = queryInputs(queries)
    val cand = Similarity.ivfCandidateCells(assigned, q, qcell, k, nProbe,
      col("vec_id") =!= col("q_id"), broadcastQueries = true)
    val cellSizes = assigned.groupBy(col("cell")).agg(count(lit(1)).as("sz"))
    // sum() over zero candidate rows is NULL — coalesce before the read
    // so an empty probe batch reports 0.0 instead of throwing
    val scored = cand.join(broadcast(cellSizes), Seq("cell"))
      .agg(coalesce(sum(col("sz")), lit(0L))).collect()(0).getLong(0)
    val n = vectors.read(queries.sparkSession).count()
    val nq = q.count()
    if (n == 0 || nq == 0) 0.0 else scored.toDouble / (n.toDouble * nq)
  }

  /** Retrain + re-assign + atomic swap; returns the handle for the new
    * generation (this handle stays readable as the pre-swap snapshot).
    * Cost: one bounded-sample Lloyd (≤ nlist·64 vectors on the driver,
    * constant in corpus size), one O(N·nlist)-flop row-local assignment
    * scan, two table creates — never any pairwise or shuffle work.
    */
  def recluster(spark: SparkSession, iters: Int = 3): VectorIndex = {
    import spark.implicits._
    val cur = VectorIndex.currentGeneration(root)
    require(cur == generation,
      s"stale index handle: generation $generation superseded by $cur")
    val corpus = vectors.read(spark).select(col("vec_id"),
      col("v").as("embedding"))
    val newCents = Similarity.trainCentroids(corpus, nlist, iters)
    val nextGen = generation + 1
    val dir = VectorIndex.genDir(root, nextGen)
    Files.createDirectories(Paths.get(dir))
    val cents = new MergeTable(s"$dir/centroids", VectorIndex.CentSchema,
      keyCol = "cent_id", partitionCol = None).create()
    cents.appendAll(newCents.toSeq.toDF("cent_id", "cv"),
      Some(s"retrain-g$nextGen"))
    val vecs = new MergeTable(s"$dir/vectors", VectorIndex.VecSchema,
      keyCol = "vec_id", partitionCol = None).create()
    vecs.appendAll(
      Similarity.assignCells(corpus.select(col("vec_id"),
        col("embedding").as("v")), newCents),
      Some(s"reassign-g$nextGen"))
    // the re-assign carried EVERY batch the old generation had applied,
    // so the old ledger must dedupe here too: without it, a streaming
    // checkpoint replay of a pre-swap epoch re-appends rows the new
    // generation already contains (AnnIngestStreamSpec pins this)
    vecs.inheritAppliedBatches(vectors.appliedBatchIds)
    VectorIndex.publishGeneration(root, nextGen)
    new VectorIndex(root, nextGen, cents, vecs, nlist)
  }

  /** Threshold-gated maintenance — the IVF analog of the table layer's
    * delete-file compaction threshold (the reference pins exactly such
    * a dial for its MoR debt, README.md:307): measure the scored
    * fraction on a caller-supplied probe workload and [[recluster]]
    * only when pruning has decayed past `maxScoredFraction`. Returns
    * the (possibly new) handle plus the measured fraction so callers
    * can log the decision. The probe should be a representative query
    * sample — its cost is one index query's candidate pass.
    */
  def maintain(spark: SparkSession, probeQueries: DataFrame, k: Int,
      maxScoredFraction: Double = 0.5, nProbe: Int = 4,
      iters: Int = 3): (VectorIndex, Double) = {
    val frac = scoredFraction(probeQueries, k, nProbe)
    if (frac > maxScoredFraction) (recluster(spark, iters), frac)
    else (this, frac)
  }

  /** Indexed corpus size — monitoring/spec hook. */
  def indexedVectors(spark: SparkSession): Long = vectors.read(spark).count()
}

object VectorIndex {
  private[operators] val CentSchema =
    StructType.fromDDL("cent_id INT, cv ARRAY<DOUBLE>")
  private[operators] val VecSchema =
    StructType.fromDDL("vec_id BIGINT, v ARRAY<DOUBLE>, cell INT, csim DOUBLE")

  /** Generation 0 is the legacy flat layout (root/centroids, root/
    * vectors — pre-recluster indexes keep working untouched); later
    * generations live under root/gen-NNNN.
    */
  private[operators] def genDir(root: String, gen: Int): String =
    if (gen == 0) root else f"$root/gen-$gen%04d"

  /** The published generation: contents of root/CURRENT, absent = 0. */
  def currentGeneration(root: String): Int = {
    val p = Paths.get(root, "CURRENT")
    if (Files.exists(p))
      new String(Files.readAllBytes(p), "UTF-8").trim.toInt
    else 0
  }

  /** Atomic pointer flip: write-temp + ATOMIC_MOVE, the same
    * last-writer-wins primitive the table layer commits through — a
    * reader sees either the old generation or the new, never a torn
    * pointer.
    */
  private[operators] def publishGeneration(root: String, gen: Int): Unit = {
    val tmp = Paths.get(root, s".CURRENT.tmp-$gen")
    Files.write(tmp, gen.toString.getBytes("UTF-8"))
    Files.move(tmp, Paths.get(root, "CURRENT"),
      StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    ()
  }

  /** Train on `initial` (vec_id, embedding), persist centroids, index the
    * initial batch. `nlist` is pinned in the centroids table itself.
    */
  def create(root: String, initial: DataFrame, nlist: Int = 16,
      iters: Int = 3): VectorIndex = {
    val spark = initial.sparkSession
    import spark.implicits._
    Files.createDirectories(Paths.get(root))
    val centArr = Similarity.trainCentroids(initial, nlist, iters)
    val cents = new MergeTable(s"$root/centroids", CentSchema,
      keyCol = "cent_id", partitionCol = None).create()
    cents.appendAll(centArr.toSeq.toDF("cent_id", "cv"), Some("train"))
    val vecs = new MergeTable(s"$root/vectors", VecSchema,
      keyCol = "vec_id", partitionCol = None).create()
    val idx = new VectorIndex(root, 0, cents, vecs, nlist)
    idx.addBatch(initial, Some("initial"))
    idx
  }

  /** Reopen the PUBLISHED generation (root/CURRENT, absent = the legacy
    * flat layout); nlist = the centroid count on record. Pass an
    * explicit `generation` to time-travel across a [[VectorIndex.recluster]]
    * swap — superseded generations stay consistent pairs on disk.
    */
  def open(root: String, generation: Option[Int] = None): VectorIndex = {
    val gen = generation.getOrElse(currentGeneration(root))
    val dir = genDir(root, gen)
    val cents = MergeTable.open(s"$dir/centroids")
    val vecs = MergeTable.open(s"$dir/vectors")
    val spark = SparkSession.active
    new VectorIndex(root, gen, cents, vecs, cents.read(spark).count().toInt)
  }
}
