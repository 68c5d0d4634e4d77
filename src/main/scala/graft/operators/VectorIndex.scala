package graft.operators

import java.nio.file.{Files, Paths}

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
  * performance dial (re-create the index to restore pruning), not a
  * recall risk — the exactness proof at ivfExactRank's doc applies
  * verbatim because it never assumes centroid optimality.
  *
  * Both members are engine tables: atomic commits, batchId-idempotent
  * replay (streaming-checkpoint safe), time travel (query the index AS
  * OF an ingest point by opening the tables at a version), change feed.
  *   - `centroids` — (cent_id, cv: array<double>), nlist rows, written
  *     once at create
  *   - `vectors`   — (vec_id, v: array<double>, cell, csim): the
  *     assignment rows ivfExactRank consumes directly
  */
final class VectorIndex private (
    val root: String,
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
    */
  def addBatch(vecs: DataFrame, batchId: Option[String] = None): Unit = {
    val spark = vecs.sparkSession
    val assigned = Similarity.assignCells(Similarity.asDouble(vecs), centArr(spark))
    vectors.appendAll(assigned, batchId)
  }

  /** Exact top-k cosine neighbors for `queries` (vec_id, embedding) over
    * everything indexed so far — same output contract as
    * [[Similarity.ivfTopKExact]] / brute force (self-pairs excluded).
    */
  def query(queries: DataFrame, k: Int, nProbe: Int = 4): DataFrame = {
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
    Similarity.ivfExactRank(assigned, q, qcell, k, nProbe,
      col("vec_id") =!= col("q_id"), broadcastQueries = true)
      .select(col("q_id"), col("vec_id").as("neighbor_id"),
        col("rank").cast("long").as("rank"), col("cos_sim"))
  }

  /** Indexed corpus size — monitoring/spec hook. */
  def indexedVectors(spark: SparkSession): Long = vectors.read(spark).count()
}

object VectorIndex {
  private val CentSchema = StructType.fromDDL("cent_id INT, cv ARRAY<DOUBLE>")
  private val VecSchema =
    StructType.fromDDL("vec_id BIGINT, v ARRAY<DOUBLE>, cell INT, csim DOUBLE")

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
    val idx = new VectorIndex(root, cents, vecs, nlist)
    idx.addBatch(initial, Some("initial"))
    idx
  }

  /** Reopen from disk; nlist = the centroid count on record. */
  def open(root: String): VectorIndex = {
    val cents = MergeTable.open(s"$root/centroids")
    val vecs = MergeTable.open(s"$root/vectors")
    val spark = SparkSession.active
    new VectorIndex(root, cents, vecs, cents.read(spark).count().toInt)
  }
}
