package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe for the PipelineCrashSpec fixture: prints the engine's
  * n-gram Jaccard for each planted pair and whether LSH banding at the
  * index parameters actually recalls them (deterministic given texts).
  */
object PipeProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .appName("pipe-probe")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val good = "the quick brown fox jumps over the lazy dog and runs " +
      "through the forest with great speed while birds sing songs above"
    val dup = good + " today"
    val dup2 = good + " again"
    val straddler = good + " while the gentle evening wind blows"
    val docB = "a small village near the river holds a market every " +
      "sunday where farmers sell fresh bread cheese and honey to visitors"
    val fresh = "in the morning the old man walks down to the harbor and " +
      "watches the boats come in with their catch of fish and crab"

    val docs = Seq((1L, good), (5L, dup), (10L, dup2), (11L, straddler),
      (6L, docB), (12L, fresh)).toDF("doc_id", "text")
    // engine Jaccard on all pairs vs doc 1
    val pairs = graft.operators.Dedup.ngramJaccardPairs(docs, 3, 0.0)
    pairs.orderBy("doc_a", "doc_b").collect().foreach(r =>
      println(s"J(${r.getLong(0)},${r.getLong(1)}) = ${r.getDouble(2)}"))
    // LSH recall at dedup params (k=16, bands=4) and split params (k=16, bands=8)
    for (nb <- Seq(4, 8)) {
      val sh = graft.operators.Dedup.shingleArrays(docs, 3)
      val b = graft.operators.Dedup.minhashBuckets(sh, 16, nb)
      val c = b.as("x").join(b.as("y"),
          col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
          col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id"), col("y.doc_id")).distinct()
      println(s"bands=$nb candidates: " + c.collect()
        .map(r => s"(${r.getLong(0)},${r.getLong(1)})").sorted.mkString(" "))
    }
    // curation gates on each doc
    val rep = graft.operators.CorpusOps.curationReport(
      docs.withColumn("lang", lit("en")))
    rep.orderBy("doc_id").collect().foreach(println)
    spark.stop()
  }
}
