package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch drive: keep-rate of the curation gate on the 10x synth
  * replicas vs sf0.1 — reads the pipeline probe's flat exponent.
  */
object KeepRateCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .appName("keeprate")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (d <- Seq("/root/testdata/sf0.1", "/root/repo/tmp/sf1-synth")) {
      val docs = spark.read.parquet(s"$d/documents.parquet")
        .select(col("doc_id"), col("text"), col("lang"))
      val r = graft.operators.CorpusOps.curationReport(docs, 0.5,
        Seq("en", "de", "fr", "es", "ja"))
      val kept = r.filter(col("keep")).count()
      val all = r.count()
      println(s"[keeprate] $d kept=$kept / $all")
    }
    spark.stop()
  }
}
