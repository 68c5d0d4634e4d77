package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, TextAnalysis}

/** Scratch micro-profiler for hot queries (Test/runMain graft.PerfProbe). */
object PerfProbe {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[probe] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = Tables.fanout(Tables.documents(spark, sfDir))
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    time("warmup count")(docs.count())
    val sa = Dedup.shingleArrays(docs, 3)
    time("shingleArrays")(noop(sa))
    time("shingleArrays x2")(noop(sa))
    val withN = sa.withColumn("n_sh", size(col("sh")))
    val prefLen = (col("n_sh") - ceil(col("n_sh") * 0.8 - 1e-9) + 1).cast("int")
    val pref = withN.select(col("doc_id"), col("n_sh"),
      explode(slice(col("sh"), lit(1), prefLen)).as("s"))
    time("prefix explode")(noop(pref))
    val cands = pref.as("a").join(pref.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id")
          && col("a.n_sh") * 0.8 <= col("b.n_sh") + 1e-9
          && col("b.n_sh") * 0.8 <= col("a.n_sh") + 1e-9)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    time("candidates")(println("  cands=" + cands.count()))
    time("full q26")(noop(Dedup.ngramJaccardPairs(docs, 3, 0.8)))
    time("full q26 again")(noop(Dedup.ngramJaccardPairs(docs, 3, 0.8)))
    time("full q27 minhash")(noop(Dedup.minhashLshPairs(docs, 3, 16, 4, 0.8)))
    spark.stop()
  }
}
