package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch micro-profiler (Test/runMain graft.PerfProbe [sfDir] [query...]):
  * times each named SparkEntry query twice (cold + warm) through the noop
  * sink; with no query args, runs a fixed dedup-stage breakdown.
  */
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

    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val queries = args.drop(1)
    if (queries.nonEmpty) {
      queries.foreach { q =>
        val fn = SparkEntry.queries(q)
        time(s"$q cold")(noop(fn(spark, sfDir)))
        time(s"$q warm")(noop(fn(spark, sfDir)))
      }
    } else {
      import graft.operators.Dedup
      val docs = Tables.fanout(Tables.documents(spark, sfDir))
      time("warmup count")(docs.count())
      val sa = Dedup.shingleArrays(docs, 3)
      time("shingleArrays")(noop(sa))
      time("shingleArrays x2")(noop(sa))
      time("full q26")(noop(Dedup.ngramJaccardPairs(docs, 3, 0.8)))
      time("full q27 minhash")(noop(Dedup.minhashLshPairs(docs, 3, 16, 4, 0.8)))
      time("full q28 simhash")(noop(Dedup.simhashPairs(docs, 10)))
    }
    spark.stop()
  }
}
