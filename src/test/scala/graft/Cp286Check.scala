package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object Cp286Check {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .appName("cp286").config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    println("types=" + ev.select("event_type").distinct().count())
    val out = graft.operators.Inference.changepoint(ev, "event_type", "ts")
    out.show(20, false)
    spark.stop()
  }
}
