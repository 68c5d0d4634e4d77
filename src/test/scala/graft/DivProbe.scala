package graft

import org.apache.spark.sql.SparkSession

/** Scratch: semantics of `div` on DECIMAL(38,0) operands (return type,
  * overflow behavior, negative truncation) — pins the arithmetic
  * contract for mannWhitney/logRank variance terms.
  */
object DivProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .appName("div-probe").config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val q = spark.sql(
      """SELECT CAST(6e36 AS DECIMAL(38,0)) div CAST(2.7e15 AS DECIMAL(38,0)) AS big,
                CAST(-7 AS DECIMAL(38,0)) div CAST(2 AS DECIMAL(38,0)) AS neg,
                CAST(25 AS DECIMAL(38,0)) div CAST(4 AS DECIMAL(38,0)) AS small""")
    q.printSchema()
    try q.show(false) catch { case e: Exception => println("ERR: " + e.getMessage.take(300)) }
    spark.stop()
  }
}
