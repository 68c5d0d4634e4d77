package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for named queries to plans/<tag>/<query>_<suffix>.txt
  * Usage: Test/runMain graft.PlanFile <sfDir> <tag> <suffix> <query...>
  */
object PlanFile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0); val tag = args(1); val suffix = args(2)
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-planfile")
      .config("spark.sql.extensions", "graft.sqlcat.GraftSqlExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(s"plans/$tag"))
    graft.operators.PlanCapture.enabled = true
    args.drop(3).foreach { q =>
      val df = SparkEntry.queries(q)(spark, sfDir)
      val captured = graft.operators.PlanCapture.drain()
        .find { case (label, _) => label.startsWith(q) }
      val plan = captured.map(_._2).getOrElse(
        df.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode))
      val extra = captured.map { case (l, _) => s"[pre-checkpoint capture: $l]\n\n" }.getOrElse("")
      Files.writeString(Paths.get(s"plans/$tag/${q}_$suffix.txt"), extra + plan)
      println(s"wrote plans/$tag/${q}_$suffix.txt")
    }
    spark.stop()
  }
}
