package graft.fixtures

import scala.io.Source
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The reference's deterministic CDC corpus
  * (src/utils/gen_fake_cdc_data.py:26–59), replayed verbatim from JSONL
  * resources — quirks preserved: the `" retail_trans"` leading-space
  * table-name (line :56) and the invalid hour-29 metadata timestamp (:58).
  *
  * Golden final state after applying both phases to an empty table:
  * 12 rows, keys {19,21,24,27,28,30,35,37,38,41,43,47}, updated amounts
  * 19→39, 21→60, 24→42, 30→67, 35→85 (SURVEY.md §5).
  */
object GoldenCorpus {

  private def load(name: String): Seq[String] = {
    val in = getClass.getResourceAsStream(s"/graft/$name")
    require(in != null, s"resource $name missing")
    try Source.fromInputStream(in, "UTF-8").getLines().toList
    finally in.close()
  }

  /** Phase 1: 10 inserts (gen_fake_cdc_data.py:26–38). */
  lazy val insertOnlyLines: Seq[String] = load("golden_cdc_insert_only.jsonl")

  /** Phase 2: 5 updates, 3 deletes, 5 inserts (gen_fake_cdc_data.py:40–59). */
  lazy val dmlLines: Seq[String] = load("golden_cdc_dml.jsonl")

  lazy val allLines: Seq[String] = insertOnlyLines ++ dmlLines

  def df(spark: SparkSession, lines: Seq[String]): DataFrame = {
    import spark.implicits._
    lines.toDF("value")
  }

  val goldenKeys: Set[Long] = Set(19L, 21L, 24L, 27L, 28L, 30L, 35L, 37L, 38L, 41L, 43L, 47L)
  val goldenAmounts: Map[Long, Int] = Map(
    19L -> 39, 21L -> 60, 24L -> 42, 30L -> 67, 35L -> 85,
    27L -> 1, 28L -> 1, 37L -> 1, 38L -> 1, 41L -> 5, 43L -> 1, 47L -> 1)
}
