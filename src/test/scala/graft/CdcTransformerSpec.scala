package graft

import org.apache.spark.sql.functions._
import graft.fixtures.GoldenCorpus
import graft.transform.CdcTransformer

class CdcTransformerSpec extends SparkSpec {
  import spark.implicits._

  test("golden corpus: all 23 records route to good, quirks included") {
    val res = CdcTransformer.transform(GoldenCorpus.df(spark, GoldenCorpus.allLines))
    assert(res.good.count() === 23)
    assert(res.errors.count() === 0)

    // leading-space " retail_trans" (trans_id=41) is trimmed, not rejected
    assert(res.good.filter($"trans_id" === 41).count() === 1)
    // hour-29 metadata timestamp (trans_id=47) nulls src_timestamp, keeps row
    val r47 = res.good.filter($"trans_id" === 47)
      .select($"src_timestamp", $"trans_datetime").collect().head
    assert(r47.isNullAt(0))
    assert(!r47.isNullAt(1)) // payload event time is valid
  }

  test("operation breakdown matches the corpus") {
    val res = CdcTransformer.transform(GoldenCorpus.df(spark, GoldenCorpus.dmlLines))
    val byOp = res.good.groupBy($"operation").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byOp === Map("update" -> 5L, "delete" -> 3L, "insert" -> 5L))
  }

  test("malformed / non-data / non-DML / unselected records go to errors") {
    val ok = GoldenCorpus.insertOnlyLines.head
    val bad = Seq(
      "not json at all {",
      """{"data": null, "metadata": {"operation": "insert", "record-type": "data"}}""",
      ok.replace("\"record-type\": \"data\"", "\"record-type\": \"control\""),
      ok.replace("\"operation\": \"insert\"", "\"operation\": \"load\""),
      ok.replace("\"table-name\": \"retail_trans\"", "\"table-name\": \"other_table\""))
    val res = CdcTransformer.transform((Seq(ok) ++ bad).toDF("value"))
    assert(res.good.count() === 1)
    val types = res.errors.select($"error_type").as[String].collect().sorted
    assert(types === Array("malformed_json", "missing_required_field",
      "non_data_record", "unselected_table", "unsupported_operation"))
  }

  test("good schema carries routing metadata (P4)") {
    val res = CdcTransformer.transform(GoldenCorpus.df(spark, GoldenCorpus.insertOnlyLines))
    val row = res.good.select($"dest_db", $"dest_table", $"operation").collect().head
    assert(row.getString(0) === "cdc_iceberg_demo_db")
    assert(row.getString(1) === "retail_trans_iceberg")
    assert(row.getString(2) === "insert")
  }

  test("error sink writes year/month/day/hour/error_type partitions") {
    val dir = tmpDir("err")
    val res = CdcTransformer.transform(Seq("not json {").toDF("value"))
    CdcTransformer.writeErrors(res.errors, dir)
    val back = spark.read.parquet(dir)
    assert(back.count() === 1)
    assert(back.columns.toSet ===
      Set("raw", "year", "month", "day", "hour", "error_type"))
  }
}
