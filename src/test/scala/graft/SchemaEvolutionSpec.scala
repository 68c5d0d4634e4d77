package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StringType, StructField}
import graft.fixtures.GoldenCorpus
import graft.stream.CdcPipeline
import graft.table.MergeTable

class SchemaEvolutionSpec extends SparkSpec {
  import spark.implicits._

  test("addColumn: old rows null, new writes carry it, compaction preserves") {
    val root = tmpDir("evolve")
    val t0 = MergeTable.retailTrans(root)
    CdcPipeline.replayBatch(spark, GoldenCorpus.df(spark, GoldenCorpus.allLines), t0)

    val t1 = t0.addColumn(StructField("note", StringType, nullable = true))
    assert(t1.schema.fieldNames.contains("note"))
    val afterAdd = t1.read(spark)
    assert(afterAdd.count() === 12)
    assert(afterAdd.filter($"note".isNull).count() === 12)

    // new write carries the column through the merge path
    t1.updateWhere(spark, $"trans_id" === 19, Map("note" -> lit("vip")))
    val r = t1.read(spark)
    assert(r.filter($"note" === "vip").select($"trans_id").as[Long].collect().toSeq === Seq(19L))
    assert(r.filter($"note".isNull).count() === 11)

    t1.compact(spark)
    val r2 = t1.read(spark)
    assert(r2.count() === 12)
    assert(r2.filter($"note" === "vip").count() === 1)

    // reopened handle sees the evolved schema
    assert(MergeTable.open(root).schema.fieldNames.contains("note"))
  }

  test("dropColumn: column disappears from reads, key/partition protected") {
    val root = tmpDir("evolve2")
    val t0 = MergeTable.retailTrans(root)
    CdcPipeline.replayBatch(spark, GoldenCorpus.df(spark, GoldenCorpus.allLines), t0)

    val t1 = t0.dropColumn("device")
    assert(!t1.read(spark).columns.contains("device"))
    assert(t1.read(spark).count() === 12)

    intercept[IllegalArgumentException](t1.dropColumn("trans_id"))
    intercept[IllegalArgumentException](t1.dropColumn("event"))
  }

  test("added int column participates in merges and time travel") {
    val root = tmpDir("evolve3")
    val t0 = MergeTable.retailTrans(root)
    CdcPipeline.replayBatch(spark, GoldenCorpus.df(spark, GoldenCorpus.allLines), t0)
    val v0 = t0.latestVersion
    val t1 = t0.addColumn(StructField("score", IntegerType, nullable = true))
    t1.updateWhere(spark, $"trans_id" === 21, Map("score" -> lit(99)))
    assert(t1.read(spark).filter($"score" === 99).count() === 1)
    // time travel to before the evolution still works (old snapshot, new schema view)
    assert(t1.read(spark, Some(v0)).count() === 12)
  }
}
