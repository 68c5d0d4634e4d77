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

  /** Rewrite a golden line's data payload with extra drifted fields. */
  private def drifted(line: String, extraJson: String): String =
    line.replaceFirst("\\{\"data\": \\{", s"""{"data": {$extraJson, """)

  test("CDC schema drift: new payload fields evolve the table, typed") {
    val root = tmpDir("drift")
    val t0 = MergeTable.retailTrans(root)
    // batch 1: pristine corpus — no drift, schema unchanged
    val t1 = CdcPipeline.replayBatch(spark,
      GoldenCorpus.df(spark, GoldenCorpus.insertOnlyLines), t0,
      batchId = Some("p1"), evolve = true)
    assert(t1.schema.fieldNames.toSeq ===
      t0.schema.fieldNames.toSeq, "no drift must mean no evolution")

    // batch 2: the upstream added coupon (long), loyal (boolean), disc (double)
    val driftedLines = GoldenCorpus.dmlLines.map(l =>
      drifted(l, """"coupon": 7, "loyal": true, "disc": 0.25"""))
    val t2 = CdcPipeline.replayBatch(spark,
      GoldenCorpus.df(spark, driftedLines), t1,
      batchId = Some("p2"), evolve = true)

    val bySchema = t2.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(bySchema("coupon") === org.apache.spark.sql.types.LongType)
    assert(bySchema("loyal") === org.apache.spark.sql.types.BooleanType)
    assert(bySchema("disc") === org.apache.spark.sql.types.DoubleType)

    val r = t2.read(spark)
    assert(r.count() === 12)
    // rows from the drifted batch carry values; pre-drift rows read null
    assert(r.filter($"coupon" === 7).count() > 0)
    assert(r.filter($"coupon".isNull).count() > 0)
    assert(r.filter($"loyal" === true && $"disc" === 0.25).count() ===
      r.filter($"coupon" === 7).count())

    // replay idempotence survives evolution: same batchId is a no-op
    val before = t2.latestVersion
    CdcPipeline.replayBatch(spark, GoldenCorpus.df(spark, driftedLines), t2,
      batchId = Some("p2"), evolve = true)
    assert(t2.latestVersion === before)

    // a reopened handle (fresh reader) sees the evolved schema + values
    val rr = MergeTable.open(root).read(spark)
    assert(rr.filter($"coupon" === 7).count() === r.filter($"coupon" === 7).count())
  }

  test("pipeline restart on an evolved table keeps evolved columns") {
    // regression: start() used to re-construct the handle from the BASE
    // schema; the first post-restart addColumn then rewrote _table.meta
    // from it, silently dropping previously evolved columns
    val base = tmpDir("drift-restart")
    val root = s"$base/table"
    val landing = s"$base/landing"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(landing))
    val t0 = MergeTable.retailTrans(root)
    CdcPipeline.replayBatch(spark,
      GoldenCorpus.df(spark, GoldenCorpus.insertOnlyLines.map(l =>
        drifted(l, """"coupon": 7"""))), t0,
      batchId = Some("p1"), evolve = true)
    assert(MergeTable.open(root).schema.fieldNames.contains("coupon"))

    // "restart": a fresh pipeline over the same table root; the landing
    // batch drifts a SECOND new field
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(landing, "b2.jsonl"),
      GoldenCorpus.dmlLines.map(l => drifted(l, """"loyal": true"""))
        .mkString("", "\n", "\n"))
    val q = CdcPipeline.start(spark, CdcPipeline.Config(
      landingDir = landing, tableRoot = root,
      errorRoot = s"$base/errors", checkpointDir = s"$base/ck",
      evolveSchema = true))
    q.processAllAvailable(); q.stop()

    val cols = MergeTable.open(root).schema.fieldNames.toSet
    assert(cols.contains("coupon"), s"pre-restart drift column lost: $cols")
    assert(cols.contains("loyal"), s"post-restart drift column missing: $cols")
    val r = MergeTable.open(root).read(spark)
    assert(r.filter($"coupon" === 7).count() > 0)
    assert(r.filter($"loyal" === true).count() > 0)
  }

  test("restart with evolveSchema=false on an evolved table still applies") {
    // regression: extras were computed only under the evolveSchema flag, so
    // a restart with the DEFAULT config on a previously evolved table
    // emitted batches missing the evolved columns and every micro-batch
    // failed analysis in applyBatch's payload select
    val base = tmpDir("drift-off")
    val root = s"$base/table"
    val landing = s"$base/landing"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(landing))
    val t0 = MergeTable.retailTrans(root)
    CdcPipeline.replayBatch(spark,
      GoldenCorpus.df(spark, GoldenCorpus.insertOnlyLines.map(l =>
        drifted(l, """"coupon": 7"""))), t0,
      batchId = Some("p1"), evolve = true)
    assert(MergeTable.open(root).schema.fieldNames.contains("coupon"))

    // restart WITHOUT the flag; the batch carries no drift fields
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(landing, "b2.jsonl"),
      GoldenCorpus.dmlLines.mkString("", "\n", "\n"))
    val q = CdcPipeline.start(spark, CdcPipeline.Config(
      landingDir = landing, tableRoot = root,
      errorRoot = s"$base/errors", checkpointDir = s"$base/ck"))
    q.processAllAvailable(); q.stop()

    val r = MergeTable.open(root).read(spark)
    assert(r.count() === 12) // 10 seed inserts - 3 deletes + 5 inserts
    assert(r.filter($"coupon" === 7).count() > 0) // evolved data survived
  }
}
