package graft

import java.util.Base64
import org.apache.spark.sql.functions._
import graft.fixtures.GoldenCorpus
import graft.stream.CdcPipeline
import graft.table.MergeTable
import graft.transform.CdcTransformer

/** Predicate DML (P6 parity: the reference's UPDATE/DELETE ... WHERE
  * session, README.md:400–430) + the Firehose base64 contract (S2) +
  * snapshot metadata table.
  */
class DmlSpec extends SparkSpec {
  import spark.implicits._

  private def golden(): MergeTable = {
    val t = MergeTable.retailTrans(tmpDir("dml"))
    CdcPipeline.replayBatch(spark, GoldenCorpus.df(spark, GoldenCorpus.allLines), t)
    t
  }

  test("UPDATE ... WHERE mirrors the reference DML session") {
    val t = golden()
    // README.md:400-418 analog: bump amount for one key
    t.updateWhere(spark, $"trans_id" === 19, Map("amount" -> lit(1000)))
    val row = t.read(spark).filter($"trans_id" === 19).select($"amount").as[Int].collect()
    assert(row.toSeq === Seq(1000))
    assert(t.read(spark).count() === 12)

    // predicate over non-key columns
    t.updateWhere(spark, $"event" === "cart" && $"amount" < 65,
      Map("device" -> lit("kiosk")))
    val kiosks = t.read(spark).filter($"device" === "kiosk").count()
    assert(kiosks > 0)
  }

  test("UPDATE SET binds every RHS to the pre-update row (SET a=b, b=a swaps)") {
    val t = golden()
    val before = t.read(spark).filter($"trans_id" === 19)
      .select($"customer_id", $"device").collect().head
    // SQL UPDATE evaluates all assignments against the pre-image: this
    // must SWAP, not propagate one value into both columns
    t.updateWhere(spark, $"trans_id" === 19,
      Map("customer_id" -> $"device", "device" -> $"customer_id"))
    val after = t.read(spark).filter($"trans_id" === 19)
      .select($"customer_id", $"device").collect().head
    assert(after.getString(0) === before.getString(1))
    assert(after.getString(1) === before.getString(0))
    assert(after.getString(0) !== after.getString(1))
  }

  test("UPDATE ... WHERE rejects unknown columns") {
    val t = golden()
    intercept[IllegalArgumentException] {
      t.updateWhere(spark, $"trans_id" === 19, Map("no_such_col" -> lit(1)))
    }
  }

  test("UPDATE ... WHERE rejects merge-key reassignment") {
    val t = golden()
    intercept[IllegalArgumentException] {
      t.updateWhere(spark, $"trans_id" === 19, Map("trans_id" -> lit(999L)))
    }
    assert(t.read(spark).count() === 12)
  }

  test("DELETE ... WHERE removes matching rows only") {
    val t = golden()
    t.deleteWhere(spark, $"event" === "like")
    val left = t.read(spark)
    assert(left.filter($"event" === "like").count() === 0)
    assert(left.count() === 12 - 4) // keys 27,35,37,47 are 'like'
  }

  test("update moving rows across partitions via predicate DML") {
    val t = golden()
    t.updateWhere(spark, $"event" === "visit", Map("event" -> lit("purchase")))
    assert(t.read(spark).filter($"event" === "visit").count() === 0)
    assert(t.read(spark).count() === 12)
    t.compact(spark)
    assert(t.read(spark).count() === 12)
  }

  test("base64 Firehose contract: decode then transform (S2)") {
    val encoded = GoldenCorpus.insertOnlyLines
      .map(l => Base64.getEncoder.encodeToString(l.getBytes("UTF-8")))
      .toDF("data")
    val decoded = CdcTransformer.decodeBase64(encoded)
      .withColumnRenamed("data", "value")
    val res = CdcTransformer.transform(decoded)
    assert(res.good.count() === 10)
    assert(res.errors.count() === 0)
  }

  test("snapshots metadata table reflects history") {
    val t = golden()
    t.updateWhere(spark, $"trans_id" === 19, Map("amount" -> lit(5)))
    val snaps = t.snapshotsDf(spark).orderBy($"version").collect()
    assert(snaps.length === 2)
    assert(snaps.head.getLong(0) === 0L)
    assert(snaps.map(_.getAs[String]("op")).toSeq === Seq("merge", "merge"))
    assert(snaps.last.getAs[Boolean]("requires_dedup")) // after update
  }
}
