package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.table.MergeTable

/** Bloom file-skip index: point-lookup data skipping on a non-key
  * column, where min/max range stats can't prune (high-cardinality
  * values interleaved across files).
  */
class BloomIndexSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("tag", StringType)))

  test("lookup scans only bloom-positive files; results equal the full " +
      "filter; post-build files conservatively included") {
    val root = Files.createTempDirectory("bloomspec").toString
    val t = new MergeTable(s"$root/t", schema, keyCol = "id",
      partitionCol = None).create()
    // three appends = three files with DISJOINT tag populations
    t.appendAll((0L until 100L).map(i => (i, s"a$i")).toDF("id", "tag"))
    t.appendAll((100L until 200L).map(i => (i, s"b$i")).toDF("id", "tag"))
    t.appendAll((200L until 300L).map(i => (i, s"c$i")).toDF("id", "tag"))
    t.buildBloomIndex(spark, "tag")
    val snap = t.read(spark) // force snapshot presence
    assert(snap.count() === 300L)

    def prunedCount(v: String): Int =
      t.bloomPrunedFilesFor(spark, "tag", v, t.currentSnapshot.get).size
    // a value present in exactly one file: other files' filters say no
    // (8192 bits / 500 positions set -> fp chance per file ~1e-9 here)
    assert(prunedCount("b142") === 1, "present value prunes to its file")
    assert(prunedCount("zz-absent") === 0, "absent value prunes everything")
    assert(t.lookupBloom(spark, "tag", "b142").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq === Seq((142L, "b142")))
    assert(t.lookupBloom(spark, "tag", "zz-absent").count() === 0L)

    // files appended AFTER the build have no entry -> scanned, correct
    t.appendAll(Seq((300L, "late300")).toDF("id", "tag"))
    assert(prunedCount("late300") === 1, "only the un-indexed file matches")
    assert(t.lookupBloom(spark, "tag", "late300").count() === 1L)
    // and a stale-index lookup of an OLD value still includes the new
    // (entry-less) file conservatively: 1 indexed match + 1 un-indexed
    assert(prunedCount("a7") === 2)
    assert(t.lookupBloom(spark, "tag", "a7").count() === 1L)
  }

  test("pending merge work falls back to the full filtered read " +
      "(merge semantics preserved)") {
    val root = Files.createTempDirectory("bloomspec2").toString
    val t = new MergeTable(s"$root/t", schema, keyCol = "id",
      partitionCol = None).create()
    t.applyBatch((0L until 50L).map(i => (i, s"t$i", "insert"))
      .toDF("id", "tag", "operation"))
    t.buildBloomIndex(spark, "tag")
    // an update makes requiresDedup true: lookupBloom must not serve a
    // pruned read over un-merged files
    t.applyBatch(Seq((7L, "t7-v2", "update")).toDF("id", "tag", "operation"))
    assert(t.lookupBloom(spark, "tag", "t7-v2").count() === 1L)
    assert(t.lookupBloom(spark, "tag", "t7").count() === 0L,
      "superseded row invisible")
  }
}
