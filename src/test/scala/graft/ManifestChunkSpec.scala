package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import graft.model.Schemas
import graft.table.{MergeTable, Snapshot}

/** Chunked manifests (VERDICT r2 item 5): commit manifest I/O must be
  * O(changed entries + chunk refs), not O(total table files).
  */
class ManifestChunkSpec extends SparkSpec {

  private def newTable(): MergeTable =
    new MergeTable(tmpDir("chunks") + "/t", Schemas.LakeTableSchema,
      "trans_id", None).create()

  private def manifestDir(t: MergeTable) = Paths.get(t.root, "manifest")

  private def size(t: MergeTable, name: String): Long =
    Files.size(manifestDir(t).resolve(name))

  private def mkSnap(v: Long, files: Vector[String], batches: Set[String]) =
    Snapshot(v, files, Vector.empty, batches, requiresDedup = false,
      files.map(_ -> (0L, 100L)).toMap)

  test("a 10k-file table pays O(delta) manifest bytes per commit, not O(files)") {
    val t = newTable()
    val base = (0 until 10000).map(i => f"f0-$i%05d.parquet").toVector
    t.writeManifest(mkSnap(0, base, Set("b0")))
    val v0Bytes = size(t, "v0.manifest") +
      t.chunkRefsOf(0).map(size(t, _)).sum
    assert(v0Bytes > 100000, s"baseline should be big, got $v0Bytes")

    // commit #1: +10 files, +1 batch id — the only new manifest bytes are
    // the new chunk (delta) and the tiny ref list
    val more = (0 until 10).map(i => s"f1-$i.parquet").toVector
    t.writeManifest(mkSnap(1, base ++ more, Set("b0", "b1")))
    val newChunks = t.chunkRefsOf(1).toSet -- t.chunkRefsOf(0).toSet
    val commitBytes = size(t, "v1.manifest") + newChunks.toSeq.map(size(t, _)).sum
    assert(commitBytes < v0Bytes / 50,
      s"commit wrote $commitBytes bytes vs $v0Bytes table manifest")

    // round trip: spliced chunks reproduce the snapshot exactly
    val back = t.readManifest(1)
    assert(back.dataFiles.toSet == (base ++ more).toSet)
    assert(back.appliedBatches == Set("b0", "b1"))
    assert(back.fileStats.size == 10010 && back.fileStats("f1-3.parquet") == (0L, 100L))
  }

  test("chunk refs stay bounded across many commits (fold at the cap)") {
    val t = newTable()
    var files = Vector.empty[String]
    (0 until 150).foreach { v =>
      files = files :+ s"f$v-x.parquet"
      t.writeManifest(mkSnap(v, files, (0 to v).map(i => s"b$i").toSet))
      assert(t.chunkRefsOf(v).size <= 64, s"v$v refs=${t.chunkRefsOf(v).size}")
    }
    assert(t.readManifest(149).dataFiles.size == 150)
  }

  test("real commits: incremental manifest writes, expire drops orphan chunks") {
    import spark.implicits._
    import org.apache.spark.sql.functions.lit
    val t = newTable()
    (0 until 25).foreach { i =>
      val df = Seq((i.toLong, s"c$i", "visit", s"S$i", i, "pc",
          java.sql.Timestamp.valueOf("2023-01-16 06:00:00")))
        .toDF("trans_id", "customer_id", "event", "sku", "amount", "device",
          "trans_datetime")
      t.appendAll(df, Some(s"b$i"))
    }
    assert(t.read(spark).count() == 25)
    val last = t.latestVersion
    val newChunks = t.chunkRefsOf(last).toSet -- t.chunkRefsOf(last - 1).toSet
    val lastBytes = size(t, s"v$last.manifest") + newChunks.toSeq.map(size(t, _)).sum
    val totalBytes = Files.list(manifestDir(t)).iterator().asScala
      .map(p => Files.size(p)).sum
    assert(lastBytes * 5 < totalBytes,
      s"last commit $lastBytes bytes vs $totalBytes total manifest bytes")

    // reuse keeps old chunks live in new snapshots — orphans only appear
    // once a rewrite (compact) supersedes them AND their manifests expire
    val chunksBefore = Files.list(manifestDir(t)).iterator().asScala
      .count(_.getFileName.toString.startsWith("chunk-"))
    assert(chunksBefore >= 25)
    t.compact(spark)
    t.expireSnapshots(keepLast = 1)
    val chunksAfter = Files.list(manifestDir(t)).iterator().asScala
      .count(_.getFileName.toString.startsWith("chunk-"))
    assert(chunksAfter <= 2, s"expected orphan chunks gone, have $chunksAfter")
    val live = t.chunkRefsOf(t.latestVersion).toSet
    assert(live.forall(c => Files.exists(manifestDir(t).resolve(c))))
    assert(t.read(spark).count() == 25)
  }
}
