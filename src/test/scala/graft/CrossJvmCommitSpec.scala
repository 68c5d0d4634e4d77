package graft

import java.sql.Timestamp
import java.util.concurrent.TimeUnit

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.table.MergeTable

/** The commit contract across PROCESS boundaries: the in-process specs
  * (ConcurrentCommitSpec) exercise the JVM-wide monitor; this one runs a
  * second driver JVM ([[CommitWorker]]) against the same table root, so
  * the only thing serializing the two committers is the OS `FileLock` on
  * `_commit.lock` — the multi-driver deployment story, tested for real.
  */
class CrossJvmCommitSpec extends SparkSpec {
  import spark.implicits._

  private def parentBatch(i: Int) =
    Seq((1000L + i, "list", 100 + i, "insert",
        Timestamp.valueOf(f"2023-01-01 00:00:${i % 60}%02d"), 1000L + i))
      .toDF("trans_id", "event", "amount", "operation",
        "src_timestamp", "transaction_id")
      .withColumn("customer_id", lit("w1"))
      .withColumn("sku", lit("s"))
      .withColumn("device", lit("pc"))
      .withColumn("trans_datetime",
        lit(Timestamp.valueOf("2023-01-16 06:00:00")))

  test("two driver JVMs commit concurrently: OS file lock serializes, nothing lost") {
    val root = tmpDir("xjvm") + "/t"
    MergeTable.retailTrans(root, threshold = 100)

    // mirror build.sbt's forked-JVM setup: same classpath, same JDK17
    // add-opens (SparkSession outside spark-submit needs them)
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar",
    ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    val javaBin = System.getProperty("java.home") + "/bin/java"
    val childBatches = 6
    val cmd = (Seq(javaBin) ++ addOpens ++ Seq(
      "-Xmx2g", "-Dspark.ui.enabled=false",
      "-Dspark.sql.session.timeZone=UTC",
      "-cp", System.getProperty("java.class.path"),
      "graft.CommitWorker", root, "2", childBatches.toString)).asJava
    val child = new ProcessBuilder(cmd).redirectErrorStream(true).start()

    val out = new StringBuilder
    val drain = new Thread(() => {
      val r = new java.io.BufferedReader(
        new java.io.InputStreamReader(child.getInputStream))
      var line = r.readLine()
      while (line != null) { out.append(line).append('\n'); line = r.readLine() }
    })
    drain.start()

    // parent commits while the child boots and commits: keep committing
    // until we've SEEN at least one child commit land (guaranteeing the
    // two processes really did interleave on this table), minimum 6
    // parent batches, bounded by a deadline
    val deadline = System.nanoTime() + TimeUnit.SECONDS.toNanos(150)
    var i = 0
    var sawChild = false
    val t = MergeTable.open(root)
    while ((i < 6 || !sawChild) && System.nanoTime() < deadline) {
      i += 1
      t.applyBatch(parentBatch(i), Some(s"w1-b$i"))
      sawChild = t.currentSnapshot.exists(
        _.appliedBatches.exists(_.startsWith("w2-")))
      if (!sawChild) Thread.sleep(300)
    }
    assert(child.waitFor(120, TimeUnit.SECONDS),
      s"child JVM did not finish; output so far:\n$out")
    drain.join(5000)
    assert(child.exitValue() === 0, s"child failed:\n$out")
    assert(sawChild, s"child commits never interleaved with the parent's:\n$out")

    // every batch from BOTH processes landed exactly once
    val fresh = MergeTable.open(root)
    val applied = fresh.currentSnapshot.get.appliedBatches
    (1 to childBatches).foreach(b => assert(applied.contains(s"w2-b$b"),
      s"child batch b$b lost; applied=$applied\n$out"))
    (1 to i).foreach(b => assert(applied.contains(s"w1-b$b"),
      s"parent batch b$b lost; applied=$applied"))

    val rows = fresh.read(spark)
      .select($"trans_id", $"customer_id", $"amount")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    val expect =
      (1 to childBatches).map(b => (2000L + b, "w2", 200 + b)).toSet ++
        (1 to i).map(b => (1000L + b, "w1", 100 + b)).toSet
    assert(rows === expect)

    // version chain stayed dense: one version per commit, no gaps
    assert(fresh.latestVersion === (childBatches + i - 1).toLong)
    assert(fresh.history.map(_.version) === (0L to fresh.latestVersion))
  }
}
