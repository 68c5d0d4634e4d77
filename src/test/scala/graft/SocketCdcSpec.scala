package graft

import java.io.PrintWriter
import java.net.ServerSocket

import org.apache.spark.sql.streaming.Trigger

import graft.stream.CdcPipeline
import graft.table.MergeTable

/** Network-stream ingestion smoke: the CDC pipeline fed by Spark's socket
  * source instead of the landing-dir file source — the closest
  * no-extra-jars analog of the reference's Kinesis ingestion (kds.py:28–32
  * consumed at firehose_to_iceberg.py:123–127). Mapping under test:
  *
  *   - one socket connection = one shard: lines arrive in write order
  *     (shard FIFO);
  *   - per-key ordering: the DMS partition-key-per-primary-key contract
  *     delivers each key's events in order; the pipeline must preserve
  *     that through to the merged table — within a micro-batch via the
  *     LWW collapse on (src_timestamp, transaction_id), across
  *     micro-batches via the monotone `_seq` commit stamp;
  *   - events are spread over several writes with pauses, so the query
  *     slices them into micro-batches at arbitrary boundaries — the
  *     final state must not depend on where those boundaries fell.
  */
class SocketCdcSpec extends SparkSpec {

  /** CDC envelope line in the golden-corpus shape (GoldenCorpus resources /
    * gen_fake_cdc_data.py:26–59).
    */
  private def line(transId: Long, amount: Int, op: String, txId: Long): String = {
    val sec = f"${txId % 60}%02d"
    s"""{"data": {"trans_id": $transId, "customer_id": "c$transId", "event": "cart", "sku": "S$transId", "amount": $amount, "device": "pc", "trans_datetime": "2023-01-16T06:18:32Z"}, "metadata": {"timestamp": "2023-01-16T06:25:$sec.000000Z", "record-type": "data", "operation": "$op", "partition-key-type": "primary-key", "schema-name": "testdb", "table-name": "retail_trans", "transaction-id": $txId}}"""
  }

  test("socket-fed pipeline preserves per-key event order through the merge") {
    val base = tmpDir("sockcdc")
    val tableRoot = s"$base/t"
    val server = new ServerSocket(0)
    // three writes with pauses → the stream sees the corpus in several
    // micro-batches; key 100's last event is an update to 3, key 200's an
    // update to 20, key 300 is inserted then deleted
    val phases: Seq[Seq[String]] = Seq(
      Seq(line(100L, 1, "insert", 1L), line(200L, 10, "insert", 2L),
        line(300L, 5, "insert", 3L)),
      Seq(line(100L, 2, "update", 4L), line(200L, 20, "update", 5L)),
      Seq(line(100L, 3, "update", 6L), line(300L, 5, "delete", 7L)))
    val writer = new Thread(() => {
      val sock = server.accept()
      val out = new PrintWriter(sock.getOutputStream, true)
      phases.foreach { lines =>
        lines.foreach(out.println)
        out.flush()
        Thread.sleep(700)
      }
      // keep the connection open until the query is done reading; closing
      // early can race the last poll
      Thread.sleep(20000)
      sock.close()
    })
    writer.setDaemon(true)
    writer.start()

    val lines = spark.readStream.format("socket")
      .option("host", "localhost")
      .option("port", server.getLocalPort.toString)
      .load()
    val q = CdcPipeline.startFromLines(spark, lines, CdcPipeline.Config(
      landingDir = s"$base/unused-landing",
      tableRoot = tableRoot,
      errorRoot = s"$base/errors",
      checkpointDir = s"$base/cp",
      trigger = Trigger.ProcessingTime(100)))
    try {
      val deadline = System.currentTimeMillis() + 60000
      def state(): Map[Long, Int] = {
        val t = MergeTable.open(tableRoot)
        if (t.latestVersion < 0) Map.empty
        else t.read(spark).selectExpr("trans_id", "amount")
          .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      }
      val want = Map(100L -> 3, 200L -> 20)
      var st = state()
      while (st != want && System.currentTimeMillis() < deadline) {
        Thread.sleep(500); st = state()
      }
      // per-key FINAL events won — including the cross-batch update chain
      // 1→2→3 on key 100 and the insert-then-delete on key 300
      assert(st === want,
        s"per-key order not preserved through socket ingestion: $st")
      val t = MergeTable.open(tableRoot)
      // the corpus arrived over multiple commits, so cross-batch ordering
      // (not just within-batch LWW) was actually exercised
      assert(t.latestVersion >= 1,
        s"expected several micro-batch commits, got v${t.latestVersion}")
    } finally {
      q.stop()
      server.close()
    }
  }
}
