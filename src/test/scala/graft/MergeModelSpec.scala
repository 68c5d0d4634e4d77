package graft

import scala.util.Random
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.table.MergeTable

/** Property-style randomized test (fixed seeds, SURVEY.md §5.4): random
  * insert/update/delete sequences applied in random batch splits must
  * leave the table equal to an in-memory Map model applied sequentially.
  */
class MergeModelSpec extends SparkSpec {
  import spark.implicits._

  import graft.MergeModelSpec.Op

  private def toBatch(ops: Seq[Op]): DataFrame =
    ops.map(o => (o.op, o.key, o.amount, o.event, o.seq))
      .toDF("op", "key", "amount", "event", "seq").select(
      col("key").as("trans_id"),
      lit("c").as("customer_id"),
      col("event"),
      lit("s").as("sku"),
      col("amount"),
      lit("pc").as("device"),
      to_timestamp(lit("2023-01-01 00:00:00")).as("trans_datetime"),
      col("op").as("operation"),
      // src_timestamp constant: ordering within batch decided by seq
      to_timestamp(lit("2023-02-01 00:00:00")).as("src_timestamp"),
      col("seq").as("transaction_id"))

  private def runScenario(seed: Int, nOps: Int, keySpace: Int, nBatches: Int): Unit = {
    val rnd = new Random(seed)
    val events = Vector("visit", "view", "cart", "list", "like", "purchase")
    val ops = (0 until nOps).map { i =>
      val r = rnd.nextInt(10)
      val op = if (r < 6) "insert" else if (r < 8) "update" else "delete"
      Op(op, rnd.nextInt(keySpace).toLong + 1, rnd.nextInt(101),
        events(rnd.nextInt(events.size)), i.toLong)
    }

    // model: sequential apply, LWW by seq, delete removes
    val model = scala.collection.mutable.Map.empty[Long, Op]
    ops.foreach { o =>
      if (o.op == "delete") model.remove(o.key) else model(o.key) = o
    }

    val t = MergeTable.retailTrans(tmpDir(s"model$seed"), threshold = 4)
    // random contiguous batch split preserves op order across batches
    val cuts = (Seq(0, nOps) ++ Seq.fill(nBatches - 1)(rnd.nextInt(nOps))).sorted
    cuts.sliding(2).zipWithIndex.foreach { case (Seq(a, b), bi) =>
      if (b > a) t.applyBatch(toBatch(ops.slice(a, b)), Some(s"b$bi"))
    }

    val actual = t.read(spark).select($"trans_id", $"amount", $"event")
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getString(2)))).toMap
    val expected = model.map { case (k, o) => k -> ((o.amount, o.event)) }.toMap
    assert(actual === expected, s"seed=$seed")
  }

  test("random op sequences match the sequential model (seed 1)") {
    runScenario(seed = 1, nOps = 400, keySpace = 60, nBatches = 5)
  }
  test("random op sequences match the sequential model (seed 2, delete-heavy key reuse)") {
    runScenario(seed = 2, nOps = 300, keySpace = 15, nBatches = 7)
  }
  test("random op sequences match the sequential model (seed 3, single batch)") {
    runScenario(seed = 3, nOps = 200, keySpace = 40, nBatches = 1)
  }
}

object MergeModelSpec {
  final case class Op(op: String, key: Long, amount: Int, event: String, seq: Long)
}
