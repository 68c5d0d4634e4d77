package graft

import scala.jdk.CollectionConverters._
import org.apache.spark.sql.functions._
import graft.operators.ScalePatterns

class ScalePatternsSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("salted join returns exactly the rows of the plain join") {
    val li = Tables.lineitem(spark, sf).select($"l_orderkey".as("k"), $"l_quantity")
    val o = Tables.orders(spark, sf).select($"o_orderkey".as("k"), $"o_totalprice")
    val plain = li.join(o, Seq("k"))
    val salted = ScalePatterns.saltedJoin(li, o, "k", salts = 4)
    assert(salted.count() === plain.count())
    val s1 = plain.agg(sum($"l_quantity" * $"o_totalprice")).as[Double].collect().head
    val s2 = salted.agg(sum($"l_quantity" * $"o_totalprice")).as[Double].collect().head
    assert(math.abs(s1 - s2) / math.abs(s1) < 1e-9)
  }

  test("skew-isolated join equals the plain join") {
    val li = Tables.lineitem(spark, sf).select($"l_orderkey".as("k"), $"l_quantity")
    val o = Tables.orders(spark, sf).select($"o_orderkey".as("k"), $"o_totalprice")
    val heavy = ScalePatterns.heavyHitters(li, "k", 5)
      .select($"k").as[Long].collect().toSeq
    assert(heavy.size === 5)
    val plain = li.join(o, Seq("k"))
    val iso = ScalePatterns.skewIsolatedJoin(li, o, "k", heavy)
    assert(iso.count() === plain.count())
  }

  test("bucketed tables join with zero exchanges") {
    Seq("bkt_lineitem", "bkt_orders").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.exists()) {
        java.nio.file.Files.walk(loc.toPath).iterator().asScala
          .toSeq.reverse.foreach(java.nio.file.Files.deleteIfExists(_))
      }
    }
    val li = Tables.lineitem(spark, sf).select($"l_orderkey", $"l_quantity")
    val o = Tables.orders(spark, sf).select($"o_orderkey", $"o_totalprice")
    ScalePatterns.writeBucketed(li.withColumnRenamed("l_orderkey", "k"),
      "bkt_lineitem", "k", buckets = 8)
    ScalePatterns.writeBucketed(o.withColumnRenamed("o_orderkey", "k"),
      "bkt_orders", "k", buckets = 8)

    // tiny test tables would broadcast; disable it so the plan shows what a
    // fact-fact join does at scale — sort-merge over bucketed reads
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("bkt_lineitem").join(spark.table("bkt_orders"), Seq("k"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"),
        s"plan should be shuffle-free:\n$plan")
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(joined.count() ===
        li.join(o, li("l_orderkey") === o("o_orderkey")).count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    spark.sql("DROP TABLE IF EXISTS bkt_lineitem")
    spark.sql("DROP TABLE IF EXISTS bkt_orders")
  }

  test("salted two-phase aggregation equals the direct groupBy") {
    val ev = Tables.events(spark, sf)
    val direct = ev.groupBy($"event_type")
      .agg(count(lit(1)).as("cnt"), sum($"value").as("total"))
      .orderBy($"event_type")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val salted = ScalePatterns.saltedAgg(ev, "event_type", "value", salts = 8)
      .orderBy($"event_type")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(direct.length === salted.length)
    direct.zip(salted).foreach { case ((k1, c1, t1), (k2, c2, t2)) =>
      assert(k1 === k2); assert(c1 === c2)
      assert(math.abs(t1 - t2) / math.max(1.0, math.abs(t1)) < 1e-12)
    }
  }

  test("packShards two-pass prefix sum equals the single-window formulation") {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, sf)
    val naive = docs.select($"doc_id",
        size(graft.operators.TextAnalysis.wsTokens($"text")).cast("long").as("n_tokens"))
      .withColumn("cum_tokens", sum($"n_tokens").over(
        Window.orderBy($"doc_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("shard", floor(($"cum_tokens" - 1) / 2000).cast("long"))
      .select($"doc_id", $"n_tokens", $"cum_tokens", $"shard")
      .orderBy($"doc_id").collect()
    // rangeWidth deliberately NOT dividing the id space evenly
    val twoPass = graft.operators.CorpusOps
      .packShards(docs, 2000, rangeWidth = 37L)
      .orderBy($"doc_id").collect()
    assert(naive.toSeq === twoPass.toSeq)
  }

  test("keySkewReport: uniform keys read even/gini 0, one hot key " +
      "flips the verdict with the right salt factor") {
    import graft.operators.ScalePatterns
    // uniform: 64 keys x 4 rows -> gini 0, top_share 1/64, salt 1
    val uni = (0L until 256L).map(i => i % 64).toDF("k")
    val u = ScalePatterns.keySkewReport(uni, "k").collect().head
    assert(u.getAs[Long]("n_keys") === 64L)
    assert(u.getAs[Double]("gini") === 0.0)
    assert(u.getAs[Long]("salt_factor") === 1L)
    assert(u.getAs[String]("verdict") === "even")
    // hot: one key holds half the rows (128 of 256, 63 keys share rest)
    val hot = ((0L until 128L).map(_ => 0L) ++
      (0L until 128L).map(i => 1L + i % 63)).toDF("k")
    val h = ScalePatterns.keySkewReport(hot, "k", parts = 32)
      .collect().head
    assert(h.getAs[Long]("top_count") === 128L)
    assert(h.getAs[Double]("top_share") === 0.5)
    // top key needs ceil(128*32/256) = 16 salt splits
    assert(h.getAs[Long]("salt_factor") === 16L)
    assert(h.getAs[String]("verdict") === "salt")
    assert(h.getAs[Double]("gini") > 0.4)
  }

  test("keySkewReport gini matches the textbook per-key formula") {
    import graft.operators.ScalePatterns
    // counts 1,2,3,4 over 4 keys: G = sum((2i-n-1)x_i)/(n*S)
    //   = (-3*1 + -1*2 + 1*3 + 3*4)/(4*10) = 10/40 = 0.25
    val df = (Seq.fill(1)("a") ++ Seq.fill(2)("b") ++ Seq.fill(3)("c") ++
      Seq.fill(4)("d")).toDF("k")
    val g = ScalePatterns.keySkewReport(df, "k").collect().head
    assert(g.getAs[Double]("gini") === 0.25)
  }
}
