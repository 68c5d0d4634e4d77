package graft

import org.apache.spark.sql.functions._
import graft.operators.DataQuality

/** The deequ-pillar contract: planted defects must be DETECTED with
  * exact violation counts — a battery that only ever passes clean data
  * proves nothing.
  */
class DataQualitySpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("profile: exact counts on a toy with planted nulls") {
    val toy = Seq[(java.lang.Long, String)]((1L, "a"), (2L, "b"),
      (null, "b"), (4L, null)).toDF("id", "s")
    val out = DataQuality.profile(toy).collect()
      .map(r => r.getString(0) -> r).toMap
    val id = out("id")
    assert(id.getLong(1) === 4L && id.getLong(2) === 1L) // rows, nulls
    assert(id.getDouble(3) === 0.25 && id.getLong(4) === 3L)
    assert(id.getDouble(5) === 1.0 && id.getDouble(6) === 4.0) // min/max
    assert(id.isNullAt(7) && id.isNullAt(8))
    val s = out("s")
    assert(s.getLong(2) === 1L && s.getLong(4) === 2L)
    assert(s.isNullAt(5) && s.getString(7) === "a" && s.getString(8) === "b")
  }

  test("battery: every planted defect detected with its exact count") {
    val child = Seq((1L, 10L), (2L, 10L), (2L, 20L), (3L, 99L))
      .toDF("k", "fk")
    val parent = Seq(10L, 20L).toDF("pk")
    val withNull = child.withColumn("k",
      when(col("fk") === 99L, lit(null)).otherwise(col("k")))
    val report = DataQuality.battery(Seq(
      DataQuality.notNull(withNull, "k", "k not_null"),
      DataQuality.unique(child, "k", "k unique"),
      DataQuality.satisfies(child, col("fk") < 50L, "fk in range"),
      DataQuality.refIntegrity(child, "fk", parent, "pk", "fk refs parent")
    )).collect().map(r => r.getString(0) ->
      ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(report("k not_null") === ((4L, 1L, false)))
    // both k=2 rows are violations (all members of the >1 group)
    assert(report("k unique") === ((4L, 2L, false)))
    assert(report("fk in range") === ((4L, 1L, false)))
    assert(report("fk refs parent") === ((4L, 1L, false)))
    // and a clean battery passes
    val clean = DataQuality.battery(Seq(
      DataQuality.notNull(child, "fk", "fk not_null"))).collect()
    assert(clean.head.getBoolean(3))
  }

  test("partitionCompleteness: a removed day surfaces as an explicit gap") {
    val orders = Tables.orders(spark, sf)
    val full = DataQuality.partitionCompleteness(orders, "o_orderdate")
    val someDay = full.filter(!col("is_gap")).select(col("day"))
      .orderBy(col("day")).collect()(5).getString(0)
    val holed = orders.filter(col("o_orderdate").cast("date")
      =!= to_date(lit(someDay)))
    val out = DataQuality.partitionCompleteness(holed, "o_orderdate")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(out(someDay) === ((0L, true)), "removed day must flag as gap")
    // spine covers every calendar day between bounds, no missing rows
    val days = out.keys.toSeq.sorted
    def epochDay(d: String) = java.time.LocalDate.parse(d).toEpochDay
    assert(epochDay(days.last) - epochDay(days.head) + 1 === days.length)
  }

  test("the battery composes with WAP: run checks on a branch before publish") {
    val t = graft.table.MergeTable.retailTrans(tmpDir("dqwap"))
    graft.stream.CdcPipeline.replayBatch(spark,
      graft.fixtures.GoldenCorpus.df(spark,
        graft.fixtures.GoldenCorpus.insertOnlyLines), t, None, Some("p1"))
    val b = t.createBranch("audit")
    val staged = b.read(spark)
    val report = DataQuality.battery(Seq(
      DataQuality.notNull(staged, "trans_id", "branch trans_id not_null"),
      DataQuality.unique(staged, "trans_id", "branch trans_id unique"),
      DataQuality.satisfies(staged, col("amount") >= 0,
        "branch amount non-negative")))
      .collect()
    assert(report.forall(_.getBoolean(3)), "golden branch must pass the gate")
    t.publishBranch("audit")
  }

  test("benfordAudit: uniform digits trip the line, Benford-shaped " +
      "counts pass, exclusions and negatives handled, dense spine") {
    import spark.implicits._
    // uniform 1..9: every share 111111, TV = 537454/2 -> 0.268727
    val uni = (1 to 9).map(d => ("u", d.toDouble)).toDF("g", "v")
    val u = DataQuality.benfordAudit(uni, "g", "v").collect()
    assert(u.length === 9)
    u.foreach { r =>
      assert(r.getAs[Double]("tv") === 0.268727)
      assert(r.getAs[Boolean]("suspect"))
      assert(r.getAs[Double]("obs_share") === 0.111111)
    }
    // counts proportional to Benford (n=1000): TV = 911/2 -> 0.000455
    val counts = Seq(301, 176, 125, 97, 79, 67, 58, 51, 46)
    val good = counts.zipWithIndex.flatMap { case (c, i) =>
      Seq.fill(c)(("b", (i + 1) * 10.0 + 0.5))
    }.toDF("g", "v")
    val g = DataQuality.benfordAudit(good, "g", "v").collect()
    g.foreach { r =>
      assert(r.getAs[Double]("tv") === 0.000455)
      assert(!r.getAs[Boolean]("suspect"))
    }
    // |x| < 1 and 0 excluded and counted; negatives keep their digit;
    // an absent digit still gets its dense-spine row
    val mix = Seq(("m", 0.0), ("m", 0.5), ("m", -0.25), ("m", -23.7),
      ("m", 245.0)).toDF("g", "v")
    val m = DataQuality.benfordAudit(mix, "g", "v").collect()
      .map(r => r.getAs[Int]("digit") -> r).toMap
    assert(m.size === 9, "dense 9-digit spine")
    assert(m(2).getAs[Long]("n") === 2L && m(2).getAs[Long]("n_excluded") === 3L)
    assert(m(2).getAs[Long]("n_digit") === 2L, "-23.7 and 245.0 both lead with 2")
    assert(m(7).getAs[Long]("n_digit") === 0L)
  }
}
