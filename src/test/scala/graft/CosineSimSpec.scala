package graft

import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions
import graft.operators.Similarity

class CosineSimSpec extends SparkSpec {
  import spark.implicits._

  private def vecs = Seq(
    (1L, Array(1.0, 2.0, 3.0)),
    (2L, Array(2.0, 4.0, 6.0)),   // parallel to 1 → cos = 1
    (3L, Array(-1.0, -2.0, -3.0)), // antiparallel → cos = -1
    (4L, Array(3.0, -1.5, 0.0))
  ).toDF("id", "v")

  test("native expression computes cosine (eval + codegen paths)") {
    val out = vecs.as("a").crossJoin(vecs.as("b"))
      .select(col("a.id").as("ia"), col("b.id").as("ib"),
        GraftFunctions.cosineSim(spark, col("a.v"), col("b.v")).as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(math.abs(out((1L, 2L)) - 1.0) < 1e-12)
    assert(math.abs(out((1L, 3L)) + 1.0) < 1e-12)
    assert(math.abs(out((1L, 1L)) - 1.0) < 1e-12)
  }

  test("native expression matches the built-in composition") {
    val e = Similarity.withNorm(Tables.embeddings(spark, "/root/testdata/sf0.001"))
    val both = e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .limit(500)
      .select(
        GraftFunctions.cosineSim(spark, col("a.v"), col("b.v")).as("fast"),
        Similarity.cosine(col("a.v"), col("b.v"), col("a.norm"), col("b.norm")).as("slow"))
      .filter(abs(col("fast") - col("slow")) > 1e-9)
    assert(both.count() === 0)
  }

  test("registered in SQL: cosine_sim usable via spark.sql") {
    GraftFunctions.register(spark)
    vecs.createOrReplaceTempView("cs_vecs")
    val r = spark.sql(
      """SELECT cosine_sim(a.v, b.v) AS c FROM cs_vecs a JOIN cs_vecs b
         ON a.id = 1 AND b.id = 2""").as[Double].collect().head
    assert(math.abs(r - 1.0) < 1e-12)
  }

  test("type check rejects non-double arrays") {
    GraftFunctions.register(spark)
    val bad = Seq((1, Array(1.0f))).toDF("id", "v")
    bad.createOrReplaceTempView("cs_bad")
    val ex = intercept[Exception] {
      spark.sql("SELECT cosine_sim(v, v) FROM cs_bad").collect()
    }
    assert(ex.getMessage.contains("cosine_sim") ||
      ex.getMessage.toLowerCase.contains("type"))
  }
}
