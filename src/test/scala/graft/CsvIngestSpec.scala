package graft

import org.apache.spark.sql.functions._
import graft.sources.CsvIngest

/** CSV ingest with dead-lettering (q211): the batch-file analog of the
  * CDC error-sink contract.
  */
class CsvIngestSpec extends SparkSpec {
  import spark.implicits._

  test("corrupt rows dead-letter with their original text; clean rows parse") {
    val dir = tmpDir("csv-hand")
    Seq("1,1,17.0,N", "2,1,oops,A", "3,2,5.0,R", "4,1,9.0,,too,many")
      .toDF("value").coalesce(1).write.mode("overwrite").text(dir)
    val back = spark.read.schema(CsvIngest.LineitemLite)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .csv(dir)
      .cache()
    val bad = back.filter(col("_corrupt").isNotNull)
      .select(col("_corrupt")).as[String].collect().sorted
    assert(bad === Array("2,1,oops,A", "4,1,9.0,,too,many"),
      "dead letters must carry the raw line for replay")
    val clean = back.filter(col("_corrupt").isNull)
      .select(col("l_orderkey"), col("l_quantity")).as[(Long, Double)]
      .collect().toMap
    assert(clean === Map(1L -> 17.0, 3L -> 5.0))
  }

  test("roundtrip totals equal the parquet complement of the planted slice") {
    val sf = "/root/testdata/sf0.001"
    val out = CsvIngest.roundtrip(spark, sf).collect()
    val li = Tables.lineitem(spark, sf)
    val key = col("l_orderkey") * 10 + col("l_linenumber")
    val h = ((key % 2147483648L) * 2654435761L) % 2147483647L
    val expectBad = li.filter(h % 29 === 0).count()
    assert(out.head.getLong(3) === expectBad, "dead-letter accounting")
    assert(expectBad > 0, "fixture must actually plant corruption")
    val expect = li.filter(h % 29 =!= 0)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"), sum(col("l_quantity").cast("long")).as("s"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    out.foreach { r =>
      assert(expect(r.getString(0)) === ((r.getLong(1), r.getLong(2))))
    }
    assert(out.map(_.getString(0)).toSet === expect.keySet)
  }
}
