package graft

import org.apache.spark.sql.functions._
import graft.functions.{ConfusableFoldFunction, ConfusableTable}
import graft.operators.TextAnalysis

/** The UTS #39 confusable fold (q305): the native kernel, its exact
  * SQL replay (the oracle chain run through Spark's own translate/
  * replace, generated from the SAME table), and the headline property —
  * a Cyrillic-'о' homoglyph duplicate is caught ONLY with the fold.
  */
class ConfusableFoldSpec extends SparkSpec {
  import spark.implicits._

  private def foldCol = (c: org.apache.spark.sql.Column) =>
    ConfusableFoldFunction.confusableFold(spark, c)

  test("fold: Cyrillic/Greek lookalikes, fullwidth, ligatures -> Latin; clean ASCII unchanged") {
    val rows = Seq(
      // Cyrillic es с inside an otherwise non-confusable Cyrillic
      // word: only the lookalike folds, the rest stays Cyrillic
      1L -> "чистый text",
      // Cyrillic er/o/ie lookalikes spelling a Latin spam phrase
      2L -> "sрam оffеr",
      3L -> "ｆｕｌｌ １２３ ＡＢＣ",
      4L -> "oﬃce ﬂoor traﬃc",   // ligatures (1:N)
      5L -> "plain ascii only",
      // Greek nu ν + omicron ο lookalikes
      6L -> "λογος νo οk")
      .toDF("id", "text")
    val out = rows.select($"id", foldCol($"text").as("f"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) === "чиcтый text")
    assert(out(2L) === "spam offer")
    assert(out(3L) === "full 123 ABC")
    assert(out(4L) === "office floor traffic")
    assert(out(5L) === "plain ascii only")
    // only glyph-identical Greek letters fold; lambda/gamma/sigma stay
    assert(out(6L) === "λoγoς vo ok")
  }

  test("fold == the generated oracle chain (translate+replace from the same table)") {
    // run the DuckDB oracle expression through Spark SQL — translate()
    // and replace() are 1:1 semantics in both engines for BMP text, so
    // equality here pins kernel <-> oracle non-drift
    val texts = Seq(
      "sрam оffеr ｗｉｔｈ ﬃ and ｏ",
      "все на русском без латиницы",
      "mixed Ԁата ｑuality ѕcore",
      "", "plain")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    df.createOrReplaceTempView("cf_probe")
    val oracle = spark.sql(
      s"SELECT id, ${ConfusableTable.oracleSql("text")} AS f FROM cf_probe")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val native = df.select($"id", foldCol($"text").as("f"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(native === oracle)
  }

  test("the Cyrillic-'о' duplicate is caught only with the fold") {
    val docs = Seq(
      (1L, "srcA", "limited time hello world offer"),
      (2L, "srcA", "limited time hellо wоrld оffer"), // Cyrillic о evader
      (3L, "srcA", "a genuinely different document"))
      .toDF("doc_id", "source", "text")
    val rawDups = docs.groupBy($"text").count().where($"count" > 1).count()
    assert(rawDups === 0L, "exact dedup on raw text must MISS the evader")
    val foldDups = TextAnalysis.confusableFold(docs)
      .groupBy($"fold").count().where($"count" > 1).count()
    assert(foldDups === 1L, "exact dedup on the fold must CATCH it")
  }

  test("confusableDedupAudit: evader twins are new distinct texts that re-collide under fold") {
    // doc_ids 0..9: h-gate (h % 10 < 3) picks a deterministic subset
    val docs = (0L to 9L).map(i => (i, "s" + (i % 2), s"pace copy text $i"))
      .toDF("doc_id", "source", "text")
    val out = TextAnalysis.confusableDedupAudit(docs)
      .collect().map(r => r.getString(0) -> r).toMap
    val nEv = out.values.map(_.getAs[Long]("n_evaders")).sum
    assert(nEv > 0, "the h-gate must plant at least one evader at n=10")
    out.values.foreach { r =>
      assert(r.getAs[Long]("n_rows")
        === 5L + r.getAs[Long]("n_evaders"))
      // each evader is a NEW distinct text (contains confusables the
      // original lacks) and folds back onto its original
      assert(r.getAs[Long]("distinct_text")
        === r.getAs[Long]("n_rows"))
      assert(r.getAs[Long]("fold_collisions")
        === r.getAs[Long]("n_evaders"))
      assert(r.getAs[Long]("n_conf_rows") === r.getAs[Long]("n_evaders"))
    }
  }

  test("interpreted eval == codegen path, fold is idempotent, null propagates") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.unsafe.types.UTF8String
    val samples = Seq("sрam оffеr", "oﬃce ﬂoor traﬃc", "ｆｕｌｌ １２３",
      "plain ascii", "", "все на русском", "λογος νo οk")
    val viaDf = samples.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text").select($"id", foldCol($"text").as("f"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    samples.zipWithIndex.foreach { case (t, i) =>
      val interp = graft.functions.ConfusableFold(Literal.create(t))
        .eval(null).asInstanceOf[UTF8String].toString
      assert(interp === viaDf(i.toLong), s"interpreted != codegen for '$t'")
      // fixpoint: every output char is plain Latin/ASCII, never itself
      // in a from-set, so a second fold is the identity
      assert(ConfusableTable.fold(UTF8String.fromString(interp)).toString
        === interp, s"fold not idempotent on '$t'")
    }
    val n = Seq((1L, null: String)).toDF("id", "text")
      .select(foldCol($"text").as("f")).collect()
    assert(n.head.isNullAt(0), "null input must fold to null")
  }

  test("no-fold fast path returns the input unchanged (allocation-free contract)") {
    import org.apache.spark.unsafe.types.UTF8String
    val s = UTF8String.fromString("plain ascii, no confusables at all")
    assert(ConfusableTable.fold(s) eq s)
    val t = UTF8String.fromString("оne fоld")
    assert(ConfusableTable.fold(t).toString === "one fold")
  }
}
