package graft

import org.apache.spark.sql.functions._
import graft.operators.SftOps

/** SFT / preference-data operators (q162–q164): the conversation fixture's
  * structural rules, loss-mask accounting closed forms, the audit battery
  * on hand-built pathological conversations, and the length-bias rollup.
  */
class SftOpsSpec extends SparkSpec {

  import spark.implicits._

  private def doc(id: Long, nWords: Int, source: String = "s0") =
    (id, (1 to nWords).map(i => s"w$i").mkString(" "), source)

  private def docsDf(rows: (Long, String, String)*) =
    rows.toSeq.toDF("doc_id", "text", "source")

  test("turns: system prologue, alternation, mod-11 double-send, slicing") {
    // doc 3: sys (3%3=0), 2+3%5=5 turns; doc 4: no sys, 2+4=6 turns;
    // doc 11: no sys (11%3=2), 2+1=3 turns, double-send at turn 2
    val df = docsDf(doc(3L, 100), doc(4L, 100), doc(11L, 100))
    val out = SftOps.turns(df).collect()
      .map(r => (r.getLong(0), r.getInt(2)) ->
        ((r.getString(3), r.getString(4), r.getLong(5)))).toMap

    assert(out((3L, 0))._1 === "system")
    assert(out((3L, 1))._1 === "user")
    assert(out((3L, 2))._1 === "assistant")
    assert(out((3L, 3))._1 === "user")
    assert(out((3L, 4))._1 === "assistant")
    assert(out((4L, 0))._1 === "user")
    assert(out((4L, 1))._1 === "assistant")
    assert(out((4L, 5))._1 === "assistant")
    // doc 11: turn 1 = assistant (no sys), turn 2 repeats it (double-send)
    assert(out((11L, 1))._1 === "assistant")
    assert(out((11L, 2))._1 === "assistant")
    // slicing: doc 4 turn 1 gets words 9..16, 8 tokens
    assert(out((4L, 1))._2 === "w9 w10 w11 w12 w13 w14 w15 w16")
    assert(out((4L, 1))._3 === 8L)
    // truncation: doc with 20 words, turn 2 gets 4 words, turn 3 none
    val short = SftOps.turns(docsDf(doc(4L, 20))).collect()
      .map(r => r.getInt(2) -> r.getLong(5)).toMap
    assert(short(1) === 8L && short(2) === 4L && short(3) === 0L)
  }

  test("lossMaskReport: closed-form accounting incl. overhead and masking") {
    val turns = Seq(
      (1L, 3, 0, "user", "a b c d e", 5L),
      (1L, 3, 1, "assistant", "f g h i j k l", 7L),
      (1L, 3, 2, "user", "m n o", 3L))
      .toDF("conv_id", "n_turns", "turn_ord", "role", "text", "n_tokens")
    val r = SftOps.lossMaskReport(turns, overheadPerTurn = 4).collect()(0)
    assert(r.getAs[Long]("n_turns") === 3L)
    assert(r.getAs[Long]("content_tokens") === 15L)
    assert(r.getAs[Long]("overhead_tokens") === 12L)
    assert(r.getAs[Long]("total_tokens") === 27L)
    assert(r.getAs[Long]("trainable_tokens") === 7L)
    assert(r.getAs[Double]("trainable_frac") === math.floor(7e6 / 27) / 1e6)
  }

  test("chatAudit: every failure mode flags, the clean conversation passes") {
    def conv(id: Long, rs: Seq[(String, Long)]) =
      rs.zipWithIndex.map { case ((role, n), i) => (id, i, role, n) }
    val turns = (
      conv(1L, Seq("system" -> 5L, "user" -> 4L, "assistant" -> 6L)) ++ // ok
      conv(2L, Seq("user" -> 4L, "user" -> 3L, "assistant" -> 5L)) ++   // break
      conv(3L, Seq("user" -> 4L, "system" -> 2L, "assistant" -> 5L)) ++ // late sys
      conv(4L, Seq("user" -> 4L, "assistant" -> 5L, "user" -> 2L)) ++   // ends user
      conv(5L, Seq("user" -> 4L, "assistant" -> 0L)) ++                 // empty
      conv(6L, Seq("assistant" -> 4L, "user" -> 5L))                    // starts bad
    ).toDF("conv_id", "turn_ord", "role", "n_tokens")
    val out = SftOps.chatAudit(turns).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[String]("verdict") === "ok")
    assert(!out(2L).getAs[Boolean]("alternates_ok"))
    assert(!out(3L).getAs[Boolean]("sys_only_first"))
    // a late system turn also breaks strict alternation by definition
    assert(!out(3L).getAs[Boolean]("alternates_ok"))
    assert(!out(4L).getAs[Boolean]("ends_assistant"))
    assert(out(5L).getAs[Boolean]("has_empty"))
    assert(!out(6L).getAs[Boolean]("starts_ok"))
    assert(Seq(2L, 3L, 4L, 5L, 6L).forall(
      out(_).getAs[String]("verdict") === "bad"))
  }

  test("prefPairs + lengthBias: exact per-source bias arithmetic") {
    // doc 0: lc = 10, lr = 5 -> chosen longer by 5
    // doc 20: lc = 10, lr = 5 + 140%25 = 20 -> rejected longer by 10
    // doc 40: lc = 10, lr = 5 + 280%25 = 10 -> tie
    // doc 5 (short, 12 words): both slices truncate to words 7..12 -> tie
    val df = docsDf(doc(0L, 100, "a"), doc(20L, 100, "a"),
      doc(40L, 100, "a"), doc(5L, 12, "b"))
    val pairs = SftOps.prefPairs(df)
    val lens = pairs.collect().map(r =>
      r.getLong(0) -> ((r.getLong(3), r.getLong(4)))).toMap
    assert(lens(0L) === ((10L, 5L)))
    assert(lens(20L) === ((10L, 20L)))
    assert(lens(40L) === ((10L, 10L)))
    assert(lens(5L) === ((6L, 6L)))

    val bias = SftOps.lengthBias(pairs).collect()
      .map(r => r.getString(0) -> r).toMap
    val a = bias("a")
    assert(a.getAs[Long]("n_pairs") === 3L)
    assert(a.getAs[Long]("n_chosen_longer") === 1L)
    assert(a.getAs[Long]("n_ties") === 1L)
    assert(a.getAs[Double]("frac_chosen_longer") ===
      math.floor(1000000.0 / 3) / 1e6)
    // deltas +5, -10, 0 -> sum -5; floor(-5e6/3)/1e6 = -1.666667
    assert(a.getAs[Double]("mean_delta") === math.floor(-5e6 / 3) / 1e6)
    val b = bias("b")
    assert(b.getAs[Long]("n_pairs") === 1L &&
      b.getAs[Long]("n_ties") === 1L)
  }

  test("promptDedup: same first user turn collapses, richest answer wins") {
    val turns = Seq(
      // convs 1 and 2 share the prompt; 2 has more assistant tokens
      (1L, 0, "user", "hello there", 2L),
      (1L, 1, "assistant", "short", 1L),
      (2L, 0, "user", "hello there", 2L),
      (2L, 1, "assistant", "much longer answer", 3L),
      // convs 3 and 4 share a prompt with EQUAL tokens -> min conv wins
      (4L, 0, "user", "tied prompt", 2L),
      (4L, 1, "assistant", "aa bb", 2L),
      (3L, 0, "user", "tied prompt", 2L),
      (3L, 1, "assistant", "cc dd", 2L),
      // conv 5: unique prompt; first USER turn is turn 1 (system first)
      (5L, 0, "system", "be brief", 2L),
      (5L, 1, "user", "unique prompt", 2L),
      (5L, 2, "assistant", "ok", 1L))
      .toDF("conv_id", "turn_ord", "role", "text", "n_tokens")
    val out = SftOps.promptDedup(turns).collect()
      .map(r => r.getLong(2) -> ((r.getLong(1), r.getLong(3)))).toMap
    assert(out.keySet === Set(2L, 3L, 5L))
    assert(out(2L) === ((2L, 3L))) // 2 convs, kept 3 assistant tokens
    assert(out(3L) === ((2L, 2L))) // tie -> min conv_id
    assert(out(5L) === ((1L, 1L)))
  }

  test("turns is deterministic under repartition") {
    val df = docsDf(doc(3L, 64), doc(7L, 64), doc(11L, 64))
    val once = SftOps.turns(df).orderBy("conv_id", "turn_ord").collect()
    val again = SftOps.turns(df.repartition(7))
      .orderBy("conv_id", "turn_ord").collect()
    assert(once.toSeq === again.toSeq)
  }

  test("toolCallAudit: every failure family on hand-built calls") {
    val calls = Seq(
      (1L, """{"name":"search","arguments":{"query":"a b c","top_k":7}}"""),
      (2L, """{"name":"search","arguments":{"query":"a b","top_k":7}"""),
      (3L, """{"name":"shell_exec","arguments":{"query":"a","top_k":2}}"""),
      (4L, """{"name":"lookup","arguments":{"query":"a b"}}"""),
      (5L, """{"name":"lookup","arguments":{"query":"a","top_k":"many"}}"""),
      (6L, """{"name":"lookup","arguments":{"query":"","top_k":3}}"""))
      .toDF("call_id", "call_json")
    val out = SftOps.toolCallAudit(calls).orderBy("call_id").collect()
    def row(i: Int) = out(i)
    assert(row(0).getString(7) === "ok")
    // truncated: invalid JSON, every gated field null/false
    assert(!row(1).getBoolean(2) && row(1).getString(3) == null
      && !row(1).getBoolean(4) && !row(1).getBoolean(5))
    assert(row(1).getString(7) === "bad")
    // unknown tool: valid JSON but not in registry
    assert(row(2).getBoolean(2) && !row(2).getBoolean(4)
      && row(2).getString(7) === "bad")
    // missing top_k
    assert(row(3).getBoolean(2) && row(3).getBoolean(4)
      && !row(3).getBoolean(6) && row(3).getString(7) === "bad")
    // string-typed top_k
    assert(!row(4).getBoolean(6) && row(4).getString(7) === "bad")
    // empty query
    assert(!row(5).getBoolean(5) && row(5).getString(7) === "bad")
  }

  test("toolCalls fixture: anomaly families land on the idHash residues") {
    val docs = docsDf(doc(0L, 10), doc(1L, 10), doc(3L, 10))
    val byId = SftOps.toolCalls(docs).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // doc 0: idHash 0 -> shell_exec, no top_k, truncated final brace
    assert(byId(0L).startsWith("""{"name":"shell_exec""""))
    assert(!byId(0L).contains("top_k") && !byId(0L).endsWith("}}"))
    // doc 1: clean search call with integer top_k 14
    assert(byId(1L) ===
      """{"name":"search","arguments":{"query":"w1 w2 w3","top_k":14}}""")
    // doc 3: unknown tool but otherwise well-formed (top_k 42)
    assert(byId(3L).contains("shell_exec") && byId(3L).endsWith("""top_k":42}}"""))
    val audited = SftOps.toolCallAudit(SftOps.toolCalls(docs))
      .orderBy("call_id").collect()
    assert(audited(1).getString(7) === "ok")
    assert(audited(0).getString(7) === "bad" && !audited(0).getBoolean(2))
  }

  test("pairRouge: hand-computed multiset overlap and F-scores") {
    val pairs = Seq(
      (1L, "s", Seq("a", "b", "c", "b"), Seq("b", "c", "d")),
      (2L, "s", Seq("x", "y"), Seq("x", "y")),
      (3L, "s", Seq("p", "q"), Seq("r", "t")))
      .toDF("pair_id", "source", "chosen", "rejected")
    val out = SftOps.pairRouge(pairs).orderBy("pair_id").collect()
    // pair 1: ov1 = min(2,1)[b] + 1[c] = 2; F1 = 4/7 floored
    assert(out(0).getLong(4) === 2L)
    assert(out(0).getDouble(5) === 0.571428)
    // bigrams: only "b c" shared → F2 = 2/5
    assert(out(0).getLong(8) === 1L)
    assert(out(0).getDouble(9) === 0.4)
    // identical pair: both F-scores exactly 1 — the uninformative case
    assert(out(1).getDouble(5) === 1.0 && out(1).getDouble(9) === 1.0)
    // disjoint pair: zero everywhere (left-join coalesce path)
    assert(out(2).getLong(4) === 0L && out(2).getDouble(5) === 0.0)
    assert(out(2).getDouble(9) === 0.0)
  }

  test("prefPairTexts: shifted windows and the disjoint mod-9 family") {
    val docs = docsDf(doc(1L, 60), doc(9L, 60))
    val byId = SftOps.prefPairTexts(docs).collect()
      .map(r => r.getLong(0) ->
        ((r.getSeq[String](2), r.getSeq[String](3)))).toMap
    // pair 1: chosen = w7..w17 (len 11), rejected starts at 7+1=8 (len 12)
    assert(byId(1L)._1 === (7 to 17).map(i => s"w$i"))
    assert(byId(1L)._2 === (8 to 19).map(i => s"w$i"))
    // pair 9: rejected family starts at word 40
    assert(byId(9L)._2.head === "w40")
    // shifted windows genuinely overlap → high but non-trivial rouge1
    val r = SftOps.pairRouge(SftOps.prefPairTexts(docs))
      .orderBy("pair_id").collect()
    assert(r(0).getDouble(5) > 0.5 && r(0).getDouble(5) < 1.0)
  }

  test("lengthDebias: majority class capped to minority, ties pass") {
    val pairs = Seq(
      // source a: 3 chosen-longer, 1 rejected-longer, 1 tie
      (1L, "a", 10L, 5L), (2L, "a", 10L, 6L), (3L, "a", 10L, 7L),
      (4L, "a", 5L, 10L), (5L, "a", 8L, 8L),
      // source b: only chosen-longer → minority count 0, ties survive
      (6L, "b", 9L, 5L), (7L, "b", 7L, 7L))
      .toDF("pair_id", "source", "len_chosen", "len_rejected")
    val out = SftOps.lengthDebias(pairs).collect()
      .map(r => r.getLong(1) -> r.getString(4)).toMap
    val a = out.filterKeys(Set(1L, 2L, 3L, 4L, 5L).contains)
    assert(a.values.count(_ == "chosen_longer") === 1)
    assert(a.values.count(_ == "rejected_longer") === 1)
    assert(a(5L) === "tie")
    // source b: both longer-pairs dropped, tie kept
    assert(!out.contains(6L) && out(7L) === "tie")
  }

  test("lengthDebias repairs the q164 bias on the real fixture") {
    val docs = (0L to 499L).map(i =>
      (i, (1 to 60).map(j => s"w$j").mkString(" "), s"src${i % 20}"))
      .toDF("doc_id", "text", "source")
    val pairs = SftOps.prefPairs(docs)
    val kept = SftOps.lengthDebias(pairs)
    val bias = SftOps.lengthBias(kept.select(col("pair_id"), col("source"),
      lit("").as("prompt"), col("len_chosen"), col("len_rejected")))
    // after the repair every source's non-tie classes are balanced:
    // frac_chosen_longer = n_cl / n_pairs with n_cl == n_rl
    bias.collect().foreach { r =>
      val n = r.getAs[Long]("n_pairs")
      val ncl = r.getAs[Long]("n_chosen_longer")
      val ties = r.getAs[Long]("n_ties")
      assert(n - ties === 2 * ncl,
        s"${r.getString(0)}: $ncl chosen-longer of ${n - ties} non-ties")
    }
    // and the repair deterministic under repartition
    val again = SftOps.lengthDebias(SftOps.prefPairs(docs.repartition(9)))
      .orderBy("source", "pair_id").collect().toSeq
    assert(kept.orderBy("source", "pair_id").collect().toSeq === again)
  }
}
