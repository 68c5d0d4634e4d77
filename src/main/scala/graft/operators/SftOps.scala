package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Instruction-tuning / preference-data operators — the post-training side
  * of a training-data pipeline. Pretraining corpora are flat documents;
  * SFT and RLHF datasets are STRUCTURED (conversations with roles,
  * chosen/rejected pairs), and their curation questions are structural:
  * which tokens actually train (the loss mask), is the turn structure
  * well-formed (role alternation), and do the preference pairs carry a
  * systematic length bias the reward model will learn instead of quality
  * (the verbosity-bias failure mode documented across RLHF work).
  *
  * The test corpus has no conversation column, so — exactly like
  * [[CorpusOps.urlFixture]] and [[CorpusOps.piiFixture]] — the fixtures
  * here BUILD deterministic conversations/pairs from each document's own
  * words via doc_id arithmetic, and the operators genuinely compute over
  * the built structure. Every rule is exact integer/string arithmetic, so
  * the full chain replays in a SQL oracle (q162–q164).
  *
  * Scale shape: fixtures and per-turn fields are row-local projections
  * (one bounded explode of ≤6 turns per doc); the reports are single
  * map-side-combining aggregations keyed on conv_id or source. Nothing
  * here shuffles more than once, and no shuffle carries text wider than
  * one turn.
  */
object SftOps {

  /** Deterministic conversation fixture + flatten: one conversation per
    * document, `2 + doc_id % 5` turns of `wordsPerTurn` words each sliced
    * from the document's token stream. Docs ≡ 0 (mod 3) open with a
    * system turn; after the optional system turn roles alternate
    * user/assistant. Two anomaly families keep the audit honest: docs
    * ≡ 0 (mod 11) repeat turn 1's role at turn 2 (an alternation break —
    * a double-send), and documents shorter than the turn budget run out
    * of words, leaving empty trailing turns (the truncated-conversation
    * artifact every real SFT scrape contains).
    *
    * Output: (conv_id, n_turns, turn_ord, role, text, n_tokens).
    */
  def turns(docs: DataFrame, wordsPerTurn: Int = 8): DataFrame = {
    val id = col("conv_id")
    val sys = id % 3 === 0
    val so = when(sys, lit(1)).otherwise(lit(0)) // system offset
    val t = col("turn_ord")
    val role0 = when(sys && t === 0, "system")
      .when((t - so) % 2 === 0, "user").otherwise("assistant")
    // turn 1's role, for the mod-11 double-send override at turn 2
    val roleAt1 = when((lit(1) - so) % 2 === 0, "user").otherwise("assistant")
    val role = when(id % 11 === 0 && t === 2, roleAt1).otherwise(role0)
    val turnSlice = slice(col("_w"), t * wordsPerTurn + 1, lit(wordsPerTurn))
    docs.select(col("doc_id").as("conv_id"),
        filter(split(col("text"), " "), x => x =!= lit("")).as("_w"),
        (lit(2) + (col("doc_id") % 5)).cast("int").as("n_turns"))
      .select(col("conv_id"), col("_w"), col("n_turns"),
        explode(sequence(lit(0), col("n_turns") - 1)).as("turn_ord"))
      .select(col("conv_id"), col("n_turns"), col("turn_ord"),
        role.as("role"),
        concat_ws(" ", turnSlice).as("text"),
        size(turnSlice).cast("long").as("n_tokens"))
  }

  /** Loss-mask accounting (q162): per conversation, how many tokens the
    * run will actually TRAIN on. Chat-template fine-tuning masks
    * everything except assistant turns, and every turn additionally costs
    * `overheadPerTurn` template tokens (role header + separators) that
    * are always masked — so the trainable fraction, the number that
    * decides whether a dataset is worth its storage, is
    * assistant_tokens / (content + overhead). One map-side-combining
    * aggregation; the fraction is floor-quantized at 1e-6 (the engine
    * convention for cross-engine-exact ratios).
    */
  def lossMaskReport(turnsDf: DataFrame, overheadPerTurn: Int = 4): DataFrame = {
    val agg = turnsDf.groupBy(col("conv_id"))
      .agg(count(lit(1)).as("n_turns"),
        sum(col("n_tokens")).as("content_tokens"),
        sum(when(col("role") === "assistant", col("n_tokens"))
          .otherwise(0L)).as("trainable_tokens"))
    agg.select(col("conv_id"), col("n_turns"), col("content_tokens"),
        (col("n_turns") * overheadPerTurn).as("overhead_tokens"),
        (col("content_tokens") + col("n_turns") * overheadPerTurn)
          .as("total_tokens"),
        col("trainable_tokens"))
      .withColumn("trainable_frac",
        floor(col("trainable_tokens") * 1000000L / col("total_tokens"))
          .cast("double") / 1e6)
  }

  /** Structural chat audit (q163): the well-formedness battery an SFT
    * ingest gate runs per conversation —
    *   - `starts_ok`: opens with system or user;
    *   - `sys_only_first`: system never appears past turn 0;
    *   - `alternates_ok`: from turn 1 on, each role differs from its
    *     predecessor and is never system (i.e. after the optional system
    *     prologue the dialogue strictly alternates);
    *   - `ends_assistant`: the final turn is an assistant reply (a
    *     trailing user turn trains nothing and usually marks truncation);
    *   - `has_empty`: some turn ran out of words.
    * `verdict` = 'ok' only when all pass. The lag comparison runs in a
    * per-conversation window (≤ 6 rows per frame — bounded state); the
    * rest is one aggregation.
    */
  def chatAudit(turnsDf: DataFrame): DataFrame = {
    val wnd = Window.partitionBy(col("conv_id")).orderBy(col("turn_ord"))
    val withPrev = turnsDf.withColumn("_prev", lag(col("role"), 1).over(wnd))
    val altOk = col("turn_ord") === 0 ||
      (col("role") =!= col("_prev") && col("role") =!= "system")
    val audited = withPrev.groupBy(col("conv_id"))
      .agg(
        max(when(col("n_tokens") === 0, 1).otherwise(0)).as("_empty"),
        min(when(altOk, 1).otherwise(0)).as("_alt"),
        max(when(col("role") === "system" && col("turn_ord") > 0, 1)
          .otherwise(0)).as("_latesys"),
        min_by(col("role"), col("turn_ord")).as("_first"),
        max_by(col("role"), col("turn_ord")).as("_last"))
    audited.select(col("conv_id"),
        (col("_empty") === 1).as("has_empty"),
        col("_first").isin("system", "user").as("starts_ok"),
        (col("_latesys") === 0).as("sys_only_first"),
        (col("_alt") === 1).as("alternates_ok"),
        (col("_last") === "assistant").as("ends_assistant"))
      .withColumn("verdict",
        when(!col("has_empty") && col("starts_ok") && col("sys_only_first")
          && col("alternates_ok") && col("ends_assistant"), "ok")
          .otherwise("bad"))
  }

  /** Prompt-level conversation dedup (q166): the SFT-specific dedup
    * policy — two conversations with the same FIRST USER TURN are the
    * same training example regardless of how the assistant answered, and
    * keeping both overweights that prompt (and leaks it across splits).
    * Groups conversations by the md5 of their first user turn and keeps
    * the one with the most assistant tokens (the answer-richest copy),
    * conv_id ascending as the deterministic tiebreak — the same
    * best-copy policy as `Dedup.survivorsBest`, keyed on prompts.
    *
    * Shape: two conv_id-keyed aggregations (first user turn via min_by,
    * assistant mass via a conditional sum — one pass builds both), then
    * one aggregation on the 128-bit prompt key. Nothing wider than one
    * turn's text ever shuffles, and the struct-ordered max_by gives the
    * argmax without a window.
    */
  def promptDedup(turnsDf: DataFrame): DataFrame = {
    val perConv = turnsDf.groupBy(col("conv_id"))
      .agg(
        min_by(when(col("role") === "user", col("text")),
          when(col("role") === "user", col("turn_ord"))).as("prompt"),
        sum(when(col("role") === "assistant", col("n_tokens"))
          .otherwise(0L)).as("assistant_tokens"))
      .filter(col("prompt").isNotNull)
    // argmax by (assistant_tokens desc, conv_id asc) folded into one
    // BIGINT key — portable across engines without struct comparators;
    // the 1e12 stride keeps any realistic conv_id from crossing a token
    // step (token mass per conversation is turn-bounded, conv ids are not)
    perConv.groupBy(md5(encode(col("prompt"), "UTF-8")).as("prompt_md5"))
      .agg(count(lit(1)).as("n_convs"),
        max_by(col("conv_id"),
          col("assistant_tokens") * 1000000000000L - col("conv_id"))
          .as("keep_conv"),
        max(col("assistant_tokens")).as("kept_assistant_tokens"))
  }

  /** Deterministic preference-pair fixture: per document, a prompt (its
    * first 6 words) with a chosen completion of `10 + doc_id % 20` words
    * and a rejected completion of `5 + (doc_id·7) % 25` words, both
    * sliced from word 7 on (they compete over the same content, differing
    * in length — the shape that exposes length bias). Realized lengths
    * shrink when the document runs out of words, exactly like real
    * truncated generations.
    */
  def prefPairs(docs: DataFrame): DataFrame = {
    val id = col("pair_id")
    val chosenLen = (lit(10) + (id % 20)).cast("int")
    val rejectedLen = (lit(5) + ((id * 7) % 25)).cast("int")
    docs.select(col("doc_id").as("pair_id"), col("source"),
        filter(split(col("text"), " "), x => x =!= lit("")).as("_w"))
      .select(col("pair_id"), col("source"),
        concat_ws(" ", slice(col("_w"), 1, 6)).as("prompt"),
        size(slice(col("_w"), lit(7), chosenLen)).cast("long").as("len_chosen"),
        size(slice(col("_w"), lit(7), rejectedLen)).cast("long")
          .as("len_rejected"))
  }

  /** Deterministic agentic tool-call fixture: per document, an assistant
    * tool-call JSON `{"name":...,"arguments":{"query":...,"top_k":N}}`
    * whose query is the document's first 3 words. Four anomaly families
    * keep the audit honest (all idHash-driven so they vary within every
    * source): h%9=0 calls a tool outside the registry (`shell_exec`),
    * h%5=0 omits the required `top_k`, h%7=0 sends `top_k` as a string,
    * and h%13=0 truncates the final brace (the malformed-generation
    * artifact every agent-trajectory scrape contains).
    */
  def toolCalls(docs: DataFrame): DataFrame = {
    val h = graft.operators.CorpusOps.idHash(col("call_id"))
    val name = when(h % 9 === 0, lit("shell_exec"))
      .otherwise(element_at(typedLit(Seq("search", "calculator", "lookup")),
        (h % 3).cast("int") + 1))
    val q = concat_ws(" ",
      slice(filter(split(col("text"), " "), x => x =!= lit("")), 1, 3))
    val tkVal = when(h % 7 === 0, lit("\"many\""))
      .otherwise((h % 50).cast("string"))
    val tkPart = when(h % 5 === 0, lit(""))
      .otherwise(concat(lit(",\"top_k\":"), tkVal))
    val js0 = concat(lit("{\"name\":\""), name,
      lit("\",\"arguments\":{\"query\":\""), q, lit("\""), tkPart, lit("}}"))
    docs.select(col("doc_id").as("call_id"), col("text"))
      .withColumn("call_json",
        when(h % 13 === 0, js0.substr(lit(1), length(js0) - 1)).otherwise(js0))
      .drop("text")
  }

  /** Tool-call schema audit (q171): the structural gate an agentic-SFT
    * ingest runs per trajectory step — does the call parse as JSON at
    * all (`try_parse_json`, not the lenient path extractor: Jackson
    * happily reads a prefix of truncated JSON, so extraction success is
    * NOT validity), is the tool in the registry, is the required query
    * non-empty, and is `top_k` present with an integer value. Every
    * field extraction is validity-gated so both engines see null fields
    * on malformed calls. Row-local, zero shuffle.
    */
  def toolCallAudit(calls: DataFrame,
      allowed: Seq[String] = Seq("search", "calculator", "lookup")): DataFrame = {
    val js = col("call_json")
    val valid = try_parse_json(js).isNotNull
    val name = when(valid, get_json_object(js, "$.name"))
    val q = when(valid, get_json_object(js, "$.arguments.query"))
    val tk = when(valid, get_json_object(js, "$.arguments.top_k"))
    calls.select(col("call_id"), js,
        valid.as("is_valid_json"),
        name.as("name"),
        coalesce(name.isin(allowed: _*), lit(false)).as("name_allowed"),
        coalesce(length(q) > 0, lit(false)).as("has_query"),
        coalesce(tk.rlike("^[0-9]+$"), lit(false)).as("topk_ok"))
      .withColumn("verdict",
        when(col("is_valid_json") && col("name_allowed") && col("has_query")
          && col("topk_ok"), "ok").otherwise("bad"))
  }

  /** Preference-pair TEXT fixture: like [[prefPairs]] but materializing
    * the competing completions as token arrays. Chosen starts at word 7;
    * rejected starts at a shifted offset (7 + pair_id%4, or word 40 for
    * the pair_id%9=0 family) — overlapping-but-shifted windows, so
    * unigram and bigram overlap genuinely vary per pair instead of one
    * side being a prefix of the other.
    */
  def prefPairTexts(docs: DataFrame): DataFrame = {
    val id = col("pair_id")
    val cLen = (lit(10) + (id % 20)).cast("int")
    val rLen = (lit(5) + ((id * 7) % 25)).cast("int")
    val rOff = when(id % 9 === 0, lit(40))
      .otherwise((lit(7) + (id % 4)).cast("int"))
    docs.select(col("doc_id").as("pair_id"), col("source"),
        filter(split(col("text"), " "), x => x =!= lit("")).as("_w"))
      .select(col("pair_id"), col("source"),
        slice(col("_w"), lit(7), cLen).as("chosen"),
        slice(col("_w"), rOff, rLen).as("rejected"))
  }

  /** Preference-pair ROUGE audit (q175): multiset n-gram overlap between
    * chosen and rejected — the uninformative-pair detector. A pair whose
    * completions are near-identical (ROUGE-F ≈ 1) teaches the reward
    * model nothing and dilutes the update; a standard DPO/RLHF ingest
    * filter drops them. Reports ROUGE-1 and ROUGE-2 overlap counts and
    * F-scores per pair; F = 2·ov/(nc+nr) exactly (the harmonic mean of
    * P=ov/nr and R=ov/nc collapses), floor-quantized at millionths from
    * exact BIGINT counts.
    *
    * Scale shape: per n, one bounded explode of each side's grams, two
    * map-side-combining (pair,gram) counts, an equi-join on (pair,gram)
    * (multiset min via least), and a pair-keyed sum — all equi-shuffles
    * on pair-bounded rows; totals are row-local array sizes.
    */
  def pairRouge(pairs: DataFrame): DataFrame = {
    // completions can be shorter than n (truncated docs): wordNgrams'
    // position sequence would run DESCENDING into slice(start=0) there,
    // so gate on size — n=1 is the array itself
    def grams(c: String, n: Int): Column =
      if (n == 1) col(c)
      else when(size(col(c)) >= n, TextAnalysis.wordNgrams(col(c), n))
        .otherwise(array().cast("array<string>"))
    def ov(n: Int): DataFrame = {
      def side(c: String) = pairs
        .select(col("pair_id"), explode(grams(c, n)).as("g"))
        .groupBy(col("pair_id"), col("g"))
        .agg(count(lit(1)).as(s"c_$c"))
      side("chosen").join(side("rejected"), Seq("pair_id", "g"))
        .groupBy(col("pair_id"))
        .agg(sum(least(col("c_chosen"), col("c_rejected"))).as(s"ov$n"))
    }
    def sz(c: String, n: Int) =
      greatest(size(col(c)) - (n - 1), lit(0)).cast("long")
    def f6(ovc: Column, nc: Column, nr: Column): Column =
      when(nc + nr > 0,
        floor(coalesce(ovc, lit(0L)) * 2L * 1000000L / (nc + nr))
          .cast("double") / 1e6).otherwise(lit(0.0))
    pairs.select(col("pair_id"), col("source"),
        sz("chosen", 1).as("nc1"), sz("rejected", 1).as("nr1"),
        sz("chosen", 2).as("nc2"), sz("rejected", 2).as("nr2"))
      .join(ov(1), Seq("pair_id"), "left")
      .join(ov(2), Seq("pair_id"), "left")
      .select(col("pair_id"), col("source"), col("nc1"), col("nr1"),
        coalesce(col("ov1"), lit(0L)).as("overlap1"),
        f6(col("ov1"), col("nc1"), col("nr1")).as("rouge1_f"),
        col("nc2"), col("nr2"),
        coalesce(col("ov2"), lit(0L)).as("overlap2"),
        f6(col("ov2"), col("nc2"), col("nr2")).as("rouge2_f"))
  }

  /** Length-debiased preference subsample (q191): the REPAIR for the
    * bias [[lengthBias]] diagnoses — per source, downsample the majority
    * length-direction class (chosen-longer vs rejected-longer) to the
    * minority count, so a reward model trained on the survivors cannot
    * learn "longer wins" from this source's class ratio alone. Ties
    * carry no length signal and pass through untouched. The kept subset
    * is the deterministic id-hash order within each (source, class) —
    * reproducible, and unbiased w.r.t. anything correlated with pair_id.
    *
    * Shapes: one tiny (source, class) count aggregation broadcast back,
    * and per-(source, class) ranking windows cut at the minority count
    * (WindowGroupLimit-bounded). Output keeps the pair rows plus their
    * class tag.
    */
  def lengthDebias(pairs: DataFrame): DataFrame = {
    val cls = when(col("len_chosen") > col("len_rejected"), "chosen_longer")
      .when(col("len_chosen") < col("len_rejected"), "rejected_longer")
      .otherwise("tie")
    val tagged = pairs.withColumn("class", cls)
    val counts = tagged.filter(col("class") =!= "tie")
      .groupBy(col("source")).agg(
        sum(when(col("class") === "chosen_longer", 1L).otherwise(0L)).as("ncl"),
        sum(when(col("class") === "rejected_longer", 1L).otherwise(0L)).as("nrl"))
      .withColumn("keep_n", least(col("ncl"), col("nrl")))
      .select(col("source"), col("keep_n"))
    val w = Window.partitionBy(col("source"), col("class"))
      .orderBy(graft.operators.CorpusOps.idHash(col("pair_id")), col("pair_id"))
    tagged.join(broadcast(counts), Seq("source"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("class") === "tie" || col("rk") <= col("keep_n"))
      .select(col("source"), col("pair_id"), col("len_chosen"),
        col("len_rejected"), col("class"))
  }

  /** Preference length-bias audit (q164): per source, how often the
    * chosen completion is simply the LONGER one, and by how much. A
    * reward model trained on pairs where frac_chosen_longer ≫ 0.5 learns
    * verbosity, not quality — this table is the go/no-go read before
    * training. Exact BIGINT counts and sums; the fraction and the mean
    * token delta are floor-quantized at 1e-6. One aggregation to
    * |sources| rows.
    */
  def lengthBias(pairs: DataFrame): DataFrame =
    pairs.groupBy(col("source"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(when(col("len_chosen") > col("len_rejected"), 1L).otherwise(0L))
          .as("n_chosen_longer"),
        sum(when(col("len_chosen") === col("len_rejected"), 1L).otherwise(0L))
          .as("n_ties"),
        sum(col("len_chosen") - col("len_rejected")).as("sum_delta"))
      .select(col("source"), col("n_pairs"), col("n_chosen_longer"),
        col("n_ties"),
        (floor(col("n_chosen_longer") * 1000000L / col("n_pairs"))
          .cast("double") / 1e6).as("frac_chosen_longer"),
        (floor(col("sum_delta") * 1000000L / col("n_pairs"))
          .cast("double") / 1e6).as("mean_delta"))
}
