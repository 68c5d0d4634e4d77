package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for LLM-data pipelines (SURVEY.md §0 north-star
  * extension; no counterpart in the reference): language ID, quality
  * scoring, token counting, document fingerprinting.
  *
  * All pure Catalyst expressions — codegen'd, no UDFs, shuffle-free
  * (per-row), so they scale linearly with input splits at 100 TB.
  */
object TextAnalysis {

  /** Whitespace tokens, empty strings dropped. */
  def wsTokens(c: Column): Column = filter(split(c, " "), x => x =!= "")

  /** Word n-gram array over a token array: positions 1..size-(n-1),
    * space-joined. Shared by shingling (Dedup) and n-gram stats
    * (CorpusOps) so tokenization/slicing fixes stay in one place.
    */
  def wordNgrams(w: Column, n: Int): Column =
    transform(sequence(lit(1), size(w) - (n - 1)),
      i => concat_ws(" ", slice(w, i, lit(n))))

  /** BPE-ish subword pre-tokenization: letter runs, digit runs, single
    * punctuation — the usual byte-pair pre-split regex family. The
    * whitespace class is spelled out rather than `\s` because Java's
    * `\s` includes U+000B vertical tab while RE2's (the oracle's) does
    * not — the explicit class is identical in both engines.
    */
  def bpeTokens(c: Column): Column =
    regexp_extract_all(c, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \\t\\n\\r\\f\\x0B]"), lit(0))

  val Stopwords: Seq[String] =
    Seq("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")

  /** Language marker lexicons (tiny n-gram/stopword heuristic). */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it", "was", "for"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "una", "los", "es"),
    "fr" -> Seq("le", "la", "de", "et", "un", "une", "les", "des", "est", "dans"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "eine", "zu", "den", "von"),
    "zh" -> Seq("的", "是", "在", "了", "和", "有", "我", "不", "人", "这"))

  private def markerScore(tokens: Column, markers: Seq[String]): Column =
    size(filter(tokens, t => t.isin(markers.map(lit): _*)))

  /** Heuristic language ID: argmax of marker-token counts with a fixed
    * priority order for ties (first listed wins on >=).
    */
  def langIdExpr(text: Column): Column = {
    val toks = wsTokens(lower(text))
    val scores = LangMarkers.map { case (l, ms) => l -> markerScore(toks, ms) }
    val best = greatest(scores.map(_._2): _*)
    scores.foldRight(lit("und")) { case ((l, s), elseC) =>
      when(s >= best && s > 0, lit(l)).otherwise(elseC)
    }
  }

  /** 4-decimal floor quantization. Used instead of round() for
    * ratios-of-small-integers: Spark rounds doubles via exact decimal
    * conversion while other engines multiply-then-round, so values landing
    * exactly on `x.xxxx5` diverge; `floor(x*10000)/10000` is the same
    * float ops everywhere → bit-identical.
    */
  def quant4(c: Column): Column = floor(c * 10000) / 10000

  /** Repetition quality signals (the Gopher/RefinedWeb-style filters):
    * duplicate-word fraction and duplicate-bigram fraction per document —
    * high values mean boilerplate/template text a training pipeline drops.
    * Whitespace tokenization matches the dedup shingler; ratios are
    * 4dp-floored (`quant4`) for cross-engine comparability. Row-local
    * projections: embarrassingly parallel at any scale.
    */
  /** Gopher-style composite quality gate: the standard rule battery
    * (word-count bounds, mean word length, stopword presence, duplicate-
    * word fraction, digit density) evaluated per document into a keep
    * decision plus the ordered list of failed rules — what a pipeline
    * logs to audit WHY a document was dropped. All row-local expressions
    * over [[withQuality]]/[[repetition]] metrics: shuffle-free at any
    * scale. Rule order is fixed so the reasons string is deterministic.
    */
  def gopherFilter(df: DataFrame, textCol: String = "text",
      minWords: Int = 20, maxWords: Int = 100000,
      minAvgLen: Double = 3.0, maxAvgLen: Double = 10.0,
      maxDupWordFrac: Double = 0.6, maxDigitRatio: Double = 0.1): DataFrame = {
    val q = repetition(withQuality(df, textCol), textCol)
    val rules: Seq[(String, Column)] = Seq(
      "word_count" -> (col("n_words") >= minWords && col("n_words") <= maxWords),
      "word_length" -> (col("avg_word_len") >= minAvgLen
        && col("avg_word_len") <= maxAvgLen),
      "stopword" -> (col("stopword_ratio") > 0),
      "repetition" -> (col("dup_word_frac") <= maxDupWordFrac),
      "digits" -> (col("digit_ratio") <= maxDigitRatio))
    // when() without otherwise → null for passing rules; concat_ws skips
    // nulls, leaving the comma-joined failed-rule names in rule order
    val reasons = concat_ws(",", rules.map { case (n, ok) => when(!ok, n) }: _*)
    q.withColumn("reject_reasons", reasons)
      .withColumn("keep", col("reject_reasons") === "")
  }

  def repetition(df: DataFrame, textCol: String = "text"): DataFrame = {
    // Tokenization is materialized at a projection boundary ONCE and every
    // later expression references the attribute: inlining `w` into the
    // per-position bigram lambda would re-run split+filter per element —
    // the O(tokens²)-per-row constraint-propagation trap SCALE.md documents
    // for q52. CollapseProject keeps the boundary (split is not "cheap").
    val w = filter(split(col(textCol), " "), x => x =!= "")
    val staged = df.withColumn("_w", w)
    val nw = size(col("_w"))
    // bigrams = zip(w, w[2:]) — two O(n) array ops, no per-element lookup
    val bigrams = when(nw >= 2,
      zip_with(col("_w"), slice(col("_w"), lit(2), greatest(nw - 1, lit(0))),
        (a, b) => concat(a, lit(" "), b)))
      .otherwise(array())
    staged
      .withColumn("n_words", nw.cast("long"))
      .withColumn("dup_word_frac",
        when(nw > 0, quant4(lit(1.0) -
          size(array_distinct(col("_w"))).cast("double") / nw)).otherwise(lit(0.0)))
      // zip_with pads to the LONGER input: the last element pairs w[n]
      // with null → a null bigram; slice to n-1 before counting
      .withColumn("_bg", when(nw >= 2, slice(bigrams, lit(1), nw - 1)).otherwise(array()))
      .withColumn("dup_bigram_frac",
        when(size(col("_bg")) > 0, quant4(lit(1.0) -
          size(array_distinct(col("_bg"))).cast("double") / size(col("_bg"))))
          .otherwise(lit(0.0)))
      .drop("_bg", "_w")
  }

  /** Quality metrics + composite score per document. */
  def withQuality(df: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val nChars = length(t)
    val toks = wsTokens(t)
    val nWords = size(toks)
    val punct = length(regexp_replace(t, "[^.,;:!?]", ""))
    val digits = length(regexp_replace(t, "[^0-9]", ""))
    val stop = size(filter(toks, x => x.isin(Stopwords.map(lit): _*)))
    df.withColumn("n_chars", nChars.cast("long"))
      .withColumn("n_words", nWords.cast("long"))
      .withColumn("avg_word_len",
        quant4(length(regexp_replace(t, " ", "")).cast("double") / nWords))
      .withColumn("punct_ratio", quant4(punct.cast("double") / nChars))
      .withColumn("digit_ratio", quant4(digits.cast("double") / nChars))
      .withColumn("stopword_ratio", quant4(stop.cast("double") / nWords))
      .withColumn("quality_score",
        quant4(lit(0.4) * least(lit(1.0), nWords.cast("double") / 50.0)
          + lit(0.3) * (lit(1.0) - punct.cast("double") / nChars)
          + lit(0.3) * least(lit(1.0), stop.cast("double") / nWords * 5.0)))
  }

  /** Deflate compression ratio per document — the Gopher/RedPajama-family
    * compressibility signal: highly compressible text (ratio ≪ typical
    * prose) is repetitive/templated/boilerplate; incompressible text
    * (ratio ≈ 1) is noise, minified code, or encoded binary. Both tails
    * are what curation drops; natural prose sits in the 0.3–0.7 band.
    * Emits raw byte counts and the 4dp-floored ratio; the gate
    * composition stays with the caller (e.g. AND it into
    * [[gopherFilter]]'s battery).
    *
    * zlib (`java.util.zip.Deflater`, fixed level 6) is JVM-native work no
    * Catalyst expression covers, so this is the documented `mapPartitions`
    * codec shape ([[graft.operators.Multimodal]]): one Deflater per
    * PARTITION, `reset()` per row — allocation cost amortized exactly
    * like a batch UDF; row-local, shuffle-free at any scale. No SQL
    * oracle (DuckDB has no deflate) — contract specs assert the
    * discriminating property instead, the same pattern as the sketch and
    * xxhash64 operators.
    */
  def compressionRatio(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { it =>
        val d = new java.util.zip.Deflater(6)
        it.map { case (id, text) =>
          val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          d.reset()
          d.setInput(bytes)
          d.finish()
          var total = 0L
          val buf = new Array[Byte](8192)
          while (!d.finished()) total += d.deflate(buf)
          val ratio =
            if (bytes.isEmpty) 1.0
            else math.floor(total.toDouble / bytes.length * 10000) / 10000
          (id, bytes.length.toLong, total, ratio)
        }
      }
      .toDF(idCol, "n_bytes", "n_compressed", "ratio")
  }

  /** Unicode text normalization (q260) — the canonical-form pass every
    * multi-source corpus needs BEFORE dedup and tokenization: the same
    * word crawled as composed "é" and as "e"+U+0301 hashes differently,
    * splitting near-dup clusters and inflating vocabularies; zero-width
    * characters hide inside tokens; curly quotes/dashes fork otherwise
    * identical n-grams. Stages (each a defined, oracle-replayable
    * transform):
    *
    *   1. NFC canonical composition — the native codegen
    *      [[graft.functions.NfcNormalize]] expression (java.text
    *      .Normalizer implements UAX#15 exactly as DuckDB's utf8proc,
    *      so outputs compare byte-for-byte);
    *   2. invisible-format strip: ZWSP/ZWNJ/ZWJ/BOM/soft-hyphen;
    *   3. typographic standardization: curly quotes → ASCII quotes,
    *      en/em dash → hyphen.
    *
    * Emits the cleaned text plus the audit columns a curation report
    * wants (changed flag, before/after char counts). Row-local codegen
    * end to end — no shuffle, no UDF. Idempotent: normalize ∘ normalize
    * = normalize (spec-pinned).
    */
  def normalizeText(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    val nfc = graft.functions.TextHashFunctions
      .nfcNormalize(spark, col(textCol))
    val cleaned =
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(nfc, "[\u200B\u200C\u200D\uFEFF\u00AD]", ""),
            "[\u2018\u2019]", "'"),
          "[\u201C\u201D]", "\""),
        "[\u2013\u2014]", "-")
    docs.select(col(idCol),
      cleaned.as("text_clean"),
      (cleaned =!= col(textCol)).as("changed"),
      length(col(textCol)).cast("long").as("n_chars_before"),
      length(cleaned).cast("long").as("n_chars_after"))
  }

  /** Polynomial rolling hash fingerprint over characters,
    * `h = (h*31 + codepoint) mod (2^31-1)` — order-sensitive, so it
    * distinguishes permuted documents where bag-of-words hashes collide.
    */
  def fingerprintExpr(text: Column): Column =
    aggregate(
      split(text, ""),
      lit(0L),
      (acc, ch) => pmod(acc * 31 + ascii(ch), lit(2147483647L)))

  /** Deterministic MODEL-FREE text embedding: feature-hashed bag of words
    * through a Johnson–Lindenstrauss ±1 sign matrix —
    * emb[j] = Σ_tokens sign(mix(hash(token), j)). The cheap vectorizer
    * that drops documents into the same geometric toolbox as the
    * `embeddings` table (ANN, k-means, SemDeDup, outliers) with no model
    * in the loop: documents sharing vocabulary land near each other
    * (bag-of-words cosine is preserved in expectation, JL). Components
    * are INTEGER-valued — token hash is the [[fingerprintExpr]]
    * recurrence per token, signs are popcount parity (the q73 formula) —
    * so the vector is exactly engine-replicable; only the norm rounds.
    *
    * Row-local per document: one linear pass per (token, dim) pair, no
    * shuffle, scales with input splits. Round 12 promoted the HOF nest
    * (which left whole-stage codegen and risked lambda-tree
    * duplication) to the native [[graft.functions.JlEmbed]] expression
    * — the kernel-promotion path q27's shingle_hashes took; the spec
    * pins bit-equality against the original HOF formulation.
    */
  /** Deterministic mixed-script fixture: appends idHash-selected Unicode
    * snippets to each document — Cyrillic words (h%4=1), CJK words
    * (h%4=2), a Latin/Cyrillic CONFUSABLE token "pаypal" whose second
    * letter is U+0430 CYRILLIC SMALL A (h%4=3, the classic homoglyph
    * spoof), and invisible zero-width + bidi-override controls ahead of a
    * word (h%10=0, the text-injection artifact). The corpus is otherwise
    * pure ASCII, so every non-Latin count below is fixture-attributable.
    */
  def scriptFixture(id: Column, text: Column): Column = {
    val h = CorpusOps.idHash(id)
    concat(text,
      when(h % 4 === 1, lit(" привет мир"))
        .when(h % 4 === 2, lit(" 你好世界"))
        .when(h % 4 === 3, lit(" pаypal"))
        .otherwise(lit("")),
      when(h % 10 === 0, lit(" \u200B\u202Ehidden")).otherwise(lit("")))
  }

  /** Unicode script-mix audit (q172): the curation/safety signals a
    * multilingual or spam-facing pipeline reads per document — per-script
    * character counts (Latin / Cyrillic / CJK), invisible-control count
    * (zero-width chars U+200B–U+200F and bidi overrides U+202A–U+202E,
    * the text-injection and render-spoof vector), mixed-script token
    * count (a single token containing both Latin and Cyrillic letters:
    * the homoglyph-phishing shape that per-document script ratios miss),
    * a precedence-deterministic dominant script, and a `suspicious`
    * verdict (any invisible control or confusable token). Counts are
    * length-minus-stripped-length over codegen'd regexes — row-local,
    * zero shuffle, identical code-point semantics in both engines.
    */
  def scriptMix(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    def cnt(cls: String): Column =
      length(t) - length(regexp_replace(t, cls, ""))
    val latin = cnt("[A-Za-z]")
    val cyr = cnt("[\\u0400-\\u04FF]")
    val cjk = cnt("[\\u4E00-\\u9FFF]")
    val ctl = cnt("[\\u200B-\\u200F\\u202A-\\u202E]")
    val mixed = size(filter(wsTokens(t), w =>
      w.rlike("[A-Za-z]") && w.rlike("[\\u0400-\\u04FF]")))
    docs.select(col(idCol),
        latin.cast("long").as("n_latin"),
        cyr.cast("long").as("n_cyrillic"),
        cjk.cast("long").as("n_cjk"),
        ctl.cast("long").as("n_controls"),
        mixed.cast("long").as("n_mixed_tokens"))
      .withColumn("dominant_script",
        when(col("n_latin") >= col("n_cyrillic")
          && col("n_latin") >= col("n_cjk"), "latin")
          .when(col("n_cyrillic") >= col("n_cjk"), "cyrillic")
          .otherwise("cjk"))
      .withColumn("suspicious",
        col("n_controls") > 0 || col("n_mixed_tokens") > 0)
  }

  /** Sentence-izing fixture for q205: the corpus tables carry no
    * punctuation, so every `every`-th token gets a trailing period —
    * giving documents a real words-per-sentence around `every` instead
    * of one degenerate corpus-length sentence. Index-driven transform
    * (both engines address w[i] O(1)); empty docs pass through.
    */
  def sentenceFixture(text: Column, every: Int = 12): Column = {
    val w = wsTokens(text)
    when(size(w) >= 1,
      array_join(transform(sequence(lit(1), size(w)), i =>
        when(i % every === 0, concat(element_at(w, i), lit(".")))
          .otherwise(element_at(w, i))), " "))
      .otherwise(text)
  }

  /** Flesch reading-ease readability (q205): 206.835 − 1.015·(words/
    * sentence) − 84.6·(syllables/word) with the standard band verdict —
    * the classic prose-complexity gate a curation pipeline runs next to
    * [[withQuality]] (quality asks "is it text at all", readability asks
    * "what register of text"). Syllables use the deterministic
    * vowel-group heuristic max(1, |[aeiouy]+ runs|) per token; sentences
    * are terminator runs [.!?]+ clamped to ≥1. Both ratios pass through
    * exact BIGINT millionths before the (identical-order) double
    * arithmetic, so the 1e-4-floored score and its band agree
    * cross-engine. Row-local, zero shuffle.
    */
  def readability(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val staged = docs.withColumn("_t", wsTokens(lower(t)))
    val syl = aggregate(col("_t"), lit(0L), (a, w) =>
      a + greatest(lit(1),
        size(regexp_extract_all(w, lit("[aeiouy]+"), lit(0)))).cast("long"))
    staged
      .withColumn("n_words", size(col("_t")).cast("long"))
      .withColumn("n_sentences",
        greatest(lit(1),
          size(regexp_extract_all(t, lit("[.!?]+"), lit(0)))).cast("long"))
      .withColumn("n_syllables", syl)
      .withColumn("wps6", expr("n_words * 1000000 div n_sentences"))
      .withColumn("spw6", when(col("n_words") > 0,
        expr("n_syllables * 1000000 div n_words")).otherwise(lit(0L)))
      .withColumn("flesch",
        floor((lit(206.835)
          - lit(1.015) * (col("wps6").cast("double") / 1e6)
          - lit(84.6) * (col("spw6").cast("double") / 1e6)) * 10000)
          / 10000)
      .withColumn("band",
        when(col("flesch") >= 70.0, "easy")
          .when(col("flesch") >= 50.0, "standard")
          .otherwise("difficult"))
      .select(col(idCol), col("n_words"), col("n_sentences"),
        col("n_syllables"),
        (col("wps6").cast("double") / 1e6).as("words_per_sentence"),
        (col("spw6").cast("double") / 1e6).as("syllables_per_word"),
        col("flesch"), col("band"))
  }

  /** Category blocklist for the q204 safety gate — the C4-style badwords
    * mechanism with a deliberately tame demonstration lexicon (the
    * mechanics, not the list, are the operator: swap in a production
    * blocklist per category without touching the plan). Categories carry
    * their own policy: `any` flags on a single hit (the zero-tolerance
    * class), `repeat` flags only at ≥2 hits (incidental single mentions
    * pass).
    */
  val UnsafeLexicon: Seq[(String, Seq[String], String)] = Seq(
    ("weapons", Seq("rifle", "pistol", "ammo", "grenade"), "any"),
    ("drugs", Seq("meth", "opioid", "fentanyl"), "any"),
    ("gambling", Seq("casino", "poker", "jackpot", "betting"), "repeat"),
    ("profanity", Seq("damn", "hell", "crap"), "repeat"))

  /** Deterministic lexicon-hit fixture: idHash classes append a single
    * zero-tolerance term, a repeated `repeat`-class term (flags), a
    * SINGLE `repeat`-class term (must NOT flag), or nothing.
    */
  def unsafeFixture(id: Column, text: Column): Column = {
    val h = CorpusOps.idHash(id)
    concat(text,
      when(h % 6 === 1, lit(" rifle"))
        .when(h % 6 === 2, lit(" casino poker"))
        .when(h % 6 === 3, lit(" damn"))
        .when(h % 6 === 4, lit(" meth casino"))
        .otherwise(lit("")))
  }

  /** Lexicon safety gate (q204): per document, hit counts for every
    * blocklist category (case-insensitive whole-token match — substring
    * matching is the classic C4 false-positive bug: "class" ⊃ "ass"),
    * the per-category policy verdict from [[UnsafeLexicon]], a keep
    * decision, and the ordered comma-joined list of tripped categories
    * for drop auditing. One tokenize + |categories| array filters per
    * row — row-local, codegen'd, zero shuffle.
    */
  def unsafeGate(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val toks = wsTokens(lower(col(textCol)))
    val staged = docs.withColumn("_t", toks)
    val counts = UnsafeLexicon.map { case (cat, terms, _) =>
      cat -> size(filter(col("_t"), t => t.isin(terms.map(lit): _*)))
        .cast("long")
    }
    val flags = UnsafeLexicon.map { case (cat, _, policy) =>
      val n = col(s"n_$cat")
      cat -> (if (policy == "any") n >= 1 else n >= 2)
    }
    val withCounts = counts.foldLeft(staged) { case (df, (cat, c)) =>
      df.withColumn(s"n_$cat", c)
    }
    val reasons = concat_ws(",",
      flags.map { case (cat, bad) => when(bad, cat) }: _*)
    withCounts.drop("_t")
      .withColumn("flag_reasons", reasons)
      .withColumn("keep", col("flag_reasons") === "")
      .select(col(idCol) +: counts.map(c => col(s"n_${c._1}")) :+
        col("flag_reasons") :+ col("keep"): _*)
  }

  /** Mojibake signature → repair table (q200), ORDERED: each left side is
    * the cp1252 rendering of a common UTF-8 sequence decoded as single
    * bytes (é → C3 A9 → "Ã©"; ’ → E2 80 99 → "â€™"), i.e. the ftfy-style
    * closed set of double-encoding artifacts; the right side is the
    * character the bytes originally encoded. Longer (3-char) signatures
    * sit first so the chained repair never rewrites a prefix of a longer
    * artifact. The q200 oracle is GENERATED from this same list, so
    * operator and oracle cannot drift.
    */
  val mojibakeMap: Seq[(String, String)] = Seq(
    "\u00E2\u20AC\u2122" -> "\u2019", // a-circ,euro,tm -> right quote
    "\u00E2\u20AC\u0153" -> "\u201C", // a-circ,euro,oe -> left dquote
    "\u00C3\u00A9" -> "\u00E9",        // A-tilde,copyright -> e-acute
    "\u00C3\u00A8" -> "\u00E8",        // A-tilde,diaeresis -> e-grave
    "\u00C3\u00AF" -> "\u00EF",        // A-tilde,macron -> i-diaeresis
    "\u00C3\u00A7" -> "\u00E7",        // A-tilde,section -> c-cedilla
    "\u00C2\u00A0" -> " ")              // A-circ,NBSP -> plain space

  /** Deterministic encoding-damage fixture: four idHash classes append a
    * mojibake-damaged phrase (single or multiple artifacts), a CLEAN
    * accented phrase (the false-positive probe — correctly-encoded é/è/ï
    * must not flag), or nothing.
    */
  /** The fixture phrases, shared with the q200 oracle builder (which
    * re-emits them as chr() concatenations) so both engines append
    * byte-identical text. Classes 1\u20133 are damaged; class 4 is CLEAN
    * accented text \u2014 the false-positive probe.
    */
  val MojibakePhrases: Seq[String] = Seq(
    " caf\u00C3\u00A9 cr\u00C3\u00A8me",
    " it\u00E2\u20AC\u2122s \u00E2\u20AC\u0153very\u00E2\u20AC\u0153 good",
    " na\u00C3\u00AFve fa\u00C3\u00A7ade r\u00C3\u00A9sum\u00C3\u00A9",
    " caf\u00E9 cr\u00E8me na\u00EFve")

  def mojibakeFixture(id: Column, text: Column): Column = {
    val h = CorpusOps.idHash(id)
    concat(text,
      when(h % 5 === 1, lit(MojibakePhrases(0)))
        .when(h % 5 === 2, lit(MojibakePhrases(1)))
        .when(h % 5 === 3, lit(MojibakePhrases(2)))
        .when(h % 5 === 4, lit(MojibakePhrases(3)))
        .otherwise(lit("")))
  }

  /** Encoding-damage scan + repair (q200): per document, the count of
    * mojibake artifacts from [[mojibakeMap]], a damaged verdict, and the
    * repaired text with every artifact mapped back to its original
    * character — the web-corpus cleaning pass that runs before any
    * quality scoring (a damaged "café" tokenizes as garbage and drags
    * down language-ID and stopword ratios). Counting is the exact
    * literal-replace length delta (no regex: the signatures contain no
    * metacharacters and plain replace keeps both engines byte-identical);
    * repair is the ordered replacement chain. Row-local and codegen'd —
    * zero shuffle at any scale.
    */
  def mojibake(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val n = mojibakeMap.map { case (sig, _) =>
      ((length(t) - length(replace(t, lit(sig), lit("")))) / sig.length)
        .cast("long")
    }.reduce(_ + _)
    val repaired = mojibakeMap.foldLeft(t) { case (c, (sig, fix)) =>
      replace(c, lit(sig), lit(fix))
    }
    docs.select(col(idCol), n.as("n_mojibake"), (n > 0).as("damaged"),
      repaired.as("repaired"))
  }

  def textEmbed(docs: DataFrame, dim: Int = 16, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val st = graft.functions.TextHashFunctions.jlEmbed(
      docs.sparkSession, col(textCol), dim)
    docs.withColumn("_jl", st)
      .select(col(idCol).as("doc_id"),
        col("_jl.n_tokens").as("n_tokens"),
        col("_jl.emb").as("emb"))
  }

  /** The pre-promotion HOF formulation of [[textEmbed]], kept ONLY as
    * the spec's bit-equality reference for the native kernel — never
    * call it on real data (it leaves whole-stage codegen and one lambda
    * fold per character).
    */
  private[graft] def textEmbedHof(docs: DataFrame, dim: Int = 16,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val tokenHash = (t: Column) => aggregate(
      filter(split(t, ""), c => c =!= ""),
      lit(0L),
      (acc, ch) => pmod(acc * 31 + ascii(ch), lit(2147483647L)))
    val hs = transform(wsTokens(col(textCol)), tokenHash)
    val emb = transform(sequence(lit(0), lit(dim - 1)), j =>
      aggregate(hs, lit(0L), (a, h) =>
        a + when(bit_count(h * 2654435761L + j.cast("long") * 2246822519L)
          % 2 === 0, 1L).otherwise(-1L)))
    docs.select(col(idCol).as("doc_id"),
      size(wsTokens(col(textCol))).cast("long").as("n_tokens"),
      emb.as("emb"))
  }

  /** Code-likeness gate (q227) — the prose/code router a pretraining
    * mixture needs BEFORE weighting (code belongs in the corpus, but at
    * a chosen rate and through code-specific cleaning, not the prose
    * gates: Gopher's stopword/punctuation rules mis-score source files
    * wholesale). Five row-local signals, each an exact millionth ratio:
    * symbol-char density ({};()=<>[]), semicolon-terminated line
    * fraction, indented-line fraction, bounded keyword hits
    * (def/class/return/import/function/var/val/if/for/while), bounded
    * camelCase-token hits. The composite is an integer fold —
    * code₆ = min(10⁶, (2·sym₆ + 2·semi₆ + ind₆)/5 + 25000·min(kw,20)
    * + 15000·min(camel,20)) — with `is_code` at the 0.30 operating
    * point. Weights are heuristic by design (it's a GATE, not a
    * classifier); the spec pins the operating point on planted
    * code/prose fixtures. Zero shuffle; line splitting uses
    * startswith/endswith, not regex, so both engines tokenize lines
    * identically.
    */
  def codeScore(df: DataFrame, textCol: String = "text"): DataFrame = {
    val kwPat = "\\b(def|class|return|import|function|var|val|if|for|while)\\b"
    val camelPat = "\\b[a-z]+[A-Z][A-Za-z0-9]*\\b"
    val staged = df
      .withColumn("_nc", greatest(length(col(textCol)), lit(1)))
      .withColumn("_sym", length(col(textCol)) -
        length(regexp_replace(col(textCol), "[{}();=<>\\[\\]]", "")))
      .withColumn("_ln", split(col(textCol), "\n"))
      .withColumn("_nl", greatest(size(col("_ln")), lit(1)))
      .withColumn("_semi",
        size(filter(col("_ln"), x => x.endsWith(";"))))
      .withColumn("_ind",
        size(filter(col("_ln"),
          x => x.startsWith("  ") || x.startsWith("\t"))))
      .withColumn("_kw",
        size(regexp_extract_all(col(textCol), lit(kwPat), lit(0))))
      .withColumn("_camel",
        size(regexp_extract_all(col(textCol), lit(camelPat), lit(0))))
    staged
      .withColumn("sym6", expr("cast(_sym as bigint) * 1000000 div _nc"))
      .withColumn("semi6", expr("cast(_semi as bigint) * 1000000 div _nl"))
      .withColumn("ind6", expr("cast(_ind as bigint) * 1000000 div _nl"))
      .withColumn("code6", expr(
        "least(cast(1000000 as bigint), (2 * sym6 + 2 * semi6 + ind6) " +
          "div 5 + least(cast(_kw as bigint), 20) * 25000 " +
          "+ least(cast(_camel as bigint), 20) * 15000)"))
      .withColumn("code_score", col("code6").cast("double") / 1e6)
      .withColumn("is_code", col("code6") >= 300000L)
      .drop("_nc", "_sym", "_ln", "_nl", "_semi", "_ind", "_kw", "_camel")
  }

  /** Tokenizer fertility per group (q294) — the multilingual mixture
    * designer's number: subword tokens per whitespace word (fertility)
    * and characters per subword token, under the engine's regex
    * subword proxy (the q34 tokenizer: letter runs / digit runs /
    * single marks — a BPE stand-in that both engines replay exactly).
    * High-fertility languages consume budget faster per WORD of
    * content; chars-per-token is the compression read. Exact BIGINT
    * sums, one truncating ×10⁶ division per ratio; groups with zero
    * words/subtokens report NULL.
    *
    * Scale: row-local token counts, one aggregation, |groups| rows.
    */
  def tokenizerFertility(df: DataFrame, groupCol: String,
      textCol: String = "text"): DataFrame = {
    val words = size(filter(split(col(textCol), " "), t => t =!= lit("")))
    val subtoks = size(regexp_extract_all(col(textCol),
      lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \\t\\n\\r\\f\\x0B]"), lit(0)))
    df.groupBy(col(groupCol).as("_g"))
      .agg(count(lit(1)).as("n_docs"),
        sum(words.cast("long")).as("words"),
        sum(subtoks.cast("long")).as("subtokens"),
        sum(length(col(textCol)).cast("long")).as("chars"))
      .withColumn("_f6", expr(
        "CAST(subtokens AS DECIMAL(38,0)) * 1000000 div nullif(words, 0)"))
      .withColumn("_c6", expr(
        "CAST(chars AS DECIMAL(38,0)) * 1000000 div nullif(subtokens, 0)"))
      .select(col("_g").as(groupCol), col("n_docs"), col("words"),
        col("subtokens"), col("chars"),
        (col("_f6").cast("double") / 1e6).as("fertility"),
        (col("_c6").cast("double") / 1e6).as("chars_per_token"))
  }

  /** Yule's K characteristic per group (q297) — the classical
    * sample-size-invariant lexical-concentration constant (Yule 1944):
    * K = 10⁴·(Σ_m m²·V_m − N)/N² over the token frequency spectrum
    * (V_m = word types occurring m times, N = tokens). Since
    * Σ m²·V_m = Σ_types c², one (group, word) census suffices:
    * K₆ = (Σc² − N)·10¹⁰ div N², one truncating division over exact
    * DECIMAL(38,0) integers (Σc² ≤ N² keeps the ×10¹⁰ product inside 38
    * digits to N ≈ 10¹³ tokens — 100 TB headroom). Repetitive/templated
    * sources read high K (a dedup/boilerplate planning signal the
    * entropy battery reads from the opposite side); K is famously
    * stable under corpus growth where type/token ratios are not, which
    * is why stylometry quotes it.
    *
    * Scale: one token census with map-side combine; |groups|-row tail.
    */
  def yuleK(df: DataFrame, groupCol: String, textCol: String = "text")
      : DataFrame = {
    val toks = df.select(col(groupCol).as("_g"),
      explode(filter(split(col(textCol), " "), t => t =!= lit("")))
        .as("_w"))
    val wc = toks.groupBy(col("_g"), col("_w")).agg(count(lit(1)).as("_c"))
    wc.groupBy(col("_g")).agg(
        sum(col("_c")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(col("_c").cast("decimal(38,0)") * col("_c")).as("_s2"))
      .withColumn("yule_k6", when(col("n_tokens") > 0, expr(
        """(_s2 - n_tokens) * 10000000000
           div nullif(CAST(n_tokens AS DECIMAL(38,0)) * n_tokens, 0)"""))
        .cast("long"))
      .select(col("_g").as(groupCol), col("n_tokens"), col("n_types"),
        col("yule_k6"))
  }

  /** Unicode-confusable/homoglyph fold audit (q305) — the dedup-evasion
    * normalizer: spam/SEO content swaps Cyrillic/Greek lookalikes (and
    * fullwidth forms/ligatures) into Latin text so exact and shingle
    * keys stop colliding; at 100 TB those evaders are precisely the
    * mass-produced duplicates dedup exists to kill. Adds
    *
    *   - `fold` — the native [[graft.functions.ConfusableFold]] skeleton
    *     (fixed public UTS #39-derived table, 1:1 codepoints + ligature
    *     expansions), the drop-in dedup key: hash `fold`, not `text`;
    *   - `n_confusable` — confusable-codepoint count (the triage signal:
    *     0 for clean ASCII, high for evasion-suspect text).
    *
    * Exactly replayable in SQL: [[graft.functions.ConfusableTable]]
    * generates the oracle's translate()+replace() chain from the SAME
    * table, so the two sides cannot drift. Row-local codegen end to
    * end — no shuffle; the dedup census downstream shuffles on the
    * folded key exactly as the unfolded chain does.
    */
  def confusableFold(docs: DataFrame, textCol: String = "text")
      : DataFrame = {
    val allFrom = graft.functions.ConfusableTable.singleFrom +
      graft.functions.ConfusableTable.multi.map(_._1).mkString
    docs
      .withColumn("fold", graft.functions.ConfusableFoldFunction
        .confusableFold(docs.sparkSession, col(textCol)))
      .withColumn("n_confusable",
        (length(col(textCol))
          - length(translate(col(textCol), allFrom, ""))).cast("long"))
  }

  /** Homoglyph-evader fixture alphabet: the Latin letters a dedup evader
    * swaps for their glyph-identical Cyrillic forms. Both sides of q305
    * build the SAME evader twins from this pair (Spark translate ≡
    * DuckDB translate, 1:1 codepoints), so the fixture cannot drift.
    */
  private[graft] val EvaderLatin = "aeopcxAEOPCX"
  private[graft] val EvaderCyrillic = "аеорсхАЕОРСХ"

  /** Confusable-dedup evasion audit (q305): plants deterministic
    * homoglyph evader twins (h-gated 30% of docs, Latin→Cyrillic swap —
    * text differs, glyphs identical), folds with [[confusableFold]],
    * and reports the per-source census proving the fold re-collides
    * them:
    *
    *   - `distinct_text` vs `distinct_fold` — every evader twin is a
    *     NEW distinct text but folds back onto its original, so
    *     `fold_collisions = distinct_text - distinct_fold` counts
    *     exactly the evaders exact-dedup would have missed;
    *   - `n_conf_rows` / `n_confusable` — the triage signal mass.
    *
    * Exact integers end to end. One scan + one per-source aggregation
    * (map-side combined; countDistinct expands to two exact passes over
    * the same shuffle) — at 100 TB this is the cost of the exact-dedup
    * census it guards, on ~1.3× the rows.
    */
  def confusableDedupAudit(docs: DataFrame): DataFrame = {
    val h = ((col("doc_id") % 2147483648L) * 2654435761L) % 2147483647L
    val base = docs.select(col("doc_id"), col("source"), col("text"))
    val evaders = base.where((h % 10) < 3)
      .select(col("doc_id"), col("source"),
        translate(col("text"), EvaderLatin, EvaderCyrillic).as("text"))
    val all = base.withColumn("variant", lit("orig"))
      .unionByName(evaders.withColumn("variant", lit("evader")))
    confusableFold(all)
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(when(col("variant") === "evader", 1L).otherwise(0L))
          .as("n_evaders"),
        sum(when(col("n_confusable") > 0, 1L).otherwise(0L))
          .as("n_conf_rows"),
        sum(col("n_confusable")).as("n_confusable"),
        countDistinct(col("text")).as("distinct_text"),
        countDistinct(col("fold")).as("distinct_fold"))
      .withColumn("fold_collisions",
        col("distinct_text") - col("distinct_fold"))
  }
}
