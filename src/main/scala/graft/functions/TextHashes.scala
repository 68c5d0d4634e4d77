package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal, UnaryExpression, UnsafeArrayData, XXH64}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass token/shingle hashing kernels shared by the native
  * expressions below.
  *
  * Why native Expressions and not `transform`/`filter`/`aggregate`
  * compositions: higher-order functions don't participate in whole-stage
  * codegen, and — worse — Catalyst constraint propagation substitutes a
  * referenced Project alias's FULL defining expression into inferred
  * filters (e.g. the `isnotnull`/`size > 0` filters inferred under an
  * explode or join), duplicating the lambda tree per reference; an
  * `element_at(transform(...))`-shaped composition then degrades to
  * O(tokens²) per row when inlined. An opaque single call is immune: any
  * substitution costs exactly one linear pass.
  *
  * Hash parity: token hash = Spark's `xxhash64(token)` (XXH64 over UTF-8
  * bytes, seed 42); n-gram hash = `xxhash64(h_i, …, h_{i+n-1})` (seed-42
  * fold of hashLong); short-document hash = `xxhash64(array<long>)` (same
  * fold over all token hashes, 42 for zero tokens) — so these produce
  * bit-identical values to the expression-composed formulation.
  */
object TextHashOps {

  private final val Seed = 42L

  /** xxhash64 of each space-separated token (empties skipped), in order,
    * with multiplicity. Splits on the single byte 0x20, which in UTF-8
    * never occurs inside a multi-byte sequence.
    */
  def tokenHashes(s: UTF8String): Array[Long] = {
    val bytes = s.getBytes
    val n = bytes.length
    val b = new scala.collection.mutable.ArrayBuilder.ofLong
    var i = 0
    var start = 0
    while (i <= n) {
      if (i == n || bytes(i) == ' ') {
        if (i > start) {
          b += XXH64.hashUnsafeBytes(
            bytes, Platform.BYTE_ARRAY_OFFSET + start, i - start, Seed)
        }
        start = i + 1
      }
      i += 1
    }
    b.result()
  }

  /** Sorted distinct word n-gram hashes of a document (one whole-document
    * hash when it has fewer than n tokens).
    */
  def shingleHashes(s: UTF8String, n: Int): ArrayData = {
    val th = tokenHashes(s)
    val grams: Array[Long] =
      if (th.length >= n) {
        val g = new Array[Long](th.length - n + 1)
        var i = 0
        while (i < g.length) {
          var h = Seed
          var j = 0
          while (j < n) { h = XXH64.hashLong(th(i + j), h); j += 1 }
          g(i) = h
          i += 1
        }
        g
      } else {
        var h = Seed
        var j = 0
        while (j < th.length) { h = XXH64.hashLong(th(j), h); j += 1 }
        Array(h)
      }
    java.util.Arrays.sort(grams)
    var w = 0
    var i = 0
    while (i < grams.length) {
      if (w == 0 || grams(w - 1) != grams(i)) { grams(w) = grams(i); w += 1 }
      i += 1
    }
    val out = if (w == grams.length) grams else java.util.Arrays.copyOf(grams, w)
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** 256-bin byte histogram of a binary payload. */
  def byteHistogram(b: Array[Byte]): ArrayData = {
    val h = new Array[Long](256)
    var i = 0
    while (i < b.length) {
      h(b(i) & 0xFF) += 1L
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(h)
  }

  /** 64-bit SimHash over the token-hash multiset: bit i is set iff tokens
    * with bit i set outnumber those without (strict majority — identical
    * to the Σ±1 > 0 vote). 0 for a token-less document.
    */
  def simHash64(s: UTF8String): Long = {
    val th = tokenHashes(s)
    if (th.isEmpty) return 0L
    val counts = new Array[Int](64)
    var i = 0
    while (i < th.length) {
      val h = th(i)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (2L * counts(b) > th.length) out |= (1L << b)
      b += 1
    }
    out
  }

  /** JL sign-projection text embedding (the q97 kernel): per
    * whitespace token, the polynomial rolling hash over CODE POINTS
    * h = (h·31 + cp) mod (2³¹−1); per dimension j, the ±1 vote
    * sign(popcount(h·2654435761 + j·2246822519) even). One linear pass
    * over the string; n_tokens counted in the same pass. Arithmetic is
    * digit-identical to the former HOF formulation (and to the DuckDB
    * oracle's ord/substr chain): code points match DuckDB's
    * character-based substr, the modulus never sees a negative, and
    * h·2654435761 ≤ 5.7·10¹⁸ never overflows a long.
    */
  def jlEmbed(s: UTF8String, dim: Int): org.apache.spark.sql.catalyst.InternalRow = {
    val str = s.toString
    val out = new Array[Long](dim)
    var nTok = 0L
    val n = str.length
    var i = 0
    while (i < n) {
      if (str.charAt(i) == ' ') i += 1
      else {
        nTok += 1L
        var h = 0L
        while (i < n && str.charAt(i) != ' ') {
          val cp = str.codePointAt(i)
          h = (h * 31L + cp) % 2147483647L
          i += Character.charCount(cp)
        }
        var j = 0
        while (j < dim) {
          val m = h * 2654435761L + j.toLong * 2246822519L
          if ((java.lang.Long.bitCount(m) & 1) == 0) out(j) += 1L
          else out(j) -= 1L
          j += 1
        }
      }
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](nTok, UnsafeArrayData.fromPrimitiveArray(out)))
  }

  /** Unicode NFC with an isNormalized fast path (the common ASCII/NFC
    * case is one scan + the String copy, no rebuild). Called from
    * interpreted eval AND generated code — must stay a static-shaped
    * helper.
    */
  def nfcNormalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str,
        java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

/** `byte_histogram(binary)` — 256-bin byte-value histogram as
  * array<long>; the binary-payload kernel behind Multimodal.binaryNearDup
  * (q210). Native for the same reason as the text kernels: a
  * `transform(sequence(...), i -> get_byte(...))` composition would lose
  * whole-stage codegen and risk constraint-propagation duplication; this
  * is one linear pass per row.
  */
case class ByteHistogram(child: Expression)
    extends UnaryExpression with Serializable {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"byte_histogram expects binary, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "byte_histogram"

  override protected def nullSafeEval(input: Any): Any =
    TextHashOps.byteHistogram(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextHashOps.byteHistogram($c);")

  override protected def withNewChildInternal(newChild: Expression): ByteHistogram =
    copy(child = newChild)
}

/** `shingle_hashes(text, n)` — sorted distinct hashed word n-grams as
  * array<long>; the shingle kernel behind Dedup/CorpusOps.
  */
case class ShingleHashes(child: Expression, n: Int)
    extends UnaryExpression with Serializable {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && n >= 1) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes expects (string, n>=1), got " +
        s"(${child.dataType.simpleString}, $n)")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "shingle_hashes"

  override protected def nullSafeEval(input: Any): Any =
    TextHashOps.shingleHashes(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextHashOps.shingleHashes($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

/** `simhash64(text)` — 64-bit SimHash of the whitespace-token multiset. */
case class SimHash64(child: Expression)
    extends UnaryExpression with Serializable {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"simhash64 expects string, got ${child.dataType.simpleString}")

  override def dataType: DataType = LongType

  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(input: Any): Any =
    TextHashOps.simHash64(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextHashOps.simHash64($c);")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** `nfc_normalize(text)` — Unicode NFC (canonical composition) as a
  * native codegen expression. Spark has no normalization builtin; the
  * HOF/UDF alternatives either leave whole-stage codegen or serialize
  * through Scala functions. java.text.Normalizer implements UAX#15
  * exactly as DuckDB's utf8proc does, so outputs are oracle-comparable
  * byte-for-byte. The already-NFC fast path (`Normalizer.isNormalized`)
  * skips the rebuild and returns the INPUT UTF8String — the cost floor
  * is the one String copy isNormalized needs, not a normalize pass.
  */
case class NfcNormalize(child: Expression)
    extends UnaryExpression with Serializable {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize expects string, got ${child.dataType.simpleString}")

  override def dataType: DataType = StringType

  override def prettyName: String = "nfc_normalize"

  override protected def nullSafeEval(input: Any): Any =
    TextHashOps.nfcNormalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextHashOps.nfcNormalize($c);")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

/** `jl_embed(text, dim)` — struct<n_tokens: bigint, emb: array<bigint>>:
  * the hashed-bag-of-words Johnson–Lindenstrauss sign projection as ONE
  * native codegen expression. The HOF formulation it replaces
  * (aggregate-inside-transform, one lambda fold per character plus one
  * per (token, dim) pair) was the TextAnalysis scaladoc's own marked
  * 100 TB promotion target: HOFs leave whole-stage codegen AND are
  * exposed to constraint-propagation lambda-tree duplication (the
  * object-level comment above). This is one linear pass per row.
  */
case class JlEmbed(child: Expression, dim: Int)
    extends UnaryExpression with Serializable {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && dim >= 1)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"jl_embed expects (string, dim>=1), got " +
        s"(${child.dataType.simpleString}, $dim)")

  override def dataType: DataType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("n_tokens", LongType,
        nullable = false),
      org.apache.spark.sql.types.StructField("emb",
        ArrayType(LongType, containsNull = false), nullable = false)))

  override def prettyName: String = "jl_embed"

  override protected def nullSafeEval(input: Any): Any =
    TextHashOps.jlEmbed(input.asInstanceOf[UTF8String], dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextHashOps.jlEmbed($c, $dim);")

  override protected def withNewChildInternal(newChild: Expression): JlEmbed =
    copy(child = newChild)
}

object TextHashFunctions {

  private val shingleIdent = FunctionIdentifier("shingle_hashes")
  private val simhashIdent = FunctionIdentifier("simhash64")
  private val bytehistIdent = FunctionIdentifier("byte_histogram")

  private val bytehistInfo = new ExpressionInfo(
    classOf[ByteHistogram].getCanonicalName, null, "byte_histogram",
    "_FUNC_(binary) - 256-bin byte-value histogram", "")

  private[functions] val bytehistBuilder: Seq[Expression] => Expression = {
    children =>
      require(children.size == 1, "byte_histogram takes exactly 1 argument")
      ByteHistogram(children.head)
  }

  private val shingleInfo = new ExpressionInfo(
    classOf[ShingleHashes].getCanonicalName, null, "shingle_hashes",
    "_FUNC_(text, n) - sorted distinct hashed word n-grams", "")

  private val simhashInfo = new ExpressionInfo(
    classOf[SimHash64].getCanonicalName, null, "simhash64",
    "_FUNC_(text) - 64-bit simhash of whitespace tokens", "")

  private[functions] val shingleBuilder: Seq[Expression] => Expression = {
    children =>
      require(children.size == 2, "shingle_hashes takes exactly 2 arguments")
      val n = children(1) match {
        case Literal(v: Int, IntegerType) => v
        case other => throw new IllegalArgumentException(
          s"shingle_hashes n must be an int literal, got $other")
      }
      ShingleHashes(children.head, n)
  }

  private[functions] val simhashBuilder: Seq[Expression] => Expression = {
    children =>
      require(children.size == 1, "simhash64 takes exactly 1 argument")
      SimHash64(children.head)
  }

  /** Idempotent per-session registration. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(shingleIdent)) {
      reg.registerFunction(shingleIdent, shingleInfo, shingleBuilder)
    }
    if (!reg.functionExists(simhashIdent)) {
      reg.registerFunction(simhashIdent, simhashInfo, simhashBuilder)
    }
    if (!reg.functionExists(bytehistIdent)) {
      reg.registerFunction(bytehistIdent, bytehistInfo, bytehistBuilder)
    }
  }

  def byteHistogram(spark: SparkSession, payload: Column): Column = {
    register(spark)
    call_function("byte_histogram", payload)
  }

  def shingleHashes(spark: SparkSession, text: Column, n: Int): Column = {
    register(spark)
    call_function("shingle_hashes", text, org.apache.spark.sql.functions.lit(n))
  }

  def simHash64(spark: SparkSession, text: Column): Column = {
    register(spark)
    call_function("simhash64", text)
  }

  private val nfcIdent = FunctionIdentifier("nfc_normalize")

  private val nfcInfo = new ExpressionInfo(
    classOf[NfcNormalize].getCanonicalName, null, "nfc_normalize",
    "_FUNC_(text) - Unicode NFC canonical composition", "")

  private[functions] val nfcBuilder: Seq[Expression] => Expression = {
    children =>
      require(children.size == 1, "nfc_normalize takes exactly 1 argument")
      NfcNormalize(children.head)
  }

  def nfcNormalize(spark: SparkSession, text: Column): Column = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(nfcIdent)) {
      reg.registerFunction(nfcIdent, nfcInfo, nfcBuilder)
    }
    call_function("nfc_normalize", text)
  }

  private val jlIdent = FunctionIdentifier("jl_embed")

  private val jlInfo = new ExpressionInfo(
    classOf[JlEmbed].getCanonicalName, null, "jl_embed",
    "_FUNC_(text, dim) - JL sign-projection embedding as " +
      "struct(n_tokens, emb)", "")

  private[functions] val jlBuilder: Seq[Expression] => Expression = {
    children =>
      require(children.size == 2, "jl_embed takes exactly 2 arguments")
      val dim = children(1) match {
        case Literal(v: Int, IntegerType) => v
        case other => throw new IllegalArgumentException(
          s"jl_embed dim must be an int literal, got $other")
      }
      JlEmbed(children.head, dim)
  }

  def jlEmbed(spark: SparkSession, text: Column, dim: Int): Column = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(jlIdent)) {
      reg.registerFunction(jlIdent, jlInfo, jlBuilder)
    }
    call_function("jl_embed", text, org.apache.spark.sql.functions.lit(dim))
  }
}
