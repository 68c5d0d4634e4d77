package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The fixed confusable→Latin-skeleton table, shared by the native
  * kernel, the Column helper, AND the oracle SQL generator — one source
  * of truth, the q200/q204 "oracle generated from the same table"
  * discipline, so the two sides cannot drift.
  *
  * Contents are a curated subset of the public UTS #39 confusables data
  * (Unicode Security Mechanisms, confusables.txt): the Cyrillic and
  * Greek letters whose glyphs are identical to Latin in common fonts —
  * the standard dedup-evasion alphabet for spam/SEO text — plus the
  * fullwidth ASCII block (FF01-class) and the Latin ligature presentation
  * forms (1:N foldings). Deliberately NOT a full skeleton transform:
  * only 1:1 codepoint maps and the handful of ligature expansions, so
  * the fold is exactly replayable in ANSI SQL as translate() + replace()
  * and never touches legitimate non-Latin text (a real Russian document
  * folds to itself minus lookalikes only when MIXED with Latin — the
  * script-mix audit q172 stays the detector for that; this is the
  * normalizer that makes the dup keys collide).
  */
object ConfusableTable {

  /** 1:1 codepoint maps as parallel strings (translate() operands). */
  val (singleFrom: String, singleTo: String) = {
    val pairs = Seq(
      // Cyrillic lowercase lookalikes (UTS #39)
      'а' -> 'a', 'е' -> 'e', 'о' -> 'o', 'р' -> 'p',
      'с' -> 'c', 'у' -> 'y', 'х' -> 'x', 'ѕ' -> 's',
      'і' -> 'i', 'ј' -> 'j', 'ԁ' -> 'd', 'ԛ' -> 'q',
      'ԝ' -> 'w',
      // Cyrillic uppercase
      'А' -> 'A', 'В' -> 'B', 'Е' -> 'E', 'К' -> 'K',
      'М' -> 'M', 'Н' -> 'H', 'О' -> 'O', 'Р' -> 'P',
      'С' -> 'C', 'Т' -> 'T', 'У' -> 'Y', 'Х' -> 'X',
      'Ѕ' -> 'S', 'І' -> 'I', 'Ј' -> 'J',
      // Greek lookalikes (lowercase omicron/nu; glyph-identical capitals)
      'ο' -> 'o', 'ν' -> 'v',
      'Α' -> 'A', 'Β' -> 'B', 'Ε' -> 'E', 'Ζ' -> 'Z',
      'Η' -> 'H', 'Ι' -> 'I', 'Κ' -> 'K', 'Μ' -> 'M',
      'Ν' -> 'N', 'Ο' -> 'O', 'Ρ' -> 'P', 'Τ' -> 'T',
      'Υ' -> 'Y', 'Χ' -> 'X') ++
      // fullwidth ASCII block: ０-９ Ａ-Ｚ ａ-ｚ
      (0 to 9).map(i => (0xff10 + i).toChar -> ('0' + i).toChar) ++
      (0 until 26).map(i => (0xff21 + i).toChar -> ('A' + i).toChar) ++
      (0 until 26).map(i => (0xff41 + i).toChar -> ('a' + i).toChar)
    (pairs.map(_._1).mkString, pairs.map(_._2).mkString)
  }

  /** 1:N ligature expansions (the part translate() cannot express —
    * the reason this is a native expression, not a translate() call).
    */
  val multi: Seq[(Char, String)] = Seq(
    'ﬀ' -> "ff", 'ﬁ' -> "fi", 'ﬂ' -> "fl",
    'ﬃ' -> "ffi", 'ﬄ' -> "ffl", 'ĳ' -> "ij",
    'Ĳ' -> "IJ")

  // kernel lookups: identity-initialized char map + sparse multi map.
  // Domains are disjoint and every output char is plain ASCII Latin
  // (never itself in a from-set), so ONE left-to-right pass is a
  // fixpoint — no iteration, and translate()+replace() order in the
  // oracle is irrelevant.
  private[functions] val charMap: Array[Char] = {
    val m = new Array[Char](65536)
    var i = 0
    while (i < 65536) { m(i) = i.toChar; i += 1 }
    singleFrom.zip(singleTo).foreach { case (f, t) => m(f) = t }
    m
  }
  private[functions] val multiMap: Array[String] = {
    val m = new Array[String](65536)
    multi.foreach { case (f, t) => m(f) = t }
    m
  }

  /** Shared by interpreted eval and generated code. Returns the INPUT
    * UTF8String unchanged when nothing folds (the NfcNormalize fast-path
    * discipline): ASCII text pays one scan, zero allocation.
    */
  def fold(s: UTF8String): UTF8String = {
    val str = s.toString
    val n = str.length
    var i = 0
    var changed = false
    while (i < n && !changed) {
      val c = str.charAt(i)
      changed = charMap(c) != c || multiMap(c) != null
      i += 1
    }
    if (!changed) return s
    val sb = new java.lang.StringBuilder(n + 8)
    i = 0
    while (i < n) {
      val c = str.charAt(i)
      val m = multiMap(c)
      if (m != null) sb.append(m) else sb.append(charMap(c))
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  /** The oracle-side replay of [[fold]], generated from the SAME table:
    * one translate() for the 1:1 maps, a replace() per ligature. `col`
    * is interpolated raw (caller passes a column reference or SQL
    * expression). None of the table characters is a quote, so the
    * literals embed safely.
    */
  def oracleSql(col: String): String = {
    val base = s"translate($col, '$singleFrom', '$singleTo')"
    multi.foldLeft(base) { case (acc, (f, t)) =>
      s"replace($acc, '$f', '$t')"
    }
  }
}

/** `confusable_fold(text)` — Unicode-confusable/homoglyph fold to Latin
  * skeletons as a native codegen expression: the dedup-evasion
  * normalizer (spam/SEO text swaps Cyrillic/Greek lookalikes into Latin
  * words to slip past exact and shingle dedup; at 100 TB the evaders are
  * exactly the mass-produced content dedup exists to kill). Feeds the
  * EXISTING exact/near-dup chain: key on `xxhash64(confusable_fold(x))`
  * instead of `xxhash64(x)` and the evading copies collide again.
  *
  * Why native and not `translate()`: the UTS #39 data includes 1:N
  * ligature foldings which translate() cannot express, and this compiles
  * to one allocation-free scan for the (overwhelmingly common) no-fold
  * row. Row-local, shuffle-free, inside whole-stage codegen — scales
  * with splits.
  */
case class ConfusableFold(child: Expression)
    extends UnaryExpression with Serializable {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"confusable_fold expects string, got ${child.dataType.simpleString}")

  override def dataType: DataType = StringType

  override def prettyName: String = "confusable_fold"

  override protected def nullSafeEval(input: Any): Any =
    ConfusableTable.fold(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ConfusableTable.fold($c);")

  override protected def withNewChildInternal(newChild: Expression): ConfusableFold =
    copy(child = newChild)
}

object ConfusableFoldFunction {

  private val ident = FunctionIdentifier("confusable_fold")

  private val info = new ExpressionInfo(
    classOf[ConfusableFold].getCanonicalName, null, "confusable_fold",
    "_FUNC_(text) - fold UTS #39 confusable codepoints to Latin skeletons",
    "")

  private[functions] val builder: Seq[Expression] => Expression = {
    children =>
      require(children.size == 1, "confusable_fold takes exactly 1 argument")
      ConfusableFold(children.head)
  }

  /** `confusable_fold(text)` as a Column (registers on first use). */
  def confusableFold(spark: SparkSession, text: Column): Column = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(ident)) {
      reg.registerFunction(ident, info, builder)
    }
    call_function("confusable_fold", text)
  }
}
