package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd Unicode text-canonicalization expressions — the
  * normalization passes a multilingual training-data pipeline runs
  * BEFORE any digest/shingle/signature operator (two byte sequences
  * that render identically must dedup identically: U+0065 U+0301 vs
  * U+00E9). SURVEY §4 preference (b): a native Expression with
  * doGenCode — the normalizer runs inside whole-stage codegen with
  * free null handling, no UDF serialization boundary.
  *
  * Cross-engine contract: [[NfcNormalize]] is Unicode NFC
  * (java.text.Normalizer), bit-compatible with DuckDB's
  * `nfc_normalize` (utf8proc) — NFC is stable across conformant
  * implementations. [[StripAccents]] is the classic accent-folding
  * chain NFD -> drop ALL combining marks (categories Mn, Mc AND Me —
  * exactly utf8proc's STRIPMARK, verified against DuckDB on
  * Devanagari Mc vowel signs and Me enclosing marks) -> NFC.
  * [[CodepointLower]]
  * is per-codepoint Unicode simple lowercase — the third
  * canonicalization a multilingual pipeline runs (case-insensitive
  * dedup keys); see its scaladoc for why Spark's builtin `lower` is
  * NOT this function.
  */
case class NfcNormalize(child: Expression)
    extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = StringType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(s"graft_nfc needs string, got ${child.dataType}")
  override def nullSafeEval(s: Any): Any =
    TextExpressions.nfc(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextExpressions.nfc($c)")
  override protected def withNewChildInternal(newChild: Expression)
      : NfcNormalize = copy(child = newChild)
}

case class StripAccents(child: Expression)
    extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = StringType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(
        s"graft_strip_accents needs string, got ${child.dataType}")
  override def nullSafeEval(s: Any): Any =
    TextExpressions.stripAccents(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextExpressions.stripAccents($c)")
  override protected def withNewChildInternal(newChild: Expression)
      : StripAccents = copy(child = newChild)
}

/** Per-codepoint Unicode SIMPLE lowercase (`Character.toLowerCase(int)`
  * — 1:1, locale-independent), matching DuckDB's `lower` (utf8proc
  * `tolower`, also 1:1). Spark's builtin `lower` is NOT this function:
  * `UTF8String.toLowerCase` falls back to `String.toLowerCase()` on
  * non-ASCII input, which applies FULL, DEFAULT-LOCALE mappings —
  * U+0130 (Turkish dotted I) becomes TWO codepoints (i + combining
  * dot above) where both this expression and DuckDB produce plain
  * `i`, and under a Turkish default locale even ASCII `I` maps to
  * dotless ı — a nondeterministic dedup key across deployments.
  *
  * Cross-library differential (tools/case_differential.py, full
  * 0..0x10FFFF sweep): JDK 17 and DuckDB's utf8proc disagree on
  * exactly THREE codepoints (U+A7C7, U+A7C9, U+A7F5 — Unicode 13
  * additions whose lowercase utf8proc's table predates; JDK maps
  * them, utf8proc passes them through). This expression keeps the
  * current-Unicode (JDK) behavior; the pinned divergence is asserted
  * by the differential gate, and graded corpora stay outside it. */
case class CodepointLower(child: Expression)
    extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = StringType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(
        s"graft_lower needs string, got ${child.dataType}")
  override def nullSafeEval(s: Any): Any =
    TextExpressions.codepointLower(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextExpressions.codepointLower($c)")
  override protected def withNewChildInternal(newChild: Expression)
      : CodepointLower = copy(child = newChild)
}

object TextExpressions {

  /** Static codegen targets — UTF8String in/out so generated code
    * never round-trips through Java String at the call site. */
  def nfc(s: UTF8String): UTF8String =
    UTF8String.fromString(java.text.Normalizer.normalize(
      s.toString, java.text.Normalizer.Form.NFC))

  def stripAccents(s: UTF8String): UTF8String = {
    val d = java.text.Normalizer.normalize(
      s.toString, java.text.Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(d.length)
    var i = 0
    while (i < d.length) {
      val c = d.charAt(i)
      val t = Character.getType(c)
      // ALL THREE mark categories (Mn+Mc+Me), NOT Mn-only: the r14
      // ADVICE claimed utf8proc strips only nonspacing marks — checked
      // against DuckDB this round and found FALSE: utf8proc's
      // UTF8PROC_STRIPMARK documents (and DuckDB measurably does)
      // stripping nonspacing, spacing-combining AND enclosing marks —
      // strip_accents('क' || chr(2366)) drops the Mc vowel sign,
      // strip_accents('a' || chr(8413) || 'b') = 'ab' drops the Me
      // enclosing circle. Pinned codepoint-for-codepoint against
      // DuckDB in TextAnalysisSpec (Devanagari/enclosing-mark rows).
      if (t != Character.NON_SPACING_MARK &&
          t != Character.COMBINING_SPACING_MARK &&
          t != Character.ENCLOSING_MARK)
        sb.append(c)
      i += 1
    }
    UTF8String.fromString(java.text.Normalizer.normalize(
      sb.toString, java.text.Normalizer.Form.NFC))
  }

  /** Codegen target for [[CodepointLower]] — a tight codepoint loop,
    * no String.toLowerCase (locale trap) anywhere on the path. */
  def codepointLower(s: UTF8String): UTF8String = {
    val str = s.toString
    val sb = new java.lang.StringBuilder(str.length)
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      sb.appendCodePoint(Character.toLowerCase(cp))
      i += Character.charCount(cp)
    }
    UTF8String.fromString(sb.toString)
  }

  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_nfc", exprs => NfcNormalize(exprs(0)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_strip_accents", exprs => StripAccents(exprs(0)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_lower", exprs => CodepointLower(exprs(0)), "built-in")
  }

  def nfc_normalize(c: Column): Column =
    org.apache.spark.sql.functions.call_function("graft_nfc", c)

  def strip_accents(c: Column): Column =
    org.apache.spark.sql.functions.call_function("graft_strip_accents", c)

  def codepoint_lower(c: Column): Column =
    org.apache.spark.sql.functions.call_function("graft_lower", c)
}
