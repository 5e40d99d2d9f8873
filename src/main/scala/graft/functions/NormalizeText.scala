package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the FULL text-identity normalization
  * stage — NFC canonical composition followed by zero-width/control
  * stripping — fused into one pass (the EIGHTH native expression).
  *
  * Why it exists: TextAnalysis.normalizeUnicode was composed as
  * regexp_replace(nfc_normalize(text), ZW_CONTROL_CLASS, '') and, once
  * round 11 routed every near-dup shingle path through it, the
  * composition became a measured per-query tax across the dedup family
  * (dedup_incremental_neardup 1.55 → 2.56 s at sf0.1): Spark's
  * RegExpReplace materializes a java.lang.String AND runs the regex NFA
  * per row even when the text is pure ASCII and the whole stage is the
  * identity. This expression scans the UTF8String's bytes once; when
  * every byte is plain ASCII outside the strip set (the overwhelmingly
  * common case on a crawl) it returns the INPUT object — no String, no
  * regex, no allocation. Only rows that actually carry multi-byte or
  * strippable characters pay the Normalizer + code-point filter, which
  * is itself cheaper than the regex machinery it replaces.
  *
  * Semantics are EXACTLY the old composition's (NFC first, then strip
  * the fixed code-point set), proven against the regexp formulation by
  * NfcSpec, so every consumer's DuckDB oracle —
  * regexp_replace(nfc_normalize(text), <class>, '', 'g') — is
  * unchanged.
  */
case class NormalizeText(child: Expression)
  extends UnaryExpression with Serializable {

  override def dataType: DataType = StringType
  override def prettyName: String = "normalize_text"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any =
    NormalizeText.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NormalizeText.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): NormalizeText =
    copy(child = newChild)
}

object NormalizeText {
  /** The stripped code points: ZWSP/ZWNJ/ZWJ/BOM plus the C0 controls
    * (except \t \n \r) and DEL — mirrors TextAnalysis.ZW_CONTROL_CLASS
    * code point for code point (NfcSpec pins the equivalence). */
  def isStripped(cp: Int): Boolean =
    cp == 0x200B || cp == 0x200C || cp == 0x200D || cp == 0xFEFF ||
      (cp <= 0x08) || cp == 0x0B || cp == 0x0C ||
      (cp >= 0x0E && cp <= 0x1F) || cp == 0x7F

  /** Static helper shared by eval and generated code: NFC, then strip. */
  def normalize(s: UTF8String): UTF8String = {
    // Fast path: every byte plain ASCII (< 0x80) and outside the strip
    // set -> NFC is the identity and nothing strips; return the input
    // object untouched. (Multi-byte sequences have bytes >= 0x80, so a
    // clean all-ASCII scan also proves no ZWSP/BOM is present.)
    val n = s.numBytes
    var i = 0
    var clean = true
    while (clean && i < n) {
      val b = s.getByte(i) & 0xFF
      if (b >= 0x80 || isStripped(b)) clean = false
      i += 1
    }
    if (clean) return s
    val nfc = {
      val str = s.toString
      if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) str
      else java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC)
    }
    val out = new java.lang.StringBuilder(nfc.length)
    var j = 0
    while (j < nfc.length) {
      val cp = nfc.codePointAt(j)
      if (!isStripped(cp)) out.appendCodePoint(cp)
      j += Character.charCount(cp)
    }
    UTF8String.fromString(out.toString)
  }
}
