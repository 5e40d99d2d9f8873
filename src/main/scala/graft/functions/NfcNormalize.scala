package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: Unicode NFC normalization (canonical
  * composition via the JDK's java.text.Normalizer — public API).
  *
  * Why it exists: on a real multilingual crawl the same text arrives
  * in NFC and NFD encodings (and platform-specific mixes — macOS file
  * paths are NFD, most web text NFC); byte-level content hashes see
  * them as distinct documents, so NFC-vs-NFD variants silently escape
  * exact dedup and every shingle-based near-dup operator. Normalizing
  * BEFORE hashing is the standard fix, and DuckDB's nfc_normalize
  * mirrors it exactly, so operators that ride this stage stay fully
  * oracled.
  *
  * Why a custom Expression rather than a UDF: this runs once per
  * document on the ingest path ahead of every content hash; doGenCode
  * keeps it inside WholeStageCodegen (no boxing, no lambda dispatch),
  * with an ASCII fast path — a UTF8String whose byte count equals its
  * char count is pure ASCII, which NFC never changes, so the common
  * case returns the input without materializing a java.lang.String.
  */
case class NfcNormalize(child: Expression)
  extends UnaryExpression with Serializable {

  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any =
    NfcNormalize.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  /** Static helper shared by eval and generated code. */
  def normalize(s: UTF8String): UTF8String = {
    // ASCII fast path: one byte per char <=> no code point above 0x7F,
    // and NFC is the identity on ASCII
    if (s.numBytes == s.numChars) s
    else {
      val str = s.toString
      if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
      else UTF8String.fromString(
        java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
    }
  }
}
