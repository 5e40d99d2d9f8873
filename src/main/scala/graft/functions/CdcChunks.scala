package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: content-defined chunking of a text
  * column (LBFS/Rabin-style) — value-identical to the declarative
  * formulation the CDC family and its DuckDB oracle share:
  *
  *   cs[j]  = codepoint of the j-th character (1-based)
  *   bound  = { i in [W, len) | fold((h,c) -> (h*31 + c) % 1e9+7)
  *                              over cs[i-W+1..i]  % DIV == 0 }
  *   bs     = [0] ++ bound ++ [len]
  *   chunks = [ substring(text, bs[k]+1, bs[k+1]-bs[k]) | k ]
  *   len in [1, W)  -> [text];   len == 0 -> []
  *
  * Why a custom Expression: the declarative form re-folds a W-element
  * slice with interpreted HOF lambdas at EVERY character position —
  * ~n*W boxed lambda evaluations plus n slice allocations per document
  * (the WinnowedPositions lesson, measured 219 s -> ~2 s there). The
  * expression computes codepoints once and folds each window in a long
  * register; doGenCode emits one static call so the chunking projection
  * stays inside whole-stage codegen. CdcChunksSpec pins equivalence to
  * the declarative formulation on the real corpus.
  *
  * Null text returns an EMPTY array (the declarative CASE falls through
  * its null-valued WHENs to ELSE array()) — not null — so the expression
  * evaluates the null case explicitly rather than via null-intolerance.
  */
case class CdcChunks(child: Expression, w: Int, div: Int)
  extends UnaryExpression with Serializable {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "cdc_chunks"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires string, got $t")
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    CdcChunks.compute(v.asInstanceOf[UTF8String], w, div)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${c.code}
        org.apache.spark.sql.catalyst.util.GenericArrayData ${ev.value} =
          graft.functions.CdcChunks.compute(${c.isNull} ? null : ${c.value}, $w, $div);
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): CdcChunks =
    copy(child = newChild)
}

object CdcChunks {

  private val MOD = 1000000007L

  /** Static core shared by eval and the generated code. */
  def compute(text: UTF8String, w: Int, div: Int): GenericArrayData = {
    if (text == null) return new GenericArrayData(Array.empty[Any])
    val s = text.toString
    if (s.isEmpty) return new GenericArrayData(Array.empty[Any])
    // codepoints, not UTF-16 units: Spark's length()/ascii(substring)
    // and DuckDB's are codepoint-based (the WinnowedPositions contract)
    val cps = s.codePoints().toArray
    val len = cps.length
    if (len < w)
      return new GenericArrayData(Array[Any](text))
    // UTF-16 offset of each codepoint boundary, so chunk substrings cut
    // the underlying String without re-walking it per chunk
    val off16 = new Array[Int](len + 1)
    var i = 0
    var o = 0
    while (i < len) {
      off16(i) = o
      o += Character.charCount(cps(i))
      i += 1
    }
    off16(len) = o
    // boundary positions: i in [w, len) with the window fold % div == 0
    val bs = new scala.collection.mutable.ArrayBuffer[Int](8)
    bs += 0
    var p = w // 1-based window end position
    while (p < len) {
      var h = 0L
      var j = p - w // 0-based window start
      while (j < p) { h = (h * 31 + cps(j)) % MOD; j += 1 }
      if (h % div == 0) bs += p
      p += 1
    }
    bs += len
    val out = new Array[Any](bs.length - 1)
    var k = 0
    while (k < out.length) {
      out(k) = UTF8String.fromString(s.substring(off16(bs(k)), off16(bs(k + 1))))
      k += 1
    }
    new GenericArrayData(out)
  }
}
