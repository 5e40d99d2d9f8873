package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: Hamming distance between two
  * equal-length bitstrings (e.g. the 64-char SimHash fingerprints from
  * graft.dedup.Dedup.qSimhash).
  *
  * Why a custom Expression rather than a UDF or HOF chain: the
  * per-comparison hot path of SimHash near-dup joins runs this once
  * per candidate pair; doGenCode emits a tight byte-compare loop that
  * stays inside WholeStageCodegen (no boxing, no lambda dispatch),
  * which is the preferred extension order for this engine (compose
  * built-ins > custom codegen Expression > UDF).
  *
  * Returns -1 when lengths differ (callers treat that as "not
  * comparable"); null-safe like any BinaryExpression.
  */
case class HammingDistance(left: Expression, right: Expression)
  extends BinaryExpression with Serializable {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "hamming"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (string, string), got (${left.dataType}, ${right.dataType})")

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[UTF8String].getBytes
    val b = r.asInstanceOf[UTF8String].getBytes
    if (a.length != b.length) -1
    else {
      var i = 0; var d = 0
      while (i < a.length) { if (a(i) != b(i)) d += 1; i += 1 }
      d
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val ab = ctx.freshName("ab")
      val bb = ctx.freshName("bb")
      val acc = ctx.freshName("acc")
      s"""
         |byte[] $ab = $a.getBytes();
         |byte[] $bb = $b.getBytes();
         |if ($ab.length != $bb.length) {
         |  ${ev.value} = -1;
         |} else {
         |  int $acc = 0;
         |  for (int $i = 0; $i < $ab.length; $i++) {
         |    if ($ab[$i] != $bb[$i]) $acc++;
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HammingDistance =
    copy(left = newLeft, right = newRight)
}
