package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}

/** Native Catalyst expression: the number of DISTINCT adjacent word
  * bigrams of an `array<string>` column — bitwise-equal to
  * `size(array_distinct(transform(sequence(1, size(ws) - 1),
  * i -> concat(element_at(ws, i), ' ', element_at(ws, i + 1)))))`
  * for space-split word arrays (words cannot contain the separator),
  * and 0 for arrays shorter than 2.
  *
  * Why a custom Expression: the duplicate-bigram fraction is a
  * per-document quality gate that every corpus row pays (Repetition,
  * the clean-corpus compositions). The declarative form materializes
  * the full bigram STRING array per row through interpreted HOF
  * lambdas and then hashes it again in array_distinct — measured
  * 2.6 s of the clean-corpus composition at sf0.1. This emits one
  * fused loop (dedup hash set over adjacent pairs, no bigram array)
  * inside whole-stage codegen.
  */
case class DistinctBigramCount(child: Expression)
  extends UnaryExpression with Serializable {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "distinct_bigram_count"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got $t")
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return null
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n < 2) return 0
    val seen = new java.util.HashSet[String]()
    var i = 0
    while (i < n - 1) {
      // the space separator mirrors the declarative concat exactly;
      // split(' ') words cannot contain it, so pairs stay unambiguous
      seen.add(a.getUTF8String(i).toString + " " + a.getUTF8String(i + 1).toString)
      i += 1
    }
    seen.size()
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val seen = ctx.freshName("seen")
      s"""
         |int $n = $a.numElements();
         |if ($n < 2) {
         |  ${ev.value} = 0;
         |} else {
         |  java.util.HashSet $seen = new java.util.HashSet();
         |  for (int $i = 0; $i < $n - 1; $i++) {
         |    $seen.add($a.getUTF8String($i).toString() + " " + $a.getUTF8String($i + 1).toString());
         |  }
         |  ${ev.value} = $seen.size();
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): DistinctBigramCount =
    copy(child = newChild)
}
