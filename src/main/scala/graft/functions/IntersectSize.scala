package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}

/** Native Catalyst expression: |a ∩ b| of two `array<string>` columns
  * — the size of the distinct intersection, bitwise-equal to
  * `size(array_intersect(a, b))` (element match by value, a NULL
  * element intersects a NULL element, duplicates in `a` count once).
  *
  * Why a custom Expression: the intersection COUNT is the per-pair hot
  * loop of every Jaccard verification (LSH near-dup, n-gram near-dup,
  * prefix join, incremental near-dup gate) — at 100 TB each candidate
  * pair pays it. The builtin array_intersect MATERIALIZES the
  * intersection array only for size() to throw it away; this emits one
  * fused membership loop (build-side hash set, probe with dedup)
  * inside whole-stage codegen with no result array at all.
  */
case class IntersectSize(left: Expression, right: Expression)
  extends BinaryExpression with Serializable {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "intersect_size"

  private def isStringArray(t: DataType): Boolean = t match {
    case ArrayType(StringType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isStringArray(left.dataType) && isStringArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<string>, array<string>), " +
        s"got (${left.dataType}, ${right.dataType})")

  override def eval(input: InternalRow): Any = {
    val l = left.eval(input)
    if (l == null) return null
    val r = right.eval(input)
    if (r == null) return null
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val bset = new java.util.HashSet[Any]()
    var bNull = false
    var j = 0
    while (j < b.numElements()) {
      if (b.isNullAt(j)) bNull = true else bset.add(b.getUTF8String(j))
      j += 1
    }
    val seen = new java.util.HashSet[Any]()
    var seenNull = false
    var count = 0
    var i = 0
    while (i < a.numElements()) {
      if (a.isNullAt(i)) {
        if (!seenNull) { seenNull = true; if (bNull) count += 1 }
      } else {
        val s = a.getUTF8String(i)
        if (seen.add(s) && bset.contains(s)) count += 1
      }
      i += 1
    }
    count
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val bset = ctx.freshName("bset")
      val seen = ctx.freshName("seen")
      val bNull = ctx.freshName("bNull")
      val seenNull = ctx.freshName("seenNull")
      val cnt = ctx.freshName("cnt")
      val s = ctx.freshName("s")
      s"""
         |java.util.HashSet $bset = new java.util.HashSet();
         |boolean $bNull = false;
         |for (int $j = 0; $j < $b.numElements(); $j++) {
         |  if ($b.isNullAt($j)) $bNull = true;
         |  else $bset.add($b.getUTF8String($j));
         |}
         |java.util.HashSet $seen = new java.util.HashSet();
         |boolean $seenNull = false;
         |int $cnt = 0;
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  if ($a.isNullAt($i)) {
         |    if (!$seenNull) { $seenNull = true; if ($bNull) $cnt++; }
         |  } else {
         |    org.apache.spark.unsafe.types.UTF8String $s = $a.getUTF8String($i);
         |    if ($seen.add($s) && $bset.contains($s)) $cnt++;
         |  }
         |}
         |${ev.value} = $cnt;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IntersectSize =
    copy(left = newLeft, right = newRight)
}
