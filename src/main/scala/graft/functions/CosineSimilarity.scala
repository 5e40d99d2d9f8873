package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression: cosine similarity of two numeric-array
  * columns (`array<float>` or `array<double>` — both sides the same
  * element type), in double precision.
  *
  * Why a custom Expression: vector scoring is THE per-candidate hot
  * loop of every similarity-search and embedding-dedup operator, and
  * Spark's higher-order functions (zip_with/aggregate) do not
  * participate in whole-stage codegen — each pair pays lambda dispatch
  * and an intermediate products array. doGenCode emits one fused loop
  * (dot + both norms in a single pass, no allocation) that inlines
  * into the surrounding generated code.
  *
  * Semantics are BITWISE identical to the HOF formulation the oracles
  * mirror (VectorOps): each element is widened (float->double where
  * the input is float) before arithmetic, all three accumulators are
  * left-to-right folds in index order, and the result is
  * dot/(sqrt(na)*sqrt(nb)) — so swapping this in changes no oracled
  * value. The double-array path (round 11, for the projected-space
  * search) folds the same way with no conversion. Length-mismatched
  * arrays return NULL (the zip_with formulation nulls out the same
  * way); a zero vector yields NaN from 0/0, as double division does
  * everywhere.
  */
case class CosineSimilarity(left: Expression, right: Expression)
  extends BinaryExpression with Serializable {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_sim"

  private def elemType(t: DataType): Option[DataType] = t match {
    case ArrayType(FloatType, _) => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case _ => None
  }

  /** Both sides must carry the SAME numeric element type. */
  private lazy val elem: Option[DataType] =
    (elemType(left.dataType), elemType(right.dataType)) match {
      case (Some(a), Some(b)) if a == b => Some(a)
      case _ => None
    }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elem.isDefined) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two arrays of the same float/double element type, " +
        s"got (${left.dataType}, ${right.dataType})")

  private lazy val isFloat: Boolean = elem.contains(FloatType)

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val l = left.eval(input)
    if (l == null) return null
    val r = right.eval(input)
    if (r == null) return null
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (isFloat) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val getA =
        if (isFloat) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val getB =
        if (isFloat) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $x = $getA;
         |    double $y = $getB;
         |    $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |  }
         |  ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}
