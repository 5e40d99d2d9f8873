package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native Catalyst expression: product-quantization encoding of a
  * packed `array<double>` point against a fixed codebook — the M
  * nearest-centroid codes in one fused pass.
  *
  * Why a custom Expression: expressing the encode declaratively is
  * M x K unrolled distance expressions (1024 Catalyst nodes for
  * 8 x 16 x 8 dims) — the generated whole-stage method is huge, takes
  * seconds of janino compile per plan, and risks the interpreted
  * fallback when it blows the JIT limits. This expression is three
  * tight loops with the codebook as a broadcast-style reference
  * object: compact generated code, trivial compile, and the per-row
  * work a 100 TB encode pass actually needs.
  *
  * Semantics are BITWISE identical to the composed KMeans.assign
  * formulation the oracles mirror (PQSpec proves it): per centroid the
  * squared diffs accumulate left-to-right in dimension order, the
  * distance is sqrt'd BEFORE comparison (matching the oracle's CASE
  * chain over sqrt values), and the argmin keeps the FIRST minimum
  * (strict <), which is array_min + array_position's tie rule. A NaN
  * distance (empty-class NaN centers) never wins a strict <, exactly
  * as NaN sorts above every real distance in array_min.
  *
  * The codebook rides along as a reference object, not a child
  * expression: it is trained driver-side state (M*K*D doubles), the
  * same way broadcast literals ride the IVF probe.
  */
case class PQEncode(child: Expression, codebooks: Array[Array[Array[Double]]])
  extends UnaryExpression with Serializable {

  private val m = codebooks.length
  private val k = codebooks.head.length
  private val subd = codebooks.head.head.length

  /** Flattened [(s*K + j)*SUBD + d] layout for the generated loop. */
  @transient private lazy val flat: Array[Double] = {
    val a = new Array[Double](m * k * subd)
    var i = 0
    for (s <- 0 until m; j <- 0 until k; d <- 0 until subd) {
      a(i) = codebooks(s)(j)(d); i += 1
    }
    a
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "pq_encode"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got $t")
  }

  override def nullSafeEval(input: Any): Any = {
    val xs = input.asInstanceOf[ArrayData]
    val codes = new Array[Int](m)
    var s = 0
    while (s < m) {
      var best = Double.PositiveInfinity
      var bj = 0
      var j = 0
      while (j < k) {
        var acc = 0.0
        var d = 0
        while (d < subd) {
          val diff = xs.getDouble(s * subd + d) - flat((s * k + j) * subd + d)
          acc += diff * diff
          d += 1
        }
        val dist = math.sqrt(acc)
        if (dist < best) { best = dist; bj = j }
        j += 1
      }
      codes(s) = bj
      s += 1
    }
    new GenericArrayData(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, xs => {
      val cb = ctx.addReferenceObj("pqCodebook", flat, "double[]")
      val codes = ctx.freshName("codes")
      val s = ctx.freshName("s")
      val j = ctx.freshName("j")
      val d = ctx.freshName("d")
      val best = ctx.freshName("best")
      val bj = ctx.freshName("bj")
      val acc = ctx.freshName("acc")
      val diff = ctx.freshName("diff")
      val dist = ctx.freshName("dist")
      s"""
         |int[] $codes = new int[$m];
         |for (int $s = 0; $s < $m; $s++) {
         |  double $best = Double.POSITIVE_INFINITY;
         |  int $bj = 0;
         |  for (int $j = 0; $j < $k; $j++) {
         |    double $acc = 0.0;
         |    for (int $d = 0; $d < $subd; $d++) {
         |      double $diff = $xs.getDouble($s * $subd + $d)
         |        - $cb[($s * $k + $j) * $subd + $d];
         |      $acc += $diff * $diff;
         |    }
         |    double $dist = java.lang.Math.sqrt($acc);
         |    if ($dist < $best) { $best = $dist; $bj = $j; }
         |  }
         |  $codes[$s] = $bj;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($codes);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PQEncode =
    copy(child = newChild)
}

/** Native sibling of [[PQEncode]]: the M assigned (nearest-centroid)
  * distances instead of the codes — the per-subspace quantization
  * error a PQ distortion report aggregates.
  *
  * Why a custom Expression: the declarative form is the same M x K
  * unrolled distance forest PQEncode exists to avoid — at 8 x 16
  * centroids x 8 dims that is ~1,024 squared-diff terms in ONE
  * Project, which overflows janino's 64 KB method limit and silently
  * drops the whole stage to interpreted mode (the round-9 finding on
  * `simsearch_pq_distortion`). This is the identical fused triple
  * loop, emitting `best` where PQEncode emits `bj`.
  *
  * Distance semantics are bitwise identical to the composed
  * array_min(array(distTo...)) formulation the oracle mirrors:
  * left-to-right squared-diff accumulation in dimension order, sqrt
  * before comparison, strict < (NaN empty-class centers never win,
  * matching NaN-sorts-last in array_min). */
case class PQMinDists(child: Expression, codebooks: Array[Array[Array[Double]]])
  extends UnaryExpression with Serializable {

  private val m = codebooks.length
  private val k = codebooks.head.length
  private val subd = codebooks.head.head.length

  @transient private lazy val flat: Array[Double] = {
    val a = new Array[Double](m * k * subd)
    var i = 0
    for (s <- 0 until m; j <- 0 until k; d <- 0 until subd) {
      a(i) = codebooks(s)(j)(d); i += 1
    }
    a
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "pq_min_dists"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got $t")
  }

  override def nullSafeEval(input: Any): Any = {
    val xs = input.asInstanceOf[ArrayData]
    val dists = new Array[Double](m)
    var s = 0
    while (s < m) {
      var best = Double.PositiveInfinity
      var j = 0
      while (j < k) {
        var acc = 0.0
        var d = 0
        while (d < subd) {
          val diff = xs.getDouble(s * subd + d) - flat((s * k + j) * subd + d)
          acc += diff * diff
          d += 1
        }
        val dist = math.sqrt(acc)
        if (dist < best) best = dist
        j += 1
      }
      dists(s) = best
      s += 1
    }
    new GenericArrayData(dists)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, xs => {
      val cb = ctx.addReferenceObj("pqCodebook", flat, "double[]")
      val dists = ctx.freshName("dists")
      val s = ctx.freshName("s")
      val j = ctx.freshName("j")
      val d = ctx.freshName("d")
      val best = ctx.freshName("best")
      val acc = ctx.freshName("acc")
      val diff = ctx.freshName("diff")
      val dist = ctx.freshName("dist")
      s"""
         |double[] $dists = new double[$m];
         |for (int $s = 0; $s < $m; $s++) {
         |  double $best = Double.POSITIVE_INFINITY;
         |  for (int $j = 0; $j < $k; $j++) {
         |    double $acc = 0.0;
         |    for (int $d = 0; $d < $subd; $d++) {
         |      double $diff = $xs.getDouble($s * $subd + $d)
         |        - $cb[($s * $k + $j) * $subd + $d];
         |      $acc += $diff * $diff;
         |    }
         |    double $dist = java.lang.Math.sqrt($acc);
         |    if ($dist < $best) { $best = $dist; }
         |  }
         |  $dists[$s] = $best;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($dists);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PQMinDists =
    copy(child = newChild)
}
