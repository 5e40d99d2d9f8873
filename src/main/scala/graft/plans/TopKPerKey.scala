package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, BindReferences, Expression, GenericInternalRow, JoinedRow, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.types.IntegerType

/** Whole-operator extension (SURVEY.md §6a, guide category (c)): per-key
  * top-k as a first-class plan node.
  *
  * Why a custom operator: the declarative formulation
  * (row_number window + filter) sorts every key group in full and
  * cannot combine map-side — at 100 TB the window sort dominates.
  * This node declares ClusteredDistribution(keys), so EnsureRequirements
  * inserts exactly one hash shuffle, and the exec keeps only a bounded
  * k-row buffer per key while streaming each partition once.
  *
  * Semantics (mirrored by the SQL oracle): rank rows per key by
  * (value DESC, tie ASC), keep rank <= k, rank is 1-based row_number.
  * Null ordering follows Spark's defaults for those directions: value
  * desc = NULLS LAST, tie asc = NULLS FIRST.
  */
case class TopKPerKeyNode(
    keys: Seq[Expression], value: Expression, tie: Expression, k: Int,
    child: LogicalPlan,
    rankAttr: AttributeReference = AttributeReference("rank", IntegerType, nullable = false)())
  extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr)
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyNode =
    copy(child = newChild)
}

case class TopKPerKeyExec(
    keys: Seq[Expression], value: Expression, tie: Expression, k: Int,
    rankAttr: AttributeReference, child: SparkPlan)
  extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output :+ rankAttr

  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr)

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(keys) :: Nil

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val kLocal = k
    child.execute().mapPartitions { it =>
      val keyProj = UnsafeProjection.create(keys, childOutput)
      val valEval = BindReferences.bindReference(value, childOutput)
      val tieEval = BindReferences.bindReference(tie, childOutput)
      val rowCopy = UnsafeProjection.create(childOutput.map(_.dataType).toArray)
      // Sort key matching Spark's (value desc_nulls_last, tie asc)
      // exactly: NaN is the LARGEST double (group 0, first under DESC),
      // then real values by -v, then NULLs last (group 2); the tie gets
      // its own null group — asc in Spark is NULLS FIRST — so a null
      // tie sorts before every long (a Long.MaxValue sentinel would
      // both misplace nulls and collide with genuine MaxValue ties).
      def rankKey(v: java.lang.Double, t: java.lang.Long): (Int, Double, Int, Long) = {
        val (tg, tt) = if (t == null) (0, 0L) else (1, t.longValue())
        if (v == null) (2, 0.0, tg, tt)
        else if (v.isNaN) (0, 0.0, tg, tt)
        else (1, -v.doubleValue(), tg, tt)
      }
      // per key: buffer of (sortKey, row) kept <= 2k, pruned to top-k
      val buffers = mutable.LinkedHashMap.empty[UnsafeRow, mutable.ArrayBuffer[((Int, Double, Int, Long), UnsafeRow)]]
      def prune(b: mutable.ArrayBuffer[((Int, Double, Int, Long), UnsafeRow)]): Unit = {
        val kept = b.sortBy(_._1).take(kLocal)
        b.clear(); b ++= kept
      }
      it.foreach { row =>
        val key = keyProj(row).copy()
        val buf = buffers.getOrElseUpdate(key, mutable.ArrayBuffer.empty)
        buf += ((rankKey(valEval.eval(row).asInstanceOf[java.lang.Double],
          tieEval.eval(row).asInstanceOf[java.lang.Long]), rowCopy(row).copy()))
        if (buf.length > 2 * kLocal) prune(buf)
      }
      val outProj = UnsafeProjection.create(output.map(_.dataType).toArray)
      val joined = new JoinedRow
      buffers.iterator.flatMap { case (_, buf) =>
        prune(buf)
        buf.iterator.zipWithIndex.map { case ((_, row), i) =>
          outProj(joined(row, new GenericInternalRow(Array[Any](i + 1))))
        }
      }
    }
  }
}

/** Optimizer rule: rewrite the declarative per-key top-k idiom —
  *
  *   Filter(rank <= k,
  *     Window([row_number() over (partition by K order by v DESC, t ASC)],
  *            [optional WindowGroupLimit child]))
  *
  * — into TopKPerKeyNode, so users who write the window formulation
  * get the bounded-heap exec (one hash shuffle, NO per-group sort)
  * automatically. Spark's own InferWindowGroupLimit only prunes each
  * group to k rows before the window SORT; this removes the sort
  * entirely. Guards keep it exactly as strict as the exec's contract:
  * non-empty partition keys, double value with DESC NULLS LAST, long
  * tie with ASC NULLS FIRST, a lone row_number window expression, and
  * a bare `rank <= literal` / `rank < literal` filter. Registered via
  * GraftExtensions.injectOptimizerRule; every rewritten query is still
  * oracle-exact (row_number semantics are reproduced bit-for-bit,
  * incl. null ordering — TopKPerKeySpec).
  */
object TopKRewriteRule extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions.{Alias, LessThan, LessThanOrEqual, Literal, RowNumber, SortOrder, WindowExpression, WindowSpecDefinition}
  import org.apache.spark.sql.catalyst.expressions.{Ascending, CurrentRow, Descending, NullsFirst, NullsLast, RowFrame, SpecifiedWindowFrame, UnboundedPreceding}
  import org.apache.spark.sql.catalyst.plans.logical.{Filter, Window, WindowGroupLimit}
  import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, w: Window) =>
      rewrite(cond, w).getOrElse(f)
  }

  private def rewrite(cond: Expression, w: Window): Option[LogicalPlan] = {
    val kOpt = cond match {
      case LessThanOrEqual(a: AttributeReference, Literal(k: Int, IntegerType)) => Some((a, k))
      case LessThan(a: AttributeReference, Literal(k: Int, IntegerType)) => Some((a, k - 1))
      case _ => None
    }
    kOpt.flatMap { case (rankRef, k) =>
      (w.windowExpressions, w.orderSpec) match {
        case (Seq(alias @ Alias(WindowExpression(RowNumber(),
                WindowSpecDefinition(_, _,
                  SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))), _)),
              Seq(SortOrder(v, Descending, NullsLast, _),
                  SortOrder(t, Ascending, NullsFirst, _)))
            if k > 0 && alias.exprId == rankRef.exprId &&
              w.partitionSpec.nonEmpty &&
              v.dataType == DoubleType && t.dataType == LongType =>
          // drop Spark's WindowGroupLimit if present — the heap exec
          // subsumes its pruning (and unlike it, needs no sort)
          val child = w.child match {
            case WindowGroupLimit(_, _, _, _, inner) => inner
            case other => other
          }
          Some(TopKPerKeyNode(w.partitionSpec, v, t, k, child,
            alias.toAttribute.asInstanceOf[AttributeReference]))
        case _ => None
      }
    }
  }
}

object TopKPerKeyStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(keys, value, tie, k, child, rankAttr) =>
      TopKPerKeyExec(keys, value, tie, k, rankAttr, planLater(child)) :: Nil
    case _ => Nil
  }
}

object TopKPerKey {
  /** Per-key top-k of `df` by (value DESC, tie ASC) with a 1-based
    * rank column. Columns are named (resolved here against the child's
    * analyzed output — the node carries only resolved attributes, so
    * no analyzer rule is needed). Registers the planner strategy on
    * first use. */
  def apply(df: DataFrame, keys: Seq[String], value: String, tie: String, k: Int): DataFrame = {
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(TopKPerKeyStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKPerKeyStrategy
    val plan = GraftBridge.analyzedPlan(df)
    def attr(name: String): Attribute = plan.output.find(_.name == name)
      .getOrElse(throw new IllegalArgumentException(
        s"column $name not in ${plan.output.map(_.name).mkString(", ")}"))
    val (v, t) = (attr(value), attr(tie))
    // fail fast on types the exec's eval path would miscast at runtime
    require(v.dataType == org.apache.spark.sql.types.DoubleType,
      s"value column $value must be double, got ${v.dataType}")
    require(t.dataType == org.apache.spark.sql.types.LongType,
      s"tie column $tie must be bigint, got ${t.dataType}")
    val node = TopKPerKeyNode(keys.map(attr), v, t, k, plan)
    GraftBridge.ofRows(spark, node)
  }
}
