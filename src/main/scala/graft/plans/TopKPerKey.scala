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

/** Shared per-partition bounded-heap pruning for the partial and final
  * execs: per key, keep only the top-k rows by (value DESC NULLS LAST,
  * tie ASC NULLS FIRST), buffer never exceeding 2k rows per key. */
private[plans] object TopKHeap {
  /** Sort key matching Spark's (value desc_nulls_last, tie asc)
    * exactly: NaN is the LARGEST double (group 0, first under DESC),
    * then real values by -v, then NULLs last (group 2); the tie gets
    * its own null group — asc in Spark is NULLS FIRST — so a null
    * tie sorts before every long (a Long.MaxValue sentinel would
    * both misplace nulls and collide with genuine MaxValue ties). */
  def rankKey(v: java.lang.Double, t: java.lang.Long): (Int, Double, Int, Long) = {
    val (tg, tt) = if (t == null) (0, 0L) else (1, t.longValue())
    if (v == null) (2, 0.0, tg, tt)
    else if (v.isNaN) (0, 0.0, tg, tt)
    else (1, -v.doubleValue(), tg, tt)
  }

  /** Consume one partition, returning the per-key pruned buffers in
    * first-seen key order; each buffer is sorted and <= k rows. */
  def pruneTopK(
      it: Iterator[InternalRow], keys: Seq[Expression], value: Expression,
      tie: Expression, k: Int, childOutput: Seq[Attribute])
    : Iterator[mutable.ArrayBuffer[((Int, Double, Int, Long), UnsafeRow)]] = {
    val keyProj = UnsafeProjection.create(keys, childOutput)
    val valEval = BindReferences.bindReference(value, childOutput)
    val tieEval = BindReferences.bindReference(tie, childOutput)
    val rowCopy = UnsafeProjection.create(childOutput.map(_.dataType).toArray)
    val buffers = mutable.LinkedHashMap.empty[UnsafeRow, mutable.ArrayBuffer[((Int, Double, Int, Long), UnsafeRow)]]
    def prune(b: mutable.ArrayBuffer[((Int, Double, Int, Long), UnsafeRow)]): Unit = {
      val kept = b.sortBy(_._1).take(k)
      b.clear(); b ++= kept
    }
    it.foreach { row =>
      val key = keyProj(row).copy()
      val buf = buffers.getOrElseUpdate(key, mutable.ArrayBuffer.empty)
      buf += ((rankKey(valEval.eval(row).asInstanceOf[java.lang.Double],
        tieEval.eval(row).asInstanceOf[java.lang.Long]), rowCopy(row).copy()))
      if (buf.length > 2 * k) prune(buf)
    }
    buffers.valuesIterator.map { buf => prune(buf); buf }
  }
}

/** Map-side partial top-k (the partial-aggregation pattern applied to
  * per-key top-k): per PARTITION, per key, emit only the local top-k
  * rows — no rank, no required distribution — so the exchange feeding
  * the final [[TopKPerKeyExec]] moves at most partitions x keys x k
  * rows instead of every input row. The global top-k per key is the
  * top-k of the union of per-partition top-k's (min-of-mins), so the
  * final pass is unchanged. */
case class TopKPerKeyPartialExec(
    keys: Seq[Expression], value: Expression, tie: Expression, k: Int,
    child: SparkPlan)
  extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyPartialExec =
    copy(child = newChild)

  override protected def doExecute(): RDD[InternalRow] = {
    val (childOutput, ks, v, t, kL) = (child.output, keys, value, tie, k)
    child.execute().mapPartitions { it =>
      TopKHeap.pruneTopK(it, ks, v, t, kL, childOutput)
        .flatMap(_.iterator.map(_._2))
    }
  }
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
    val (childOutput, ks, v, t, kL) = (child.output, keys, value, tie, k)
    val outTypes = output.map(_.dataType).toArray
    child.execute().mapPartitions { it =>
      val outProj = UnsafeProjection.create(outTypes)
      val joined = new JoinedRow
      TopKHeap.pruneTopK(it, ks, v, t, kL, childOutput).flatMap { buf =>
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
      // partial below the (EnsureRequirements-inserted) exchange, final
      // above it — the aggregation physical-planning shape: the shuffle
      // moves at most partitions x keys x k pre-pruned rows
      TopKPerKeyExec(keys, value, tie, k, rankAttr,
        TopKPerKeyPartialExec(keys, value, tie, k, planLater(child))) :: Nil
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
