package graft.relational

import java.math.{BigDecimal => JBD}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Exact distributed WEIGHTED quantiles with bounded state — the
  * weight-mass generalization of [[Quantiles]]: Q(p) is the smallest
  * value v whose cumulative weight reaches p fraction of the total
  * weight (the standard "weighted lower quantile"; with unit weights
  * it degenerates to the inverse empirical CDF). The operational
  * question it answers is different from the unweighted engine's:
  * "below what unit price does half the shipped QUANTITY sit" weights
  * every row by how much it represents.
  *
  * Same scale contract as Quantiles: pass 1 fuses totals and the
  * first refinement into ONE scan (the static rank-preserving
  * sign/binade/log-mantissa bucket id), later passes histogram the
  * active bracket into 1024 comparison-exact buckets, and the final
  * residual collect is capped. Driver state is O(groups x buckets)
  * per pass — the bounded-group contract (dims, flags, types), not
  * per-user keys.
  *
  * Exactness: weight masses accumulate as DECIMAL end-to-end — Spark
  * sums decimal(38,6) (exact, order-independent) and the driver walks
  * java.math.BigDecimal — so the threshold comparison cumW >= p*W is
  * EXACT, never a double near-tie. `probs` must be decimal-exact
  * literals (0.25, not 1.0/3): the threshold is W * BigDecimal(p's
  * decimal string), mirrored by the oracle's DECIMAL literal product.
  * Values only ever move through COMPARISONS against driver-held
  * exact doubles (the Quantiles discipline), so bracket membership
  * can't straddle a rounding boundary.
  */
object WeightedQuantiles {

  val Buckets = 1024
  val DefaultResidualCap = 65536
  private val SubBuckets = 32

  private final case class Target(group: String, prob: Double)
  private final case class Bracket(lo: Double, hi: Double, hiClosed: Boolean,
                                   massBelow: JBD, rowsIn: Long)

  /** group -> prob -> weighted quantile (groups with zero positive-
    * weight rows are absent). */
  def grouped(df: DataFrame, groupCol: String, valueCol: String,
              weightCol: String, probs: Seq[Double],
              residualCap: Int = DefaultResidualCap)
      : Map[String, Map[Double, Double]] =
    groupedWithTotals(df, groupCol, valueCol, weightCol, probs, residualCap)._1

  /** As [[grouped]], but also returns each group's exact total weight
    * (already summed by the fused pass — consumers reporting the
    * total should not pay a second scan). */
  def groupedWithTotals(df: DataFrame, groupCol: String, valueCol: String,
                        weightCol: String, probs: Seq[Double],
                        residualCap: Int = DefaultResidualCap)
      : (Map[String, Map[Double, Double]], Map[String, JBD]) = {
    require(probs.nonEmpty && probs.forall(p => p > 0.0 && p <= 1.0))
    val spark = df.sparkSession
    val base = df.select(col(groupCol).cast("string").as("g"),
        col(valueCol).cast("double").as("v"),
        col(weightCol).cast("decimal(38,6)").as("w"))
      .filter(col("v").isNotNull && !isnan(col("v")) &&
        col("w").isNotNull && col("w") > 0)

    // ---- fused pass 1: totals + first refinement in one scan ----
    val v = col("v")
    val lg = least(lit(1025.0), greatest(lit(-1074.0), log(2.0, abs(v))))
    val e = floor(lg)
    val sub = least(lit(SubBuckets - 1), greatest(lit(0),
      floor((lg - e) * SubBuckets).cast("int")))
    val mag = (lit(1100) + e.cast("int")) * SubBuckets + sub
    val bucket =
      when(v === 0.0, 0)
        .when(v === Double.PositiveInfinity, 2200 * SubBuckets)
        .when(v === Double.NegativeInfinity, -2200 * SubBuckets)
        .otherwise(when(v < 0.0, -1).otherwise(1) * mag)

    val first: Map[String, Array[(Int, JBD, Long, Double, Double)]] =
      base.groupBy(col("g"), bucket.as("bk"))
        .agg(sum("w").as("ws"), count(lit(1)).as("n"),
          min("v").as("mn"), max("v").as("mx"))
        .collect()
        .map(r => (r.getString(0), r.getInt(1), r.getDecimal(2),
          r.getLong(3), r.getDouble(4), r.getDouble(5)))
        .groupBy(_._1)
        .map { case (g, rs) =>
          g -> rs.map(t => (t._2, t._3, t._4, t._5, t._6)).sortBy(_._1)
        }

    val totals: Map[String, JBD] = first.map { case (g, bs) =>
      g -> bs.foldLeft(JBD.ZERO) { case (acc, (_, ws, _, _, _)) => acc.add(ws) }
    }
    def threshold(g: String, p: Double): JBD =
      totals(g).multiply(new JBD(p.toString))

    val resolved = scala.collection.mutable.Map.empty[Target, Double]
    var active = Map.empty[Target, Bracket]
    for ((g, bs) <- first; p <- probs) {
      val t = threshold(g, p)
      var cum = JBD.ZERO
      var done = false
      var i = 0
      while (!done && i < bs.length) {
        val (_, ws, n, mn, mx) = bs(i)
        val next = cum.add(ws)
        if (next.compareTo(t) >= 0) {
          if (mn == mx) resolved(Target(g, p)) = mn
          else active += Target(g, p) -> Bracket(mn, mx, hiClosed = true, cum, n)
          done = true
        }
        cum = next; i += 1
      }
      require(done, s"weight mass $t unreached in fused histogram for group $g")
    }

    var pass = 0
    while (active.nonEmpty && pass < 64) {
      pass += 1
      val (flat, rest) = active.partition { case (_, b) => b.lo == b.hi }
      flat.foreach { case (t, b) => resolved(t) = b.lo }
      val (small, big) = rest.partition { case (_, b) => b.rowsIn <= residualCap }
      small.foreach { case (t, b) =>
        resolved(t) = residualAnswer(base, t, b, threshold(t.group, t.prob))
      }
      active = big.map { case (t, b) =>
        t -> refineOnce(base, t, b, threshold(t.group, t.prob), resolved)
      }.collect { case (t, Some(b)) => t -> b }.toMap
    }
    require(active.isEmpty, s"weighted refinement did not converge in $pass passes")

    (totals.keys.map { g =>
      g -> probs.map(p => p -> resolved(Target(g, p))).toMap
    }.toMap, totals)
  }

  /** Ungrouped convenience. */
  def exact(df: DataFrame, valueCol: String, weightCol: String,
            probs: Seq[Double],
            residualCap: Int = DefaultResidualCap): Map[Double, Double] =
    grouped(df.withColumn("__g", lit("all")), "__g", valueCol, weightCol,
      probs, residualCap).getOrElse("all", Map.empty)

  private def member(b: Bracket): Column = {
    val v = col("v")
    v >= lit(b.lo) && (v < lit(b.hi) || (lit(b.hiClosed) && v <= lit(b.hi)))
  }

  /** One 1024-bucket histogram pass over a single target's bracket;
    * resolves when the mass-holding bucket is a tie block (min == max),
    * otherwise returns the narrowed bracket. Jobs per pass are bounded
    * by |groups| x |probs| (the bounded-group contract). */
  private def refineOnce(base: DataFrame, t: Target, b: Bracket, thr: JBD,
                         resolved: scala.collection.mutable.Map[Target, Double])
      : Option[Bracket] = {
    val width = b.hi - b.lo
    val idx = least(lit(Buckets - 1), greatest(lit(0),
      floor((col("v") - lit(b.lo)) / lit(width) * Buckets).cast("int")))
    val rows = base.filter(col("g") === lit(t.group) && member(b))
      .groupBy(idx.as("i"))
      .agg(sum("w").as("ws"), count(lit(1)).as("n"),
        min("v").as("mn"), max("v").as("mx"))
      .collect()
      .map(r => (r.getInt(0), r.getDecimal(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
      .sortBy(_._1)
    var cum = b.massBelow
    for ((_, ws, n, mn, mx) <- rows) {
      val next = cum.add(ws)
      if (next.compareTo(thr) >= 0) {
        if (mn == mx) { resolved(t) = mn; return None }
        return Some(Bracket(mn, mx, hiClosed = true, cum, n))
      }
      cum = next
    }
    throw new IllegalStateException(
      s"weight mass $thr unreached while refining ${t.group}")
  }

  /** Final capped collect: sort the bracket's (v, w) rows by value and
    * walk the exact decimal mass to the threshold. */
  private def residualAnswer(base: DataFrame, t: Target, b: Bracket,
                             thr: JBD): Double = {
    val rows = base.filter(col("g") === lit(t.group) && member(b))
      .select("v", "w").collect()
      .map(r => (r.getDouble(0), r.getDecimal(1)))
      .sortBy(_._1)
    var cum = b.massBelow
    for ((v, w) <- rows) {
      cum = cum.add(w)
      if (cum.compareTo(thr) >= 0) return v
    }
    throw new IllegalStateException(
      s"weight mass $thr unreached in residual for ${t.group}")
  }
}
