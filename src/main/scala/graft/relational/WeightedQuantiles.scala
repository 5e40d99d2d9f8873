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
      if (small.nonEmpty) resolveResidualBatch(base, small, threshold, resolved)
      active =
        if (big.nonEmpty) refineBatch(base, big, threshold, resolved) else Map.empty
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

  /** Per-row tag array for a batch of targets: element tid where the
    * row belongs to target tid's (group, bracket), null otherwise —
    * exploded + null-filtered, this turns N per-target scans into ONE
    * (a row can legitimately serve two targets whose brackets
    * overlap, so the tag must be an array, not a first-match). */
  private def tagged(base: DataFrame, targets: Seq[(Target, Bracket)]): DataFrame = {
    val tags = targets.zipWithIndex.map { case ((t, b), tid) =>
      when(col("g") === lit(t.group) && member(b), lit(tid))
        .otherwise(lit(null).cast("int"))
    }
    base.select(col("v"), col("w"), explode(array(tags: _*)).as("tid"))
      .filter(col("tid").isNotNull)
  }

  /** One batched 1024-bucket histogram pass over every active
    * bracket — a single scan regardless of target count; a target
    * resolves when its mass-holding bucket is a tie block (min ==
    * max), otherwise its bracket narrows >= 1024x. */
  private def refineBatch(base: DataFrame, targets: Map[Target, Bracket],
                          threshold: (String, Double) => JBD,
                          resolved: scala.collection.mutable.Map[Target, Double])
      : Map[Target, Bracket] = {
    val ordered = targets.toSeq
    val lows = ordered.map(_._2.lo).toArray
    val widths = ordered.map(b => b._2.hi - b._2.lo).toArray
    val loCol = element_at(typedLit(lows.toSeq), col("tid") + 1)
    val widthCol = element_at(typedLit(widths.toSeq), col("tid") + 1)
    val idx = least(lit(Buckets - 1), greatest(lit(0),
      floor((col("v") - loCol) / widthCol * Buckets).cast("int")))
    val byTid = tagged(base, ordered)
      .groupBy(col("tid"), idx.as("i"))
      .agg(sum("w").as("ws"), count(lit(1)).as("n"),
        min("v").as("mn"), max("v").as("mx"))
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getDecimal(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))
      .groupBy(_._1)
    ordered.zipWithIndex.flatMap { case ((t, b), tid) =>
      val thr = threshold(t.group, t.prob)
      val rows = byTid(tid).map(x => (x._2, x._3, x._4, x._5, x._6)).sortBy(_._1)
      var cum = b.massBelow
      var out: Option[(Target, Bracket)] = None
      var done = false
      for ((_, ws, n, mn, mx) <- rows if !done) {
        val next = cum.add(ws)
        if (next.compareTo(thr) >= 0) {
          if (mn == mx) resolved(t) = mn
          else out = Some(t -> Bracket(mn, mx, hiClosed = true, cum, n))
          done = true
        }
        cum = next
      }
      require(done, s"weight mass $thr unreached while refining ${t.group}")
      out
    }.toMap
  }

  /** Final batched capped collect: one scan gathers every small
    * bracket's (v, w) rows (<= residualCap per target by
    * construction); the driver sorts each target's slice by value and
    * walks the exact decimal mass to its threshold. */
  private def resolveResidualBatch(base: DataFrame,
                                   targets: Map[Target, Bracket],
                                   threshold: (String, Double) => JBD,
                                   resolved: scala.collection.mutable.Map[Target, Double])
      : Unit = {
    val ordered = targets.toSeq
    val byTid = tagged(base, ordered)
      .select("tid", "v", "w").collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getDecimal(2)))
      .groupBy(_._1)
    ordered.zipWithIndex.foreach { case ((t, b), tid) =>
      val thr = threshold(t.group, t.prob)
      var cum = b.massBelow
      var done = false
      for ((_, v, w) <- byTid(tid).map(x => (x._1, x._2, x._3)).sortBy(_._2) if !done) {
        cum = cum.add(w)
        if (cum.compareTo(thr) >= 0) { resolved(t) = v; done = true }
      }
      require(done, s"weight mass $thr unreached in residual for ${t.group}")
    }
  }
}
