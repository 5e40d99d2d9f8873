package graft.relational

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact distributed quantiles with BOUNDED executor and driver state —
  * the scale-safe replacement for Spark's `percentile`, whose single
  * aggregation buffer accumulates a value→count map of EVERY distinct
  * value of the column on one reducer (an executor OOM once the value
  * domain stops fitting in memory: `l_extendedprice` at 100 TB has
  * ~10⁸⁺ distinct doubles).
  *
  * Algorithm — iterative bucket refinement, the classic distributed
  * exact-selection scheme. Per needed order statistic:
  *
  *   pass 0   groupBy(group) → (count, min, max)           O(|groups|)
  *   pass k   histogram the current bracket into 1024
  *            comparison-exact buckets, keep the bucket
  *            holding the rank, recurse             O(|brackets|·1024)
  *   final    sort_array(collect_list) of the ≤ residualCap
  *            values left in the bracket, index the rank O(residualCap)
  *
  * Every aggregation in every pass is a partial-aggregated groupBy
  * over a STATICALLY bounded key space; the only collect_list is
  * capped at `residualCap` by construction. Each pass shrinks the
  * bracket ≥1024×, so even an adversarial all-values-within-one-ulp
  * column terminates in ≤ ~6 passes (a double has 52 mantissa bits);
  * typical data resolves in stats + one histogram + one residual
  * pass = 3 scans of the (cached, explicitly released) input.
  *
  * Exactness: bucket membership is defined by COMPARISONS against
  * driver-computed edge doubles — the float division only seeds a
  * ±1-corrected guess — so no value can straddle a rounding boundary
  * and the rank bookkeeping is exact. The final interpolation mirrors
  * `percentile`'s `(k₂−r)·lower + (r−k₁)·higher`, keeping results
  * bitwise-identical to the single-buffer aggregate (QuantilesSpec
  * asserts this property on adversarial data).
  */
object Quantiles {

  val Buckets = 1024
  val DefaultResidualCap = 65536

  private final case class Target(group: String, rank: Long)
  private final case class Bracket(lo: Double, hi: Double, hiClosed: Boolean,
                                   countBelow: Long, countIn: Long)

  /** Exact interpolated quantiles of `valueCol` per `groupCol` value.
    * Returns group → prob → quantile (groups with zero non-null rows
    * are absent). Bounded state everywhere; see object doc. */
  def grouped(df: DataFrame, groupCol: String, valueCol: String,
              probs: Seq[Double],
              residualCap: Int = DefaultResidualCap)
      : Map[String, Map[Double, Double]] = {
    require(probs.nonEmpty && probs.forall(p => p >= 0.0 && p <= 1.0))
    val spark = df.sparkSession
    val base = df.select(col(groupCol).cast("string").as("g"),
        col(valueCol).cast("double").as("v"))
      .filter(col("v").isNotNull)
    // One materialization serves the 3-4 passes; released before return
    // (the global cache-leak audit holds for this path too).
    val staged = base.cache()
    try {
      val stats = staged.groupBy("g")
        .agg(count(lit(1)).as("n"), min("v").as("mn"), max("v").as("mx"))
        .collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3))))
        .toMap

      // Ranks needed per group: floor and ceil of p·(n−1), deduped.
      val ranksOf: Map[String, Seq[Long]] = stats.map { case (g, (n, _, _)) =>
        g -> probs.flatMap { p =>
          val r = p * (n - 1)
          Seq(math.floor(r).toLong, math.ceil(r).toLong)
        }.distinct
      }

      val resolved = scala.collection.mutable.Map.empty[Target, Double]
      var active: Map[Target, Bracket] = (for {
        (g, ranks) <- ranksOf.toSeq
        (n, mn, mx) = stats(g)
        r <- ranks
      } yield Target(g, r) -> Bracket(mn, mx, hiClosed = true, 0L, n)).toMap

      var pass = 0
      while (active.nonEmpty && pass < 64) {
        pass += 1
        // 1. Width-zero brackets: every remaining value equals lo.
        val (flat, rest) = active.partition { case (_, b) => b.lo == b.hi }
        flat.foreach { case (t, b) => resolved(t) = b.lo }
        // 2. Small brackets: one batched collect, capped per target.
        val (small, big) = rest.partition { case (_, b) => b.countIn <= residualCap }
        if (small.nonEmpty) resolveResidual(spark, staged, small, resolved)
        // 3. Large brackets: histogram refinement, 1024× narrower each;
        //    single-distinct-value buckets (heavy tie blocks) resolve
        //    inside refine() from the bucket's min==max, so a column
        //    with a million copies of one value costs ONE pass, not a
        //    width-shrinking spiral down to ulp scale.
        active = if (big.nonEmpty) refine(spark, staged, big, resolved) else Map.empty
      }
      require(active.isEmpty, s"quantile refinement did not converge in $pass passes")

      stats.map { case (g, (n, _, _)) =>
        g -> probs.map { p =>
          val r = p * (n - 1)
          val k1 = math.floor(r).toLong
          val k2 = math.ceil(r).toLong
          val lo = resolved(Target(g, k1))
          val hi = resolved(Target(g, k2))
          // percentile's exact interpolation form (two products, not
          // lo + Δ·frac — they differ by an ulp and the oracle is bitwise)
          val v = if (k1 == k2 || lo == hi) lo
                  else (k2 - r) * lo + (r - k1) * hi
          p -> v
        }.toMap
      }
    } finally staged.unpersist()
  }

  /** Ungrouped convenience: exact quantiles of one column. */
  def exact(df: DataFrame, valueCol: String, probs: Seq[Double],
            residualCap: Int = DefaultResidualCap): Map[Double, Double] =
    grouped(df.withColumn("__g", lit("all")), "__g", valueCol, probs, residualCap)
      .getOrElse("all", Map.empty)

  /** Bracket-membership predicate: comparisons against exact driver
    * doubles, [lo, hi) half-open except the original max stays closed. */
  private def member(lo: org.apache.spark.sql.Column, hi: org.apache.spark.sql.Column,
                     hic: org.apache.spark.sql.Column) = {
    val v = col("v")
    v >= lo && (v < hi || (hic && v <= hi))
  }

  /** One histogram pass over every active large bracket; returns the
    * refined bracket per target, resolving targets whose bucket holds
    * a single distinct value (min==max) directly into `out`. Identical
    * (group, bracket) pairs share one histogram — on pass 1 all of a
    * group's ranks do. */
  private def refine(spark: org.apache.spark.sql.SparkSession, staged: DataFrame,
                     big: Map[Target, Bracket],
                     out: scala.collection.mutable.Map[Target, Double]): Map[Target, Bracket] = {
    import spark.implicits._
    val byBracket: Map[(String, Bracket), Seq[Target]] =
      big.toSeq.groupBy { case (t, b) => (t.group, b) }
        .map { case (k, ts) => k -> ts.map(_._1) }
    val keyed = byBracket.keys.toSeq.zipWithIndex
    val idOf = keyed.toMap
    val bdf = keyed.map { case ((g, b), id) =>
      (g, id, b.lo, b.hi, b.hiClosed, edges(b.lo, b.hi))
    }.toDF("g", "bid", "lo", "hi", "hic", "edges")

    // Seed bucket by division, then correct ±1 against the exact edges:
    // membership is decided ONLY by comparisons with e_b / e_{b+1}.
    val b0 = least(lit(Buckets - 1), greatest(lit(0),
      floor((col("v") - col("lo")) * Buckets / (col("hi") - col("lo"))).cast("int")))
    val hist = staged.join(broadcast(bdf), "g")
      .filter(member(col("lo"), col("hi"), col("hic")))
      .withColumn("b0", b0)
      .withColumn("b1",
        when(col("v") < element_at(col("edges"), col("b0") + 1), col("b0") - 1)
          .otherwise(col("b0")))
      .withColumn("b2",
        when(col("b1") < Buckets - 1 &&
             col("v") >= element_at(col("edges"), col("b1") + 2), col("b1") + 1)
          .otherwise(col("b1")))
      .withColumn("bk", least(lit(Buckets - 1), greatest(lit(0), col("b2"))))
      .groupBy("bid", "bk")
      .agg(count(lit(1)).as("c"), min("v").as("mn"), max("v").as("mx"))
      .collect()
      .groupBy(_.getInt(0))
      .map { case (bid, rows) =>
        bid -> rows.map(r =>
          r.getInt(1) -> ((r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
      }

    byBracket.toSeq.flatMap { case ((g, br), targets) =>
      val counts = hist.getOrElse(idOf((g, br)), Map.empty)
      val total = counts.values.map(_._1).sum
      require(total == br.countIn,
        s"histogram lost rows: $total != ${br.countIn} for $g $br")
      val es = edges(br.lo, br.hi)
      targets.flatMap { t =>
        val rankIn = t.rank - br.countBelow
        var cum = 0L
        var chosen = -1
        var below = 0L
        var bucket = (0L, 0.0, 0.0)
        var b = 0
        while (b < Buckets && chosen < 0) {
          val (c, mn, mx) = counts.getOrElse(b, (0L, 0.0, 0.0))
          if (rankIn < cum + c) { chosen = b; below = cum; bucket = (c, mn, mx) }
          cum += c
          b += 1
        }
        require(chosen >= 0, s"rank ${t.rank} not found in bracket $br")
        val (inBucket, mn, mx) = bucket
        if (mn == mx) { out(t) = mn; None } // one distinct value: done
        // new bracket = the OBSERVED [mn, mx] (closed), not the nominal
        // bucket edges: values in other buckets are < e_b or >= e_{b+1}
        // and mn >= e_b, mx < e_{b+1}, so [mn, mx] holds exactly this
        // bucket's values — tighter, and clustered data converges in
        // one extra pass instead of ulp-stepping through empty margins.
        else Some(t -> Bracket(mn, mx, hiClosed = true,
          countBelow = br.countBelow + below, countIn = inBucket))
      }
    }.toMap
  }

  /** Final pass: collect each small bracket (≤ residualCap values by
    * construction — the one collect_list, explicitly bounded), sort,
    * index the rank. Batched into ONE job for all targets. */
  private def resolveResidual(spark: org.apache.spark.sql.SparkSession,
                              staged: DataFrame, small: Map[Target, Bracket],
                              out: scala.collection.mutable.Map[Target, Double]): Unit = {
    import spark.implicits._
    val rows = small.toSeq.zipWithIndex.map { case ((t, b), id) =>
      (t.group, id, b.lo, b.hi, b.hiClosed)
    }
    val tOf = small.toSeq.zipWithIndex.map { case ((t, b), id) =>
      id -> (t, b)
    }.toMap
    val rdf = rows.toDF("g", "tid", "lo", "hi", "hic")
    val got = staged.join(broadcast(rdf), "g")
      .filter(member(col("lo"), col("hi"), col("hic")))
      .groupBy("tid").agg(sort_array(collect_list("v")).as("vs"))
      .collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1))
      .toMap
    tOf.foreach { case (id, (t, b)) =>
      val vs = got.getOrElse(id, Seq.empty)
      require(vs.length == b.countIn,
        s"residual lost rows: ${vs.length} != ${b.countIn} for $t")
      out(t) = vs((t.rank - b.countBelow).toInt)
    }
  }

  /** 1025 monotone bucket edges lo = e₀ ≤ … ≤ e₁₀₂₄ = hi. Duplicate
    * edges (sub-ulp widths) just leave empty buckets. */
  private def edges(lo: Double, hi: Double): Array[Double] = {
    val es = new Array[Double](Buckets + 1)
    val w = hi - lo
    var i = 0
    while (i <= Buckets) {
      es(i) = lo + w * i / Buckets
      if (i > 0 && es(i) < es(i - 1)) es(i) = es(i - 1)
      i += 1
    }
    es(0) = lo
    es(Buckets) = hi
    es
  }
}
