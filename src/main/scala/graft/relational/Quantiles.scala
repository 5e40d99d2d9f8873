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
  * exact-selection scheme, with the stats pass FUSED into the first
  * histogram pass so the typical query is two scans total:
  *
  *   pass 1   groupBy(group, rankBucket(v)) → (count, min, max)
  *            where rankBucket is a rank-preserving function of the
  *            double's sign/binary-exponent/log-mantissa — computable
  *            WITHOUT knowing per-group min/max, statically bounded
  *            (≤ ~4300·32 ids). One scan yields per-group n/min/max
  *            (sums over buckets) AND the first bracket refinement.
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
  * typical data resolves in ONE fused pass + one residual pass = 2
  * scans of a 2-column projection. The input is deliberately NOT
  * cached: recomputing a cheap projection beats materializing a
  * corpus-wide cache at 100 TB, and locally the pass count is what
  * dominates, not the scan.
  *
  * Exactness: pass-1 bucketing only needs to be rank-preserving
  * (floor∘log2 is monotone — java.lang.Math.log is semi-monotonic,
  * division by the positive constant ln 2 and floor preserve order);
  * each bucket's bracket is its OBSERVED [min, max], and all later
  * membership is decided by COMPARISONS against driver-held exact
  * doubles, so no value can straddle a rounding boundary and the rank
  * bookkeeping is exact. The final interpolation mirrors
  * `percentile`'s `(k₂−r)·lower + (r−k₁)·higher`, keeping results
  * bitwise-identical to the single-buffer aggregate (QuantilesSpec
  * asserts this property on adversarial data).
  *
  * NaN policy: NaNs are filtered with nulls (a corrupt value must not
  * abort the query — the bracket comparisons would silently drop it
  * and the row-count invariant would throw). This deliberately
  * diverges from `percentile`, which sorts NaN above every value.
  *
  * Group-cardinality contract: driver state is O(|groups| × 1024)
  * histogram cells per pass, so the engine targets BOUNDED group
  * counts (dims, event types, languages, quartile gates — every call
  * site here). For data-sized group keys (per-user, per-document) use
  * `approx_percentile`, whose GK sketch merges distributively; an
  * exact answer at that cardinality is a different algorithm
  * (per-group selection), not a bigger driver.
  */
object Quantiles {

  val Buckets = 1024
  val DefaultResidualCap = 65536

  /** Sub-buckets per binade in the fused first pass: 32 splits the
    * mantissa's log evenly so a group spanning b binades lands in
    * ≤ 32·b buckets — typical columns (tens of binades) refine to
    * residual-sized brackets in the one fused pass. */
  private val SubBuckets = 32

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
      .filter(col("v").isNotNull && !isnan(col("v")))

    // ---- Fused pass 1: stats + first refinement in ONE scan. ----
    // Rank-preserving bucket id from the value alone:
    //   0 for ±0; ±(binade·32 + log-mantissa-32th) for finite v;
    //   ±2200·32 sentinels for ±Infinity (their own width-zero
    //   buckets, so every later bracket has FINITE width).
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

    val first: Map[String, Array[(Int, Long, Double, Double)]] =
      base.groupBy(col("g"), bucket.as("bk"))
        .agg(count(lit(1)).as("n"), min("v").as("mn"), max("v").as("mx"))
        .collect()
        .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
        .groupBy(_._1)
        .map { case (g, rs) =>
          g -> rs.map(t => (t._2, t._3, t._4, t._5)).sortBy(_._1)
        }

    val stats: Map[String, Long] = first.map { case (g, bs) => g -> bs.map(_._2).sum }

    // Ranks needed per group: floor and ceil of p·(n−1), deduped.
    val ranksOf: Map[String, Seq[Long]] = stats.map { case (g, n) =>
      g -> probs.flatMap { p =>
        val r = p * (n - 1)
        Seq(math.floor(r).toLong, math.ceil(r).toLong)
      }.distinct
    }

    val resolved = scala.collection.mutable.Map.empty[Target, Double]
    var active = scala.collection.mutable.Map.empty[Target, Bracket]
    for ((g, ranks) <- ranksOf; r <- ranks) {
      // Walk the group's fused histogram to the bucket holding rank r.
      val bs = first(g)
      var cum = 0L
      var i = 0
      var done = false
      while (!done && i < bs.length) {
        val (_, c, mn, mx) = bs(i)
        if (r < cum + c) {
          if (mn == mx) resolved(Target(g, r)) = mn
          else active(Target(g, r)) = Bracket(mn, mx, hiClosed = true, cum, c)
          done = true
        }
        cum += c
        i += 1
      }
      require(done, s"rank $r not found in fused histogram for group $g")
    }

    var activeMap: Map[Target, Bracket] = active.toMap
    var pass = 0
    while (activeMap.nonEmpty && pass < 64) {
      pass += 1
      // 1. Width-zero brackets: every remaining value equals lo.
      val (flat, rest) = activeMap.partition { case (_, b) => b.lo == b.hi }
      flat.foreach { case (t, b) => resolved(t) = b.lo }
      // 2. Small brackets: one batched collect, capped per target.
      val (small, big) = rest.partition { case (_, b) => b.countIn <= residualCap }
      if (small.nonEmpty) resolveResidual(spark, base, small, resolved)
      // 3. Large brackets: histogram refinement, 1024× narrower each;
      //    single-distinct-value buckets (heavy tie blocks) resolve
      //    inside refine() from the bucket's min==max, so a column
      //    with a million copies of one value costs ONE pass, not a
      //    width-shrinking spiral down to ulp scale.
      activeMap = if (big.nonEmpty) refine(spark, base, big, resolved) else Map.empty
    }
    require(activeMap.isEmpty, s"quantile refinement did not converge in $pass passes")

    stats.map { case (g, n) =>
      g -> probs.map { p =>
        val r = p * (n - 1)
        val k1 = math.floor(r).toLong
        val k2 = math.ceil(r).toLong
        val lo = resolved(Target(g, k1))
        val hi = resolved(Target(g, k2))
        // percentile's exact interpolation form (two products, not
        // lo + Δ·frac — they differ by an ulp and the oracle is bitwise)
        val q = if (k1 == k2 || lo == hi) lo
                else (k2 - r) * lo + (r - k1) * hi
        p -> q
      }.toMap
    }
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

    // Seed bucket by division — DIVIDE FIRST so a wide bracket can't
    // overflow (v−lo ≤ hi−lo, the quotient is in [0,1]; hi−lo itself
    // is finite because pass-1 binade bucketing never produces a
    // mixed-sign or Infinity-spanning bracket) — then correct ±1
    // against the exact edges: membership is decided ONLY by
    // comparisons with e_b / e_{b+1}.
    val b0 = least(lit(Buckets - 1), greatest(lit(0),
      floor((col("v") - col("lo")) / (col("hi") - col("lo")) * Buckets).cast("int")))
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
    * edges (sub-ulp widths) just leave empty buckets. Width is divided
    * BEFORE scaling by the index so no intermediate can overflow
    * (w ≤ 2¹⁰²³ is guaranteed finite: pass-1 binade bucketing never
    * emits a mixed-sign or Infinity-spanning bracket). */
  private def edges(lo: Double, hi: Double): Array[Double] = {
    val w = hi - lo
    require(!w.isInfinity, s"bracket [$lo, $hi] has non-finite width")
    val step = w / Buckets
    val es = new Array[Double](Buckets + 1)
    var i = 0
    while (i <= Buckets) {
      es(i) = lo + step * i
      if (i > 0 && es(i) < es(i - 1)) es(i) = es(i - 1)
      i += 1
    }
    es(0) = lo
    es(Buckets) = hi
    es
  }
}
