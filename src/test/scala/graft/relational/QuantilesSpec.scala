package graft.relational

import graft.clustering.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** The bounded-state exact-quantile engine must agree BITWISE with
  * Spark's single-buffer `percentile` aggregate — on ties, sub-ulp
  * spreads, negatives, singleton groups — while never holding more
  * than residualCap values in any one task. A tiny residualCap forces
  * the histogram-refinement loop several levels deep. */
class QuantilesSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private val probs = Seq(0.25, 0.5, 0.75, 0.9)

  /** Oracle: Spark's own exact percentile, per group. */
  private def sparkPercentile(rows: Seq[(String, Double)]): Map[String, Map[Double, Double]] =
    rows.toDF("g", "v")
      .groupBy("g")
      .agg(expr(s"percentile(v, array(${probs.mkString("D,")}D))").as("ps"))
      .collect()
      .map(r => r.getString(0) -> probs.zip(r.getSeq[Double](1)).toMap)
      .toMap

  private def check(rows: Seq[(String, Double)], residualCap: Int): Unit = {
    val got = Quantiles.grouped(rows.toDF("g", "v"), "g", "v", probs, residualCap)
    val exp = sparkPercentile(rows)
    assert(got.keySet == exp.keySet)
    for (g <- exp.keySet; p <- probs) {
      val (a, b) = (got(g)(p), exp(g)(p))
      assert(java.lang.Double.doubleToLongBits(a) == java.lang.Double.doubleToLongBits(b),
        s"group $g p=$p: refinement $a != percentile $b")
    }
  }

  test("random mixed-scale data matches percentile bitwise (deep refinement)") {
    val rnd = new Random(42)
    val rows = Seq.tabulate(5000) { i =>
      val g = s"g${i % 3}"
      val v = rnd.nextInt(4) match {
        case 0 => rnd.nextDouble() * 1e9 - 5e8
        case 1 => rnd.nextInt(10).toDouble          // heavy ties
        case 2 => 1.0 + rnd.nextInt(50) * math.ulp(1.0)  // sub-ulp spread
        case _ => -math.exp(rnd.nextDouble() * 20)
      }
      (g, v)
    }
    check(rows, residualCap = 8) // force several histogram levels
  }

  test("all-equal column resolves via the width-zero rule") {
    check(Seq.fill(1000)(("g", 3.25)), residualCap = 4)
  }

  test("singleton and pair groups interpolate correctly") {
    check(Seq(("a", 7.5), ("b", 1.0), ("b", 2.0), ("c", -1.0), ("c", -1.0)),
      residualCap = 4)
  }

  test("two huge tie blocks converge (bucket never shrinks by count, only width)") {
    val rows = Seq.fill(3000)(("g", 1.0)) ++ Seq.fill(3000)(("g", 2.0))
    check(rows, residualCap = 16)
  }

  test("ungrouped convenience matches and nulls are ignored") {
    val df = (Seq.tabulate(500)(i => Some(i.toDouble)) :+ Option.empty[Double])
      .toDF("v")
    val got = Quantiles.exact(df, "v", Seq(0.5), residualCap = 32)(0.5)
    val exp = df.agg(expr("percentile(v, 0.5)")).head().getDouble(0)
    assert(java.lang.Double.doubleToLongBits(got) ==
      java.lang.Double.doubleToLongBits(exp))
  }

  test("NaN values are filtered like nulls, not a query abort") {
    // the documented divergence from percentile (which sorts NaN
    // last): a corrupt value must not throw the row-count invariant
    val clean = Seq.tabulate(500)(i => ("g", i.toDouble))
    val got = Quantiles.grouped(
      (clean ++ Seq(("g", Double.NaN), ("g", Double.NaN))).toDF("g", "v"),
      "g", "v", probs, residualCap = 16)
    val exp = sparkPercentile(clean)
    for (p <- probs)
      assert(java.lang.Double.doubleToLongBits(got("g")(p)) ==
        java.lang.Double.doubleToLongBits(exp("g")(p)),
        s"NaN rows must vanish, leaving the clean column's answer at p=$p")
  }

  test("a near-max-double range converges (no Infinity width collapse)") {
    // bucket seeding divides BEFORE scaling: a group spanning almost
    // the whole double range must refine normally rather than collapse
    // into the extreme buckets and fail the 64-pass bound
    val rows = Seq.tabulate(2000) { i =>
      ("g", (if (i % 2 == 0) -1.0 else 1.0) * Double.MaxValue / (1 + i % 7))
    }
    check(rows, residualCap = 16)
  }

  test("infinite values sit in their own sentinel buckets") {
    val rows = Seq.fill(100)(("g", Double.NegativeInfinity)) ++
      Seq.tabulate(300)(i => ("g", i.toDouble)) ++
      Seq.fill(100)(("g", Double.PositiveInfinity))
    check(rows, residualCap = 16)
  }

  test("edges are monotone and span exactly [lo, hi] even at sub-ulp width") {
    // private edges() is exercised end-to-end: a bracket whose width is
    // a few ulps must still refine rather than loop forever.
    val lo = 1.0
    val rows = Seq.fill(2000)(("g", lo)) ++
      Seq.fill(2000)(("g", math.nextUp(lo))) ++
      Seq.fill(2000)(("g", math.nextUp(math.nextUp(lo))))
    check(rows, residualCap = 8)
  }
}
