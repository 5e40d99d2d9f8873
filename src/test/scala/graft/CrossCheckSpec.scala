package graft

import graft.clustering.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Cross-operator consistency: independent implementations that claim
  * the same statistic must agree on the same data — the strongest
  * in-repo correctness signal after the DuckDB oracles, because the
  * two sides share NO code path.
  */
class CrossCheckSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"

  test("orders_gini (two-level stripe rank) agrees with orders_pareto's gini") {
    // independent derivations: Inequality ranks within $100k stripes +
    // census offsets; Analytics.paretoOf uses its distributed presum
    val g1 = relational.Inequality.qGini(spark, sf)
      .select("gini").distinct().collect().head.getDouble(0)
    val g2 = relational.Analytics.paretoOf(
        graft.Tables.t(spark, sf, "orders"))
      .collect().head.getAs[Double]("gini")
    // identical rank-weighted-sum identity; rounding styles differ
    // (cross-multiplied HALF_UP vs double expression), allow 1 ulp@6dp
    assert(math.abs(g1 - g2) <= 1e-6, s"$g1 vs $g2")
  }

  test("HLL and KMV sketches both track the same exact distinct counts") {
    val hll = relational.Hll.qHllSketch(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(4)))).toMap
    val kmv = relational.Hll.qKmvSketch(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(4)))).toMap
    assert(hll.keySet == kmv.keySet)
    hll.foreach { case (k, (exact, est)) =>
      assert(kmv(k)._1 == exact) // identical exact companion counts
      assert(math.abs(est - exact).toDouble / exact < 0.30)
      assert(math.abs(kmv(k)._2 - exact).toDouble / exact < 0.55)
    }
  }

  test("markov entropy's state shares equal the transition-count row sums") {
    val ent = relational.Sequencing.qMarkovEntropy(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val trans = relational.Relational.queries("events_transitions")(spark, sf)
      .groupBy("event_type").agg(sum("n").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ent == trans)
  }

  test("both modularity queries score the SAME candidate graph") {
    val m1 = relational.Graph.qModularity(spark, sf).collect().head
    val m2 = relational.Graph.qLpModularity(spark, sf).collect().head
    assert(m1.getLong(0) == m2.getLong(0)) // identical n_edges
    Seq(m1, m2).foreach { r =>
      val q = r.getAs[Double]("modularity")
      assert(q >= -0.5 && q <= 1.0)
    }
  }

  test("attribution-compare shares are distributions; ranks are permutations") {
    val rows = relational.AttributionCompare.qAttributionCompare(spark, sf).collect()
    val sLt = rows.map(_.getAs[Double]("share_last_touch")).sum
    assert(math.abs(sLt - 1.0) < 1e-4)
    val n = rows.length
    assert(rows.map(_.getAs[Int]("rank_last_touch")).sorted.toSeq == (1 to n))
    assert(rows.map(_.getAs[Int]("rank_markov")).sorted.toSeq == (1 to n))
  }

  test("survival at week 26 is consistent with the repeat-rate censuses") {
    // customers entering the KM study = customers in the repeat-rate
    // cohort census (same first-order derivation)
    val atRisk1 = relational.Survival.qChurnKm(spark, sf)
      .filter(col("week") === 1).collect().head.getLong(1)
    val cohortN = relational.Survival.qRepeatRate(spark, sf)
      .agg(sum("n_customers")).collect().head.getLong(0)
    assert(atRisk1 == cohortN)
  }
}
