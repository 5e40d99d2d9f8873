package graft.relational

import graft.clustering.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class NewOpsSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"

  test("freqItems surfaces the exact heaviest user among its candidates") {
    val r = Relational.eventsFreqItems(spark, sf).collect().head
    assert(r.getAs[Boolean]("top_user_found"),
      "the KSP sketch must contain the true heavy hitter (one-sided guarantee)")
    assert(r.getAs[Int]("n_candidates") > 0)
  }

  test("approx distinct stays within 10% of the exact count per group") {
    val rows = Relational.aggApproxDistinct(spark, sf)
      .select("exact_users", "approx_users").as[(Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (exact, approx) =>
      assert(math.abs(approx - exact).toDouble / exact < 0.10,
        s"HLL error too large: approx $approx vs exact $exact")
    }
  }

  test("salted join spreads one key over SALT partitions without changing results") {
    import org.apache.spark.sql.functions._
    val salted = Relational.joinSalted(spark, sf)
      .orderBy("o_orderstatus").collect().map(_.toSeq)
    val plain = graft.Tables.t(spark, sf, "lineitem")
      .join(graft.Tables.t(spark, sf, "orders"), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_items"), round(sum("l_extendedprice"), 1).as("sum_price"))
      .orderBy("o_orderstatus").collect().map(_.toSeq)
    assert(salted.toSeq == plain.toSeq)
  }

  test("approx percentile lands within 5% of the exact median per group") {
    val rows = Relational.percentileApproxQty(spark, sf)
      .select("p50_approx", "p50_exact").as[(Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (approx, exact) =>
      assert(math.abs(approx - exact) / exact < 0.05,
        s"approx $approx vs exact $exact")
    }
  }

  test("salted join shuffles on (key, salt) rather than broadcasting the replicated side") {
    val plan = Relational.joinSalted(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("ShuffledHashJoin") || plan.contains("SortMergeJoin"),
      plan.take(500))
  }

  test("sliding windows count every event exactly twice (1h window, 30m slide)") {
    import org.apache.spark.sql.functions._
    val total = graft.Tables.t(spark, sf, "events").count()
    val windowed = Relational.eventsSliding(spark, sf)
      .agg(sum("n_events")).head().getLong(0)
    assert(windowed == 2 * total, s"$windowed vs 2x$total")
  }

  test("cube emits every subtotal combination incl. the grand total") {
    val out = Relational.cubeRevenue(spark, sf)
      .select("l_returnflag", "l_linestatus").as[(String, String)].collect().toSet
    assert(out.contains(("ALL", "ALL")), "grand total row")
    assert(out.exists { case (f, s) => f != "ALL" && s == "ALL" }, "per-flag subtotal")
    assert(out.exists { case (f, s) => f == "ALL" && s != "ALL" }, "per-status subtotal")
  }
}
