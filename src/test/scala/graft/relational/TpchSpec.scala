package graft.relational

import graft.clustering.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral specs for the round-13 TPC-H-shape additions: Q4 (EXISTS
  * semi-join), Q6 (pure pushdown scan), Q10 (returned-item top-k),
  * Q14 (conditional-agg ratio), Q19 (disjunctive join predicate).
  * Reference semantics: TPC-H spec queries adapted to the testdata
  * star schema (no partsupp/commitdate/shipmode columns). */
class TpchSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"

  test("q6: revenue equals the hand-rolled filter aggregate") {
    val got = Relational.q6RevenueDelta(spark, sf).collect()(0)
    val rows = graft.Tables.t(spark, sf, "lineitem")
      .select(col("l_shipdate").cast("string"), col("l_discount"),
        col("l_quantity"), col("l_extendedprice"))
      .collect()
      .filter { r =>
        val d = r.getString(0)
        d >= "1996-01-01" && d < "1997-01-01" &&
          r.getDouble(1) >= 0.05 && r.getDouble(1) <= 0.07 && r.getDouble(2) < 24.0
      }
    assert(got.getLong(1) == rows.length)
    val exp = rows.map { r =>
      (BigDecimal(r.getDouble(3)).setScale(2, BigDecimal.RoundingMode.HALF_UP) *
        BigDecimal(r.getDouble(1)).setScale(2, BigDecimal.RoundingMode.HALF_UP))
    }.sum.setScale(2, BigDecimal.RoundingMode.HALF_UP)
    assert(math.abs(got.getDouble(0) - exp.toDouble) < 1e-9, s"got $got exp $exp")
  }

  test("q4: each qualifying order counts once however many late lines it has") {
    // distinct-order count must equal the semi-join count per priority
    val got = Relational.q4OrderPriority(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val ord = graft.Tables.t(spark, sf, "orders")
      .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp")
        && col("o_orderdate") < lit("1997-07-01").cast("timestamp"))
    val exp = ord.join(graft.Tables.t(spark, sf, "lineitem"),
        col("o_orderkey") === col("l_orderkey")
          && col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"))
      .select("o_orderkey", "o_orderpriority").distinct()
      .groupBy("o_orderpriority").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == exp && got.values.sum > 0)
  }

  test("q14: promo share is promo/total in exact 1e-6 units, within [0,1]") {
    val rows = Relational.q14PromoShare(spark, sf).collect()
    assert(rows.length == 12)
    rows.foreach { r =>
      val promo = r.getDouble(2); val tot = r.getDouble(3); val share = r.getDouble(4)
      assert(promo >= 0.0 && promo <= tot)
      assert(share >= 0.0 && share <= 1.0)
      // share is the HALF_UP 6-dp rounding of the exact ratio
      assert(math.abs(share - promo / tot) <= 5e-7 + 1e-12, s"$share vs ${promo / tot}")
    }
  }

  test("q19: disjunctive filter matches a union of the three arms") {
    val got = Relational.q19BrandQuantity(spark, sf).collect()(0)
    val joined = graft.Tables.t(spark, sf, "lineitem")
      .join(graft.Tables.t(spark, sf, "part"), col("l_partkey") === col("p_partkey"))
    def arm(b: String, s: Int, lo: Double, hi: Double) =
      joined.filter(col("p_brand") === b && col("p_size").between(1, s)
        && col("l_quantity").between(lo, hi)).select("l_orderkey", "l_linenumber")
    val expN = arm("Brand#13", 5, 1.0, 11.0)
      .union(arm("Brand#20", 10, 10.0, 20.0))
      .union(arm("Brand#23", 15, 20.0, 30.0)).distinct().count()
    assert(got.getLong(1) == expN && expN > 0)
  }

  test("q10: exactly 20 rows, revenue non-increasing, custkey tiebreak") {
    val rows = Relational.q10ReturnedCustomers(spark, sf).collect()
    assert(rows.length == 20)
    val revs = rows.map(_.getDouble(4))
    assert(revs.zip(revs.tail).forall { case (a, b) => a >= b })
    rows.zip(rows.tail).foreach { case (a, b) =>
      if (a.getDouble(4) == b.getDouble(4))
        assert(a.getLong(0) < b.getLong(0))
    }
  }

  test("q12: critical + other equals total joined lines in the window") {
    val rows = Relational.q12PriorityLatency(spark, sf).collect()
    assert(rows.map(_.getString(0)).toSet == Set("late", "ontime"))
    val total = rows.map(r => r.getLong(1) + r.getLong(2)).sum
    val exp = graft.Tables.t(spark, sf, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp")
        && col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .join(graft.Tables.t(spark, sf, "orders"),
        col("l_orderkey") === col("o_orderkey")).count()
    assert(total == exp && exp > 0)
  }

  test("q13: distribution covers every customer exactly once, including zero-order ones") {
    val rows = Relational.q13CustomerDistribution(spark, sf).collect()
    val totalCust = rows.map(_.getLong(1)).sum
    val nCust = graft.Tables.t(spark, sf, "customer").count()
    assert(totalCust == nCust)
    val totalOrders = rows.map(r => r.getLong(0) * r.getLong(1)).sum
    assert(totalOrders == graft.Tables.t(spark, sf, "orders").count())
  }

  test("q15: every returned supplier carries the same maximal revenue") {
    val rows = Relational.q15TopSupplier(spark, sf).collect()
    assert(rows.nonEmpty)
    val revs = rows.map(_.getDouble(2)).distinct
    assert(revs.length == 1)
  }

  test("q17: small-quantity lines are a strict subset of the brand's lines") {
    val got = Relational.q17SmallQuantity(spark, sf).collect()(0)
    val brandLines = graft.Tables.t(spark, sf, "lineitem")
      .join(graft.Tables.t(spark, sf, "part")
        .filter(col("p_brand") === "Brand#13"),
        col("l_partkey") === col("p_partkey")).count()
    assert(got.getLong(1) < brandLines)
  }

  test("q22: threshold in multiply-form matches the division-form definition") {
    val rows = Relational.q22IdleCustomers(spark, sf).collect()
    val cust = graft.Tables.t(spark, sf, "customer")
    val stats = cust.filter(col("c_acctbal") > 0)
      .agg(sum("c_acctbal"), count(lit(1))).collect()(0)
    val avg = stats.getDouble(0) / stats.getLong(1)
    val recent = graft.Tables.t(spark, sf, "orders")
      .filter(col("o_orderdate") >= lit("2000-09-01").cast("timestamp"))
      .select("o_custkey")
    val expected = cust.filter(col("c_acctbal") > avg)
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .count()
    assert(rows.map(_.getLong(1)).sum == expected)
  }

  test("q5: only ASIA nations returned; revenue matches the same-nation recompute") {
    val rows = Relational.q5LocalSupplier(spark, sf).collect()
    assert(rows.nonEmpty)
    val asia = graft.Tables.t(spark, sf, "nation")
      .join(graft.Tables.t(spark, sf, "region"),
        col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "ASIA")
      .select("n_name").collect().map(_.getString(0)).toSet
    assert(rows.map(_.getString(0)).forall(asia.contains))
    // independent recompute: plain five-table join, same-nation filter LAST
    val exp = graft.Tables.t(spark, sf, "lineitem")
      .join(graft.Tables.t(spark, sf, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(graft.Tables.t(spark, sf, "customer"), col("o_custkey") === col("c_custkey"))
      .join(graft.Tables.t(spark, sf, "supplier"), col("l_suppkey") === col("s_suppkey"))
      .filter(col("c_nationkey") === col("s_nationkey"))
      .join(graft.Tables.t(spark, sf, "nation"), col("c_nationkey") === col("n_nationkey"))
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp")
        && col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      .filter(col("n_name").isin(asia.toSeq: _*))
      .groupBy("n_name").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.map(r => r.getString(0) -> r.getLong(2)).toMap == exp)
  }

  test("q7: both shipping directions present, nation pair fixed, years within window") {
    val rows = Relational.q7VolumeShipping(spark, sf).collect()
    assert(rows.nonEmpty)
    val combos = rows.map(r => (r.getString(0), r.getString(1))).toSet
    assert(combos.subsetOf(Set(("NATION_18", "NATION_19"), ("NATION_19", "NATION_18"))))
    assert(rows.map(_.getInt(2)).forall(y => y == 1996 || y == 1997))
    // the (pair, year) line counts re-derive from a direction-agnostic recompute
    val total = rows.map(_.getLong(4)).sum
    val exp = graft.Tables.t(spark, sf, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp")
        && col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .join(graft.Tables.t(spark, sf, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(graft.Tables.t(spark, sf, "customer"), col("o_custkey") === col("c_custkey"))
      .join(graft.Tables.t(spark, sf, "supplier"), col("l_suppkey") === col("s_suppkey"))
      .filter((col("s_nationkey") === 18 && col("c_nationkey") === 19)
        || (col("s_nationkey") === 19 && col("c_nationkey") === 18))
      .count()
    assert(total == exp && exp > 0)
  }

  test("q8: market share is nation/total in exact 1e-6 units, within [0,1]") {
    val rows = Relational.q8MarketShare(spark, sf).collect()
    assert(rows.map(_.getInt(0)).toSet == Set(1996, 1997))
    rows.foreach { r =>
      val nat = r.getDouble(2); val tot = r.getDouble(3); val share = r.getDouble(4)
      assert(nat >= 0.0 && nat <= tot)
      assert(share >= 0.0 && share <= 1.0)
      assert(math.abs(share - nat / tot) <= 5e-7 + 1e-12, s"$share vs ${nat / tot}")
    }
  }

  test("q5/q7/q8 plans: single fact-fact shuffle, dimensions broadcast") {
    for (df <- Seq(Relational.q5LocalSupplier(spark, sf),
                   Relational.q7VolumeShipping(spark, sf),
                   Relational.q8MarketShare(spark, sf))) {
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("BroadcastHashJoin"), p)
      // the only SortMergeJoin (if any) is the lineitem-orders orderkey pair
      assert(p.split("SortMergeJoin").length <= 2, p)
    }
  }

  test("reconciliation: the bands partition every order exactly once") {
    val rows = Relational.ordersReconciliation(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val parts = (2 to 6).map(r.getLong).sum
      assert(parts == r.getLong(1), r.toString)
    }
    assert(rows.map(_.getLong(1)).sum ==
      graft.Tables.t(spark, sf, "orders").count())
  }

  test("q6/q19 plans: broadcast join for q19, no shuffle join; q6 scans with pushed filters") {
    val p19 = Relational.q19BrandQuantity(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p19.contains("BroadcastHashJoin"), p19)
    assert(!p19.contains("SortMergeJoin"), p19)
    val p6 = Relational.q6RevenueDelta(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p6.contains("PushedFilters: ["), p6)
    assert(!p6.contains("Exchange hashpartitioning"), p6) // single-row agg only
  }
}
