package graft.relational

import graft.clustering.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral specs for Apriori frequent triples: a from-scratch
  * driver recompute over the collected (order, part) pairs, plus the
  * Apriori closure property (every sub-pair of a frequent triple is
  * frequent). */
class BasketTriplesSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private lazy val baskets: Map[Long, Set[Long]] =
    graft.Tables.t(spark, sf, "lineitem")
      .select("l_orderkey", "l_partkey").distinct().collect()
      .groupBy(_.getLong(0))
      .map { case (o, rs) => o -> rs.map(_.getLong(1)).toSet }

  private lazy val pairCounts: Map[(Long, Long), Int] =
    baskets.values.toSeq
      .flatMap(items => items.toSeq.sorted.combinations(2).map(p => (p(0), p(1))))
      .groupBy(identity).map { case (k, v) => k -> v.size }

  test("triples match a from-scratch recompute of counts and support") {
    val expected = baskets.values.toSeq
      .flatMap(items => items.toSeq.sorted.combinations(3).map(t => (t(0), t(1), t(2))))
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      .filter { case ((a, b, c), n) =>
        n >= 2 && pairCounts((a, b)) >= 2 && pairCounts((a, c)) >= 2 &&
          pairCounts((b, c)) >= 2 }
    val got = Analytics.qBasketTriples(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getLong(3)).toMap
    assert(got == expected && got.nonEmpty)
  }

  test("broadcastL2 guard: shuffled semi-join fallback is row-identical") {
    // the 100 TB low-minSupport path (broadcastL2 = false) must give
    // exactly the broadcast plan's answer — same rows, same support
    def rows(bcast: Boolean) =
      Analytics.qBasketTriples(spark, sf, broadcastL2 = bcast).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getDouble(4))).toSet
    val b = rows(bcast = true)
    assert(rows(bcast = false) == b && b.nonEmpty)
  }

  test("Apriori closure: every reported triple's sub-pairs are frequent") {
    Analytics.qBasketTriples(spark, sf).collect().foreach { r =>
      val (a, b, c) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(a < b && b < c)
      Seq((a, b), (a, c), (b, c)).foreach(p => assert(pairCounts(p) >= 2, p))
      val support = r.getDouble(4)
      assert(support > 0.0 && support < 1.0)
    }
  }
}
