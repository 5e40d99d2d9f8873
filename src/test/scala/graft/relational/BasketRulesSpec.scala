package graft.relational

import graft.clustering.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral specs for the directed association rules. */
class BasketRulesSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private lazy val rows = BasketRules.qBasketRules(spark, sf).collect()

  test("rules are consistent with a driver recompute of their counts") {
    val li = graft.Tables.t(spark, sf, "lineitem")
      .select("l_orderkey", "l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val perPart = li.groupBy(_._2).map { case (p, xs) => p -> xs.length.toLong }
    val pairCount = li.groupBy(_._1).values
      .flatMap(o => o.map(_._2).sorted.combinations(2).map(p => (p(0), p(1))))
      .toSeq.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    rows.foreach { r =>
      val (a, b, nab, na) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      val key = if (a < b) (a, b) else (b, a)
      assert(pairCount(key) == nab && perPart(a) == na)
      val conf = r.getDouble(4)
      assert(math.abs(conf - nab.toDouble / na) < 1e-6)
      assert(conf > 0.0 && conf <= 1.0)
    }
  }

  test("top-50 is the confidence head under the total order") {
    assert(rows.length == 50)
    val keys = rows.map(r =>
      (-math.round(r.getDouble(4) * 1e6), r.getLong(0), r.getLong(1)))
    assert(keys.sameElements(keys.sorted))
  }

  test("leverage sign matches dependence direction") {
    rows.foreach { r =>
      val lev = r.getDouble(6)
      assert(lev >= -1.0 && lev <= 1.0)
      // high-confidence rules over these small baskets co-occur more
      // than independence predicts
      if (r.getDouble(4) >= 0.5) assert(lev > 0.0)
    }
  }
}
