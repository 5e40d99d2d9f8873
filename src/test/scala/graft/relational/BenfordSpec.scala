package graft.relational

import graft.clustering.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral specs for the Benford first-digit audit. */
class BenfordSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("digit census matches a driver recompute; shares and chi2 are consistent") {
    val prices = graft.Tables.t(spark, sf, "orders")
      .select("o_totalprice").collect().map(_.getDouble(0))
    val expected = prices
      .map(p => math.floor(p).toLong.toString.charAt(0).asDigit)
      .groupBy(identity).map { case (d, v) => d -> v.size.toLong }
    val n = prices.length.toLong
    val rows = Benford.qBenford(spark, sf).collect()
    assert(rows.map(_.getInt(0)).toSet == expected.keySet)
    rows.foreach { r =>
      val (d, cnt) = (r.getInt(0), r.getLong(1))
      assert(cnt == expected(d), s"digit $d")
      val exp = math.log10(1.0 + 1.0 / d)
      assert(math.abs(r.getDouble(2) - cnt.toDouble / n) < 5e-7)
      assert(math.abs(r.getDouble(3) - exp) < 5e-7)
      assert(math.abs(r.getDouble(4) - (cnt.toDouble / n - exp)) < 1e-6)
      assert(r.getDouble(5) >= 0.0)
    }
    assert(rows.map(_.getLong(1)).sum == n)
  }
}
