package graft.relational

import graft.clustering.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral specs for the six derived-column TPC-H queries
  * (Q2/Q9/Q11/Q16/Q20/Q21): each is recomputed in plain Scala from the
  * collected sf0.001 base tables (small enough to hold) and compared
  * to the operator output — an oracle-independent second witness. */
class TpchClosureSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  // -- driver-side mirrors of the derivations --------------------------
  private lazy val lineitem = graft.Tables.t(spark, sf, "lineitem")
    .select("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
      "l_quantity", "l_extendedprice", "l_discount", "l_shipdate")
    .collect()
  private lazy val partsuppPairs: Seq[(Long, Long)] =
    lineitem.map(r => (r.getLong(1), r.getLong(2))).distinct.toSeq
  private def availQty(pk: Long, sk: Long): Long = 1 + (pk * 13 + sk * 29) % 49
  private def costCents(pk: Long, sk: Long): Long = (pk * 7919 + sk * 104729) % 99001 + 1000
  private lazy val suppNation: Map[Long, Int] =
    graft.Tables.t(spark, sf, "supplier").collect()
      .map(r => r.getLong(0) -> r.getInt(2)).toMap
  private lazy val nationRegion: Map[Int, Int] =
    graft.Tables.t(spark, sf, "nation").collect()
      .map(r => r.getInt(0) -> r.getInt(2)).toMap
  private def suppInRegion(regionKey: Int): Set[Long] =
    suppNation.collect { case (s, n) if nationRegion(n) == regionKey => s }.toSet

  test("q2: every returned cost is THE minimum among the part's EUROPE suppliers") {
    val partsLarge = graft.Tables.t(spark, sf, "part")
      .filter(col("p_type") === "LARGE" && col("p_size").between(10, 20))
      .collect().map(_.getLong(0)).toSet
    val europe = suppInRegion(3)
    val minCost = partsuppPairs
      .filter { case (pk, sk) => partsLarge(pk) && europe(sk) }
      .groupBy(_._1)
      .map { case (pk, ps) => pk -> ps.map { case (p, s) => costCents(p, s) }.min }
    val rows = TpchClosure.q2MinCostSupplier(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val pk = r.getLong(3)
      val cents = math.round(r.getDouble(5) * 100)
      assert(cents == minCost(pk), s"part $pk: $cents vs ${minCost(pk)}")
    }
  }

  test("q9: one (nation, year) group's profit matches a from-scratch integer recompute") {
    val widgetParts = graft.Tables.t(spark, sf, "part")
      .filter(col("p_name").like("%widget")).collect().map(_.getLong(0)).toSet
    val orderYear = graft.Tables.t(spark, sf, "orders").collect()
      .map(r => r.getLong(0) ->
        r.getAs[java.time.LocalDateTime]("o_orderdate").getYear).toMap
    val profit4dp = scala.collection.mutable.Map.empty[(Int, Int), Long]
    lineitem.foreach { r =>
      val pk = r.getAs[Long]("l_partkey"); val sk = r.getAs[Long]("l_suppkey")
      if (widgetParts(pk)) {
        val qty = r.getAs[Double]("l_quantity").toLong
        val rev = math.round(r.getAs[Double]("l_extendedprice") * 100) *
          (100 - math.round(r.getAs[Double]("l_discount") * 100))
        val amt = rev - costCents(pk, sk) * qty * 100
        val key = (suppNation(sk), orderYear(r.getAs[Long]("l_orderkey")))
        profit4dp(key) = profit4dp.getOrElse(key, 0L) + amt
      }
    }
    val rows = TpchClosure.q9Profit(spark, sf).collect()
    assert(rows.nonEmpty && rows.length == profit4dp.size)
    rows.foreach { r =>
      val nation = r.getString(0).stripPrefix("NATION_").toInt
      val got = math.round(r.getDouble(2) * 10000)
      assert(got == profit4dp((nation, r.getInt(1))), r.toString)
    }
  }

  test("q11: the returned parts are EXACTLY those above twice the mean share") {
    val asia = suppInRegion(2)
    val value = partsuppPairs.filter { case (_, sk) => asia(sk) }
      .groupBy(_._1)
      .map { case (pk, ps) =>
        pk -> ps.map { case (p, s) => costCents(p, s) * availQty(p, s) }.sum }
    val total = value.values.sum
    val n = value.size.toLong
    val expected = value.filter { case (_, v) => v * n > 2 * total }
    val rows = TpchClosure.q11ImportantStock(spark, sf).collect()
      .map(r => r.getLong(0) -> math.round(r.getDouble(1) * 100)).toMap
    assert(rows == expected && rows.nonEmpty)
  }

  test("q16: counts exclude negative-balance suppliers exactly") {
    val bad = graft.Tables.t(spark, sf, "supplier")
      .filter(col("s_acctbal") < 0).collect().map(_.getLong(0)).toSet
    val partMeta = graft.Tables.t(spark, sf, "part").collect()
      .map(r => r.getLong(0) -> ((r.getAs[String]("p_brand"),
        r.getAs[String]("p_type"), r.getAs[Int]("p_size")))).toMap
    val sizes = Set(1, 3, 9, 14, 19, 23, 36, 45)
    val expected = partsuppPairs
      .filter { case (pk, sk) =>
        val (b, t, s) = partMeta(pk)
        !bad(sk) && b != "Brand#45" && t != "MEDIUM" && sizes(s) }
      .groupBy { case (pk, _) => partMeta(pk) }
      .map { case (k, ps) => k -> ps.map(_._2).distinct.size.toLong }
    val rows = TpchClosure.q16SupplierCnt(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2)) -> r.getLong(3)).toMap
    assert(rows == expected && rows.nonEmpty)
  }

  test("q20: every returned supplier has an excess-stock witness") {
    val red = graft.Tables.t(spark, sf, "part")
      .filter(col("p_name").like("red%")).collect().map(_.getLong(0)).toSet
    val shipped = scala.collection.mutable.Map.empty[(Long, Long), Long]
    lineitem.foreach { r =>
      val y = r.getAs[java.time.LocalDateTime]("l_shipdate").getYear
      val pk = r.getAs[Long]("l_partkey")
      if (y == 1997 && red(pk)) {
        val key = (pk, r.getAs[Long]("l_suppkey"))
        shipped(key) = shipped.getOrElse(key, 0L) + r.getAs[Double]("l_quantity").toLong
      }
    }
    val expected = shipped.collect {
      case ((pk, sk), q) if 2 * availQty(pk, sk) > q => sk
    }.toSet intersect suppInRegion(3)
    val suppName = graft.Tables.t(spark, sf, "supplier").collect()
      .map(r => r.getString(1) -> r.getLong(0)).toMap
    val got = TpchClosure.q20ExcessStock(spark, sf).collect()
      .map(r => suppName(r.getString(0))).toSet
    assert(got == expected && got.nonEmpty)
  }

  test("q21: waits are late lines of multi-supplier F orders with exactly one late supplier") {
    def commitOff(ok: Long, ln: Int): Long = (ok * 3 + ln * 7) % 61 - 30
    def receiptOff(ok: Long, ln: Int): Long = 1 + (ok * 5 + ln * 11) % 30
    val fOrders = graft.Tables.t(spark, sf, "orders")
      .filter(col("o_orderstatus") === "F").collect().map(_.getLong(0)).toSet
    case class L(ok: Long, sk: Long, late: Boolean)
    val ls = lineitem.map { r =>
      val ok = r.getAs[Long]("l_orderkey"); val ln = r.getAs[Int]("l_linenumber")
      L(ok, r.getAs[Long]("l_suppkey"), receiptOff(ok, ln) > commitOff(ok, ln))
    }
    val byOrder = ls.groupBy(_.ok)
    val america = suppInRegion(1)
    val expected = scala.collection.mutable.Map.empty[Long, Long]
    byOrder.foreach { case (ok, lines) =>
      val nSupp = lines.map(_.sk).distinct.size
      val lateSupp = lines.filter(_.late).map(_.sk).distinct
      if (fOrders(ok) && nSupp >= 2 && lateSupp.size == 1) {
        val waits = lines.count(l => l.late)
        val sk = lateSupp.head
        if (america(sk)) expected(sk) = expected.getOrElse(sk, 0L) + waits
      }
    }
    val suppName = graft.Tables.t(spark, sf, "supplier").collect()
      .map(r => r.getString(1) -> r.getLong(0)).toMap
    val got = TpchClosure.q21WaitingSuppliers(spark, sf).collect()
      .map(r => suppName(r.getString(0)) -> r.getLong(1)).toMap
    assert(got == expected.toMap && got.nonEmpty)
  }
}
