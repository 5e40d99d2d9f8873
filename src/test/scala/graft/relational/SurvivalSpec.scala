package graft.relational

import graft.clustering.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral specs for the Kaplan-Meier churn survival report. */
class SurvivalSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def km(orders: Seq[(Long, String, Long)]) =
    Survival.churnKmOf(spark,
        orders.toDF("o_custkey", "d", "o_orderkey")
          .selectExpr("o_custkey", "CAST(d AS TIMESTAMP) AS o_orderdate",
            "o_orderkey"))
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))))
      .toMap

  test("hand-computed two-customer study: one event week 1, one censored week 2") {
    val m = km(Seq(
      (1L, "2001-06-01 00:00:00", 10L), // A first
      (1L, "2001-06-04 00:00:00", 11L), // A second -> event week 1
      (2L, "2001-07-25 00:00:00", 20L))) // B censored at week 2
    assert(m(1L) == ((2L, 1L, 0.5, 0.5))) // at_risk 2, 1 event, S=0.5
    assert(m(2L) == ((1L, 0L, 0.0, 0.5))) // B alone, no event, S stays
    assert(m.size == 2) // weeks past every obs window are dropped
  }

  test("same-day repurchase lands in week 1; ties break on order key") {
    val m = km(Seq(
      (1L, "2001-05-01 00:00:00", 2L),
      (1L, "2001-05-01 00:00:00", 1L))) // key 1 is first, key 2 second
    assert(m(1L)._2 == 1L && m(1L)._4 == 0.0) // event week 1, S -> 0
  }

  test("no second order anywhere -> zero events, survival stays 1") {
    val m = km(Seq(
      (1L, "2001-06-01 00:00:00", 1L),
      (2L, "2001-06-08 00:00:00", 2L)))
    assert(m.values.forall(v => v._2 == 0L && v._4 == 1.0))
  }

  test("cohort repeat rate: inside vs outside the 90-day window") {
    val rows = Survival.repeatRateOf(spark.createDataFrame(Seq(
        (1L, java.sql.Timestamp.valueOf("2000-01-05 00:00:00"), 1L),
        (1L, java.sql.Timestamp.valueOf("2000-02-01 00:00:00"), 2L), // +27d: repeat
        (2L, java.sql.Timestamp.valueOf("2000-01-20 00:00:00"), 3L),
        (2L, java.sql.Timestamp.valueOf("2000-09-01 00:00:00"), 4L), // +225d: no
        (3L, java.sql.Timestamp.valueOf("2000-03-10 00:00:00"), 5L)))
        .toDF("o_custkey", "o_orderdate", "o_orderkey"))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(rows("2000-01") == ((2L, 1L, 0.5)))
    assert(rows("2000-03") == ((1L, 0L, 0.0)))
  }
}
