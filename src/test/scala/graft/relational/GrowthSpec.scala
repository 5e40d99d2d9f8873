package graft.relational

import graft.clustering.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral specs for the month-over-month growth report. */
class GrowthSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def rows(data: Seq[(String, Long)]) =
    Growth.momGrowthOf(data.toDF("month", "cents"))
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Long]),
          Option(r.get(3)).map(_.asInstanceOf[Double]), r.getLong(4))))
      .toMap

  test("hand-computed growth: doubling month is +100%, halving is -50%") {
    val m = rows(Seq(("2020-01", 100L), ("2020-01", 0L),
      ("2020-02", 200L), ("2020-03", 100L)))
    assert(m("2020-01") == ((100L, None, None, 100L)))
    assert(m("2020-02") == ((200L, Some(100L), Some(100.0), 300L)))
    assert(m("2020-03") == ((100L, Some(200L), Some(-50.0), 400L)))
  }

  test("trailing 3-month total uses at most three months") {
    val m = rows(Seq(("2020-01", 10L), ("2020-02", 20L),
      ("2020-03", 30L), ("2020-04", 40L)))
    assert(m("2020-04")._4 == 90L) // 20+30+40, January dropped
  }
}
