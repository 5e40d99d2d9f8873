package graft.relational

import graft.clustering.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral specs for the DAU/WAU stickiness report. */
class StickinessSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def run(rows: Seq[(Long, String)]) =
    Stickiness.stickinessOf(
      rows.toDF("user_id", "ds")
        .withColumn("day", org.apache.spark.sql.functions.col("ds").cast("date"))
        .drop("ds"))
      .collect()
      .map(r => r.getDate(0).toString -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap

  test("hand case: daily user vs one-day visitor") {
    // u1 active all 3 days; u2 only on day 2
    val m = run(Seq(
      (1L, "2024-01-01"), (1L, "2024-01-02"), (1L, "2024-01-03"),
      (2L, "2024-01-02")))
    assert(m("2024-01-01") == ((1L, 1L, 1.0)))
    assert(m("2024-01-02") == ((2L, 2L, 1.0))) // trailing window, both new
    assert(m("2024-01-03") == ((1L, 2L, 0.5))) // u2 still in the 7-day window
  }

  test("duplicate same-day events collapse before counting") {
    val m = run(Seq((7L, "2024-01-05"), (7L, "2024-01-05")))
    assert(m("2024-01-05") == ((1L, 1L, 1.0)))
  }

  test("sf events: dau <= wau, stickiness in [1/7, 1] after warmup") {
    val rows = Stickiness.qStickiness(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) <= r.getLong(2))
      val s = r.getDouble(3)
      assert(s > 0.0 && s <= 1.0)
    }
  }
}
