package graft.relational

import graft.clustering.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral specs for step-level funnel A/B significance. */
class FunnelAbSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("hand-built funnel: per-step denominators and the pooled z") {
    def e(u: Long, t: String, ty: String, id: Long) = (u, t, ty, id)
    val rows = Seq(
      // ctrl (even): user 2 completes all three, user 4 views only
      e(2L, "2024-01-01 10:00:00", "view", 1),
      e(2L, "2024-01-01 10:01:00", "click", 2),
      e(2L, "2024-01-01 10:02:00", "purchase", 3),
      e(4L, "2024-01-01 11:00:00", "view", 4),
      // treat (odd): user 1 reaches click, user 3 views only
      e(1L, "2024-01-01 10:00:00", "view", 5),
      e(1L, "2024-01-01 10:05:00", "click", 6),
      e(3L, "2024-01-01 12:00:00", "view", 7))
      .toDF("user_id", "tss", "event_type", "event_id")
      .selectExpr("user_id", "CAST(tss AS TIMESTAMP) AS ts",
        "event_type", "event_id")
    val m = FunnelAb.funnelAbOf(rows).collect()
      .map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5), r.getDouble(6), r.getDouble(7))))
      .toMap
    // step 2: both arms 1 of 2 -> z = 0
    assert(m(2) == ((2L, 1L, 2L, 1L, 0.5, 0.5, 0.0)))
    // step 3: ctrl 1/1, treat 0/1 -> z = -1/sqrt(0.5) = -1.414214
    val s3 = m(3)
    assert((s3._1, s3._2, s3._3, s3._4) == ((1L, 1L, 1L, 0L)))
    assert(s3._5 == 1.0 && s3._6 == 0.0)
    assert(s3._7 == -1.414214)
  }

  test("click before the first view does not count as a transition") {
    val rows = Seq(
      (2L, "2024-01-01 09:00:00", "click", 1L), // pre-view click
      (2L, "2024-01-01 10:00:00", "view", 2L),
      (1L, "2024-01-01 10:00:00", "view", 3L))
      .toDF("user_id", "tss", "event_type", "event_id")
      .selectExpr("user_id", "CAST(tss AS TIMESTAMP) AS ts",
        "event_type", "event_id")
    val m = FunnelAb.funnelAbOf(rows).collect()
      .map(r => r.getInt(0) -> r.getLong(2)).toMap // step -> k_a (ctrl)
    assert(m(2) == 0L)
  }
}
