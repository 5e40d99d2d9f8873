package graft.relational

import graft.clustering.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral specs for the MDE power / sample-size planner. */
class PowerSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private val zc = {
    val za = 1.9599639845400545; val zb = 0.8416212335729143
    2.0 * (za + zb) * (za + zb)
  }

  private def run(rows: Seq[(String, Long, Long)]) =
    Power.mdePowerOf(rows.toDF("event_type", "user_id", "v")).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(5))))
      .toMap

  test("zero variance needs zero samples; known variance matches the formula") {
    val m = run(Seq(
      ("a", 1L, 3000000L), ("a", 2L, 3000000L), // constant metric
      ("b", 1L, 0L), ("b", 2L, 2000000L)))      // mean 1, pop var 1
    assert(m("a") == ((2L, 3.0, 0.0, 0L)))
    val (n, mean, variance, req) = m("b")
    assert(n == 2L && mean == 1.0 && variance == 1.0)
    assert(req == math.ceil(zc * 1.0 / (0.05 * 0.05)).toLong)
  }

  test("per-user aggregation happens before the moments") {
    // one user with two events of 1 unit each = one metric of 2
    val m = run(Seq(("a", 1L, 1000000L), ("a", 1L, 1000000L)))
    assert(m("a")._1 == 1L && m("a")._2 == 2.0)
  }

  private def srm(users: Seq[Long]) = {
    val r = Power.srmCheckOf(users.toDF("user_id")).collect().head
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4))
  }

  test("SRM: a fair split passes, a broken split alarms") {
    val fair = srm((1L to 1000L))
    assert(fair == ((1000L, 500L, 500L, 0.0, 0L)))
    // 990 odd vs 10 even users: chi2 = 980^2/1000 = 960.4
    val broken = srm((1L to 1980L by 2) ++ (2L to 20L by 2))
    assert(broken._4 == 960.4 && broken._5 == 1L)
  }

  test("SRM flag boundary is decided in integer form") {
    // chi2 just below 10.828 must NOT flag: d=104, n=1000 -> 10.816
    val below = srm((1L to 1104L by 2) ++ (2L to 896L by 2))
    assert(below._4 == 10.816 && below._5 == 0L)
  }
}
