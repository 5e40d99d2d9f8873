package graft.relational

import graft.clustering.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral specs for the deterministic HyperLogLog sketch. */
class HllSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def run(keys: Seq[(String, Long)]) =
    Hll.hllOf(keys.toDF("event_type", "k")).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap

  test("estimate tracks the exact distinct count within HLL error") {
    // m=256 -> relative sigma ~ 1.04/16 = 6.5%; allow 4 sigma
    val m = run((1L to 5000L).map(k => ("a", k)))
    val (exact, _, _, est) = m("a")
    assert(exact == 5000L)
    assert(math.abs(est - 5000.0) / 5000.0 < 0.26)
  }

  test("duplicate items do not move the sketch (set semantics)") {
    val once = run((1L to 800L).map(k => ("a", k)))
    val twice = run((1L to 800L).flatMap(k => Seq(("a", k), ("a", k))))
    assert(once("a") == twice("a"))
  }

  test("small-range correction engages: few distinct, most buckets zero") {
    val m = run((1L to 20L).map(k => ("s", k)))
    val (exact, zeros, _, est) = m("s")
    assert(exact == 20L)
    assert(zeros >= 236L) // at most 20 of 256 buckets touched
    // linear counting is tight at this occupancy
    assert(math.abs(est - 20.0) < 3.0)
  }

  test("groups sketch independently") {
    val m = run((1L to 300L).map(k => ("a", k)) ++ (1L to 300L).map(k => ("b", k)))
    assert(m("a") == m("b")) // identical key sets -> identical registers
  }

  test("half-sketch merge reproduces the whole-corpus registers exactly") {
    val rows = Hll.hllMergeOf(
        (1L to 2000L).map(k => ("a", k % 7, k)) // users 0..6 across halves
          .toDF("event_type", "user_id", "k"))
      .collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getLong(1) == r.getLong(2)) // ss_merged == ss_whole
    assert(r.getDouble(3) == r.getDouble(4)) // identical estimates
    assert(r.getLong(5) == 1L) // merge_identity
  }

  private def kmv(keys: Seq[(String, Long)]) =
    Hll.kmvOf(keys.toDF("event_type", "k")).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(4), r.getDouble(5))))
      .toMap

  test("KMV exact fallback below k: estimate equals the kept count") {
    val m = kmv((1L to 40L).map(k => ("s", k)))
    val (exact, kept, est, err) = m("s")
    assert(exact == 40L && kept == 40L && est == 40.0 && err == 0.0)
  }

  test("KMV estimate tracks the exact count within sketch error") {
    // sigma ~ 1/sqrt(k-1) = 12.6%; allow 4 sigma
    val m = kmv((1L to 5000L).map(k => ("a", k)))
    val (exact, kept, est, _) = m("a")
    assert(exact == 5000L && kept == 64L)
    assert(math.abs(est - 5000.0) / 5000.0 < 0.51)
  }

  test("KMV duplicates do not move the sketch") {
    val once = kmv((1L to 900L).map(k => ("a", k)))
    val twice = kmv((1L to 900L).flatMap(k => Seq(("a", k), ("a", k))))
    assert(once("a") == twice("a"))
  }
}
