package graft.relational

import graft.clustering.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral specs for trailing-6h sliding distinct users. */
class SlidingUniquesSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def run(rows: Seq[(Long, String)]) =
    SlidingUniques.slidingUniquesOf(
        rows.toDF("user_id", "hs").selectExpr("user_id", "CAST(hs AS TIMESTAMP) AS hr"))
      .collect()
      .map(r => r.getTimestamp(0).toString -> ((r.getLong(1), r.getLong(2))))
      .toMap

  test("trailing window counts distinct users across 6 hours, then forgets") {
    val m = run(Seq(
      (1L, "2024-01-01 00:00:00"),
      (2L, "2024-01-01 00:00:00"),
      (2L, "2024-01-01 05:00:00"),
      (3L, "2024-01-01 06:00:00")))
    assert(m("2024-01-01 00:00:00.0") == ((2L, 2L)))
    // hour 5: users {1,2} from hour 0 still inside the 6-hour trail
    assert(m("2024-01-01 05:00:00.0") == ((1L, 2L)))
    // hour 6: hour 0 has fallen out; only hour 5 (user 2) + hour 6 (user 3)
    assert(m("2024-01-01 06:00:00.0") == ((1L, 2L)))
  }

  test("duplicate events in one hour count once") {
    val m = run(Seq(
      (1L, "2024-01-01 10:00:00"),
      (1L, "2024-01-01 10:00:00"),
      (1L, "2024-01-01 10:00:00")))
    assert(m("2024-01-01 10:00:00.0") == ((1L, 1L)))
  }
}
