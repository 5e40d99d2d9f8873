package graft.relational

import graft.clustering.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral specs for the per-user HHI concentration index. */
class UserHhiSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def hhi(rows: Seq[(Long, String)]) =
    UserHhi.hhiOf(rows.toDF("user_id", "event_type"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap

  test("hand-computed: single-action user is 1, uniform over k is 1/k") {
    val m = hhi(Seq(
      (1L, "view"), (1L, "view"), (1L, "view"),
      (2L, "view"), (2L, "click"), (2L, "purchase"), (2L, "search")))
    assert(m(1L) == ((3L, 1L, 1.0)))
    assert(m(2L) == ((4L, 4L, 0.25)))
  }

  test("skewed distribution: 3-1 split over two types is (9+1)/16") {
    val m = hhi(Seq((7L, "a"), (7L, "a"), (7L, "a"), (7L, "b")))
    assert(m(7L) == ((4L, 2L, 0.625)))
  }

  test("sf events: hhi bounded by [1/n_types, 1]") {
    UserHhi.qUserHhi(spark, "/root/testdata/sf0.001").collect().foreach { r =>
      val (types, h) = (r.getLong(2), r.getDouble(3))
      assert(h <= 1.0 + 1e-9)
      assert(h >= 1.0 / types - 1e-6)
    }
  }
}
