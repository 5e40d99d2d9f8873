package graft.relational

import graft.clustering.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral specs for the Chapman-Kolmogorov order-1 diagnostic. */
class ChapmanKolmogorovSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def run(rows: Seq[(Long, String, Long, String)]) =
    ChapmanKolmogorov.ckOf(
      rows.toDF("user_id", "tss", "event_id", "event_type")
        .withColumn("ts",
          org.apache.spark.sql.functions.col("tss").cast("timestamp"))
        .drop("tss"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getDouble(2), r.getDouble(3), r.getDouble(4))))
      .toMap

  test("deterministic cycle is exactly Markov: P^2 matches, gaps 0") {
    // a,b,a,b,a: P(a->b)=P(b->a)=1, so P^2 = I; two-step observations
    // are (a,a),(a,a),(b,b) — model and empirical agree exactly
    val m = run(Seq(
      (1L, "2024-01-01 00:00:00", 1L, "a"),
      (1L, "2024-01-01 01:00:00", 2L, "b"),
      (1L, "2024-01-01 02:00:00", 3L, "a"),
      (1L, "2024-01-01 03:00:00", 4L, "b"),
      (1L, "2024-01-01 04:00:00", 5L, "a")))
    assert(m(("a", "a")) == ((1.0, 1.0, 0.0)))
    assert(m(("b", "b")) == ((1.0, 1.0, 0.0)))
    assert(m.size == 2) // no cross terms in a deterministic cycle
  }

  test("history-dependent stream shows a nonzero gap") {
    // two users: 'a b x' and 'c b y' — from b the next step depends on
    // what PRECEDED b, which a first-order chain cannot encode:
    // model p2(a->x) = p(a->b) p(b->x) = 1 * 0.5, but empirically
    // a is ALWAYS followed two steps later by x (p = 1.0)
    val m = run(Seq(
      (1L, "2024-01-01 00:00:00", 1L, "a"),
      (1L, "2024-01-01 01:00:00", 2L, "b"),
      (1L, "2024-01-01 02:00:00", 3L, "x"),
      (2L, "2024-01-01 00:00:00", 4L, "c"),
      (2L, "2024-01-01 01:00:00", 5L, "b"),
      (2L, "2024-01-01 02:00:00", 6L, "y")))
    assert(m(("a", "x")) == ((0.5, 1.0, 0.5)))
    assert(m(("a", "y")) == ((0.5, 0.0, -0.5)))
  }

  test("sf events: model rows sum to ~1 per from-state, gaps bounded") {
    val rows = ChapmanKolmogorov.qCkTest(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      val s = rs.map(_.getDouble(2)).sum
      assert(math.abs(s - 1.0) < 1e-4, s)
    }
    rows.foreach { r =>
      assert(math.abs(r.getDouble(4)) <= 1.0)
      assert(math.abs(r.getDouble(3) - r.getDouble(2) - r.getDouble(4)) < 1e-9)
    }
  }
}
