package graft.relational

import graft.clustering.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral specs for the temporal Markov next-event backtest. */
class MarkovBacktestSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def run(rows: Seq[(Long, String, Long, String)]) =
    MarkovBacktest.backtestOf(
      rows.toDF("user_id", "tss", "event_id", "event_type")
        .withColumn("ts",
          org.apache.spark.sql.functions.col("tss").cast("timestamp"))
        .drop("tss"))
      .collect()
      .map(r => r.getString(0) ->
        ((Option(r.getString(1)), r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap

  test("hand case: majority transition wins training, scored on the tail") {
    // train (before 2024-01-21): a->b x2, a->c x1, b->a x2
    //   => predict a -> b, b -> a
    // test (after): a->b (hit), b->a (hit), a->c (miss)
    val m = run(Seq(
      (1L, "2024-01-10 00:00:00", 1L, "a"),
      (1L, "2024-01-10 01:00:00", 2L, "b"),
      (1L, "2024-01-10 02:00:00", 3L, "a"),
      (1L, "2024-01-10 03:00:00", 4L, "b"),
      (1L, "2024-01-10 04:00:00", 5L, "a"),
      (1L, "2024-01-10 05:00:00", 6L, "c"),
      (2L, "2024-01-22 00:00:00", 7L, "a"),
      (2L, "2024-01-22 01:00:00", 8L, "b"),
      (2L, "2024-01-22 02:00:00", 9L, "a"),
      (2L, "2024-01-22 03:00:00", 10L, "c")))
    assert(m("a") == ((Some("b"), 2L, 1L, 0.5)))
    assert(m("b") == ((Some("a"), 1L, 1L, 1.0)))
    assert(m("__ALL__") == ((None, 3L, 2L, 0.666667)))
    // c never has an outgoing TEST transition (it ends user 2's stream)
    assert(!m.contains("c"))
  }

  test("tie in training counts resolves to the lexicographically first state") {
    // a->b and a->c once each in train; prediction must be b
    val m = run(Seq(
      (1L, "2024-01-10 00:00:00", 1L, "a"),
      (1L, "2024-01-10 01:00:00", 2L, "c"),
      (2L, "2024-01-10 00:00:00", 3L, "a"),
      (2L, "2024-01-10 01:00:00", 4L, "b"),
      (3L, "2024-01-25 00:00:00", 5L, "a"),
      (3L, "2024-01-25 01:00:00", 6L, "b")))
    assert(m("a") == ((Some("b"), 1L, 1L, 1.0)))
  }

  test("sf events: ALL row aggregates the per-state rows exactly") {
    val rows = MarkovBacktest.qMarkovBacktest(spark, "/root/testdata/sf0.001")
      .collect()
    val (all, per) = rows.partition(_.getString(0) == "__ALL__")
    assert(all.length == 1 && per.nonEmpty)
    assert(all(0).getLong(2) == per.map(_.getLong(2)).sum)
    assert(all(0).getLong(3) == per.map(_.getLong(3)).sum)
    per.foreach { r =>
      assert(r.getLong(3) <= r.getLong(2))
      assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0)
    }
  }
}
