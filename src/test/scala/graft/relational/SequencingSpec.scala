package graft.relational

import graft.clustering.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral specs for session paths and Markov next-event entropy. */
class SequencingSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def pathsOf(rows: Seq[(Long, String, Long, String)]) =
    Sequencing.topPathsOf(
        rows.toDF("user_id", "tss", "event_id", "event_type")
          .selectExpr("user_id", "CAST(tss AS TIMESTAMP) AS ts",
            "event_id", "event_type")
          .selectExpr("user_id", "CAST(ts AS DATE) AS day", "ts",
            "event_id", "event_type"))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap

  test("paths order by time then event id; same path aggregates") {
    val m = pathsOf(Seq(
      (1L, "2024-01-01 10:00:00", 1L, "view"),
      (1L, "2024-01-01 10:01:00", 2L, "cart"),
      (2L, "2024-01-01 09:00:00", 3L, "view"),
      (2L, "2024-01-01 09:05:00", 4L, "cart"),
      (3L, "2024-01-01 09:00:00", 6L, "buy"), // same ts: id 5 first
      (3L, "2024-01-01 09:00:00", 5L, "view")))
    assert(m("view>cart") == ((2L, 2L)))
    assert(m("view>buy") == ((1L, 2L)))
  }

  test("sessions truncate at 8 hops and split on calendar day") {
    val day1 = (1 to 12).map(i =>
      (1L, f"2024-01-01 10:${i}%02d:00", i.toLong, "e"))
    val day2 = Seq((1L, "2024-01-02 10:00:00", 99L, "z"))
    val m = pathsOf(day1 ++ day2)
    assert(m(Seq.fill(8)("e").mkString(">")) == ((1L, 8L)))
    assert(m("z") == ((1L, 1L)))
  }

  private def entropyOf(rows: Seq[(Long, String, Long, String)]) =
    Sequencing.markovEntropyOf(
        rows.toDF("user_id", "tss", "event_id", "event_type")
          .selectExpr("user_id", "CAST(tss AS TIMESTAMP) AS ts",
            "event_id", "event_type"))
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))))
      .toMap

  test("deterministic chain has zero entropy; a fair branch has ln 2") {
    // one user: A B A C A B A C -> from A: B,C,B,C (H = ln 2);
    // from B: A,A (H = 0); from C: A,A -> but last C ends the stream
    val ts = (1 to 8).map(i => f"2024-01-01 10:0$i:00")
    val types = Seq("A", "B", "A", "C", "A", "B", "A", "C")
    val m = entropyOf(types.zipWithIndex.map { case (t, i) =>
      (1L, ts(i), i.toLong, t)
    })
    assert(m("A")._1 == 4L && m("A")._3 == 0.693147) // ln 2
    assert(m("B")._3 == 0.0)
    assert(m("C")._3 == 0.0)
    // entropy rate = share(A) * ln2 = (4/7) * 0.6931...
    assert(math.abs(m("A")._4 - 4.0 / 7.0 * math.log(2.0)) < 1e-5)
  }
}
