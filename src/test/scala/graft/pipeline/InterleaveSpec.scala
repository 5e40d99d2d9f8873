package graft.pipeline

import graft.clustering.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral specs for the round-robin interleave audit. */
class InterleaveSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("two equal sources: hand-computed decile census and prefix shares") {
    // a docs at positions 1,3,5,7; b at 2,4,6,8 (nsrc=2, n=8, pos grid 16)
    val docs = (1L to 4L).map(i => (i, "a")) ++ (11L to 14L).map(i => (i, "b"))
    val rows = Interleave.interleaveOf(docs.toDF("doc_id", "source")).collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    assert(rows((1L, "a")) == ((1L, 0.5, 0.5)))
    assert(rows((1L, "b")) == ((1L, 0.5, 0.5)))
    assert(rows((3L, "a")) == ((1L, 0.6, 0.5))) // a pulls ahead mid-stream
    assert(rows((4L, "b")) == ((1L, 0.428571, 0.5)))
    assert(rows((5L, "b")) == ((1L, 0.5, 0.5))) // converges by the end
    assert(rows.values.map(_._1).sum == 8L)
  }

  test("unequal sources keep their corpus share as the target") {
    val docs = (1L to 30L).map(i => (i, "big")) ++ (101L to 110L).map(i => (i, "small"))
    val rows = Interleave.interleaveOf(docs.toDF("doc_id", "source")).collect()
    val big = rows.filter(_.getString(1) == "big")
    assert(big.forall(_.getDouble(4) == 0.75))
    assert(rows.map(_.getLong(2)).sum == 40L)
  }
}
