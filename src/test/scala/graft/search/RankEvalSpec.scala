package graft.search

import graft.clustering.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral specs for MAP@k and reciprocal-rank fusion. */
class RankEvalSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def ap(truth: Seq[(Long, Long)], ann: Seq[(Long, Long, Int)]) =
    RankEval.mapOf(truth.toDF("q_id", "vec_id"),
        ann.toDF("q_id", "vec_id", "rank"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap

  test("hand-computed AP: hits at ranks 1, 3, 5") {
    // precisions 1/1, 2/3, 3/5 -> AP = (60 + 2*20 + 3*12)/(60*5) = 0.453333
    val truth = (1L to 5L).map(v => (1L, v))
    val ann = Seq((1L, 1L, 1), (1L, 9L, 2), (1L, 2L, 3), (1L, 8L, 4), (1L, 3L, 5))
    assert(ap(truth, ann)(1L) == ((5L, 3L, 0.453333)))
  }

  test("perfect retrieval -> AP 1; total miss -> AP 0") {
    val truth = (1L to 5L).map(v => (1L, v)) ++ (1L to 5L).map(v => (2L, v))
    val ann = (1 to 5).map(r => (1L, r.toLong, r)) ++
      (1 to 5).map(r => (2L, 100L + r, r))
    val m = ap(truth, ann)
    assert(m(1L) == ((5L, 5L, 1.0)))
    assert(m(2L) == ((5L, 0L, 0.0)))
  }

  test("RRF fusion: a doc ranked by both systems beats single-system rank 1") {
    val full = Seq((1L, 10L, 1), (1L, 20L, 2)).toDF("q_id", "vec_id", "r_full")
    val prefix = Seq((1L, 20L, 1), (1L, 30L, 2)).toDF("q_id", "vec_id", "r_prefix")
    val rows = RankEval.fusionOf(full, prefix).collect()
      .map(r => r.getLong(2) -> ((r.getInt(1), r.getLong(3), r.getLong(4))))
      .toMap
    // doc 20: 1/62 + 1/61 > doc 10: 1/61 > doc 30: 1/62
    assert(rows(20L) == ((1, 2L, 1L)))
    assert(rows(10L) == ((2, 1L, 0L)))
    assert(rows(30L) == ((3, 0L, 2L)))
  }
}
