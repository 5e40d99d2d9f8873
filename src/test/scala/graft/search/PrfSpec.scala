package graft.search

import graft.clustering.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral specs for Rocchio pseudo-relevance feedback. */
class PrfSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def run(vecs: Seq[(Long, Array[Float])]) =
    Prf.prfOf(vecs.toDF("vec_id", "embedding")).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap

  test("a uniform cluster is PRF-stable: full overlap, top-1 unchanged") {
    val vecs = (0L to 20L).map(i => (i, Array(1.0f, 0.0f)))
    val m = run(vecs)
    // 20 candidates per query, report depth 10 -> full overlap
    assert(m.values.forall { case (ov, nw, t1) => ov == 10L && nw == 0L && t1 == 0L })
  }

  test("feedback pulls the query toward the neighbor centroid and flips top-1") {
    // q=(1,0); top-3 {A,B,C} carry a strong second dimension, so the
    // blended query scores B above the original top-1 A
    val m = run(Seq(
      (0L, Array(1.0f, 0.0f)),
      (10L, Array(0.9f, 0.2f)),  // original top-1
      (11L, Array(0.85f, 1.0f)), // new top-1 after expansion
      (12L, Array(0.84f, 1.0f)),
      (13L, Array(0.83f, 1.0f))))
    val (ov, nw, t1) = m(0L)
    assert(t1 == 1L)
    assert(ov == 4L && nw == 6L) // all 4 candidates overlap; depth is 10
  }
}
