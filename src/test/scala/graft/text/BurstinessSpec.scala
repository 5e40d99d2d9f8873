package graft.text

import graft.clustering.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral specs for the word-burstiness (VMR) report. */
class BurstinessSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def rows(texts: String*) =
    Burstiness.burstinessOf(
        texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("doc_id", "text"))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap

  test("hand-computed VMR: bursty vs evenly-spread words") {
    // x: all 4 occurrences in one of 3 docs -> vmr (3*16-16)/(3*4) = 8/3
    // y: 1 occurrence in each of 2 docs    -> vmr (3*2-4)/(3*2) = 1/3
    val m = rows("x x x x", "y", "y")
    assert(m("x") == ((1L, 4L, 2.666667)))
    assert(m("y") == ((2L, 2L, 0.333333)))
    assert(m("x")._3 > m("y")._3)
  }

  test("a word occurring once per document has VMR (N-1)/N (near-Poisson floor)") {
    // z once in each of 4 docs: s=4, ss=4 -> (4*4-16)/(4*4) = 0
    val m = rows("z", "z", "z", "z")
    assert(m("z") == ((4L, 4L, 0.0)))
  }
}
