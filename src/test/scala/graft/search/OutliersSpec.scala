package graft.search

import graft.clustering.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral specs for k-NN-distance outlier scoring. */
class OutliersSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("a straggler far from the pack tops the ranking") {
    // eval ids are multiples of 10; vec 40 sits far away
    val pack = (0 to 3).map(i => (i * 10L, Array(0.0f, i * 0.001f), 1)) ++
      (1L to 9L).map(i => (i, Array(0.0f, i.toFloat * 0.0001f), 1))
    val far = Seq((40L, Array(100.0f, 0.0f), 2))
    val rows = Outliers.knnOutliersOf(
        (pack ++ far).toDF("vec_id", "embedding", "label"))
      .collect()
    assert(rows.head.getLong(0) == 40L) // ordered by mean_d2 desc
    assert(rows.head.getInt(1) == 2)
    val scores = rows.map(_.getDouble(4))
    assert(scores.head > 1.0) // far point above the eval mean
    assert(rows.map(_.getLong(2)).toSeq == rows.map(_.getLong(2)).sortBy(-_).toSeq)
  }

  test("identical vectors all score zero distance") {
    val rows = Outliers.knnOutliersOf(
        (0 to 60).map(i => (i.toLong, Array(1.0f, 2.0f), 1))
          .toDF("vec_id", "embedding", "label"))
      .collect()
    assert(rows.forall(_.getLong(2) == 0L)) // mean_d2
  }
}
