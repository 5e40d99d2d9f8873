package graft.text

import graft.clustering.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral specs for the cross-source vocabulary-overlap matrix. */
class SourceOverlapSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def overlap(rows: Seq[(String, String)]) =
    SourceOverlap.overlapOf(rows.toDF("source", "text"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))))
      .toMap

  test("hand-computed Jaccard on crafted vocabularies") {
    // a: {x,y,z}; b: {y,z,w}; c: {q}
    val m = overlap(Seq(
      ("a", "x y z"), ("a", "y"), ("b", "y z w"), ("c", "q")))
    assert(m(("a", "b")) == ((3L, 3L, 2L, 0.5))) // |∩|=2, |∪|=4
    assert(!m.contains(("a", "c"))) // disjoint pairs produce no row
    assert(!m.contains(("b", "a"))) // canonical sa < sb only
  }

  test("identical vocabularies give jaccard 1, empty words are ignored") {
    val m = overlap(Seq(("a", "x  y"), ("b", "y x")))
    assert(m(("a", "b")) == ((2L, 2L, 2L, 1.0)))
  }

  test("sf corpus: every pair bounded, symmetric-canonical, jaccard in (0,1]") {
    val rows = SourceOverlap.qSourceOverlap(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getString(0) < r.getString(1))
      val (na, nb, common, j) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))
      assert(common >= 1 && common <= math.min(na, nb))
      assert(j > 0.0 && j <= 1.0)
    }
  }
}
