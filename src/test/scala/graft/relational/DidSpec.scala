package graft.relational

import graft.clustering.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral specs for the difference-in-differences lift estimator:
  * the estimate must net out both the cohort gap and the common time
  * trend, and the published identity did = (tp2-tp1)-(cp2-cp1) must
  * hold on the operator's own outputs. */
class DidSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("did equals the four-mean identity on every output row") {
    val rows = Did.qDidLift(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (tp1, tp2) = (r.getDouble(5), r.getDouble(6))
      val (cp1, cp2) = (r.getDouble(7), r.getDouble(8))
      val did = r.getDouble(9)
      assert(math.abs(did - ((tp2 - tp1) - (cp2 - cp1))) < 1e-9, r.toString)
      Seq(1, 2, 3, 4).foreach(i => assert(r.getLong(i) > 0))
    }
  }

  test("cell counts conserve the event census") {
    val rows = Did.qDidLift(spark, sf).collect()
    val total = rows.map(r => r.getLong(1) + r.getLong(2) + r.getLong(3) + r.getLong(4)).sum
    val expected = graft.Tables.t(spark, sf, "events").count()
    assert(total == expected)
  }
}
