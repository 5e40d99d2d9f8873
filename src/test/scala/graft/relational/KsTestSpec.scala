package graft.relational

import graft.clustering.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral specs for the exact two-sample KS test. */
class KsTestSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def ks(rows: Seq[(Long, Int)]) = {
    val r = KsTest.ksTestOf(rows.toDF("cents", "side")).collect().head
    (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
      r.getDouble(4), r.getLong(5))
  }

  test("identical samples: D = 0, no rejection") {
    val r = ks(Seq((100L, 1), (200L, 1), (100L, 0), (200L, 0)))
    assert(r._3 == 0.0 && r._4 == 0.0 && r._6 == 0L)
  }

  test("fully separated samples: KS = 1 and the test rejects") {
    val rows = (1L to 30L).map(v => (v, 1)) ++ (31L to 60L).map(v => (v, 0))
    val r = ks(rows)
    assert(r._1 == 30L && r._2 == 30L)
    assert(r._4 == 1.0 && r._6 == 1L)
  }

  test("cumulative counts compose correctly across $100k stripe boundaries") {
    // values 1 and 9999999 in stripe 0; 10000001 in stripe 1
    // D_max occurs mid-sequence: |cumA*nB - cumB*nA| = 1, KS = 1/2
    val r = ks(Seq((1L, 1), (10000001L, 1), (9999999L, 0)))
    assert(r._1 == 2L && r._2 == 1L)
    assert(r._4 == 0.5)
  }
}
