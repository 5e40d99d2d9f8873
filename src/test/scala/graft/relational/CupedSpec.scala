package graft.relational

import graft.clustering.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral specs for CUPED variance reduction. */
class CupedSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def run(rows: Seq[(Long, String, Long)]) = {
    val r = Cuped.cupedOf(rows.toDF("user_id", "period", "v")).collect().head
    (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
      r.getDouble(4), r.getDouble(5))
  }

  test("Y identical to X: theta 1, CUPED removes the whole pre-existing gap") {
    // ctrl users 2,4 (X=Y=10,20); treat users 1,3 (X=Y=30,40)
    def u(id: Long, x: Long) = Seq(
      (id, "pre", x * 1000000L), (id, "post", x * 1000000L))
    val (nt, nc, theta, naive, cuped, vr) =
      run(u(2, 10) ++ u(4, 20) ++ u(1, 30) ++ u(3, 40))
    assert(nt == 2L && nc == 2L)
    assert(theta == 1.0)
    assert(naive == 20.0) // (30+40)/2 - (10+20)/2
    assert(cuped == 0.0)  // the gap was all pre-period
    assert(vr == 100.0)
  }

  test("X orthogonal to Y: theta 0, CUPED leaves the naive lift unchanged") {
    // cov(X,Y) = 0 by construction; treat (odd ids) carries Y=7 vs 5
    val rows = Seq(
      (2L, "pre", 1000000L), (2L, "post", 5000000L),
      (4L, "pre", 3000000L), (4L, "post", 5000000L),
      (1L, "pre", 1000000L), (1L, "post", 7000000L),
      (3L, "pre", 3000000L), (3L, "post", 7000000L))
    val (_, _, theta, naive, cuped, vr) = run(rows)
    assert(theta == 0.0)
    assert(naive == 2.0 && cuped == 2.0)
    assert(vr == 0.0)
  }
}
