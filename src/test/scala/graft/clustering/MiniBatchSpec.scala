package graft.clustering

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral specs for mini-batch k-means. */
class MiniBatchSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("cumulative counts equal the gated batch census") {
    val rows = MiniBatch.qMiniBatch(spark, sf).collect()
    assert(rows.length == 4)
    val vTotal = rows.map(_.getLong(1)).sum
    val pts = Points.lineitem4d(spark, sf)
    val expected = (1 to 3).map { i =>
      pts.filter(expr(s"(pid * 31 + $i) % 4 = 0")).count()
    }.sum
    assert(vTotal == expected && expected > 0)
  }

  test("centers stay inside the data bounding box (convex blends)") {
    val pts = Points.lineitem4d(spark, sf)
    val bounds = pts.agg(
      min("x1"), max("x1"), min("x2"), max("x2"),
      min("x3"), max("x3"), min("x4"), max("x4")).collect()(0)
    val rows = MiniBatch.qMiniBatch(spark, sf).collect()
    rows.foreach { r =>
      for (j <- 0 until 4) {
        val c = r.getDouble(2 + j)
        val (lo, hi) = (bounds.getDouble(2 * j), bounds.getDouble(2 * j + 1))
        // round-6 can nudge past a bound by at most 5e-7
        assert(c >= lo - 1e-6 && c <= hi + 1e-6, s"c${j + 1} = $c not in [$lo, $hi]")
      }
    }
  }

  test("the blend moves a center toward its batch mean, never past it") {
    // one iteration by hand on the engine's own outputs is the oracle's
    // job; here pin the learning-rate endpoints: first touch of a
    // center (v was 0, eta = 1) must land EXACTLY on the batch mean.
    // With the first-K init, iteration 1's blend for any center whose
    // v was 0 is c' = round(c + (m - c) * 1, 6) = m.
    val pts = Points.lineitem4d(spark, sf).cache()
    try {
      val centers = Points.firstKCenters(pts, 4)
      val b1 = pts.filter(expr("(pid * 31 + 1) % 4 = 0"))
      val u = KMeans.update(KMeans.assign(b1, centers)).collect()
        .map(r => r.getAs[Int]("k") -> (0 until 4).map(j => r.getDouble(2 + j))).toMap
      // recompute iteration 1 only (v starts all-zero -> eta = 1)
      val out = MiniBatchProbe.oneIteration(spark, sf)
      u.foreach { case (k, m) =>
        (0 until 4).foreach(j => assert(out(k)(j) == m(j), s"k=$k j=$j"))
      }
    } finally { pts.unpersist(); () }
  }
}

/** Test-only single-iteration probe mirroring qMiniBatch's first step. */
private[clustering] object MiniBatchProbe {
  def oneIteration(spark: org.apache.spark.sql.SparkSession, dir: String)
    : Map[Int, IndexedSeq[Double]] = {
    val pts = Points.lineitem4d(spark, dir)
    val centers = Points.firstKCenters(pts, 4)
    val b1 = pts.filter(expr("(pid * 31 + 1) % 4 = 0"))
    val u = KMeans.update(KMeans.assign(b1, centers)).collect()
    val out = Array.tabulate(4)(k => centers(k).toIndexedSeq)
    u.foreach { r =>
      val k = r.getAs[Int]("k")
      // eta = n / (0 + n) = 1 -> c' = round(m, 6) = m (m already 6 dp)
      out(k) = (0 until 4).map(j =>
        BigDecimal(centers(k)(j) + (r.getDouble(2 + j) - centers(k)(j)) * 1.0)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    out.zipWithIndex.map { case (c, k) => k -> c }.toMap
  }
}
