package graft.relational

import graft.clustering.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral specs for the Gini / Lorenz inequality report. */
class InequalitySpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def gini(revs: Seq[Long]): Double =
    Inequality.giniOf(
        revs.zipWithIndex.map { case (r, i) => (i.toLong, r) }
          .toDF("o_custkey", "cents"))
      .collect().head.getAs[Double]("gini")

  test("perfect equality -> gini 0") {
    assert(gini(Seq(25L, 25L, 25L, 25L)) == 0.0)
  }

  test("hand-computed concentration: nine paupers, one near-total holder") {
    // sorted x = 1x9, 999991; SI = 45 + 10*999991; T = 1e6
    // gini = (2*9999955 - 11*1e6) / (10*1e6) = 0.899991
    assert(gini(Seq.fill(9)(1L) :+ 999991L) == 0.899991)
  }

  test("two-level stripe rank reproduces the exact global order") {
    // revenues straddle three $100k stripes; hand value = 0.375 (HALF_UP)
    assert(gini(Seq(3L, 9999999L, 10000000L, 20000001L)) == 0.375)
  }

  test("Lorenz shares are monotone and end at 1") {
    val rows = Inequality.giniOf(
        (1L to 40L).map(i => (i, i * 7L)).toDF("o_custkey", "cents"))
      .collect().sortBy(_.getAs[Long]("decile"))
    val shares = rows.map(_.getAs[Double]("cum_share"))
    assert(shares.zip(shares.tail).forall { case (a, b) => a <= b })
    assert(shares.last == 1.0)
    assert(rows.map(_.getAs[Long]("n_customers")).sum == 40L)
  }
}
