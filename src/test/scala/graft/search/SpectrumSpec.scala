package graft.search

import graft.clustering.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SpectrumSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("standardization: transformed dims verify to zero mean, unit variance") {
    val rows = Spectrum.qStandardize(spark, sf).collect()
    assert(rows.length == 64)
    rows.foreach { r =>
      val d = r.getAs[Int]("dim")
      assert(math.abs(r.getAs[Double]("mean_after")) < 1e-4,
        s"dim $d mean_after ${r.getAs[Double]("mean_after")}")
      assert(math.abs(r.getAs[Double]("var_after") - 1.0) < 1e-3,
        s"dim $d var_after ${r.getAs[Double]("var_after")}")
      assert(r.getAs[Double]("var_before") > 0.0)
    }
  }

  test("covariance: full upper triangle, nonnegative diagonal, matches var_pop") {
    val rows = Spectrum.qCovariance(spark, sf).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(rows.size == 64 * 65 / 2)
    assert(rows.keys.forall { case (i, j) => i <= j && i >= 0 && j < 64 })
    (0 until 64).foreach(i => assert(rows((i, i)) >= 0.0, s"var($i) negative"))
    // spot-check the diagonal against Spark's own var_pop (central-
    // moment formula; agrees with E[x^2]-E[x]^2 up to float noise)
    val vp = graft.Tables.t(spark, sf, "embeddings")
      .select(var_pop(expr("CAST(embedding[0] AS DOUBLE)")).as("v0"),
        var_pop(expr("CAST(embedding[63] AS DOUBLE)")).as("v63"))
      .collect()(0)
    assert(math.abs(rows((0, 0)) - vp.getDouble(0)) < 1e-4)
    assert(math.abs(rows((63, 63)) - vp.getDouble(1)) < 1e-4)
  }

  test("spectrum: dominant eigenvalue positive, bounded by the trace, share in (0,1]") {
    val r = Spectrum.qSpectrum(spark, sf).collect()(0)
    assert(r.getAs[Int]("dim") == 64)
    assert(r.getAs[Long]("n_vecs") > 0)
    val (tr, lam, share) = (r.getAs[Double]("trace"),
      r.getAs[Double]("top_eig"), r.getAs[Double]("explained_share"))
    assert(tr > 0 && lam > 0)
    // covariance is PSD (up to round-6 noise), so no eigenvalue
    // exceeds the eigenvalue sum
    assert(lam <= tr + 1e-4, s"top_eig $lam above trace $tr")
    assert(share > 0 && share <= 1.0 + 1e-9)
    assert(math.abs(share - BigDecimal(lam / tr).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
  }

  test("correlation spectrum: dominant eigenvalue between the mean (1) and the trace (64)") {
    val r = Spectrum.qCorrSpectrum(spark, sf).collect()(0)
    val lam = r.getAs[Double]("top_eig")
    // the correlation matrix has unit diagonal: 64 eigenvalues summing
    // to 64, so the largest is at least the mean and at most the sum
    assert(lam >= 1.0 - 1e-4 && lam <= 64.0 + 1e-6, s"top_eig $lam")
    assert(math.abs(r.getAs[Double]("explained_share") - BigDecimal(lam / 64)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
  }
}
