package graft.search

import graft.clustering.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class WhitenSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("top-PC removal kills the removed direction and shrinks the dominant share") {
    val r = Whiten.qWhiten(spark, sf).collect()(0)
    assert(r.getAs[Int]("dim") == 64)
    assert(r.getAs[Long]("n_vecs") > 0)
    val (lam, sb) = (r.getAs[Double]("top_eig_removed"), r.getAs[Double]("share_before"))
    val (lam2, t2, sa) = (r.getAs[Double]("top_eig_after"),
      r.getAs[Double]("trace_after"), r.getAs[Double]("share_after"))
    assert(lam > 0 && sb > 0 && sb <= 1.0 + 1e-9)
    // variance along the removed direction is (numerically) gone:
    // the round-6 residual of projecting out a round-6 unit vector
    assert(math.abs(r.getAs[Double]("var_pc_after")) < 1e-4,
      s"var along removed PC: ${r.getAs[Double]("var_pc_after")}")
    // the deflated spectrum lost exactly the top eigenvalue from the
    // trace (Hotelling deflation: trace' = trace - lam * |v|^2, |v|~1)
    val traceBefore = lam / sb // share_before = lam/trace rounded 6
    assert(math.abs(t2 - (traceBefore - lam)) < traceBefore * 1e-3,
      s"trace_after $t2 vs trace-lam ${traceBefore - lam}")
    // the residual dominant eigenvalue stays in the removed one's
    // band — with a near-isotropic spectrum (this corpus) and 15
    // finite iterations the estimates of two nearly-equal eigenvalues
    // can cross by a percent, so the bound is a tolerance, not an
    // exact order
    assert(lam2 <= lam * 1.05 + 1e-4, s"second eig $lam2 above removed $lam")
    assert(sa > 0 && sa <= 1.0 + 1e-9)
  }
}
