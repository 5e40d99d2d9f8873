package graft.search

import graft.clustering.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral specs for the embedding-isotropy report. */
class IsotropySpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def report(vecs: Seq[Seq[Float]]): (Long, Option[Double], Double) = {
    val r = Isotropy.isotropyOf(
      vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("vec_id", "embedding")).collect()(0)
    (r.getLong(0), Option(r.get(1)).map(_.asInstanceOf[Double]), r.getDouble(2))
  }

  test("identical vectors: fully anisotropic, mean cosine 1") {
    val (n, cos, mnorm) = report(Seq.fill(4)(Seq(1f, 0f, 0f)))
    assert(n == 4 && cos.contains(1.0) && mnorm == 1.0)
  }

  test("orthogonal pair: mean cosine 0; antipodal pair: -1") {
    assert(report(Seq(Seq(1f, 0f), Seq(0f, 1f)))._2.contains(0.0))
    val (_, cos, mnorm) = report(Seq(Seq(1f, 0f), Seq(-1f, 0f)))
    assert(cos.contains(-1.0) && mnorm == 0.0)
  }

  test("zero vectors are excluded; single survivor gives NULL cosine") {
    val (n, cos, _) = report(Seq(Seq(0f, 0f), Seq(3f, 4f)))
    assert(n == 1 && cos.isEmpty)
  }

  test("sf embeddings: cosine in [-1, 1], norm in [0, 1]") {
    val r = Isotropy.qIsotropy(spark, "/root/testdata/sf0.001").collect()(0)
    val cos = r.getDouble(1)
    val mnorm = r.getDouble(2)
    assert(cos >= -1.0 - 1e-6 && cos <= 1.0 + 1e-6)
    assert(mnorm >= 0.0 && mnorm <= 1.0 + 1e-6)
    // identity check: mean_vector_norm^2 ~ (|S|^2)/(N 1e6)^2 and the
    // pairwise mean derives from the same |S|^2 — so
    // cos ~ (norm^2 * N - 1) / (N - 1) up to rounding
    val n = r.getLong(0).toDouble
    assert(math.abs(cos - (mnorm * mnorm * n - 1.0) / (n - 1.0)) < 1e-3)
  }
}
