package graft.search

import graft.clustering.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral specs for the k-NN embedding-quality evaluators:
  * leave-one-out label classification and the Matryoshka prefix-dim
  * recall curve. */
class KnnEvalSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"

  test("knn classify: eval census matches the capped vec_id%10 subsample, accuracy within [0,1]") {
    val rows = KnnEval.qKnnClassify(spark, sf).collect()
    val nEval = rows.map(_.getLong(1)).sum
    val expected = graft.Tables.t(spark, sf, "embeddings")
      .filter(col("vec_id") % 10 === 0 && col("vec_id") < 10000L).count()
    assert(nEval == expected && expected > 0)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
      val acc = r.getDouble(3)
      assert(acc >= 0.0 && acc <= 1.0)
      // accuracy is the exact 6-dp HALF_UP of correct/eval
      val exact = BigDecimal(r.getLong(2)) / BigDecimal(r.getLong(1))
      assert(math.abs(acc - exact.toDouble) <= 5e-7 + 1e-12)
    }
  }

  test("knn classify: perfectly separated crafted clusters classify at accuracy 1") {
    // two tight clusters far apart: every LOO neighbor shares the label
    def v(base: Float, j: Int): Array[Float] =
      Array.tabulate(64)(i => if (i == 0) base + j * 0.001f else 0.1f)
    val rows = (0 until 10).map(j => (j.toLong, v(-0.5f, j), 0)) ++
      (10 until 20).map(j => (j.toLong, v(0.5f, j), 1))
    val df = rows.toDF("vec_id", "embedding", "label")
    val out = KnnEval.knnClassifyOf(df).collect()
    assert(out.nonEmpty)
    out.foreach(r => assert(r.getDouble(3) == 1.0, r.toString))
  }

  test("knn classify: eval set is ABSOLUTE-bounded — ids past the cap never evaluate") {
    // 2100 vectors: %10 alone would admit 210 eval points; the cap
    // admits only vec_id < 10000, i.e. ALL here — so craft ids above
    // the cap instead: ids 10000..10090 are %10==0 but past the cap
    def v(j: Int): Array[Float] = Array.tabulate(64)(i => (i * j % 7) * 0.01f)
    val rows = (0 until 40).map(j => (j.toLong, v(j), j % 2)) ++
      (0 until 10).map(j => (10000L + 10 * j, v(j + 40), 0))
    val out = KnnEval.knnClassifyOf(rows.toDF("vec_id", "embedding", "label"))
      .collect()
    // only the 4 in-cap %10 ids (0,10,20,30) evaluate
    assert(out.map(_.getLong(1)).sum == 4)
  }

  test("matryoshka: full-dim control row has recall exactly 1, all recalls bounded") {
    val rows = KnnEval.qMatryoshka(spark, sf).collect()
    assert(rows.map(_.getInt(0)).toSet == Set(8, 16, 32, 64))
    val full = rows.find(_.getInt(0) == 64).get
    assert(full.getDouble(3) == 1.0 && full.getLong(2) == full.getLong(1))
    rows.foreach { r =>
      assert(r.getLong(2) >= 0 && r.getLong(2) <= r.getLong(1))
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
    }
  }
}
