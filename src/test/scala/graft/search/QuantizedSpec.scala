package graft.search

import graft.clustering.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class QuantizedSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"

  test("int8 quantization stays in [-128, 127] and preserves dimensionality") {
    val qz = graft.Tables.t(spark, sf, "embeddings")
      .select(col("vec_id"), Quantized.quantizeExpr.as("q"))
    val bad = qz.filter(expr("exists(q, v -> v < -128 OR v > 127)")).count()
    assert(bad == 0)
    assert(qz.filter(expr("size(q) != 64")).count() == 0)
    // max-abs scaling: at least one component hits +/-127 unless the
    // vector is all-zero (scale is defined by the largest magnitude)
    val noPeak = qz.filter(expr(
      "NOT exists(q, v -> abs(v) >= 126) AND exists(q, v -> v != 0)")).count()
    assert(noPeak == 0, "per-vector max-abs scale must drive the peak to ~127")
  }

  test("quantized top-k has exactly k ranked rows per query, deterministic") {
    val out = Quantized.qQuantizedTopK(spark, sf).cache()
    try {
      val perQ = out.groupBy("q_id").count().select("count").as[Long].collect()
      assert(perQ.nonEmpty && perQ.forall(_ == 10))
      assert(out.filter($"rank" < 1 || $"rank" > 10).count() == 0)
      val again = Quantized.qQuantizedTopK(spark, sf)
      assert(out.exceptAll(again).count() == 0 && again.exceptAll(out).count() == 0)
    } finally { out.unpersist(); () }
  }
}
