package graft.search

import graft.clustering.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral specs for the embedding centroid-drift monitor. */
class DriftSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"

  test("drift report conserves per-label counts across the parity batches") {
    val rows = Drift.qCentroidDrift(spark, sf).collect()
    val perLabel = graft.Tables.t(spark, sf, "embeddings")
      .groupBy("label").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(rows.length == perLabel.size)
    rows.foreach { r =>
      assert(r.getLong(1) + r.getLong(2) == perLabel(r.getInt(0)))
      assert(r.getDouble(3) >= 0.0)
    }
  }

  test("a crafted +0.5 shift in one dimension reads back as that drift") {
    // batch 0 (even vec_id) at base, batch 1 (odd) shifted +0.5 in dim 7
    def v(shift7: Float): Array[Float] =
      Array.tabulate(64)(i => if (i == 7) 0.1f + shift7 else 0.1f)
    val rows = (0 until 8).map { j =>
      (j.toLong, if (j % 2 == 0) v(0f) else v(0.5f), 3)
    }
    val out = Drift.centroidDriftOf(rows.toDF("vec_id", "embedding", "label"))
      .collect()
    assert(out.length == 1)
    val r = out(0)
    assert(r.getInt(0) == 3 && r.getLong(1) == 4 && r.getLong(2) == 4)
    assert(math.abs(r.getDouble(3) - 0.25) < 1e-9, r.toString) // drift2 = 0.5^2
    assert(r.getInt(4) == 7)
    assert(math.abs(r.getDouble(5) + 0.5) < 1e-9) // batch0 - batch1 = -0.5
  }

  test("a label present in only one parity batch is skipped, not a crash") {
    // label 9 has a single (even-id) vector -> no batch-1 half; the
    // oracle's inner join drops it, so the operator must too
    val rows = (0 until 6).map(j => (j.toLong, Array.fill(64)(0.2f), 1)) :+
      ((100L, Array.fill(64)(0.9f), 9))
    val out = Drift.centroidDriftOf(rows.toDF("vec_id", "embedding", "label"))
      .collect()
    assert(out.length == 1 && out(0).getInt(0) == 1)
  }

  test("identical batches drift exactly zero with the tie-broken top dim 0") {
    val rows = (0 until 6).map(j => (j.toLong, Array.fill(64)(0.2f), 1))
    val out = Drift.centroidDriftOf(rows.toDF("vec_id", "embedding", "label"))
      .collect()
    assert(out.length == 1)
    assert(out(0).getDouble(3) == 0.0 && out(0).getInt(4) == 0)
  }
}
