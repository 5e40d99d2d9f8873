package graft.dedup

import graft.clustering.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral specs for the ingest-gate precision report. */
class GatePrecisionSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private lazy val row = Dedup.qGatePrecision(spark, sf).collect()(0)
  private lazy val recall = Dedup.qGateRecall(spark, sf).collect()(0)

  test("numerators never exceed denominators; precisions in [0, 1]") {
    for (base <- Seq(0, 3, 6)) {
      val (cand, tru) = (row.getLong(base), row.getLong(base + 1))
      assert(tru <= cand, s"cols $base: $tru > $cand")
      if (cand > 0) {
        val p = row.getDouble(base + 2)
        assert(p >= 0.0 && p <= 1.0)
        assert(math.abs(p - tru.toDouble / cand) < 1e-6)
      }
    }
  }

  test("prefix16 true-pair numerator matches the recall report's") {
    // both reports count the same quantity for the single-block gate
    assert(row.getLong(1) == recall.getLong(1))
  }

  test("band collision workload grows with band count") {
    // 8 bands of 8 bits collide at least as often as 4 bands of 16
    // (every 16-bit match contains two 8-bit matches)
    assert(row.getLong(6) >= row.getLong(3))
    assert(row.getLong(7) >= row.getLong(4))
  }

  test("driver recompute of the prefix16 candidate volume") {
    val fps = Dedup.simhashOf(
      graft.Tables.t(spark, sf, "documents")).collect()
      .map(_.getString(1).substring(0, 16))
    val expected = fps.groupBy(identity).values
      .map(g => g.size.toLong * (g.size - 1) / 2).sum
    assert(row.getLong(0) == expected)
  }
}
