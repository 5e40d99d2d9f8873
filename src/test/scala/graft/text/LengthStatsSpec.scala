package graft.text

import graft.clustering.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral spec for the per-source length-percentile report. */
class LengthStatsSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("quantiles are ordered, bounded by the observed range, counts conserve") {
    val rows = LengthStats.qLengthQuantiles(spark, sf).collect()
    val docs = graft.Tables.t(spark, sf, "documents")
    assert(rows.map(_.getLong(1)).sum == docs.count())
    val bounds = docs.groupBy("source")
      .agg(min("n_chars").as("lo"), max("n_chars").as("hi"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    rows.foreach { r =>
      val (p10, p50, p90, p99) =
        (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))
      assert(p10 <= p50 && p50 <= p90 && p90 <= p99)
      val (lo, hi) = bounds(r.getString(0))
      assert(p10 >= lo && p99 <= hi)
    }
  }
}
