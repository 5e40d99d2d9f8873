package graft.text

import graft.clustering.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral spec for the encoding-damage QC report: the detector
  * census must match the doc_id%6 injection arithmetic exactly (the
  * injected ground truth), and a clean corpus must report zero flags. */
class EncodingSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"

  test("census matches the doc_id%6 injection arms per source") {
    val got = Encoding.qEncodingReport(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    val arms = graft.Tables.t(spark, sf, "documents")
      .groupBy("source")
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("doc_id") % 6 === 1, 1L).otherwise(0L)).as("a1"),
        sum(when(col("doc_id") % 6 === 2, 1L).otherwise(0L)).as("a2"),
        sum(when(col("doc_id") % 6 === 3, 1L).otherwise(0L)).as("a3"),
        sum(when(col("doc_id") % 6 === 4, 1L).otherwise(0L)).as("a4"),
        sum(when(col("doc_id") % 6 === 5, 1L).otherwise(0L)).as("a5"),
        sum(when(col("doc_id") % 6 === 0, 1L).otherwise(0L)).as("a0"))
      .collect()
    assert(arms.nonEmpty && arms.length == got.size)
    arms.foreach { e =>
      val r = got(e.getString(0))
      assert(r.getLong(1) == e.getLong(1))            // n_docs
      assert(r.getLong(2) == e.getLong(2))            // n_replacement = arm 1
      assert(r.getLong(3) == e.getLong(3) + e.getLong(6)) // mojibake = arms 2+5
      assert(r.getLong(4) == e.getLong(4))            // n_c1 = arm 3
      assert(r.getLong(5) == e.getLong(5))            // n_bom = arm 4
      assert(r.getLong(6) == e.getLong(7))            // n_clean = arm 0
    }
  }

  test("an undamaged ASCII corpus reports every doc clean") {
    // doc_ids all ≡ 0 (mod 6) → no arm fires, detectors must stay silent
    val df = Seq((0L, "plain ascii text only here", "s1"),
                 (6L, "another clean ascii document", "s1"),
                 (12L, "nothing suspicious at all okay", "s2"))
      .toDF("doc_id", "text", "source")
    val out = Encoding.encodingReportOf(df).collect()
    out.foreach { r =>
      assert(r.getLong(2) == 0 && r.getLong(3) == 0 && r.getLong(4) == 0
        && r.getLong(5) == 0)
      assert(r.getLong(6) == r.getLong(1))
    }
  }
}
