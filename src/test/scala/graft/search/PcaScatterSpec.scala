package graft.search

import graft.clustering.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral spec for the 2-D PCA scatter histogram. */
class PcaScatterSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("scatter conserves the corpus and spreads on both principal axes") {
    val rows = PcaScatter.qPcaScatter(spark, sf).collect()
    val total = rows.map(_.getLong(2)).sum
    assert(total == graft.Tables.t(spark, sf, "embeddings").count())
    // a real 2-D map: multiple occupied cells along BOTH axes (a
    // degenerate projection would collapse one axis to a single bucket)
    assert(rows.map(_.getLong(0)).distinct.length > 1, "PC1 collapsed")
    assert(rows.map(_.getLong(1)).distinct.length > 1, "PC2 collapsed")
    rows.foreach(r => assert(r.getLong(2) > 0))
  }

  test("rerun is bit-stable (staged chain + grid math, no layout surface)") {
    val a = PcaScatter.qPcaScatter(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(t => (t._1, t._2))
    val b = PcaScatter.qPcaScatter(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(t => (t._1, t._2))
    assert(a.sameElements(b))
  }
}
