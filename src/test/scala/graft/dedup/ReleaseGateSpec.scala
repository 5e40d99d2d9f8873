package graft.dedup

import graft.clustering.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Composition specs for the release-gate rollups: each must equal a
  * driver-side recompute from its independently-oracled members. */
class ReleaseGateSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("decontaminated corpus = corpus minus the union of member-flagged ids") {
    val gram = Dedup.decontaminate(spark, sf).collect().map(_.getLong(0)).toSet
    val embed = Dedup.qDecontaminateEmbed(spark, sf).collect().map(_.getLong(0)).toSet
    val flagged = gram ++ embed
    val corpus = graft.Tables.t(spark, sf, "documents")
      .filter("doc_id > 5").select("doc_id", "source").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val expectKept = corpus.filterNot(c => flagged(c._1))
      .groupBy(_._2).map { case (s, xs) => s -> xs.length.toLong }
    val expectTot = corpus.groupBy(_._2).map { case (s, xs) => s -> xs.length.toLong }
    val got = ReleaseGate.qDecontaminatedCorpus(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got.keySet == expectTot.keySet)
    got.foreach { case (s, (nDocs, nKept, nDropped)) =>
      assert(nDocs == expectTot(s) && nKept == expectKept.getOrElse(s, 0L)
        && nDropped == nDocs - nKept, s"source $s")
    }
  }

  test("span savings equals a recompute from the rebuild rows") {
    val reb = LongestSpan.qSpanRebuild(spark, sf).collect()
    val before = graft.Tables.t(spark, sf, "documents")
      .selectExpr("sum(length(text))").head.getLong(0)
    val r = ReleaseGate.qSpanSavings(spark, sf).head
    assert(r.getLong(0) == reb.length)
    assert(r.getLong(1) == reb.count(_.getBoolean(1)))
    assert(r.getLong(2) == before)
    assert(r.getLong(3) == reb.map(_.getLong(4)).sum)
    assert(r.getLong(4) == r.getLong(2) - r.getLong(3))
    val frac = r.getDouble(5)
    assert(frac >= 0.0 && frac <= 1.0)
    // every cut is >= MIN_CUT=128 chars, so savings >= 128 * n_cut
    assert(r.getLong(4) >= 128L * r.getLong(1))
  }
}
