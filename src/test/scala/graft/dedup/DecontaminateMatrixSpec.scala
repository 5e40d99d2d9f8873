package graft.dedup

import graft.clustering.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Agreement specs for the unified decontamination verdict matrix:
  * the matrix must be a pure composition of its member modalities,
  * the registered query's bloom==gram cross-check runs on the gated
  * corpus sample, and the FULL-corpus exact==bloom equality is kept
  * HERE as the audit path (verdict-16 demand #7: the registered
  * matrix is bloom-priced; the unfiltered exact leg lives in specs). */
class DecontaminateMatrixSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  // (gram, bloom, embed, any, gramSampled, bloomSampled, agree)
  private lazy val matrix =
    DecontaminateMatrix.qDecontaminateMatrix(spark, sf).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4),
          r.getLong(5), r.getLong(6), r.getBoolean(7))).toMap

  private def countsOf(rows: Array[org.apache.spark.sql.Row],
                       benchIdx: Int): Map[Long, Long] =
    rows.groupBy(_.getLong(benchIdx)).map { case (k, v) => k -> v.length.toLong }

  test("spine covers every bench id exactly once, hit or not") {
    val docBench = graft.Tables.t(spark, sf, "documents")
      .filter("doc_id <= 5").select("doc_id").collect().map(_.getLong(0)).toSet
    val vecBench = graft.Tables.t(spark, sf, "embeddings")
      .filter("vec_id <= 5").select("vec_id").collect().map(_.getLong(0)).toSet
    assert(matrix.keySet == (docBench ++ vecBench))
  }

  test("FULL-corpus audit: the unfiltered exact member equals the matrix's bloom-priced counts") {
    val member = countsOf(Dedup.decontaminate(spark, sf).collect(), 1)
    matrix.foreach { case (b, (g, bl, _, _, _, _, _)) =>
      assert(g == member.getOrElse(b, 0L), s"bench $b gram")
      assert(bl == member.getOrElse(b, 0L), s"bench $b bloom")
    }
  }

  test("embed column equals the embed member query's per-bench counts") {
    val member = countsOf(Dedup.qDecontaminateEmbed(spark, sf).collect(), 1)
    matrix.foreach { case (b, (_, _, e, _, _, _, _)) =>
      assert(e == member.getOrElse(b, 0L), s"bench $b")
    }
  }

  test("any_hit is exactly (some modality flagged >= 1 doc)") {
    matrix.foreach { case (b, (g, bl, e, any, _, _, _)) =>
      assert(any == (g + bl + e > 0), s"bench $b")
    }
  }

  test("sampled agreement legs: exact == bloom on the gated sample, flag true") {
    matrix.foreach { case (b, (_, _, _, _, gs, bs, agree)) =>
      assert(gs == bs, s"bench $b sampled legs disagree: $gs vs $bs")
      assert(agree, s"bench $b agreement flag")
    }
  }

  test("sampled legs are a genuine subset: sampled <= full per bench item") {
    matrix.foreach { case (b, (g, _, _, _, gs, _, _)) =>
      assert(gs <= g, s"bench $b sampled $gs exceeds full $g")
    }
  }
}
