package graft.dedup

import graft.clustering.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Agreement specs for the unified decontamination verdict matrix:
  * the matrix must be a pure composition of its three member
  * modalities, and the bloom column must equal the exact gram column
  * (no false negatives + exact confirm join). */
class DecontaminateMatrixSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private lazy val matrix =
    DecontaminateMatrix.qDecontaminateMatrix(spark, sf).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4))).toMap

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

  test("gram column equals the exact member query's per-bench counts") {
    val member = countsOf(Dedup.decontaminate(spark, sf).collect(), 1)
    matrix.foreach { case (b, (g, _, _, _)) =>
      assert(g == member.getOrElse(b, 0L), s"bench $b")
    }
  }

  test("bloom column equals the gram column (agreement cross-check)") {
    matrix.foreach { case (b, (g, bl, _, _)) => assert(g == bl, s"bench $b") }
  }

  test("embed column equals the embed member query's per-bench counts") {
    val member = countsOf(Dedup.qDecontaminateEmbed(spark, sf).collect(), 1)
    matrix.foreach { case (b, (_, _, e, _)) =>
      assert(e == member.getOrElse(b, 0L), s"bench $b")
    }
  }

  test("any_hit is exactly (some modality flagged >= 1 doc)") {
    matrix.foreach { case (b, (g, bl, e, any)) =>
      assert(any == (g + bl + e > 0), s"bench $b")
    }
  }
}
