package graft.search

import graft.clustering.{Points, SparkTestSession}
import org.scalatest.funsuite.AnyFunSuite

/** PQEncode (native codegen expression) must be BITWISE equal to the
  * declarative M x K unrolled KMeans.assign formulation — that is what
  * keeps the simsearch_pq / simsearch_ivfpq oracles valid with the
  * fast expression in the plan (the CosineSimilarity precedent). */
class PQEncodeSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark

  test("expression codes equal the declarative assign codes on the real corpus") {
    val pts = Points.embeddings64(spark, "/root/testdata/sf0.01").cache()
    try {
      val codebooks = PQ.trainCodebooks(pts)
      val fast = PQ.encodeCodes(pts, codebooks)
      val slow = PQ.encodeCodesDeclarative(pts, codebooks)
      assert(fast.exceptAll(slow).isEmpty && slow.exceptAll(fast).isEmpty,
        "native and declarative PQ codes must match row-for-row")
      assert(fast.count() == pts.count())
    } finally pts.unpersist()
  }

  test("expression min-dists equal the declarative array_min distances bitwise") {
    import org.apache.spark.sql.functions._
    val pts = Points.embeddings64(spark, "/root/testdata/sf0.001").cache()
    try {
      val codebooks = PQ.trainCodebooks(pts)
      val fast = pts.select(col("pid"),
        graft.functions.GraftFunctions
          .pqMinDists(array(Points.embedDims.map(col): _*), codebooks).as("d"))
      // the round-9 formulation simsearch_pq_distortion used to unroll
      // (M x K literal distance trees) — correct, but blows janino's
      // 64 KB limit at full M; reduced to per-subspace columns here
      val slowCols = codebooks.indices.map { s =>
        val sd = Points.embedDims.slice(s * 8, (s + 1) * 8)
        array_min(array(codebooks(s).map(c => Points.distTo(c, sd)): _*)).as(s"d_$s")
      }
      val slow = pts.select(col("pid") +: slowCols: _*)
        .select(col("pid"), array(codebooks.indices.map(s => col(s"d_$s")): _*).as("d"))
      assert(fast.exceptAll(slow).isEmpty && slow.exceptAll(fast).isEmpty,
        "native and declarative PQ min-distances must match bitwise")
    } finally pts.unpersist()
  }

  test("empty-class NaN centers never win the argmin") {
    val pts = Points.embeddings64(spark, "/root/testdata/sf0.001")
    val codebooks = PQ.trainCodebooks(pts.cache())
    try {
      // poison one centroid per subspace with NaN; codes must avoid it
      val poisoned = codebooks.map { cb =>
        cb.updated(7, Array.fill(cb(7).length)(Double.NaN))
      }
      val codes = PQ.encodeCodes(pts, poisoned).collect()
      assert(codes.nonEmpty)
      codes.foreach { r =>
        (1 until r.length).foreach(i => assert(r.getInt(i) != 7,
          "a NaN centroid must never be selected"))
      }
    } finally pts.unpersist()
  }
}
