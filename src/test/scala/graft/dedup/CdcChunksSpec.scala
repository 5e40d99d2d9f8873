package graft.dedup

import graft.clustering.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class CdcChunksSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"

  private val W = 8
  private val DIV = 32

  test("native cdc_chunks equals the declarative formulation on the real corpus") {
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.t(spark, sf, "documents")
      .withColumn("len", length(col("text")).cast("long"))
    val diff = docs.select(
      graft.functions.GraftFunctions.cdcChunks(col("text"), W, DIV).as("native"),
      expr(Cdc.declarativeChunksSql).as("ref"))
      .filter(col("native") =!= col("ref"))
    assert(diff.count() == 0,
      "native expression must reproduce the declarative chunking exactly")
  }

  test("edge cases: empty, shorter-than-window, exactly-window, null, multibyte") {
    import org.apache.spark.sql.functions._
    val rows = Seq(
      (1L, ""),
      (2L, "short"),        // 5 < W -> [text]
      (3L, "exactly8!"),    // >= W, no interior boundary possible at len == W+1
      (4L, null.asInstanceOf[String]),
      (5L, "café au lait, café au lait, café au lait! " * 4),
      (6L, "a" * 200))      // uniform text: every window hashes the same
      .toDF("doc_id", "text")
      .withColumn("len", length(col("text")).cast("long"))
    val diff = rows.select(col("doc_id"),
      graft.functions.GraftFunctions.cdcChunks(col("text"), W, DIV).as("native"),
      expr(Cdc.declarativeChunksSql).as("ref"))
      .filter(col("native") =!= col("ref") ||
        col("native").isNull =!= col("ref").isNull)
    assert(diff.count() == 0, "edge cases must match the declarative formulation")
    // chunks re-concatenate to the original text (partition property)
    val bad = rows.filter(col("text").isNotNull)
      .select(col("text"),
        concat_ws("", graft.functions.GraftFunctions.cdcChunks(col("text"), W, DIV)).as("glued"))
      .filter(col("text") =!= col("glued"))
    assert(bad.count() == 0, "chunks must partition the text")
  }
}
