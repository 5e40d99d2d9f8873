package graft.sources

import graft.clustering.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** ORC source/sink round trip: the engine's operators are storage-
  * agnostic DataFrame transforms, so a corpus landed in ORC (zstd)
  * serves them unchanged — schema, values, and pushdown intact. */
class OrcSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("documents round-trip through zstd ORC and feed the operators unchanged") {
    val docs = graft.Tables.t(spark, sf, "documents")
    val dir = java.nio.file.Files.createTempDirectory("graft_orc").toString + "/docs"
    docs.write.option("compression", "zstd").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.schema == docs.schema)
    assert(back.count() == docs.count())
    assert(back.exceptAll(docs).count() == 0 && docs.exceptAll(back).count() == 0)
    // an operator runs identically over the ORC-backed frame
    val viaOrc = graft.text.TextAnalysis.entropyOf(back).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val viaParquet = graft.text.TextAnalysis.entropyOf(docs).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(viaOrc == viaParquet)
    // filter pushdown reaches the ORC scan
    val plan = back.filter(col("doc_id") === 7L).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("doc_id"), plan.take(500))
  }
}
