package graft.dedup

import graft.clustering.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class IncrementalSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"

  test("incremental dedup labels every batch doc exactly once and consistently") {
    val out = Incremental.qIncremental(spark, sf).cache()
    try {
      assert(out.count() > 0, "the 10% gate must select a batch")
      assert(out.groupBy("doc_id").count().filter($"count" > 1).count() == 0,
        "one verdict per batch doc")
      assert(out.filter($"status" === "new").groupBy("content_hash")
        .count().filter($"count" > 1).count() == 0,
        "at most one 'new' per content hash")
      // a hash known to the corpus never yields 'new' or 'dup_in_batch'
      val inconsistent = out.groupBy("content_hash")
        .agg(collect_set("status").as("ss"))
        .filter(array_contains($"ss", "dup_of_corpus") &&
          (array_contains($"ss", "new") || array_contains($"ss", "dup_in_batch")))
      assert(inconsistent.count() == 0)
      // rerun-stable (pure hash gate + window)
      val again = Incremental.qIncremental(spark, sf)
      assert(out.exceptAll(again).count() == 0 && again.exceptAll(out).count() == 0)
    } finally { out.unpersist(); () }
  }
}
