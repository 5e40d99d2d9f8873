package graft.sources

import graft.clustering.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class JsonDocsSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmpDir() =
    java.nio.file.Files.createTempDirectory("graft_jsonl").toString

  test("reads a jsonl corpus it wrote itself (round trip)") {
    val dir = tmpDir()
    val docs = Seq((1L, "the quick brown fox"), (2L, "hash table join"))
      .toDF("doc_id", "text")
    JsonDocsSource.write(docs, s"$dir/out")
    val back = JsonDocsSource.docs(spark, s"$dir/out")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(back == Map(1L -> "the quick brown fox", 2L -> "hash table join"))
  }

  test("corrupt lines are quarantined, not fatal, and extra fields are ignored") {
    val dir = tmpDir()
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/docs.jsonl"),
      ("""{"doc_id": 1, "text": "good doc", "lang": "en", "score": 0.9}""" + "\n" +
        """not json at all""" + "\n" +
        """{"doc_id": 2, "text": "another good one"}""" + "\n").getBytes)
    // Spark refuses corrupt-column-only queries on raw JSON; the
    // documented posture is to materialize the parsed frame first
    val all = JsonDocsSource.read(spark, s"$dir/docs.jsonl").cache()
    try {
      assert(all.filter($"_corrupt".isNotNull).count() == 1, "one quarantined line")
      val good = JsonDocsSource.docs(spark, s"$dir/docs.jsonl")
      assert(good.count() == 2)
      assert(good.columns.toSeq == Seq("doc_id", "text"), "extra fields pruned at the source")
    } finally { all.unpersist(); () }
  }

  test("engine operators run unchanged over a jsonl corpus") {
    val dir = tmpDir()
    JsonDocsSource.write(
      Seq((1L, "a b c d"), (2L, "a b c d"), (3L, "x y z w")).toDF("doc_id", "text"),
      s"$dir/c")
    val docs = JsonDocsSource.docs(spark, s"$dir/c")
    val fp = graft.dedup.Dedup.simhashOf(docs).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fp(1L) == fp(2L), "identical docs, identical fingerprints")
    assert(fp(1L) != fp(3L))
  }
}
