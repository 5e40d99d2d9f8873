package graft.functions

import graft.clustering.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native distinct_bigram_count expression must be
  * indistinguishable from
  * size(array_distinct(transform(sequence(1, size(ws) - 1),
  * i -> concat(element_at(ws, i), ' ', element_at(ws, i + 1)))))
  * for split-word arrays — including short arrays (0 by definition),
  * repeated phrases (dedup), and single-word docs — in both the
  * crafted-edge and real-corpus codegen paths. */
class BigramSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private val declarative =
    "CASE WHEN size(ws) >= 2 THEN size(array_distinct(transform(sequence(1, size(ws) - 1), " +
      "i -> concat(element_at(ws, i), ' ', element_at(ws, i + 1))))) ELSE 0 END"

  test("distinct_bigram_count equals the declarative form on crafted edge cases") {
    val cases: Seq[Seq[String]] = Seq(
      Seq("a", "b", "c"), // all distinct
      Seq("a", "b", "a", "b"), // "a b" repeats, "b a" once
      Seq("x", "x", "x", "x"), // one distinct bigram
      Seq("a"), // single word -> 0
      Seq(), // empty -> 0
      Seq("a", "b"))
    val df = cases.toDF("ws")
      .withColumn("native", GraftFunctions.distinctBigramCount(col("ws")))
      .withColumn("decl", expr(declarative))
    df.select("native", "decl").collect().zip(cases).foreach { case (r, c) =>
      assert(r.getInt(0) == r.getInt(1), s"mismatch on $c: ${r.getInt(0)} vs ${r.getInt(1)}")
    }
  }

  test("distinct_bigram_count equals the declarative form on the real corpus (codegen path)") {
    val docs = graft.Tables.t(spark, "/root/testdata/sf0.001", "documents")
      .withColumn("ws", split(col("text"), " "))
      .withColumn("native", GraftFunctions.distinctBigramCount(col("ws")))
      .withColumn("decl", expr(declarative))
    assert(docs.filter(col("native") =!= col("decl")).count() == 0)
    assert(docs.filter(col("native") > 0).count() > 0, "non-trivial corpus coverage")
  }

  test("distinct_bigram_count is SQL-callable through GraftExtensions") {
    // bigrams of "a b a b": "a b", "b a", "a b" -> 2 distinct
    spark.sql("SELECT distinct_bigram_count(split('a b a b', ' ')) AS n")
      .collect().headOption.map(_.getInt(0)).foreach(n => assert(n == 2))
  }
}
