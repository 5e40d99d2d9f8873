package graft.text

import graft.clustering.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral specs for the Heaps'-law vocabulary-growth fit. */
class HeapsSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("checkpoint table: cumulative tokens and first-occurrence vocab") {
    // doc i: "a b w<i>" -> 3 tokens each, vocab 2 + i at checkpoint i
    val docs = (1L to 10L).map(i => (i, s"a b w$i")).toDF("doc_id", "text")
    val rows = Heaps.heapsOf(docs).collect().sortBy(_.getAs[Long]("cp"))
    assert(rows.length == 10)
    rows.zipWithIndex.foreach { case (r, idx) =>
      val i = idx + 1
      assert(r.getAs[Long]("n_tokens") == 3L * i)
      assert(r.getAs[Long]("vocab") == 2L + i)
    }
    val beta = rows.head.getAs[Double]("beta")
    val k = rows.head.getAs[Double]("k")
    assert(beta > 0 && beta < 1) // sub-linear growth
    assert(k > 0)
  }

  test("pure repetition flattens the exponent vs fresh vocabulary") {
    val repeat = (1L to 10L).map(i => (i, "x y z")).toDF("doc_id", "text")
    val fresh = (1L to 10L).map(i =>
      (i, s"w${i}a w${i}b w${i}c")).toDF("doc_id", "text")
    val bRep = Heaps.heapsOf(repeat).collect().head.getAs[Double]("beta")
    val bFresh = Heaps.heapsOf(fresh).collect().head.getAs[Double]("beta")
    assert(bRep == 0.0) // vocab constant -> zero slope
    assert(bFresh == 1.0) // every token new -> linear growth
  }
}
