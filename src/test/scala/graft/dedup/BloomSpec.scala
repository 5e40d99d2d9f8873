package graft.dedup

import graft.clustering.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BloomSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"

  test("bloom-prefiltered decontamination is row-identical to the exact operator") {
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getLong(0), r.getLong(1), r.getLong(2))
    val exact = Dedup.decontaminate(spark, sf).collect().map(key).toSet
    val bloomed = Bloom.decontaminateBloom(spark, sf).collect().map(key).toSet
    assert(exact.nonEmpty, "fixture must flag something")
    assert(bloomed == exact, "bloom pre-filter must not change the result")
  }

  test("bloom has no false negatives and a sane false-positive rate") {
    val bench = Seq("abcde", "fghij", "klmno").toDF("g")
    val bf = bench.agg(Bloom.bloomAgg(col("g"), 1000L).as("bf"))
      .head.getAs[Array[Byte]](0)
    // every inserted gram must survive the probe
    val kept = bench.filter(Bloom.mightContain(lit(bf), col("g"))).count()
    assert(kept == 3, "no false negatives, ever")
    // of 1000 absent keys, only the configured fp rate (~3%) may pass
    val absent = (0 until 1000).map(i => s"q$i").toDF("g")
    val fp = absent.filter(Bloom.mightContain(lit(bf), col("g"))).count()
    assert(fp < 100, s"false-positive rate out of control: $fp/1000")
  }
}
