package graft.functions

import graft.clustering.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class HammingSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("hamming distance via the native expression") {
    val df = Seq(
      ("0000", "0000", 0), ("0000", "1111", 4), ("0101", "0110", 2),
      ("01", "0101", -1) // length mismatch sentinel
    ).toDF("a", "b", "expect")
    val out = df.withColumn("hd", GraftFunctions.hamming($"a", $"b"))
      .filter($"hd" =!= $"expect")
    assert(out.count() == 0)
  }

  test("hamming handles nulls like any binary expression") {
    val df = Seq((Some("01"), None: Option[String])).toDF("a", "b")
    val out = df.withColumn("hd", GraftFunctions.hamming($"a", $"b"))
      .select("hd").collect()
    assert(out.head.isNullAt(0))
  }

  test("sql registration via GraftExtensions (spark.sql.extensions)") {
    val r = spark.sql("SELECT hamming('0110', '0000') AS hd").collect().head.getInt(0)
    assert(r == 2)
  }

  test("expression survives whole-stage codegen on a real query") {
    val out = graft.dedup.Dedup.qSimhashPairs(spark, "/root/testdata/sf0.001")
    assert(out.filter($"hd" > 12 || $"hd" < 0).count() == 0)
    assert(out.count() > 0, "expected simhash near-dup pairs in the corpus")
  }
}
