package graft.functions

import graft.clustering.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the NFC expression's semantics: JDK-Normalizer agreement,
  * eval/codegen equivalence (the whole-stage path is what production
  * runs), SQL registration, and the ASCII fast path's no-op claim. */
class NfcSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private val cases = Seq(
    "plain ascii stays put",
    "café nfc",
    "café nfd",
    "ṩ one-codepoint s-dot", // NFC keeps composed forms
    "ṩ builds ṩ", // NFD sequence composes
    "", // empty
    "mixed café and café")

  test("nfc_normalize agrees with java.text.Normalizer on every case") {
    val got = cases.zipWithIndex.map(_.swap).toDF("i", "s")
      .select($"i", GraftFunctions.nfcNormalize($"s").as("n"))
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    cases.zipWithIndex.foreach { case (s, i) =>
      val want = java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)
      assert(got(i) == want, s"case $i: ${got(i)} != $want")
    }
  }

  test("nfc_normalize is registered for SQL and composes NFD input") {
    val r = Seq("café").toDF("s").selectExpr("nfc_normalize(s) AS n")
      .head().getString(0)
    assert(r == "caf\u00e9", s"got ${r.map(_.toInt.toHexString)}")
  }

  test("interpreted eval matches the codegen path") {
    // force interpreted eval through the expression directly
    val e = NfcNormalize(org.apache.spark.sql.catalyst.expressions.Literal(
      org.apache.spark.unsafe.types.UTF8String.fromString("café x"),
      org.apache.spark.sql.types.StringType))
    assert(e.eval(null).toString == "café x")
  }

  test("ascii fast path returns the identical UTF8String instance") {
    val in = org.apache.spark.unsafe.types.UTF8String.fromString("ascii only")
    assert(NfcNormalize.normalize(in) eq in)
  }
}
