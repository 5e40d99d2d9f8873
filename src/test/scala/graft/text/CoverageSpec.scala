package graft.text

import graft.clustering.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral specs for the held-out bigram coverage report. */
class CoverageSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  /** Mirror of the engine's split assignment (first 3 md5 nibbles of
    * the id string, mod 100; <80 train, <90 val). */
  private def bucket(docId: Long): Int = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(docId.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val nib = (c: Char) => "0123456789abcdef".indexOf(c)
    (nib(hex(0)) * 256 + nib(hex(1)) * 16 + nib(hex(2))) % 100
  }

  test("coverage matches a from-scratch recompute on crafted docs") {
    // find ids landing in train and in val
    val ids = (0L until 2000L)
    val trainIds = ids.filter(bucket(_) < 80).take(3)
    val valIds = ids.filter(i => bucket(i) >= 80 && bucket(i) < 90).take(2)
    assert(trainIds.size == 3 && valIds.size == 2)
    // train corpus: "a b c" and "b c d"; val: "a b x" -> val bigrams
    // {a b, b x}: "a b" covered, "b x" not -> coverage 0.5
    val docs =
      Seq((trainIds(0), "en", "a b c"), (trainIds(1), "en", "b c d"),
        (trainIds(2), "en", "q r"), (valIds(0), "en", "a b x"),
        (valIds(1), "fr", "a b")) // fr val, NO fr train -> coverage 0
    val out = Coverage.ngramCoverageOf(docs.toDF("doc_id", "lang", "text"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out("en") == ((2L, 1L, 0.5)))
    assert(out("fr") == ((1L, 0L, 0.0)))
  }

  test("identical val and train text reads full coverage") {
    val ids = (0L until 2000L)
    val tId = ids.find(bucket(_) < 80).get
    val vId = ids.find(i => bucket(i) >= 80 && bucket(i) < 90).get
    val out = Coverage.ngramCoverageOf(
        Seq((tId, "en", "x y z"), (vId, "en", "x y z"))
          .toDF("doc_id", "lang", "text"))
      .collect()
    assert(out.length == 1 && out(0).getDouble(3) == 1.0)
  }

  test("single-token and empty documents contribute no bigrams") {
    val ids = (0L until 2000L)
    val vId = ids.find(i => bucket(i) >= 80 && bucket(i) < 90).get
    val vId2 = ids.filter(i => bucket(i) >= 80 && bucket(i) < 90)(1)
    val out = Coverage.ngramCoverageOf(
        Seq((vId, "en", "solo"), (vId2, "en", "a b"))
          .toDF("doc_id", "lang", "text"))
      .collect()
    // only "a b" counts; no train -> covered 0
    assert(out.length == 1 && out(0).getLong(1) == 1L && out(0).getLong(2) == 0L)
  }
}
