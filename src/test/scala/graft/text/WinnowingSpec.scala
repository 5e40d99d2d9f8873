package graft.text

import graft.clustering.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral specs for the winnowing fingerprint operator against the
  * paper's two defining properties (Schleimer/Wilkerson/Aiken 2003):
  * any shared substring of length >= k + w - 1 yields at least one
  * identical selected fingerprint in both documents, and window-min
  * ties break to the RIGHTMOST position. K = 5, W = 4 here, so the
  * guarantee threshold is 8 chars. */
class WinnowingSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def rows(texts: String*): Map[Long, (Long, Long, Long)] =
    Winnowing.winnowingOf(
        texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("doc_id", "text"))
      .select("doc_id", "n_kgrams", "n_selected", "checksum")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap

  test("short documents yield zero fingerprints") {
    val m = rows("", "abc", "abcdefg") // 0, 0, 3 k-grams; all < W=4
    assert(m(0L) == ((0L, 0L, 0L)))
    assert(m(1L) == ((0L, 0L, 0L)))
    assert(m(2L)._1 == 3L && m(2L)._2 == 0L)
  }

  test("identical documents select identical fingerprints") {
    val m = rows("the quick brown fox jumps", "the quick brown fox jumps")
    assert(m(0L) == m(1L) && m(0L)._2 > 0)
  }

  test("shared substring of length >= k+w-1 shares a fingerprint") {
    // a k+w-1 = 9-char string has exactly w consecutive k-grams, i.e.
    // one full window, so it MUST select >= 1 fingerprint — and the
    // same window of hashes occurs inside any document embedding it
    val m = rows("xxxxSHAREDRUNyyyy", "qqqqSHAREDRUNzzzz", "SHAREDRUN")
    assert(m(2L)._1 == 5L && m(2L)._2 >= 1L)
    assert(m(0L)._2 >= 1L && m(1L)._2 >= 1L)
  }

  test("rightmost tie rule: repeated k-grams select the later position") {
    // "aaaaaaaaaaaa" (12 a's): all k-gram hashes identical, so every
    // window's min is decided purely by the position packing
    // (PACK-1-j): larger j -> smaller packed value -> RIGHTMOST wins.
    // Consecutive windows then pick overlapping rightmost positions;
    // array_distinct collapses them. 12 chars -> 8 k-grams -> 5
    // windows, window s selects position s+3 (rightmost), distinct
    // positions {4..8} -> 5 selected.
    val m = rows("aaaaaaaaaaaa")
    assert(m(0L)._1 == 8L)
    assert(m(0L)._2 == 5L)
  }

  test("density is the exact HALF_UP ratio of selected to k-grams") {
    val df = Winnowing.winnowingOf(Seq((0L, "aaaaaaaaaaaa")).toDF("doc_id", "text"))
    val d = df.select("density").collect()(0).getDouble(0)
    assert(d == 0.625) // 5/8 exactly representable
  }
}
