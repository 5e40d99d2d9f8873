package graft.text

import graft.clustering.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral specs for RAKE keyword extraction against hand-computed
  * deg/freq scores on crafted corpora. */
class RakeSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def rows(texts: String*) =
    Rake.rakeOf(texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text"))
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap

  test("hand-computed RAKE scores on a crafted two-phrase corpus") {
    // phrases: "key agg" x2 -> freq(key)=freq(agg)=2, deg=2+2=4,
    // word scores 2.0 each, phrase score 4.0
    val m = rows("key agg the key agg")
    assert(m("key agg") == ((2L, 2L, 4.0)))
  }

  test("longer phrases outscore their member words (degree dominance)") {
    // "deep neural net" once, "net" once alone:
    // freq(net)=2, deg(net)=3+1=4 -> 2.0; deep/neural: 3/1 = 3.0
    // phrase "deep neural net" = 3+3+2 = 8.0; "net" = 2.0
    val m = rows("deep neural net the net")
    assert(m("deep neural net") == ((3L, 1L, 8.0)))
    assert(m("net") == ((1L, 1L, 2.0)))
    assert(m("deep neural net")._3 > m("net")._3)
  }

  test("consecutive stopwords and edge stopwords produce no empty phrases") {
    val m = rows("the of to key and and agg in")
    assert(m.keySet == Set("key", "agg"))
    assert(m("key") == ((1L, 1L, 1.0)))
  }
}
