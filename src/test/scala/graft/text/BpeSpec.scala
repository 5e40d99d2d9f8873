package graft.text

import graft.clustering.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral specs for the BPE merge-induction operator — in
  * particular the greedy left-to-right merge scan, whose semantics a
  * string replace() would get wrong on abutting occurrences. */
class BpeSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def merge(rep: String, a: String, b: String): String =
    Bpe.mergePass(Seq((rep, 1L)).toDF("rep", "c"), a, b)
      .select("rep").as[String].collect()(0)

  test("merge fuses every non-overlapping occurrence, greedy left-to-right") {
    assert(merge("t h t h", "t", "h") == "th th") // abutting pairs both merge
    assert(merge("a b c", "a", "b") == "ab c")
    assert(merge("c a b", "a", "b") == "c ab")
    assert(merge("a b a b a b", "a", "b") == "ab ab ab")
  }

  test("self-pair runs merge like the published greedy scan") {
    assert(merge("l l", "l", "l") == "ll")
    assert(merge("l l l", "l", "l") == "ll l")     // 3rd has no partner
    assert(merge("l l l l", "l", "l") == "ll ll")
    assert(merge("l l l l l", "l", "l") == "ll ll l")
  }

  test("a symbol merged this pass cannot re-merge in the same pass") {
    // merging (a, ab): "a a b" -> after NO merge of (a,b)... craft:
    // pattern (ab, a) over "ab a b": merged "aba" must not then pair
    // with the following "b" even though "aba"+"b" ends with "ab"+"a b"
    assert(merge("ab a ab a", "ab", "a") == "aba aba")
    // tail-anchoring: previous token ENDING in `a` is not token `a`
    assert(merge("ba b", "a", "b") == "ba b")
    assert(merge("x a b", "a", "b") == "x ab")
  }

  test("multi-symbol words and 1-char words coexist; single symbols pass through") {
    assert(merge("a", "a", "b") == "a")
    val reps = Seq(("a", 5L), ("t h e", 3L)).toDF("rep", "c")
    val pairs = Bpe.pairCounts(reps).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(pairs == Map("t h" -> 3L, "h e" -> 3L))
  }

  test("full trajectory on a crafted corpus follows exact counts with lexicographic ties") {
    // corpus: "abab" x2, "ab" x3 -> pairs: (a,b)=7, (b,a)=2
    val docs = Seq("abab abab ab ab ab").toDF("text")
    val m = Bpe.mergesOf(spark, docs).orderBy("merge_round").collect()
    assert(m(0).getString(1) == "a" && m(0).getString(2) == "b" && m(0).getLong(4) == 7L)
    // after merge 1: "ab ab" x2, "ab" x3 -> top pair (ab, ab) = 2
    assert(m(1).getString(3) == "abab" && m(1).getLong(4) == 2L)
  }

  test("tokenize: token mass shrinks vs chars and never below word count") {
    val sf = "/root/testdata/sf0.001"
    val rows = Bpe.qBpeTokenize(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nWords = r.getLong(2); val nTokens = r.getLong(3); val fert = r.getDouble(4)
      assert(nTokens >= nWords)              // every word is >= 1 symbol
      assert(fert >= 1.0)
      assert(math.abs(fert - nTokens.toDouble / nWords) <= 5e-7 + 1e-12)
    }
    // the 5 learned merges must have compressed SOMETHING: total tokens
    // strictly below total characters
    val chars = graft.Tables.t(spark, sf, "documents")
      .select(sum(length(regexp_replace(col("text"), " ", ""))))
      .collect()(0).getLong(0)
    assert(rows.map(_.getLong(3)).sum < chars)
  }

  test("corpus trajectory is deterministic and count-monotone per prefix") {
    val sf = "/root/testdata/sf0.001"
    val m1 = Bpe.qBpeMerges(spark, sf).orderBy("merge_round").collect()
    val m2 = Bpe.qBpeMerges(spark, sf).orderBy("merge_round").collect()
    assert(m1.toSeq.map(_.toSeq) == m2.toSeq.map(_.toSeq))
    assert(m1.length == Bpe.ROUNDS)
    assert(m1.forall(_.getLong(4) > 0))
  }
}
