package graft.text

import graft.clustering.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral specs for the C4 rule bundle over crafted pages with
  * known doc_id-derived structure. */
class C4RulesSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def run(rows: Seq[(Long, String, String)]) =
    C4Rules.c4Of(rows.toDF("doc_id", "source", "text"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      .toMap

  test("kept lines need terminal punctuation AND >= 5 words") {
    // doc_id=1: k=4+1%5=5 words/line; line j punct iff (1+j)%3!=0
    // 20 words -> 4 lines of 5; lines j=0,1,3 get '.', j=2 doesn't
    val words = (1 to 20).map(i => s"w$i").mkString(" ")
    val m = run(Seq((1L, "s", words)))
    val (nDocs, kept, nLines, keptLines, lorem, brace) = m("s")
    assert(nDocs == 1 && nLines == 4)
    assert(keptLines == 3)     // j=0,1,3 end '.', all have 5 words
    assert(kept == 1 && lorem == 0 && brace == 0)
  }

  test("short final line is never kept even when punctuated") {
    // doc_id=1: k=5; 12 words -> lines of 5,5,2. j=0,1 punctuated (5 words,
    // kept); j=2 unpunctuated anyway ((1+2)%3==0). Only 2 kept -> page dropped.
    val words = (1 to 12).map(i => s"w$i").mkString(" ")
    val m = run(Seq((1L, "s", words)))
    val (_, kept, nLines, keptLines, _, _) = m("s")
    assert(nLines == 3 && keptLines == 2 && kept == 0)
  }

  test("lorem-ipsum and brace pages are dropped regardless of kept lines") {
    val words = (1 to 40).map(i => s"w$i").mkString(" ")
    // doc_id=7 -> %7==0 lorem injected; doc_id=11 -> %11==0 brace injected
    val m = run(Seq((7L, "a", words), (11L, "b", words), (1L, "c", words)))
    assert(m("a")._5 == 1 && m("a")._2 == 0) // lorem page dropped
    assert(m("b")._6 == 1 && m("b")._2 == 0) // brace page dropped
    assert(m("c")._2 == 1)                   // clean page kept
  }

  test("injected lines add to the line census but never to kept lines") {
    val words = (1 to 40).map(i => s"w$i").mkString(" ")
    val base = run(Seq((1L, "s", words)))("s")._3
    val withLorem = run(Seq((7L, "s", words)))("s")
    // doc 7: k=4+7%5=6 -> ceil(40/6)=7 word lines + 1 lorem line
    assert(withLorem._3 == 8)
    assert(base == 8) // doc 1: k=5 -> 8 word lines, no injection
  }
}
