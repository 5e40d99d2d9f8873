package graft.pipeline

import graft.clustering.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral specs for the dataset release diff. */
class ReleaseDiffSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("hand-enumerated arms over ids 0..29") {
    // A = even, B = id%3!=0 (with id%7==0 rewritten)
    // common = even & %3!=0 = {2,4,8,10,14,16,20,22,26,28}
    //   changed = {14, 28}; unchanged = 8
    // added = odd & %3!=0 (10 ids); removed = even & %3==0 = {0,6,12,18,24}
    val docs = (0L to 29L).map(i => (i, s"text $i", "s"))
    val r = ReleaseDiff.releaseDiffOf(docs.toDF("doc_id", "text", "source"))
      .collect().head
    assert(r.getString(0) == "s")
    assert(r.getLong(1) == 10L) // added
    assert(r.getLong(2) == 5L)  // removed
    assert(r.getLong(3) == 2L)  // changed
    assert(r.getLong(4) == 8L)  // unchanged
  }

  test("census is conserved: arms partition the union of both snapshots") {
    val docs = (0L to 99L).map(i => (i, s"doc $i body", if (i % 2 == 0) "x" else "y"))
    val rows = ReleaseDiff.releaseDiffOf(docs.toDF("doc_id", "text", "source")).collect()
    val total = rows.map(r => r.getLong(1) + r.getLong(2) + r.getLong(3) + r.getLong(4)).sum
    val expected = (0L to 99L).count(i => i % 2 == 0 || i % 3 != 0)
    assert(total == expected)
  }
}
