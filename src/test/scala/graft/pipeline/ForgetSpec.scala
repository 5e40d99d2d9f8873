package graft.pipeline

import graft.clustering.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral specs for deletion-request propagation over a crafted
  * corpus with known keeper/reassignment/drop cases. doc_id%13==0 is
  * the deletion set. */
class ForgetSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def run(rows: Seq[(Long, String, String)]) =
    Forget.forgetOf(rows.toDF("doc_id", "source", "text"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap

  test("deleted keeper hands its entry to the smallest surviving owner") {
    // hash A: owners 13 (deleted keeper), 20, 15 -> reassigned (keeper 15)
    // hash B: owners 26, 39 (both deleted)       -> dropped
    // hash C: owner 7 only                       -> untouched
    val m = run(Seq(
      (13L, "s", "dup a"), (20L, "s", "dup a"), (15L, "s", "dup a"),
      (26L, "s", "dup b"), (39L, "s", "dup b"),
      (7L, "s", "solo c")))
    val (ib, irm, irs, ia, ires) = m("dedup_index")
    assert(ib == 3 && irm == 1 && irs == 1 && ia == 2 && ires == 0)
    val (cb, crm, _, ca, cres) = m("corpus:s")
    assert(cb == 6 && crm == 3 && ca == 3 && cres == 0)
  }

  test("a corpus with no deletion requests propagates as a no-op") {
    val m = run(Seq((1L, "s", "x"), (2L, "s", "y"), (3L, "s", "x")))
    assert(m("corpus:s") == ((3L, 0L, 0L, 3L, 0L)))
    assert(m("dedup_index") == ((2L, 0L, 0L, 2L, 0L)))
  }

  test("residuals are zero on the real corpus at sf0.001") {
    val rows = Forget.qForget(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(5) == 0L, r.toString))
    // and something was actually deleted
    assert(rows.map(_.getLong(2)).sum > 0)
  }
}
