package graft.relational

import graft.clustering.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral specs for incremental join maintenance. */
class IvmSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("hand-built arms: one row each, identity holds") {
    val orders = Seq(
      (1L, 10L, 5L),  // delta-A (key%10==0) x old-B
      (1L, 11L, 7L),  // old x old
      (10L, 20L, 9L), // delta-A x delta-B (cust 10)
      (10L, 21L, 11L) // old-A x delta-B
    ).toDF("o_custkey", "o_orderkey", "cents")
    val cust = Seq(1L, 10L).toDF("c_custkey")
    val r = Ivm.joinIncrementalOf(orders, cust).collect().head
    assert(r.getLong(0) == 1L) // n_old_old
    assert(r.getLong(1) == 1L) // n_delta_a
    assert(r.getLong(2) == 1L) // n_delta_b
    assert(r.getLong(3) == 1L) // n_delta_both
    assert(r.getLong(4) == 4L && r.getLong(5) == 4L)
    assert(r.getLong(6) == 32L && r.getLong(7) == 32L)
    assert(r.getLong(8) == 1L) // identity_holds
  }

  test("empty delta: everything lands in the old-old arm") {
    val orders = Seq((1L, 1L, 3L), (1L, 2L, 4L)).toDF("o_custkey", "o_orderkey", "cents")
    val cust = Seq(1L).toDF("c_custkey")
    val r = Ivm.joinIncrementalOf(orders, cust).collect().head
    assert(r.getLong(0) == 2L && r.getLong(1) == 0L &&
      r.getLong(2) == 0L && r.getLong(3) == 0L)
    assert(r.getLong(8) == 1L)
  }
}
