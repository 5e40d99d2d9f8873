package graft.relational

import graft.clustering.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral specs for the duplicate-payment screen. */
class AuditSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def pairs(rows: Seq[(Long, Long, String, Long)]) =
    Audit.doubleChargeOf(
        rows.toDF("o_custkey", "o_orderkey", "ds", "cents")
          .selectExpr("o_custkey", "o_orderkey",
            "CAST(ds AS TIMESTAMP) AS o_orderdate", "cents"))
      .collect()

  test("same band within 90 days flags; time or band separation clears") {
    val r = pairs(Seq(
      (1L, 1L, "2020-01-01 00:00:00", 150000L), // $1500, band 1
      (1L, 2L, "2020-02-01 00:00:00", 150050L), // band 1, +31d -> pair
      (1L, 3L, "2020-08-01 00:00:00", 150000L), // band 1, too late
      (1L, 4L, "2020-01-05 00:00:00", 999999L), // band 9: different
      (2L, 5L, "2020-01-02 00:00:00", 150000L))) // other customer
    assert(r.length == 1)
    val row = r.head
    assert(row.getLong(0) == 1L && row.getLong(2) == 1L && row.getLong(3) == 2L)
    assert(row.getLong(6) == 31L) // day_gap
  }

  test("no pairs on distinct bands") {
    val r = pairs(Seq(
      (1L, 1L, "2020-01-01 00:00:00", 100000L),
      (1L, 2L, "2020-01-02 00:00:00", 250000L)))
    assert(r.isEmpty)
  }
}
