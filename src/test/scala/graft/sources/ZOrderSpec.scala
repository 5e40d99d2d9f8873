package graft.sources

import java.nio.file.Files

import graft.clustering.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Measures what Z-ordering is FOR: after a Z-ordered write, every
  * file covers a small rectangle of the (x, y) space, so parquet
  * min/max stats can prune on BOTH columns; after a plain x-sort the
  * y extent of every file stays ~global. */
class ZOrderSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("z-ordered files cover small rectangles of both dimensions") {
    val dir = Files.createTempDirectory("graft_zorder").toString
    val li = graft.Tables.t(spark, "/root/testdata/sf0.01", "lineitem")
      .select(col("l_extendedprice").as("x"), col("l_quantity").as("y"))
    val (xLo, xHi, yLo, yHi) = (900.0, 105000.0, 1.0, 51.0)

    Sinks.writeZOrdered(li, s"$dir/z", "x", xLo, xHi, "y", yLo, yHi, numFiles = 16)
    // baseline: plain sort by x only, same file count
    li.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(s"$dir/plain")

    def avgFileSpan(path: String, c: String): Double =
      spark.read.parquet(path)
        .groupBy(input_file_name()).agg((max(col(c)) - min(col(c))).as("span"))
        .agg(avg("span")).as[Double].head()

    val zX = avgFileSpan(s"$dir/z", "x"); val zY = avgFileSpan(s"$dir/z", "y")
    val pX = avgFileSpan(s"$dir/plain", "x"); val pY = avgFileSpan(s"$dir/plain", "y")

    // the x-sorted layout prunes x perfectly but y not at all
    assert(pY > 0.9 * (yHi - yLo), s"plain sort leaves y unpruned: $pY")
    // z-order: BOTH spans well under the global ranges
    assert(zX < 0.5 * (xHi - xLo), s"z-order x span too wide: $zX")
    assert(zY < 0.5 * (yHi - yLo), s"z-order y span too wide: $zY")
    // and it loses some x locality vs the pure x-sort — the trade
    assert(zX > pX, "z-order trades a little x locality for y pruning")
  }
}
