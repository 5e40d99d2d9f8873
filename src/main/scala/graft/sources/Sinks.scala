package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus landing sinks. At 100 TB the write layout decides every
  * downstream read: partition directories give coarse pruning, sorted
  * rows within files give min/max row-group pruning, and a per-file
  * record cap bounds both the small-files failure mode (repartition to
  * one writer task per partition value) and the giant-file one
  * (maxRecordsPerFile splits the writer's output).
  */
object Sinks {

  /** Write `df` as parquet partitioned by `partitionCol`, rows sorted
    * by `sortCol` within each file, at most `maxRecordsPerFile` rows
    * per file. One writer task per partition value (the repartition),
    * so each directory holds ceil(rows / maxRecordsPerFile) files,
    * every one internally sorted — no post-hoc compaction pass. */
  def writePartitioned(df: DataFrame, path: String, partitionCol: String,
                       sortCol: String, maxRecordsPerFile: Int): Unit =
    df.repartition(col(partitionCol))
      .sortWithinPartitions(col(partitionCol), col(sortCol))
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile.toLong)
      .partitionBy(partitionCol)
      .parquet(path)

  /** Morton (Z-order) code of two numeric columns over a fixed
    * [lo, hi) range each: 8 bucket bits per dimension, bit-interleaved
    * — pure codegen'd integer arithmetic. */
  def mortonCode(x: Column, xLo: Double, xHi: Double,
                 y: Column, yLo: Double, yHi: Double): Column = {
    def bucket(c: Column, lo: Double, hi: Double): Column =
      greatest(lit(0), least(lit(255),
        floor((c - lit(lo)) / lit(hi - lo) * 256.0).cast("int")))
    val xb = bucket(x, xLo, xHi)
    val yb = bucket(y, yLo, yHi)
    (0 until 8).map(b =>
      shiftright(xb, b).bitwiseAND(lit(1)) * lit(1 << (2 * b + 1)) +
        shiftright(yb, b).bitwiseAND(lit(1)) * lit(1 << (2 * b)))
      .reduce(_ + _)
  }

  /** Z-ordered write: range-partition + sort by the Morton code of
    * two query columns, so each output file covers a small RECTANGLE
    * of the (x, y) space instead of a thin slice of one column — the
    * lakehouse layout trick that lets parquet min/max row-group stats
    * prune on BOTH columns at once. A plain sort by x gives perfect
    * x-pruning and zero y-pruning; Z-order trades a little of x's
    * locality for pruning on both (ZOrderSpec measures exactly this).
    */
  def writeZOrdered(df: DataFrame, path: String,
                    x: String, xLo: Double, xHi: Double,
                    y: String, yLo: Double, yHi: Double,
                    numFiles: Int): Unit = {
    val z = mortonCode(col(x), xLo, xHi, col(y), yLo, yHi)
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }
}
