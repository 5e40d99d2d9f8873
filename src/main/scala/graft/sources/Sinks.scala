package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

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
}
