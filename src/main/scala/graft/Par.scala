package graft

import org.apache.spark.sql.{Column, DataFrame}

/** CPU-bound shuffle sizing.
  *
  * AQE coalesces post-shuffle partitions by BYTES
  * (advisoryPartitionSizeInBytes, 64 MB default), which is right for
  * I/O-bound relational stages but collapses byte-tiny, CPU-heavy
  * stages to one or two tasks: a candidate-pair frame of a few hundred
  * KB whose every row pays an array-intersection or distance kernel
  * runs single-threaded while the rest of the machine idles (measured:
  * dedup_prefix_join's verify stage was ONE 2.0 s task on local[32]).
  *
  * [[Par.cpuBound]] pins such a seam to the session's configured
  * shuffle parallelism with an explicit hash repartition — exactly the
  * exchange the implicit ENSURE_REQUIREMENTS would insert, minus AQE's
  * byte-based coalescing (AQE never coalesces a user-specified
  * repartition). Because it REPLACES an exchange the plan needs anyway
  * (the downstream distinct/groupBy/join keyed the same way reuses the
  * partitioning), it adds no extra shuffle — it only stops the
  * coalesce. Sizing follows spark.sql.shuffle.partitions, the knob a
  * production deployment already sets per cluster, so nothing here is
  * local-mode-specific.
  */
object Par {
  def cpuBound(df: DataFrame, cols: Column*): DataFrame = {
    val n = df.sparkSession.sessionState.conf.numShufflePartitions
    df.repartition(n, cols: _*)
  }
}
