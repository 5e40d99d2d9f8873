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

  /** Integrity MANIFEST of a landed parquet dataset: one row per data
    * file with its row count and an ORDER-INDEPENDENT content
    * fingerprint (exact DECIMAL sum of a 48-bit slice of each row's
    * md5-over-JSON), plus the file-relative path. The manifest is what
    * a corpus release ships next to the data: a receiver re-runs it
    * and compares — row drops, duplicate shards, or silent corruption
    * all shift a fingerprint. One scan, partial-aggregated per file;
    * sum-of-hashes (not hash-of-concatenation) keeps the fingerprint
    * independent of row order within the file, so recomputation under
    * a different task split agrees. */
  def manifest(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame = {
    val df = spark.read.parquet(path)
    df.withColumn("__h", expr(
        "cast(conv(substr(md5(to_json(struct(*))), 1, 12), 16, 10) as decimal(20,0))"))
      .withColumn("__file",
        regexp_replace(input_file_name(), s"^.*${java.util.regex.Pattern.quote(new java.io.File(path).getName)}/", ""))
      .groupBy(col("__file").as("file"))
      .agg(count(lit(1)).as("n_rows"), sum("__h").as("fingerprint"))
  }

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

  /** One planned compaction group: which files merge into one output.
    * `oversized` marks a group whose single file already exceeds the
    * target — it can't be split by compaction (that's a rewrite job),
    * so the "at most targetBytes" contract is explicitly waived and
    * surfaced rather than silently broken. */
  case class CompactionGroup(groupId: Int, files: Seq[String], bytes: Long,
                             oversized: Boolean = false)

  /** Compaction PLAN for a directory of parquet files: first-fit-
    * decreasing bin packing of files into groups of at most
    * `targetBytes` — the small-files maintenance pass every streaming /
    * incremental sink eventually needs (thousands of KB-sized files
    * turn a scan into a metadata stampede). Planning is driver-side
    * FILE METADATA only (names + sizes — never data); at 100 TB the
    * listing is the object-store manifest, the plan is still tiny. */
  def compactionPlan(dir: String, targetBytes: Long): Seq[CompactionGroup] = {
    // listFiles() is null (not empty) for a missing path or non-directory
    val listed = Option(new java.io.File(dir).listFiles()).getOrElse(
      throw new IllegalArgumentException(s"compactionPlan: not a listable directory: $dir"))
    planFiles(listed
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
      .map(f => f.getPath -> f.length()).toSeq, targetBytes)
  }

  /** The FFD packing itself over (path, bytes) pairs — shared with the
    * transactional table's snapshot compaction, whose file list comes
    * from a manifest rather than a directory listing. */
  private[sources] def planFiles(sized: Seq[(String, Long)],
                                 targetBytes: Long): Seq[CompactionGroup] = {
    val files = sized.sortBy { case (p, len) => (-len, p) } // FFD: biggest first, stable
    val bins = scala.collection.mutable.ArrayBuffer.empty[(Long, scala.collection.mutable.ArrayBuffer[String])]
    for ((path, len) <- files) {
      val i = bins.indexWhere(_._1 + len <= targetBytes)
      if (i >= 0) bins(i) = (bins(i)._1 + len, bins(i)._2 += path)
      else bins += ((len, scala.collection.mutable.ArrayBuffer(path)))
    }
    bins.zipWithIndex.map { case ((bytes, fs), i) =>
      CompactionGroup(i, fs.toSeq, bytes,
        oversized = bytes > targetBytes)
    }.toSeq
  }

  /** Execute a compaction plan: each group's files re-read and written
    * as ONE file in `outDir`. Groups are independent — on a cluster
    * they run as parallel jobs; rewriting is the only data movement
    * and each group is bounded by targetBytes. */
  def compact(spark: org.apache.spark.sql.SparkSession,
              plan: Seq[CompactionGroup], outDir: String): Unit =
    plan.foreach { g =>
      spark.read.parquet(g.files: _*)
        .coalesce(1)
        .write.mode("overwrite").parquet(s"$outDir/group_${g.groupId}")
    }

  /** Schema-evolution-safe union: unionByName with missing columns
    * nulled — how a corpus accumulated across releases (each adding
    * columns) reads back as one frame. Pair with
    * spark.read.option("mergeSchema", true) for the storage-side
    * equivalent. */
  def unionEvolved(dfs: Seq[DataFrame]): DataFrame =
    dfs.reduce((a, b) => a.unionByName(b, allowMissingColumns = true))

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
