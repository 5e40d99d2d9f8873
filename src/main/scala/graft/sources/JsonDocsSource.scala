package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** JSON-lines document source — the de-facto interchange format for
  * text corpora (one JSON object per line: {"doc_id": ..., "text":
  * ..., ...extra fields}).
  *
  * The schema is DECLARED, not inferred: schema inference costs a full
  * extra pass over 100 TB and silently unions drifting shapes, so the
  * reader pins (doc_id, text) and keeps everything else out of the
  * scan (column pruning at the source). Corrupt lines land in a
  * quarantine column instead of killing the job — PERMISSIVE mode with
  * an explicit corrupt-record field, the production posture for
  * web-scale corpora where malformed records are routine.
  */
object JsonDocsSource {

  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = true),
    StructField("text", StringType, nullable = true),
    StructField("_corrupt", StringType, nullable = true)))

  /** Read a jsonl corpus as (doc_id, text); malformed lines surface as
    * (null, null, raw-line) rows the caller can count or divert. */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .json(path)

  /** The well-formed rows only, in the engine's documents shape. */
  def docs(spark: SparkSession, path: String): DataFrame =
    read(spark, path)
      .filter(col("_corrupt").isNull && col("doc_id").isNotNull && col("text").isNotNull)
      .select("doc_id", "text")

  /** Write a documents frame back out as jsonl (one object per line) —
    * the matching sink, partitioned however the input is. */
  def write(df: DataFrame, path: String): Unit =
    df.select("doc_id", "text").write.mode("overwrite").json(path)

  /** COMMITTED jsonl write: stage the files under a fresh immutable
    * data dir, then publish the file list through the TxTable commit
    * protocol (manifest + atomic CURRENT swap). The commit-log
    * protocol is format-agnostic — only the manifest and pointer
    * matter — so a jsonl hand-off gets the same crash safety as the
    * parquet standing corpus: a crash anywhere before the pointer
    * swap leaves readers on the previous complete version, never a
    * half-written corpus. Returns the committed version. */
  def commitJson(df: DataFrame, tableDir: String): Long = {
    val files = TxTable.stageWith(tableDir, "json", ".json") { p =>
      df.select("doc_id", "text").write.mode("errorifexists").json(p)
    }
    // replace-style: the cleaned corpus derives from the INPUT, not the
    // standing snapshot, so a collision (orphaned claim from a crashed
    // run) safely advances to the next slot
    TxTable.commitReplace(tableDir, files)
  }

  /** Snapshot read of a committed jsonl table: exactly the files the
    * CURRENT manifest lists — staged-but-uncommitted data dirs are
    * invisible, the same isolation TxTable.read gives parquet. */
  def readCommitted(spark: SparkSession, tableDir: String): DataFrame =
    TxTable.snapshot(tableDir) match {
      case Some(s) if s.files.nonEmpty =>
        spark.read.schema(StructType(schema.dropRight(1)))
          .json(s.files.map(f => s"$tableDir/$f"): _*)
      case _ => spark.emptyDataFrame
    }
}
