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
}
