package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables.t

/** Incremental (batch-vs-corpus) deduplication — the daily-ingest
  * shape: a new batch of documents arrives and must be deduplicated
  * BOTH against the standing corpus and within itself, without ever
  * re-deduplicating the corpus.
  *
  * The standing corpus is represented by its distinct content-hash
  * set — exactly what a production pipeline keeps as its dedup index.
  * The batch joins that index on the hash key (co-partitioned
  * equi-join, corpus side never re-scanned beyond the index) and
  * resolves batch-internal duplicates with a per-hash min-id window.
  * Batch membership is the same deterministic md5-nibble gate the
  * split/sample/mix operators use (~10% of the corpus), so the whole
  * operator is rerun-stable and oracle-exact.
  *
  * At 100 TB: the index is (hash) only — 16 bytes a row, bucketable
  * on the hash key so tomorrow's batch joins without a corpus-side
  * shuffle; the batch-internal window shuffles just the batch.
  */
object Incremental {

  /** Same 0..4095 md5-nibble row hash as Splits (inlined SQL so the
    * oracle mirrors it verbatim). */
  private def nibbleHashSql(keyExpr: String): String =
    (1 to 3).map(i =>
      s"(instr('0123456789abcdef', substr(md5($keyExpr), $i, 1)) - 1) * ${math.pow(16, 3 - i).toInt}")
      .mkString("(", " + ", ")")

  private val BATCH_BUCKET = 7 // gate % 10 == 7 -> ~10% "new batch"

  def qIncremental(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
      .withColumn("__b",
        expr(s"${nibbleHashSql("cast(doc_id as string)")} % 10") === BATCH_BUCKET)
      .withColumn("content_hash", md5(col("text")))
    val corpusIndex = docs.filter(!col("__b"))
      .select("content_hash").distinct()
      .withColumn("in_corpus", lit(1))
    val batch = docs.filter(col("__b")).select("doc_id", "content_hash")
    val w = Window.partitionBy("content_hash")
    batch
      .withColumn("first_id", min("doc_id").over(w))
      .join(corpusIndex, Seq("content_hash"), "left")
      .select(col("doc_id"), col("content_hash"),
        when(col("in_corpus") === 1, lit("dup_of_corpus"))
          .when(col("doc_id") =!= col("first_id"), lit("dup_in_batch"))
          .otherwise(lit("new")).as("status"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_incremental" -> (qIncremental _))

  val oracleSql: Map[String, String] = Map(
    "dedup_incremental" ->
      s"""WITH d AS (SELECT doc_id, md5(text) AS content_hash,
         |    ${nibbleHashSql("CAST(doc_id AS VARCHAR)")} % 10 = $BATCH_BUCKET AS b
         |  FROM documents),
         |idx AS (SELECT DISTINCT content_hash FROM d WHERE NOT b),
         |batch AS (SELECT doc_id, content_hash,
         |    min(doc_id) OVER (PARTITION BY content_hash) AS first_id
         |  FROM d WHERE b)
         |SELECT batch.doc_id, batch.content_hash,
         |  CASE WHEN idx.content_hash IS NOT NULL THEN 'dup_of_corpus'
         |       WHEN batch.doc_id <> batch.first_id THEN 'dup_in_batch'
         |       ELSE 'new' END AS status
         |FROM batch LEFT JOIN idx USING (content_hash)""".stripMargin)
}
