package graft.search

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables.t
import graft.functions.VectorOps

/** Similarity search over the embeddings corpus.
  *
  * Brute-force top-k broadcasts the SMALL query set against the corpus
  * (the scalable shape for k queries x N corpus: one pass over the
  * corpus, no corpus-side shuffle). The ANN variant restricts
  * candidates to sign-LSH buckets — an equi-join on the bucket key —
  * trading recall for a candidate set ~N/2^bits per query.
  */
object SimSearch {

  private val QN = 5 // query vectors: vec_id <= QN
  private val TOPK = 10
  private val ANN_TOPK = 5
  private val BITS = 4

  /** Brute-force cosine top-k per query vector. */
  def qTopK(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "embeddings")
    val q = e.filter(col("vec_id") <= QN)
      .select(col("vec_id").as("q_id"), col("embedding").as("qe"))
    val scored = e.join(broadcast(q), col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("vec_id"), VectorOps.cosine("qe", "embedding").as("cs"))
    val w = Window.partitionBy("q_id").orderBy(col("cs").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= TOPK)
      .select("q_id", "vec_id", "rank", "cs")
  }

  /** ANN top-k: same scoring, candidates limited to the query's sign
    * bucket. */
  def qAnn(spark: SparkSession, dir: String): DataFrame = {
    val b = t(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"), VectorOps.signBucket("embedding", BITS).as("bk"))
    val q = b.filter(col("vec_id") <= QN)
      .select(col("vec_id").as("q_id"), col("embedding").as("qe"), col("bk").as("qbk"))
    val scored = b.join(broadcast(q), col("qbk") === col("bk") && col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("vec_id"), VectorOps.cosine("qe", "embedding").as("cs"))
    val w = Window.partitionBy("q_id").orderBy(col("cs").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= ANN_TOPK)
      .select("q_id", "vec_id", "rank", "cs")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "simsearch_topk" -> (qTopK _),
    "simsearch_ann" -> (qAnn _))

  val oracleSql: Map[String, String] = Map(
    "simsearch_topk" ->
      s"""WITH q AS (SELECT vec_id AS q_id, embedding AS qe FROM embeddings WHERE vec_id <= $QN),
         |c AS (SELECT q_id, vec_id,
         |  ${VectorOps.cosineSql("qe", "embedding")} AS cs
         |  FROM q JOIN embeddings ON q_id != vec_id),
         |r AS (SELECT *, CAST(row_number() OVER (
         |  PARTITION BY q_id ORDER BY cs DESC, vec_id ASC) AS INT) AS rank FROM c)
         |SELECT q_id, vec_id, rank, cs FROM r WHERE rank <= $TOPK""".stripMargin,
    "simsearch_ann" ->
      s"""WITH b AS (SELECT vec_id, embedding,
         |  ${VectorOps.signBucketSql("embedding", BITS)} AS bk FROM embeddings),
         |q AS (SELECT vec_id AS q_id, embedding AS qe, bk AS qbk FROM b WHERE vec_id <= $QN),
         |c AS (SELECT q_id, vec_id,
         |  ${VectorOps.cosineSql("qe", "embedding")} AS cs
         |  FROM q JOIN b ON qbk = bk AND q_id != vec_id),
         |r AS (SELECT *, CAST(row_number() OVER (
         |  PARTITION BY q_id ORDER BY cs DESC, vec_id ASC) AS INT) AS rank FROM c)
         |SELECT q_id, vec_id, rank, cs FROM r WHERE rank <= $ANN_TOPK""".stripMargin)
}
