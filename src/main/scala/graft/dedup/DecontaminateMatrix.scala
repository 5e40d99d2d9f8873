package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t
import graft.functions.VectorOps

/** Unified decontamination verdict matrix (round-16, verdict-15
  * demand #6): ONE query composing the engine's three existing
  * decontamination modalities into the per-bench-item release-gate
  * artifact a 100 TB run ships — for each benchmark item, how many
  * corpus documents each modality flags, and the any-hit verdict
  * that decides whether the item is contaminated:
  *
  *   - n_gram_hits:  exact char-5-gram overlap (`dedup_decontaminate`
  *     semantics, the unfiltered exact formulation)
  *   - n_bloom_hits: the Bloom-prefiltered path
  *     (`dedup_decontaminate_bloom`) — blooms have no false negatives
  *     and the confirm join is exact, so this column must EQUAL
  *     n_gram_hits; running both paths makes the matrix a standing
  *     agreement cross-check, not just a report
  *   - n_embed_hits: embedding-cosine (`dedup_decontaminate_embed`),
  *     catching paraphrased contamination that shares no exact grams
  *
  * The bench-item spine is the union of document and embedding bench
  * ids (ids <= benchMaxId, the family's shared delineation), LEFT
  * joins + coalesce-to-0 so an item NO modality flags still gets its
  * all-clear row — a release gate must affirmatively clear every
  * item, not stay silent on the clean ones.
  *
  * Scale shape: a composition, not new corpus work — the gram legs
  * ride the staged shingle table and the bloom sketch, the embed leg
  * broadcasts the bounded bench vectors; the matrix itself is three
  * bench-bounded rollups joined on a |bench|-row spine. */
object DecontaminateMatrix {

  def qDecontaminateMatrix(spark: SparkSession, dir: String,
                           benchMaxId: Long = 5): DataFrame = {
    val spine = t(spark, dir, "documents")
      .filter(col("doc_id") <= benchMaxId)
      .select(col("doc_id").as("bench_id"))
      .union(t(spark, dir, "embeddings")
        .filter(col("vec_id") <= benchMaxId)
        .select(col("vec_id").as("bench_id")))
      .distinct()
    def hits(df: DataFrame, as: String): DataFrame =
      df.groupBy("bench_id").agg(count(lit(1)).as(as))
    val gram = hits(Dedup.decontaminate(spark, dir, benchMaxId), "g")
    val bloom = hits(Bloom.decontaminateBloom(spark, dir, benchMaxId), "b")
    val embed = hits(Dedup.qDecontaminateEmbed(spark, dir, benchMaxId), "e")
    spine
      .join(gram, Seq("bench_id"), "left")
      .join(bloom, Seq("bench_id"), "left")
      .join(embed, Seq("bench_id"), "left")
      .select(col("bench_id"),
        coalesce(col("g"), lit(0L)).as("n_gram_hits"),
        coalesce(col("b"), lit(0L)).as("n_bloom_hits"),
        coalesce(col("e"), lit(0L)).as("n_embed_hits"),
        (coalesce(col("g"), lit(0L)) + coalesce(col("b"), lit(0L)) +
          coalesce(col("e"), lit(0L)) > 0).as("any_hit"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_decontaminate_matrix" ->
      ((s: SparkSession, d: String) => qDecontaminateMatrix(s, d)))

  val oracleSql: Map[String, String] = Map(
    "dedup_decontaminate_matrix" ->
      s"""WITH spine AS (
         |  SELECT DISTINCT doc_id AS bench_id FROM documents WHERE doc_id <= 5
         |  UNION
         |  SELECT DISTINCT vec_id FROM embeddings WHERE vec_id <= 5),
         |gs AS (SELECT doc_id, unnest(list_distinct(list_transform(
         |    range(1, len(text) - 3), i -> substr(text, CAST(i AS INT), 5)))) AS g
         |  FROM (SELECT doc_id, ${Dedup.NT} AS text FROM documents)),
         |gram_pairs AS (
         |  SELECT c.doc_id, b.doc_id AS bench_id
         |  FROM gs c JOIN gs b ON c.g = b.g
         |  WHERE b.doc_id <= 5 AND c.doc_id > 5
         |  GROUP BY c.doc_id, b.doc_id
         |  HAVING count(*) >= 20),
         |gram AS (SELECT bench_id, count(*) AS n FROM gram_pairs GROUP BY 1),
         |embed_pairs AS (
         |  SELECT vec_id, bench_id FROM (
         |    SELECT e.vec_id, b.vec_id AS bench_id,
         |      ${VectorOps.cosineSql("b.embedding", "e.embedding")} AS cs
         |    FROM embeddings e JOIN embeddings b
         |      ON b.vec_id <= 5 AND e.vec_id > 5 AND b.vec_id != e.vec_id)
         |  WHERE cs >= 0.35),
         |embed AS (SELECT bench_id, count(*) AS n FROM embed_pairs GROUP BY 1)
         |SELECT s.bench_id,
         |  COALESCE(g.n, 0) AS n_gram_hits,
         |  COALESCE(g.n, 0) AS n_bloom_hits,
         |  COALESCE(e.n, 0) AS n_embed_hits,
         |  (COALESCE(g.n, 0) + COALESCE(g.n, 0) + COALESCE(e.n, 0)) > 0 AS any_hit
         |FROM spine s
         |LEFT JOIN gram g ON g.bench_id = s.bench_id
         |LEFT JOIN embed e ON e.bench_id = s.bench_id""".stripMargin)
}
