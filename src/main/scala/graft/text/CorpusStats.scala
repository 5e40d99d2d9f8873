package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Corpus-level statistics a training-data pipeline reports before and
  * after every filtering stage: the vocabulary head, a unigram-LM
  * quality score, and the per-source composition report.
  *
  * Scale shapes: vocabulary aggregation is ONE map-side-combined
  * shuffle on the word key (the classic word-count plan — partial
  * counts per partition, tiny merged state); the top-20 head is a
  * TakeOrderedAndProject, never a global sort. The unigram scorer
  * re-joins the exploded corpus to the vocabulary on the word key —
  * an equi-join that co-partitions both sides by word, no broadcast
  * needed, so it holds when the vocabulary itself is huge.
  */
object CorpusStats {

  private val TOPK = 20

  /** Corpus vocabulary head: the TOPK most frequent words with their
    * occurrence and document frequencies. */
  def qVocabTopK(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .groupBy("word")
      .agg(count(lit(1)).as("n_occurrences"), countDistinct("doc_id").as("n_docs"))
      .orderBy(col("n_occurrences").desc, col("word").asc)
      .limit(TOPK)

  /** Unigram-LM document quality score: mean log2 corpus probability
    * of the document's words — the cheapest "does this read like the
    * corpus" signal (public LM reports gate on exactly this family of
    * scores). No smoothing needed: every word in every document is by
    * construction in the corpus vocabulary. */
  def qUnigramLogprob(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    // corpus totals as a broadcast 1-row aggregate (no separate job)
    val words = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
    val totals = words.agg(count(lit(1)).cast("double").as("__t"))
    val vocab = words.groupBy("word").agg(count(lit(1)).as("c"))
    words.join(vocab, "word").crossJoin(broadcast(totals))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"),
        round(avg(log2(col("c") / col("__t"))), 6).as("avg_log2p"))
  }

  /** Per-source composition report: what a mix dashboard shows after
    * every pipeline stage. One partial-aggregated shuffle on source. */
  def qCorpusReport(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(size(split(col("text"), " "))).cast("long").as("n_words"),
        round(avg(col("n_chars")), 6).as("avg_chars"),
        countDistinct("lang").as("n_langs"))

  /** Per-language adaptive quality thresholds: the median TTR of each
    * language's documents becomes that language's gate (fixed global
    * thresholds misfire across languages — the standard fix is
    * per-stratum quantile cutoffs). Two aggregates: the per-lang
    * median (exact interpolated percentile, tiny result joined back —
    * Catalyst broadcasts it) and the below-threshold count. */
  def qLangThresholds(spark: SparkSession, dir: String): DataFrame = {
    val d = t(spark, dir, "documents")
      .withColumn("ws", split(col("text"), " "))
      .select(col("doc_id"), col("lang"),
        (size(array_distinct(col("ws"))).cast("double") / size(col("ws"))).as("ttr"))
    val med = d.groupBy("lang").agg(expr("percentile(ttr, 0.5)").as("med"))
    d.join(broadcast(med), "lang")
      .groupBy("lang")
      .agg(round(min("med"), 6).as("median_ttr"),
        count(lit(1)).as("n_docs"),
        sum(when(col("ttr") < col("med"), 1L).otherwise(0L)).as("n_below"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_vocab_topk" -> (qVocabTopK _),
    "text_unigram_logprob" -> (qUnigramLogprob _),
    "pipeline_corpus_report" -> (qCorpusReport _),
    "text_lang_thresholds" -> (qLangThresholds _))

  val oracleSql: Map[String, String] = Map(
    "text_vocab_topk" ->
      s"""SELECT word, count(*) AS n_occurrences,
         |  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
         |FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents)
         |GROUP BY word
         |ORDER BY n_occurrences DESC, word ASC
         |LIMIT $TOPK""".stripMargin,
    "text_unigram_logprob" ->
      """WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
        |t AS (SELECT CAST(count(*) AS DOUBLE) AS t FROM w),
        |v AS (SELECT word, count(*) AS c FROM w GROUP BY word)
        |SELECT doc_id, count(*) AS n_words,
        |  round(avg(log2(c / t)), 6) AS avg_log2p
        |FROM w JOIN v USING (word) CROSS JOIN t
        |GROUP BY doc_id""".stripMargin,
    "pipeline_corpus_report" ->
      """SELECT source, count(*) AS n_docs,
        |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_words,
        |  round(avg(n_chars), 6) AS avg_chars,
        |  CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
        |FROM documents GROUP BY source""".stripMargin,
    "text_lang_thresholds" ->
      """WITH d AS (SELECT doc_id, lang,
        |    CAST(len(list_distinct(ws)) AS DOUBLE) / len(ws) AS ttr
        |  FROM (SELECT doc_id, lang, string_split(text, ' ') AS ws FROM documents)),
        |m AS (SELECT lang, quantile_cont(ttr, 0.5) AS med FROM d GROUP BY lang)
        |SELECT lang, round(min(med), 6) AS median_ttr, count(*) AS n_docs,
        |  CAST(sum(CASE WHEN ttr < med THEN 1 ELSE 0 END) AS BIGINT) AS n_below
        |FROM d JOIN m USING (lang) GROUP BY lang""".stripMargin)
}
