package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t
import graft.pipeline.Splits.nibbleHashSql

/** Training-mix composition: downsample each source domain to a target
  * rate so the corpus matches a prescribed mixture (the step that turns
  * "whatever we crawled" into "the mix we train on").
  *
  * Same scale contract as Splits: the gate is a pure per-row hash
  * decision — no RNG state, no sampling pass, no shuffle before the
  * gate — so rows die inside the scan's own stage and the sample is
  * stable across reruns and engines. Rates are per-source literals
  * here; a production run would join a tiny broadcast rate table
  * instead, the gate expression is unchanged.
  */
object Mix {

  /** Keep-rate percent per source parity: even-numbered sources are
    * "high-quality" domains kept at 75%, odd ones downsampled to 25%. */
  private val EVEN_RATE = 75
  private val ODD_RATE = 25

  private def rateSql(srcNumExpr: String): String =
    s"CASE WHEN ($srcNumExpr) % 2 = 0 THEN $EVEN_RATE ELSE $ODD_RATE END"

  /** Mixed-corpus composition report: per source, corpus size before
    * and after the gate plus the realized rate — the numbers a mix
    * dashboard shows. One pass, one partial-agg shuffle on source. */
  def qMix(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .withColumn("src_num", expr("CAST(substr(source, 4, 10) AS INT)"))
      .withColumn("kept",
        expr(s"${nibbleHashSql("cast(doc_id as string)")} % 100") <
          expr(rateSql("src_num")))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"))
      .withColumn("realized_rate",
        round(col("n_kept").cast("double") / col("n_docs"), 6))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pipeline_mix" -> (qMix _))

  val oracleSql: Map[String, String] = Map(
    "pipeline_mix" ->
      s"""SELECT source, n_docs, n_kept,
         |  round(CAST(n_kept AS DOUBLE) / n_docs, 6) AS realized_rate
         |FROM (
         |  SELECT source, count(*) AS n_docs,
         |    CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
         |  FROM (
         |    SELECT source,
         |      ${nibbleHashSql("CAST(doc_id AS VARCHAR)")} % 100 <
         |        ${rateSql("CAST(substr(source, 4, 10) AS INT)")} AS kept
         |    FROM documents)
         |  GROUP BY source)""".stripMargin)
}
