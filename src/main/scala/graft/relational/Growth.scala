package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Month-over-month revenue growth: the period-over-period report
  * every revenue dashboard leads with — monthly revenue, the previous
  * month, percent growth, and the trailing 3-month total (the smoothed
  * companion the MoM noise is read against). Complements the existing
  * time-series family (daily cumulative, 30-day rolling, weekday
  * index, Holt forecast) at the calendar-month grain none of them
  * reports.
  *
  * Determinism: revenue quantizes to cents at read and sums in
  * BIGINT; growth_pct is (rev - prev) * 100 / prev — double division
  * of exact integers in one IEEE op chain, rounded 6; the lag/rolling
  * windows run over the calendar-month frame (~80 rows, bounded by
  * the date span, not the corpus).
  *
  * Scale shape: one scan into a month-bounded aggregate; windows only
  * over the bounded month frame. */
object Growth {

  def qMomGrowth(spark: SparkSession, dir: String): DataFrame =
    momGrowthOf(t(spark, dir, "orders")
      .select(date_format(col("o_orderdate"), "yyyy-MM").as("month"),
        expr("CAST(round(o_totalprice * 100.0) AS BIGINT)").as("cents")))

  /** [[qMomGrowth]] over any (month: 'yyyy-MM', cents) frame. */
  private[relational] def momGrowthOf(rows: DataFrame): DataFrame = {
    val monthly = rows.groupBy("month").agg(sum("cents").as("rev_cents"))
    val byMonth = Window.orderBy("month")
    val rolling = Window.orderBy("month").rowsBetween(-2, 0)
    monthly
      .withColumn("prev_rev_cents", lag("rev_cents", 1).over(byMonth))
      .withColumn("rev_3m_cents", sum("rev_cents").over(rolling))
      .select(col("month"), col("rev_cents"), col("prev_rev_cents"),
        round(expr(
          "CAST(rev_cents - prev_rev_cents AS DOUBLE) * 100.0 / prev_rev_cents"),
          6).as("growth_pct"),
        col("rev_3m_cents"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "orders_mom_growth" -> (qMomGrowth _))

  val oracleSql: Map[String, String] = Map(
    "orders_mom_growth" ->
      """WITH m AS (
        |  SELECT strftime(o_orderdate, '%Y-%m') AS month,
        |    sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS rev_cents
        |  FROM orders GROUP BY 1)
        |SELECT month, rev_cents,
        |  lag(rev_cents, 1) OVER (ORDER BY month) AS prev_rev_cents,
        |  round(CAST(rev_cents - lag(rev_cents, 1) OVER (ORDER BY month)
        |        AS DOUBLE) * 100.0
        |    / lag(rev_cents, 1) OVER (ORDER BY month), 6) AS growth_pct,
        |  sum(rev_cents) OVER (ORDER BY month
        |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS rev_3m_cents
        |FROM m""".stripMargin)
}
