package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Sliding-window DISTINCT users per hour — trailing-6h uniques beside
  * each hour's own uniques. The hard version of the sliding SUM the
  * engine already has (`events_sliding`): distinct counts don't
  * decompose over window panes, so the exact answer needs the
  * dedup-then-window shape — reduce the corpus to distinct
  * (user, hour) pairs FIRST (one hash shuffle, corpus-linear), then
  * fan each pair out to the <= 6 target hours it can serve via a
  * broadcast hour-frame range join (calendar-bounded), and count
  * distinct users per target hour over that bounded expansion.
  *
  * Determinism: pure integer/timestamp set arithmetic — counts exact.
  *
  * Scale shape: the only corpus-sized shuffle is the first distinct;
  * the range join fans out 6x the DISTINCT pair set (not the event
  * stream) against a ~720-row broadcast frame. */
object SlidingUniques {

  private val TRAIL = 6 // trailing window, hours

  def qSlidingUniques(spark: SparkSession, dir: String): DataFrame =
    slidingUniquesOf(t(spark, dir, "events")
      .select(col("user_id"), date_trunc("hour", col("ts")).as("hr")))

  /** [[qSlidingUniques]] over any (user_id, hr: TIMESTAMP) frame. */
  private[relational] def slidingUniquesOf(events: DataFrame): DataFrame = {
    val pairs = events.distinct()
    val hours = pairs.select(col("hr").as("h")).distinct()
    val fanned = pairs.join(broadcast(hours),
      col("hr") <= col("h") &&
        col("hr") >= col("h") - expr(s"INTERVAL ${TRAIL - 1} HOURS"))
    fanned.groupBy("h")
      .agg(countDistinct(when(col("hr") === col("h"), col("user_id")))
        .as("uniques_1h"),
        countDistinct("user_id").as("uniques_6h"))
      .select(col("h").as("hour"), col("uniques_1h"), col("uniques_6h"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "events_sliding_uniques" -> (qSlidingUniques _))

  val oracleSql: Map[String, String] = Map(
    "events_sliding_uniques" ->
      s"""WITH pairs AS (
         |  SELECT DISTINCT user_id, date_trunc('hour', ts) AS hr FROM events),
         |hours AS (SELECT DISTINCT hr AS h FROM pairs),
         |f AS (
         |  SELECT h, hr, user_id FROM pairs JOIN hours
         |    ON hr <= h AND hr >= h - INTERVAL ${TRAIL - 1} HOUR)
         |SELECT h AS hour,
         |  count(DISTINCT CASE WHEN hr = h THEN user_id END) AS uniques_1h,
         |  count(DISTINCT user_id) AS uniques_6h
         |FROM f GROUP BY h""".stripMargin)
}
