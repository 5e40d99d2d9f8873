package graft.relational

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Count-Min sketch (Cormode-Muthukrishnan, from the public paper)
  * over the events stream: D independent hash rows x W buckets of
  * counts, point-estimate = min over rows of the hashed bucket's
  * count. Completes the sketch family next to HLL (distinct), GK
  * (quantiles), Bloom (membership) and freqItems (heavy hitters).
  *
  * Scale shape: the sketch build is ONE partial-aggregated shuffle on
  * (row, bucket) — D*W cells of merged state regardless of stream
  * size (at 100 TB the sketch is still 128 longs; partial aggregation
  * does the compression map-side). The estimate stage joins the tiny
  * sketch back broadcast. Hashes are md5-derived so the whole sketch —
  * build AND estimates — is deterministic and oracle-exact, unlike
  * the seeded builtins (HLL/GK are rows-only for exactly that reason).
  *
  * The one-sided guarantee (est >= exact, overestimate bounded by
  * collisions) is asserted both here (the `overestimate` column is
  * non-negative by construction of min-over-rows) and in NewOpsSpec.
  */
object CountMin {

  private val D = 4 // hash rows
  private val W = 32 // buckets per row

  /** Row-r bucket of a string key: the md5 family again (SURVEY §4) —
    * first 4 hex digits as an int, mod W. Identical in DuckDB. */
  private def bucket(r: Int, key: Column): Column =
    expr(s"CAST(conv(substr(md5(concat('$r:', ${key.toString()})), 1, 4), 16, 10) AS INT) % $W")

  private def bucketSql(r: Int, key: String): String = {
    // 4 hex nibbles -> int via the instr() hex-parse (the simhash
    // oracle's trick; DuckDB has no conv())
    val nib = (i: Int) =>
      s"(instr('0123456789abcdef', substr(md5(concat('$r:', $key)), $i, 1)) - 1)"
    s"(((${nib(1)} * 16 + ${nib(2)}) * 16 + ${nib(3)}) * 16 + ${nib(4)}) % $W"
  }

  /** Per-event-type frequency estimate from the sketch vs the exact
    * count: (event_type, est, exact, overestimate >= 0). */
  def qCountMin(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
    // sketch build: explode each event into its D (row, bucket) cells,
    // one map-side-combined shuffle -> D*W counter cells
    val sketch = ev.select(explode(array((0 until D).map(r =>
        struct(lit(r).as("r"), bucket(r, col("event_type")).as("b"))): _*)).as("c"))
      .groupBy(col("c.r").as("r"), col("c.b").as("b"))
      .agg(count(lit(1)).as("cnt"))
    // point estimates for the distinct keys: min over the D rows
    val keys = ev.groupBy("event_type").agg(count(lit(1)).as("exact"))
    val probes = keys.select(col("event_type"), col("exact"),
      explode(array((0 until D).map(r =>
        struct(lit(r).as("r"), bucket(r, col("event_type")).as("b"))): _*)).as("c"))
      .select(col("event_type"), col("exact"), col("c.r").as("r"), col("c.b").as("b"))
    probes.join(broadcast(sketch), Seq("r", "b"))
      .groupBy("event_type")
      .agg(min("exact").as("exact"), min("cnt").as("est"))
      .select(col("event_type"), col("est"), col("exact"),
        (col("est") - col("exact")).as("overestimate"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "events_countmin" -> (qCountMin _))

  val oracleSql: Map[String, String] = Map(
    "events_countmin" -> {
      val cells = (0 until D).map(r =>
        s"SELECT $r AS r, ${bucketSql(r, "event_type")} AS b FROM events")
        .mkString(" UNION ALL ")
      val probes = (0 until D).map(r =>
        s"SELECT event_type, exact, $r AS r, ${bucketSql(r, "event_type")} AS b FROM keys")
        .mkString(" UNION ALL ")
      s"""WITH sketch AS (
         |  SELECT r, b, count(*) AS cnt FROM ($cells) GROUP BY r, b),
         |keys AS (SELECT event_type, count(*) AS exact FROM events GROUP BY event_type),
         |probes AS ($probes)
         |SELECT event_type, min(cnt) AS est, min(exact) AS exact,
         |  min(cnt) - min(exact) AS overestimate
         |FROM probes JOIN sketch USING (r, b)
         |GROUP BY event_type""".stripMargin
    })
}
