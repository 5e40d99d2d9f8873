package graft.clustering

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables.t

/** Numeric point-set views over the testdata tables, playing the role
  * of the reference's CSV ingestion (kmeans.java:203-239 readDataset)
  * — but as a distributed DataFrame, never a driver array.
  *
  * pid = l_orderkey*10 + l_linenumber is unique and computable per-row,
  * so we get a stable point id with NO global sort / zipWithIndex —
  * at 100 TB a row_number() over a global order would be a
  * single-partition bottleneck.
  */
object Points {

  /** Dimension column names for the lineitem 4-D point set. */
  val dims: Seq[String] = Seq("x1", "x2", "x3", "x4")

  def lineitem4d(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem").select(
      (col("l_orderkey") * 10 + col("l_linenumber")).as("pid"),
      col("l_quantity").as("x1"),
      col("l_extendedprice").as("x2"),
      col("l_discount").as("x3"),
      col("l_tax").as("x4"))

  /** [[lineitem4d]] hash-spread by pid across the session's cores when
    * the backing parquet cannot feed them (single row group = ONE scan
    * task; see Tables.spreadIfNeeded). For the ITERATIVE consumers that
    * cache/checkpoint the point set and then run many jobs over it, the
    * one exchange amortizes over the whole loop (measured on local[32]
    * at sf0.1: gka_selection_wheel 2.96 -> 1.08 s, kmeans_mllib
    * 7.83 -> 2.66 s solo min-of-5). Hash-by-pid avoids round-robin's
    * sort-before-repartition pass and spreads evenly (pid is unique up
    * to tiny duplicate groups). Single-pass consumers keep the plain
    * loader — the exchange costs more than one pass saves. */
  def lineitem4dSpread(spark: SparkSession, dir: String): DataFrame =
    graft.Tables.spreadIfNeeded(spark, dir, "lineitem",
      lineitem4d(spark, dir), Some("pid"))

  /** Per-dimension min/max + count — the stats the reference computes
    * while reading (kmeans.java:219-230), as one distributed agg. */
  def stats(spark: SparkSession, dir: String): DataFrame = {
    val p = lineitem4d(spark, dir)
    p.agg(
      count(lit(1)).as("n"),
      dims.flatMap(d => Seq(min(col(d)).as(s"min_$d"), max(col(d)).as(s"max_$d"))): _*)
  }

  /** Squared-sum Euclidean distance from the point's dim columns to a
    * fixed center, mirrored operation-for-operation by the SQL oracles
    * (left-fold adds, x*x not pow) so results match bitwise.
    * Reference: kmeans.java:254-260 compute_dist. */
  def distTo(center: Array[Double], ds: Seq[String] = dims): Column =
    sqrt(ds.zip(center).map { case (d, cj) =>
      val diff = col(d) - lit(cj); diff * diff
    }.reduce(_ + _))

  /** 64-dim point view over the embeddings table: one double column per
    * dimension (cast float->double, exact) so the SAME generic k-means
    * operates on it. */
  val embedDims: Seq[String] = (1 to 64).map(i => s"e$i")

  def embeddings64(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "embeddings").select(
      col("vec_id").as("pid") +:
        (1 to 64).map(i => expr(s"CAST(element_at(embedding, $i) AS DOUBLE)").as(s"e$i")): _*)

  /** [[embeddings64]] hash-spread by pid when the backing parquet
    * cannot feed the session's cores — the embeddings twin of
    * [[lineitem4dSpread]], for ITERATIVE consumers that cache the
    * 64-dim point view and run several assign-shaped jobs over it
    * (every such job otherwise scans in the single row-group task).
    * Same opt-in bar: single-pass consumers keep the plain view. */
  def embeddings64Spread(spark: SparkSession, dir: String): DataFrame =
    graft.Tables.spreadIfNeeded(spark, dir, "embeddings",
      embeddings64(spark, dir), Some("pid"))

  val embedPtsSql: String =
    "SELECT vec_id AS pid, " +
      (1 to 64).map(i => s"CAST(embedding[$i] AS DOUBLE) AS e$i").mkString(", ") +
      " FROM embeddings"

  /** The first k points by (pid, dims) — deterministic replacement for
    * the reference's random center init (kmeans.java:240-248); the dim
    * tie-break keeps the choice stable because pid alone is not unique
    * in the testdata. Only k rows cross to the driver (TakeOrdered, no
    * full sort). */
  def firstKCenters(points: DataFrame, k: Int, ds: Seq[String] = dims): Array[Array[Double]] =
    points.orderBy(col("pid") +: ds.map(col): _*).limit(k)
      .select(ds.map(col): _*)
      .collect()
      .map(r => ds.indices.map(r.getDouble).toArray)

  /** Seeded-random center init — the distributed, reproducible analog
    * of the reference's create_center (kmeans.java:240-248, k
    * Math.random() draws from the dataset array): rank every row by a
    * seeded md5 of its pid — the same cross-engine determinism pattern
    * the split/sample hash gates use, so the draw is fully
    * oracle-checkable in DuckDB (hex strings compare identically in
    * both engines) — and take the first k. k distinct dataset points,
    * deterministic per seed, and only k rows cross to the driver
    * (TakeOrdered — no full sort, no driver-side dataset). */
  def randomRankSql(seed: Long): String =
    s"md5(concat('$seed-', CAST(pid AS STRING)))"

  def randomCenters(points: DataFrame, k: Int, seed: Long,
                    ds: Seq[String] = dims): Array[Array[Double]] =
    points.orderBy(expr(randomRankSql(seed)) +:
        (col("pid") +: ds.map(col)): _*)
      .limit(k)
      .select(ds.map(col): _*)
      .collect()
      .map(r => ds.indices.map(r.getDouble).toArray)

  /** Add a unique row id without any global sort: pid collides only
    * within tiny groups, so a pid-partitioned row_number (cheap, scales
    * — every partition is a handful of rows) disambiguates. Used by the
    * GA/PSO loops that must address a single gene/row.
    *
    * The *100 encoding holds 99 duplicates per pid; a larger group
    * would silently collide rids (and GKA's mutation would flip the
    * wrong gene), so the row fails LOUDLY instead of encoding. */
  def withRid(df: DataFrame, ds: Seq[String] = dims): DataFrame = {
    val w = Window.partitionBy("pid").orderBy(ds.map(col): _*)
    df.withColumn("__rn", row_number().over(w))
      .withColumn("rid",
        when(col("__rn") <= 99, col("pid") * 100 + col("__rn"))
          .otherwise(raise_error(concat(
            lit("pid group exceeds 99 rows, rid encoding would collide: pid="),
            col("pid").cast("string")))))
      .drop("__rn")
  }

  /** SQL fragment shared by the clustering oracles: the point set. */
  val ptsSql: String =
    "SELECT l_orderkey*10 + l_linenumber AS pid, l_quantity AS x1, " +
      "l_extendedprice AS x2, l_discount AS x3, l_tax AS x4 FROM lineitem"

}
