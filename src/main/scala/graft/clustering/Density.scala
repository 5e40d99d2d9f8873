package graft.clustering

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Grid-based density clustering (the GDBSCAN / grid-DBSCAN shape,
  * from the public DBSCAN literature): points land in fixed-width grid
  * cells, cells denser than a threshold are "core", and core cells
  * that touch (8-neighborhood) merge into clusters — the density
  * complement to the centroid family (k-means/GKA/PSO find convex
  * blobs; density clustering finds arbitrary-shape regions and
  * isolates sparse noise).
  *
  * This is the scale-correct DBSCAN reduction: per-point work is one
  * codegen'd floor() pair (no neighbor search), the per-cell count is
  * one partial-aggregated shuffle on the cell key, and cell-adjacency
  * edges come from an equi-join of each core cell's 8 neighbor keys
  * against the core-cell set. The GRID bounds the remaining state:
  * like the K centers of Lloyd's loop, the cell graph is tiny no
  * matter how large the data, so the final merge is an exact
  * driver-side union-find over the collected cell edges — full
  * transitive components (a fixed-sweep distributed propagation would
  * under-merge long cell chains), with data never leaving executors.
  * The oracle mirrors the exact components with a recursive CTE.
  */
object Density {

  private val QTY_W = 5.0 // cell width in l_quantity
  private val PRICE_W = 5000.0 // cell width in l_extendedprice

  /** Core cells: occupied cells with count >= half the mean occupied-
    * cell count (a RELATIVE threshold, so the operator behaves the
    * same across scale factors; fixed absolute minPts would flip
    * between all-dense and all-sparse as the data grows). */
  private def coreCells(spark: SparkSession, dir: String): DataFrame = {
    val cells = t(spark, dir, "lineitem")
      .select(floor(col("l_quantity") / QTY_W).cast("long").as("cx"),
        floor(col("l_extendedprice") / PRICE_W).cast("long").as("cy"))
      .groupBy("cx", "cy")
      .agg(count(lit(1)).as("n_points"))
    val thr = cells.agg((sum("n_points").cast("double") / count(lit(1)) / 2.0).as("__thr"))
    cells.crossJoin(broadcast(thr)).filter(col("n_points").cast("double") >= col("__thr"))
      .select(col("cx"), col("cy"), col("n_points"))
  }

  /** Density clusters: (cx, cy, n_points, cluster_id) where cluster_id
    * is the min cell key of the cell's connected core component. */
  def qDensityGrid(spark: SparkSession, dir: String): DataFrame = {
    val core = coreCells(spark, dir)
    // Disjoint-bitfield cell key: (cx << 32) | (cy & 0xffffffff) is
    // injective for any 32-bit cell coordinates, negative included —
    // a cx*K + cy pack silently aliases distinct cells once cy leaves
    // [0, K), merging unrelated clusters.
    def pack(cx: org.apache.spark.sql.Column, cy: org.apache.spark.sql.Column) =
      shiftleft(cx, 32).bitwiseOR(cy.bitwiseAND(lit(0xffffffffL)))
    val keyed = core.withColumn("id", pack(col("cx"), col("cy"))).cache()
    // 8-neighborhood edges among core cells: emit neighbor keys,
    // equi-join against the core set (linear in core-cell count)
    val offsets = for (dx <- -1 to 1; dy <- -1 to 1 if dx != 0 || dy != 0) yield (dx, dy)
    val nbr = keyed.select(col("id").as("ia"), explode(array(offsets.map { case (dx, dy) =>
      pack(col("cx") + dx, col("cy") + dy)
    }: _*)).as("ib"))
    val edges = nbr.join(keyed.select(col("id").as("ib")), "ib")
      .filter(col("ia") < col("ib"))
      .select("ia", "ib")
    // grid-bounded state crosses the driver: cell ids + cell edges
    // (like K centers — NOT the data); exact union-find, min-key roots
    val ids = keyed.select("id").collect().map(_.getLong(0))
    val parent = scala.collection.mutable.Map(ids.map(i => i -> i): _*)
    def find(x: Long): Long = { var r = x; while (parent(r) != r) r = parent(r); r }
    edges.collect().foreach { r =>
      val (ra, rb) = (find(r.getLong(0)), find(r.getLong(1)))
      if (ra != rb) { val (lo, hi) = (math.min(ra, rb), math.max(ra, rb)); parent(hi) = lo }
    }
    import spark.implicits._
    val roots = ids.toSeq.map(i => (i, find(i))).toDF("id", "cluster_id")
    val out = keyed.join(broadcast(roots), "id")
      .select(col("cx"), col("cy"), col("n_points"), col("cluster_id"))
    // materialize, then release the cell cache (KMeans.lloyd's trick)
    val rows = out.collect()
    val schema = out.schema
    keyed.unpersist()
    spark.createDataFrame(spark.sparkContext.parallelize(rows.toSeq, 1), schema)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "cluster_density_grid" -> (qDensityGrid _))

  val oracleSql: Map[String, String] = Map(
    "cluster_density_grid" -> {
      val nbrUnion = (for (dx <- -1 to 1; dy <- -1 to 1 if dx != 0 || dy != 0) yield
        s"SELECT id AS ia, (cx + $dx) * 4294967296 + ((cy + $dy) & 4294967295) AS ib FROM keyed")
        .mkString(" UNION ALL ")
      s"""WITH RECURSIVE cells AS (
         |  SELECT CAST(floor(l_quantity / $QTY_W) AS BIGINT) AS cx,
         |    CAST(floor(l_extendedprice / $PRICE_W) AS BIGINT) AS cy,
         |    count(*) AS n_points
         |  FROM lineitem GROUP BY 1, 2),
         |thr AS (SELECT CAST(sum(n_points) AS DOUBLE) / count(*) / 2.0 AS t FROM cells),
         |core AS (SELECT cx, cy, n_points FROM cells CROSS JOIN thr
         |  WHERE CAST(n_points AS DOUBLE) >= t),
         |keyed AS (SELECT cx, cy, n_points,
         |  cx * 4294967296 + (cy & 4294967295) AS id FROM core),
         |nbr AS ($nbrUnion),
         |edges AS (SELECT nbr.ia, nbr.ib FROM nbr
         |  JOIN keyed k ON nbr.ib = k.id WHERE nbr.ia < nbr.ib),
         |e2 AS (SELECT ia AS s, ib AS d FROM edges
         |       UNION ALL SELECT ib AS s, ia AS d FROM edges),
         |reach(node, r) AS (
         |  SELECT id, id FROM keyed
         |  UNION
         |  SELECT e2.s, reach.r FROM reach JOIN e2 ON e2.d = reach.node)
         |SELECT k.cx, k.cy, k.n_points, m.cluster_id
         |FROM keyed k JOIN (
         |  SELECT node, min(r) AS cluster_id FROM reach GROUP BY node) m
         |ON m.node = k.id""".stripMargin
    })
}
