package graft.functions

import graft.clustering.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Pins graft.functions.SquaredL2D bitwise to the DOUBLE HOF fold it
  * replaces in the high-dim k-means assign kernel:
  *   aggregate(zip_with(a, b, (x,y) -> (x-y)*(x-y)), 0.0D, (acc,v) -> acc+v)
  * — the exact left-to-right accumulation the unrolled per-dim oracles
  * mirror. Bitwise: compared via =!= on the raw doubles (no
  * tolerance). */
class SquaredL2DSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"

  private def d2Hof(a: String, b: String) =
    org.apache.spark.sql.functions.expr(
      s"aggregate(zip_with($a, $b, (x, y) -> (x - y) * (x - y)), " +
        "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)")

  test("native squared_l2d equals the double HOF fold bitwise on real embeddings") {
    import org.apache.spark.sql.functions._
    val e = graft.Tables.t(spark, sf, "embeddings")
      .select(col("vec_id"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
    val ev = e.filter(col("vec_id") <= 5)
      .select(col("vec_id").as("e_id"), col("v").as("evv"))
    val diff = e.join(broadcast(ev), col("e_id") =!= col("vec_id"))
      .select(
        GraftFunctions.squaredL2D(col("evv"), col("v")).as("native"),
        d2Hof("evv", "v").as("hof"))
      .filter(col("native") =!= col("hof") ||
        col("native").isNull =!= col("hof").isNull)
    assert(diff.count() == 0, "native expression must reproduce the double HOF fold bitwise")
  }

  test("assign over 64-dim centers is unchanged by the native kernel") {
    import org.apache.spark.sql.functions._
    // the consumer-level pin: nearest-center index and distance of the
    // packed-array path must match the HOF formulation on every row
    val pts = graft.clustering.Points.embeddings64(spark, sf)
    val ds = graft.clustering.Points.embedDims
    val centers = graft.clustering.Points.firstKCenters(pts, 4, ds)
    val native = graft.clustering.KMeans.assign(pts, centers, ds)
      .select(col("pid"), col("k"), col("dist"))
    val hofDist = centers.map { c =>
      sqrt(aggregate(
        zip_with(col("__xs"), typedLit(c), (x, cj) => { val d = x - cj; d * d }),
        lit(0.0), (acc, v) => acc + v))
    }
    val hof = pts.withColumn("__xs", array(ds.map(col): _*))
      .withColumn("dist_arr", array(hofDist: _*))
      .withColumn("dist", array_min(col("dist_arr")))
      .withColumn("k", (array_position(col("dist_arr"), col("dist")) - 1).cast("int"))
      .select(col("pid").as("h_pid"), col("k").as("h_k"), col("dist").as("h_dist"))
    val joined = native.join(hof, col("pid") === col("h_pid"))
    assert(joined.filter(col("k") =!= col("h_k") || col("dist") =!= col("h_dist"))
      .count() == 0, "assign must be bitwise-unchanged by the native kernel")
    assert(joined.count() == native.count())
  }

  test("SQL-registered, null- and mismatch-safe like zip_with") {
    val df = Seq(
      (1L, Some(Array(1.0, 2.0, 3.5)), Some(Array(1.0, 5.0, 1.25))),
      (2L, Some(Array(1.0, 2.0)), Some(Array(1.0))), // length mismatch
      (3L, None, Some(Array(1.0, 2.0)))) // null input
      .toDF("id", "a", "b")
    df.createOrReplaceTempView("t_sqld")
    val out = spark.sql("SELECT id, squared_l2d(a, b) AS d FROM t_sqld")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(out(1L) === Some(0.0 + 9.0 + 2.25 * 2.25))
    assert(out(2L) === None)
    assert(out(3L) === None)
  }
}
