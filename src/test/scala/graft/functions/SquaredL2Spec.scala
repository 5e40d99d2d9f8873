package graft.functions

import graft.clustering.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class SquaredL2Spec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"

  // the HOF formulation the oracles mirror — the reference the native
  // expression must reproduce bitwise
  private def d2Hof(a: String, b: String) =
    org.apache.spark.sql.functions.expr(
      s"aggregate(zip_with($a, $b, (x, y) -> (x - y) * (x - y)), 0L, (acc, v) -> acc + v)")

  private val qvec =
    "transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT))"

  test("native squared_l2 equals the HOF fold bitwise on real quantized embeddings") {
    import org.apache.spark.sql.functions._
    val e = graft.Tables.t(spark, sf, "embeddings")
      .select(col("vec_id"), expr(qvec).as("q"))
    val ev = e.filter(col("vec_id") <= 5)
      .select(col("vec_id").as("e_id"), col("q").as("eq"))
    val diff = e.join(broadcast(ev), col("e_id") =!= col("vec_id"))
      .select(
        GraftFunctions.squaredL2(col("eq"), col("q")).as("native"),
        d2Hof("eq", "q").as("hof"))
      .filter(col("native") =!= col("hof") ||
        col("native").isNull =!= col("hof").isNull)
    assert(diff.count() == 0, "native expression must reproduce the HOF fold bitwise")
  }

  test("prefix variant equals the slice+zip_with formulation for every prefix") {
    import org.apache.spark.sql.functions._
    val e = graft.Tables.t(spark, sf, "embeddings")
      .select(col("vec_id"), expr(qvec).as("q"))
    val ev = e.filter(col("vec_id") <= 5)
      .select(col("vec_id").as("e_id"), col("q").as("eq"))
    val diff = e.join(broadcast(ev), col("e_id") =!= col("vec_id"))
      .withColumn("p", explode(lit(Array(8, 16, 32, 64))))
      .select(
        GraftFunctions.squaredL2Prefix(col("eq"), col("q"), col("p")).as("native"),
        d2Hof("slice(eq, 1, p)", "slice(q, 1, p)").as("hof"))
      .filter(col("native") =!= col("hof") ||
        col("native").isNull =!= col("hof").isNull)
    assert(diff.count() == 0, "prefix variant must reproduce slice+zip_with bitwise")
  }

  test("SQL-registered, null- and mismatch-safe like zip_with") {
    val df = Seq(
      (1L, Some(Array(1L, 2L, 3L)), Some(Array(1L, 5L, 1L))),
      (2L, Some(Array(1L, 2L)), Some(Array(1L))), // length mismatch
      (3L, None, Some(Array(1L, 2L)))) // null input
      .toDF("id", "a", "b")
    df.createOrReplaceTempView("t_sql2")
    val out = spark.sql("SELECT id, squared_l2(a, b) AS d FROM t_sql2")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(out(1L).contains(13L)) // 0 + 9 + 4
    assert(out(2L).isEmpty, "length mismatch -> null, like zip_with")
    assert(out(3L).isEmpty, "null input -> null")
    val p = spark.sql("SELECT squared_l2(a, b, 2) AS d FROM t_sql2 WHERE id = 1")
      .collect().head.getLong(0)
    assert(p == 9L) // first two components only
  }

  test("the scoring stage stays inside WholeStageCodegen") {
    import org.apache.spark.sql.functions._
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val e = graft.Tables.t(spark, sf, "embeddings")
        .select(col("vec_id"), expr(qvec).as("q"))
      val ev = e.filter(col("vec_id") <= 2)
        .select(col("vec_id").as("e_id"), col("q").as("eq"))
      val plan = e.join(broadcast(ev), col("e_id") =!= col("vec_id"))
        .select(GraftFunctions.squaredL2(col("eq"), col("q")).as("d2"))
        .queryExecution.executedPlan.toString
      assert(plan.linesIterator.exists(l =>
        l.contains("squared_l2") && l.trim.startsWith("*(")), plan.take(400))
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }
}
