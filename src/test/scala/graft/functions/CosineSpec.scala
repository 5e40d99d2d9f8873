package graft.functions

import graft.clustering.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class CosineSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"

  test("native cosine equals the HOF formulation bitwise on real embeddings") {
    import org.apache.spark.sql.functions._
    val e = graft.Tables.t(spark, sf, "embeddings")
    val q = e.filter(col("vec_id") <= 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("qe"))
    val pairs = e.join(broadcast(q), col("q_id") =!= col("vec_id"))
    val diff = pairs.select(
      VectorOps.cosine("qe", "embedding").as("native"),
      VectorOps.cosineHof("qe", "embedding").as("hof"))
      .filter(col("native") =!= col("hof") ||
        col("native").isNull =!= col("hof").isNull)
    assert(diff.count() == 0, "native expression must reproduce the HOF fold bitwise")
  }

  test("native cosine on DOUBLE arrays equals the HOF fold bitwise") {
    // the round-11 double-element path (projected-space search): same
    // left-to-right fold, no float conversion
    import org.apache.spark.sql.functions._
    val rows = Seq(
      (1L, Array(0.5, -1.25, 3.0), Array(2.0, 0.125, -0.75)),
      (2L, Array(1e-300, 1e300, -1.0), Array(1e300, 1e-300, 1.0)),
      (3L, Array(0.1, 0.2, 0.3), Array(0.1, 0.2, 0.3)))
      .toDF("id", "a", "b")
    val dotHof = (x: String, y: String) => expr(
      s"aggregate(zip_with($x, $y, (p, q) -> p * q), CAST(0 AS DOUBLE), (acc, v) -> acc + v)")
    val diff = rows.select(
      GraftFunctions.cosineSim(col("a"), col("b")).as("native"),
      (dotHof("a", "b") / (sqrt(dotHof("a", "a")) * sqrt(dotHof("b", "b")))).as("hof"))
      .filter(col("native") =!= col("hof"))
    assert(diff.count() == 0, "double-array path must reproduce the HOF fold bitwise")
  }

  test("native cosine is SQL-registered and null/mismatch-safe") {
    val df = Seq(
      (1L, Some(Array(1.0f, 2.0f)), Some(Array(1.0f, 2.0f))),
      (2L, Some(Array(1.0f, 2.0f)), Some(Array(1.0f))), // length mismatch
      (3L, None, Some(Array(1.0f, 2.0f)))) // null input
      .toDF("id", "a", "b")
    df.createOrReplaceTempView("t_cos")
    val out = spark.sql("SELECT id, cosine_sim(a, b) AS cs FROM t_cos")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(math.abs(out(1L).get - 1.0) < 1e-12)
    assert(out(2L).isEmpty, "length mismatch -> null, like zip_with")
    assert(out(3L).isEmpty, "null input -> null")
  }

  test("zero vectors yield NaN (0/0), matching double division semantics") {
    val df = Seq((Array(0.0f, 0.0f), Array(1.0f, 2.0f))).toDF("a", "b")
    val v = df.select(GraftFunctions.cosineSim(
      org.apache.spark.sql.functions.col("a"),
      org.apache.spark.sql.functions.col("b"))).collect().head.getDouble(0)
    assert(v.isNaN)
  }

  test("the scoring stage stays inside WholeStageCodegen") {
    import org.apache.spark.sql.functions._
    // AQE wraps the plan and hides codegen spans until execution;
    // disable it for the assertion only
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val e = graft.Tables.t(spark, sf, "embeddings")
      val q = e.filter(col("vec_id") <= 2)
        .select(col("vec_id").as("q_id"), col("embedding").as("qe"))
      val plan = e.join(broadcast(q), col("q_id") =!= col("vec_id"))
        .select(VectorOps.cosine("qe", "embedding").as("cs"))
        .queryExecution.executedPlan.toString
      // "*(n)" prefixes are the WholeStageCodegen span markers; the
      // scoring Project must carry one
      assert(plan.linesIterator.exists(l =>
        l.contains("cosine_sim") && l.trim.startsWith("*(")), plan.take(400))
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }
}
