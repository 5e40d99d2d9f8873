package graft.functions

import graft.clustering.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class UnitMicroQuantSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"

  // the declarative chain the isotropy oracle mirrors — the reference
  // the native expression must reproduce bitwise
  private val nrmHof =
    """sqrt(aggregate(transform(embedding,
      |  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
      |  CAST(0 AS DOUBLE), (a, v) -> a + v))""".stripMargin
  private val qsHof =
    """transform(embedding, x -> CAST(CASE WHEN (CAST(x AS DOUBLE) / nrm) >= 0
      | THEN  floor((CAST(x AS DOUBLE) / nrm) * 1000000.0 + 0.5)
      | ELSE -floor(-((CAST(x AS DOUBLE) / nrm) * 1000000.0) + 0.5)
      | END AS BIGINT))""".stripMargin.replace("\n", "")
  private val tHof = "aggregate(qs, CAST(0 AS BIGINT), (a, v) -> a + v * v)"

  test("native unit_micro_quant equals the HOF chain bitwise on real embeddings") {
    import org.apache.spark.sql.functions._
    val hof = graft.Tables.t(spark, sf, "embeddings")
      .withColumn("nrm", expr(nrmHof)).filter(col("nrm") > 0)
      .withColumn("qs", expr(qsHof)).withColumn("t", expr(tHof))
      .select("vec_id", "qs", "t")
    val native = graft.Tables.t(spark, sf, "embeddings")
      .withColumn("u", GraftFunctions.unitMicroQuant(col("embedding")))
      .filter(col("u").isNotNull)
      .select(col("vec_id"), col("u.qs").as("qs"), col("u.t").as("t"))
    assert(native.count() == hof.count(), "same surviving rows")
    val diff = native.alias("n").join(hof.alias("h"), "vec_id")
      .filter(expr("n.qs <> h.qs OR n.t <> h.t"))
    assert(diff.count() == 0, "native must reproduce the HOF chain bitwise")
  }

  test("null element, null array and zero vector yield NULL (= the filtered rows)") {
    val df = Seq(
      (1L, Some(Seq(Some(3.0f), Some(4.0f)))),        // unit-quantizes
      (2L, Some(Seq(Some(0.0f), Some(0.0f)))),        // zero norm -> null
      (3L, Some(Seq(Some(1.0f), None))),              // null element -> null
      (4L, None: Option[Seq[Option[Float]]]))         // null array -> null
      .toDF("id", "embedding")
    df.createOrReplaceTempView("t_umq")
    val out = spark.sql(
      "SELECT id, unit_micro_quant(embedding) AS u FROM t_umq")
      .collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(!out(1L) && out(2L) && out(3L) && out(4L))
    val row = spark.sql(
      "SELECT u.qs, u.t FROM (SELECT unit_micro_quant(embedding) AS u FROM t_umq WHERE id = 1)")
      .collect().head
    assert(row.getSeq[Long](0) == Seq(600000L, 800000L)) // 3/5, 4/5 in micro-units
    assert(row.getLong(1) == 600000L * 600000L + 800000L * 800000L)
  }

  test("the quantize stage stays inside WholeStageCodegen") {
    import org.apache.spark.sql.functions._
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = graft.Tables.t(spark, sf, "embeddings")
        .select(GraftFunctions.unitMicroQuant(col("embedding")).as("u"))
        .queryExecution.executedPlan
      val fused = plan.collect {
        case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
      }
      assert(fused.nonEmpty, s"expected WholeStageCodegen in:\n$plan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }
}
