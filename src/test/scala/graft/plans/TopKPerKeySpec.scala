package graft.plans

import graft.clustering.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class TopKPerKeySpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  /** Run `f` with TopKRewriteRule excluded, so a window formulation
    * stays a genuine INDEPENDENT oracle instead of being silently
    * rewritten into the very operator under test. */
  private def withoutRewrite[A](f: => A): A = {
    val key = "spark.sql.optimizer.excludedRules"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "graft.plans.TopKRewriteRule")
    try f finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("custom exec matches the window formulation exactly") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val df = Seq(
      (1L, 10L, 5.0), (1L, 11L, 7.0), (1L, 12L, 7.0), (1L, 13L, 1.0),
      (2L, 20L, 3.0), (3L, 30L, 9.0)).toDF("key", "id", "v")
    val custom = TopKPerKey(df, Seq("key"), "v", "id", 2)
      .select("key", "id", "rank").as[(Long, Long, Int)].collect().toSet
    val w = Window.partitionBy("key").orderBy(col("v").desc, col("id").asc)
    val declarative = withoutRewrite {
      val q = df.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 2)
        .select("key", "id", "rank")
      assert(!q.queryExecution.executedPlan.toString.contains("TopKPerKey"),
        "the reference must run as a real window, not the exec under test")
      q.as[(Long, Long, Int)].collect().toSet
    }
    assert(custom == declarative)
    // ties: key 1 has v=7.0 twice -> lower id wins rank 1
    assert(custom.contains((1L, 11L, 1)) && custom.contains((1L, 12L, 2)))
  }

  test("null, NaN and -Infinity order exactly like the window's DESC NULLS LAST") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val df = Seq(
      (1L, 10L, Some(5.0)), (1L, 11L, None), (1L, 12L, Some(-3.0)),
      (1L, 13L, Some(Double.NegativeInfinity)), (1L, 14L, Some(Double.NaN)))
      .toDF("key", "id", "v")
    val custom = TopKPerKey(df, Seq("key"), "v", "id", 5)
      .select("id", "rank").as[(Long, Int)].collect().toMap
    val w = Window.partitionBy("key").orderBy(col("v").desc_nulls_last, col("id").asc)
    val declarative = df.withColumn("rank", row_number().over(w))
      .select("id", "rank").as[(Long, Int)].collect().toMap
    assert(custom == declarative, s"custom $custom vs window $declarative")
    assert(custom(14L) == 1, "NaN is the largest double under Spark DESC")
    assert(custom(13L) == 4, "-Inf is a real value, before null")
    assert(custom(11L) == 5, "null sorts last")
  }

  test("null ties order like the window's tie ASC (Spark NULLS FIRST)") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    // equal values, one null tie, plus a genuine Long.MaxValue tie that
    // must NOT collide with any null sentinel
    val df = Seq(
      (1L, Some(10L), 5.0), (1L, None, 5.0), (1L, Some(Long.MaxValue), 5.0),
      (1L, Some(2L), 5.0))
      .toDF("key", "id", "v")
    val custom = TopKPerKey(df, Seq("key"), "v", "id", 4)
      .select("id", "rank").as[(Option[Long], Int)].collect().toMap
    val w = Window.partitionBy("key").orderBy(col("v").desc, col("id").asc)
    val declarative = df.withColumn("rank", row_number().over(w))
      .select("id", "rank").as[(Option[Long], Int)].collect().toMap
    assert(custom == declarative, s"custom $custom vs window $declarative")
    assert(custom(None) == 1, "null tie sorts FIRST under Spark asc")
    assert(custom(Some(Long.MaxValue)) == 4, "genuine MaxValue tie sorts last, after real ties")
  }

  test("non-double value column fails fast with a clear message") {
    val df = Seq((1L, 2L, 3)).toDF("key", "id", "v")
    val e = intercept[IllegalArgumentException] {
      TopKPerKey(df, Seq("key"), "v", "id", 1)
    }
    assert(e.getMessage.contains("must be double"))
  }

  test("physical plan contains the custom exec and exactly one shuffle") {
    val df = graft.Tables.t(spark, "/root/testdata/sf0.001", "orders")
      .select("o_custkey", "o_orderkey", "o_totalprice")
    val plan = TopKPerKey(df, Seq("o_custkey"), "o_totalprice", "o_orderkey", 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), plan.take(300))
    assert("Exchange".r.findAllIn(plan).size == 1, "exactly one hash shuffle expected")
  }

  test("optimizer rule rewrites the declarative window idiom to the custom exec") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val df = graft.Tables.t(spark, "/root/testdata/sf0.001", "orders")
      .select("o_custkey", "o_orderkey", "o_totalprice")
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    val declarative = df.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
    val plan = declarative.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), plan.take(400))
    assert(!plan.contains("WindowExec"), "the window (and its sort) must be gone")
    // and the rewritten result equals the explicitly-constructed operator
    val direct = TopKPerKey(df, Seq("o_custkey"), "o_totalprice", "o_orderkey", 3)
    assert(declarative.collect().map(_.toSeq).toSet ==
      direct.collect().map(_.toSeq).toSet)
  }

  test("optimizer rule leaves non-conforming windows alone (string tie, no partition)") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val df = Seq((1L, "a", 2.0), (1L, "b", 1.0)).toDF("key", "name", "v")
    val stringTie = df.withColumn("rank", row_number().over(
        Window.partitionBy("key").orderBy(col("v").desc, col("name").asc)))
      .filter(col("rank") <= 1)
    assert(!stringTie.queryExecution.executedPlan.toString.contains("TopKPerKey"))
    assert(stringTie.collect().map(_.getString(1)).toSeq == Seq("a"))
    val noPartition = df.withColumn("rank", row_number().over(
        Window.orderBy(col("v").desc, col("key").asc)))
      .filter(col("rank") <= 1)
    assert(!noPartition.queryExecution.executedPlan.toString.contains("TopKPerKey"))
  }

  test("buffer pruning keeps results correct when groups exceed 2k rows") {
    val rng = new scala.util.Random(5)
    val rows = (1 to 500).map(i => (i % 3L, i.toLong, rng.nextDouble()))
    val df = rows.toDF("key", "id", "v")
    val custom = TopKPerKey(df, Seq("key"), "v", "id", 4)
      .select("key", "id").as[(Long, Long)].collect().toSet
    val expect = rows.groupBy(_._1).toSeq.flatMap { case (k, g) =>
      g.sortBy(r => (-r._3, r._2)).take(4).map(r => (k, r._2))
    }.toSet
    assert(custom == expect)
  }
}
