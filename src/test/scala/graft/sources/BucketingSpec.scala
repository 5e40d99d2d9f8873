package graft.sources

import java.nio.file.Files

import graft.clustering.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Proves the SURVEY §5 co-location claim: joining two tables bucketed
  * on the join key plans with ZERO Exchange — the pattern that removes
  * the fact-fact shuffle at 100 TB. */
class BucketingSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark

  test("join of co-bucketed tables plans without a shuffle") {
    val dir = Files.createTempDirectory("graft_buckets").toString
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val orders = graft.Tables.t(spark, "/root/testdata/sf0.001", "orders")
      orders.write.bucketBy(8, "o_custkey").sortBy("o_custkey")
        .option("path", s"$dir/o1").saveAsTable("g_orders1")
      orders.groupBy("o_custkey")
        .agg(org.apache.spark.sql.functions.sum("o_totalprice").as("total"))
        .write.bucketBy(8, "o_custkey")
        .option("path", s"$dir/o2").saveAsTable("g_orders2")
      val joined = spark.table("g_orders1")
        .join(spark.table("g_orders2"), "o_custkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), "co-bucketed join must not shuffle:\n" + plan.take(500))
      assert(joined.count() == orders.count())
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS g_orders1")
      spark.sql("DROP TABLE IF EXISTS g_orders2")
    }
  }
}
