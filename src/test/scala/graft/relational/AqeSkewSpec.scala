package graft.relational

import graft.clustering.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Proves SURVEY §5's "AQE skew-join" remedy actually engages: with a
  * heavily skewed join key and thresholds scaled to test size, AQE's
  * OptimizeSkewedJoin splits the hot partition (the runtime complement
  * to the explicit salting operators, which are oracle-proven). */
class AqeSkewSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark

  test("AQE splits the skewed partition of a sort-merge join") {
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "20KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "20KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // ~200k rows on key 0 vs a uniform tail (the key is a per-row
      // expression, NOT a foldable literal — a constant key would
      // collapse the join into a filtered cartesian); no salting.
      val left = spark.range(202000).select(
        when(col("id") < 200000, 0L).otherwise(col("id") % 100).as("k"), col("id"))
      val right = spark.range(100).select(col("id").as("k"), (col("id") * 2).as("v"))
      val joined = left.join(right, "k")
      // collect() executes THIS DataFrame's own query execution, so
      // its AdaptiveSparkPlan finalizes (count() would plan an
      // entirely separate aggregate query)
      assert(joined.collect().length == 202000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        "AQE must mark the skewed join:\n" + plan.take(1500))
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
