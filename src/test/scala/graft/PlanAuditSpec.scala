package graft

import graft.clustering.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Blanket physical-plan audit over EVERY registered query — the
  * SURVEY §5 scale rule "no CartesianProduct anywhere" enforced as a
  * failing test for any future query, not just the dedup family. */
class PlanAuditSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("no registered query plans a CartesianProduct or a single-buffer exact percentile") {
    val cartesian = Seq.newBuilder[String]
    val percentile = Seq.newBuilder[String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      // driver-loop queries (lloyd, GKA, IVF...) run their inner jobs
      // here and return a literal frame; their inner stages are audited
      // by their own module specs — this asserts the returned plan
      val plan = fn(spark, sf).queryExecution.executedPlan.toString
      if (plan.contains("CartesianProduct")) cartesian += name
      // SURVEY §5 round-6 rule: the exact `percentile` aggregate holds
      // every distinct value in ONE buffer on one reducer — quantiles
      // must go through graft.relational.Quantiles instead.
      // (percentile_approx / ApproximatePercentile is bounded and fine.)
      if (plan.contains("percentile(")) percentile += name
    }
    assert(cartesian.result().isEmpty,
      s"cartesian products in: ${cartesian.result().mkString(", ")}")
    assert(percentile.result().isEmpty,
      s"single-buffer exact percentile in: ${percentile.result().mkString(", ")}")
  }

  test("no registered query leaks a cached frame") {
    // the previous test constructed every query (running each driver
    // loop's internal jobs); any cache a query failed to release is
    // still registered now
    assert(spark.sharedState.cacheManager.isEmpty,
      "a query left a cached DataFrame behind")
  }
}
