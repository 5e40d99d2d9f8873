package graft.sources

import java.nio.file.Files

import graft.clustering.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Proves partition pruning: a filter on the partition column reaches
  * the scan as a PartitionFilter, so non-matching directories are
  * never read — the layout that turns a 100 TB scan into a slice. */
class PartitionPruningSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("filter on the partition column prunes directories at plan time") {
    val dir = Files.createTempDirectory("graft_part").toString
    val events = graft.Tables.t(spark, "/root/testdata/sf0.001", "events")
    events.write.partitionBy("event_type").parquet(s"$dir/events")
    val clicks = spark.read.parquet(s"$dir/events")
      .filter($"event_type" === "click")
    val plan = clicks.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.matches("(?s).*PartitionFilters: \\[[^\\]]*event_type[^\\]]*\\].*"),
      plan.take(400))
    val want = events.filter($"event_type" === "click").count()
    assert(clicks.count() == want)
  }
}
