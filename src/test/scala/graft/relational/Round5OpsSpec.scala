package graft.relational

import java.sql.Timestamp

import graft.clustering.SparkTestSession
import graft.pipeline.Upsert
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral specs for the round-5 operators on CRAFTED data — the
  * oracle gate proves cross-engine agreement on the testdata; these
  * prove the semantics on cases the testdata may not contain
  * (out-of-order funnel steps, version ties, single-user cohorts). */
class Round5OpsSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(min: Long) = new Timestamp(1700000000000L + min * 60000L)

  test("funnel counts only steps in chain order") {
    val ev = Seq(
      // user 1: full ordered chain -> depth 3
      (1L, ts(0), "view"), (1L, ts(1), "click"), (1L, ts(2), "purchase"),
      // user 2: click BEFORE the first view -> that click must not count
      (2L, ts(0), "click"), (2L, ts(1), "view"), (2L, ts(2), "purchase"),
      // user 3: view only -> depth 1
      (3L, ts(0), "view"),
      // user 4: never viewed -> not in the funnel at all
      (4L, ts(0), "click"), (4L, ts(1), "purchase"))
      .toDF("user_id", "ts", "event_type")
    val out = Relational.funnel(ev, "view", "click", "purchase")
      .select("user_id", "depth").as[(Long, Int)].collect().toMap
    assert(out == Map(1L -> 3, 2L -> 1, 3L -> 1))
  }

  test("funnel requires strictly later timestamps per step") {
    val ev = Seq((1L, ts(0), "view"), (1L, ts(0), "click"))
      .toDF("user_id", "ts", "event_type")
    val out = Relational.funnel(ev, "view", "click", "purchase")
      .select("user_id", "depth").as[(Long, Int)].collect().toMap
    assert(out == Map(1L -> 1), "same-instant click is not 'after' the view")
  }

  test("upsert keeps the newest version's payload and counts versions") {
    val standing = Seq((1L, 1L, "a1"), (2L, 1L, "b1")).toDF("id", "version", "payload")
    val updates = Seq((2L, 2L, "b2"), (3L, 2L, "c2")).toDF("id", "version", "payload")
    val out = Upsert.merge(standing, updates, "id", "version")
      .select("id", "version", "payload", "n_versions")
      .as[(Long, Long, String, Long)].collect().toSet
    assert(out == Set((1L, 1L, "a1", 1L), (2L, 2L, "b2", 2L), (3L, 2L, "c2", 1L)))
  }

  test("retention grid is exact on a two-cohort crafted stream") {
    val ev = Seq(
      (1L, ts(0)), (1L, ts(24 * 60)),        // cohort day0, active d0+d1
      (2L, ts(10)),                          // cohort day0, active d0 only
      (3L, ts(24 * 60)), (3L, ts(48 * 60)))  // cohort day1, active d0+d1
      .toDF("user_id", "ts")
    val out = Relational.retention(ev)
      .select(col("cohort").cast("string"), col("offset"), col("n_active"),
        col("n_cohort"), col("retention"))
      .as[(String, Int, Long, Long, Double)].collect().toSet
    val d0 = new Timestamp(1700000000000L).toLocalDateTime.toLocalDate
    val d1 = d0.plusDays(1)
    assert(out == Set(
      (d0.toString, 0, 2L, 2L, 1.0), (d0.toString, 1, 1L, 2L, 0.5),
      (d1.toString, 0, 1L, 1L, 1.0), (d1.toString, 1, 1L, 1L, 1.0)))
  }

  test("anomaly flags exactly the beyond-z values, z computed from rounded stats") {
    // 10 baseline values + one far outlier per type
    val base = (1 to 10).map(i => (i.toLong, "a", 100.0))
    val ev = (base :+ (99L, "a", 1000.0)).toDF("event_id", "event_type", "value")
    val out = Relational.anomaly(ev, 3.0)
      .select("event_id", "z").as[(Long, Double)].collect()
    assert(out.map(_._1).toSet == Set(99L))
    assert(out.head._2 > 3.0)
  }

  test("round-5 operators keep their claimed plan shapes") {
    val sf = "/root/testdata/sf0.001"
    // banded interval join must be a broadcast EQUI-join, never a
    // nested loop over the corpus
    val banded = Relational.eventsBanded(spark, sf)
      .queryExecution.executedPlan.toString
    assert(banded.contains("BroadcastHashJoin"), banded.take(600))
    assert(!banded.contains("NestedLoop") && !banded.contains("CartesianProduct"))
    // upsert merges via partial aggregation, never a version window
    val ups = graft.pipeline.Upsert.qUpsert(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!ups.contains("Window"), "no row_number window in the merge")
    assert(ups.contains("partial_max_by"), "history must collapse map-side")
    // boilerplate fraction joins the frequent set back as a broadcast
    val frac = graft.text.CorpusStats.qBoilerplateFrac(spark, sf)
      .queryExecution.executedPlan.toString
    assert(frac.contains("BroadcastHashJoin"), frac.take(600))
  }

  test("histogram buckets cover every row exactly once") {
    val sf = "/root/testdata/sf0.001"
    val total = graft.Tables.t(spark, sf, "lineitem").count()
    val h = Relational.histPrice(spark, sf)
    assert(h.agg(sum("n")).as[Long].head() == total)
    val buckets = h.select("bucket").as[Int].collect()
    assert(buckets.forall(b => b >= 0 && b <= 21))
    assert(buckets.distinct.length == buckets.length)
  }
}
