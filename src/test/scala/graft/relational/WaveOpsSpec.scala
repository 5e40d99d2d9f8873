package graft.relational

import graft.clustering.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

/** Behavioral specs for the round-5 fifth-wave operators: Count-Min,
  * Markov transitions, EWMA, SCD-2, prefix join, random projection,
  * grid-density clustering, robust scaling, KL drift, Zipf profile. */
class WaveOpsSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("count-min estimates are one-sided: est >= exact for every key") {
    val rows = CountMin.qCountMin(spark, sf)
      .select("est", "exact").as[(Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (est, exact) =>
      assert(est >= exact, s"count-min under-estimated: $est < $exact")
    }
  }

  test("transition probabilities per from-state sum to 1") {
    val sums = Relational.eventsTransitions(spark, sf)
      .groupBy("event_type").agg(sum("p").as("s"))
      .select("s").as[Double].collect()
    assert(sums.nonEmpty)
    sums.foreach(s => assert(math.abs(s - 1.0) < 1e-4, s"sum $s"))
  }

  test("transitions on a crafted chain count each consecutive pair") {
    val ev = Seq(
      (1L, ts(10), 1L, "a", 0.0, "{}"),
      (2L, ts(20), 1L, "b", 0.0, "{}"),
      (3L, ts(30), 1L, "a", 0.0, "{}"),
      (4L, ts(40), 1L, "b", 0.0, "{}"),
      (5L, ts(50), 2L, "a", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val m = Relational.transitionsOf(ev).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    // user 1: a->b, b->a, a->b; user 2: no pair
    assert(m(("a", "b")) == (2L, 1.0))
    assert(m(("b", "a")) == (1L, 1.0))
    assert(m.size == 2)
  }

  test("ewma recursion matches the closed form on a crafted series") {
    val ev = Seq(
      (1L, ts(10), 1L, "a", 1.0, "{}"),
      (2L, ts(20), 1L, "a", 2.0, "{}"),
      (3L, ts(30), 1L, "a", 3.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = Relational.ewmaOf(ev).orderBy("event_id")
      .select("ewma").as[Double].collect().toSeq
    // s1 = 1; s2 = .5*2+.5*1 = 1.5; s3 = .5*3+.5*1.5 = 2.25
    assert(got == Seq(1.0, 1.5, 2.25))
  }

  test("scd2 compresses runs and intervals tile the user's timeline") {
    val ev = Seq(
      (1L, ts(10), 1L, "a", 0.0, "{}"),
      (2L, ts(20), 1L, "a", 0.0, "{}"),
      (3L, ts(30), 1L, "b", 0.0, "{}"),
      (4L, ts(40), 1L, "a", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val rows = graft.pipeline.Upsert.scd2(ev).orderBy("valid_from").collect()
    assert(rows.map(_.getString(1)).toSeq == Seq("a", "b", "a"))
    // each valid_to equals the next row's valid_from; only last is open
    assert(rows(0).getTimestamp(3) == rows(1).getTimestamp(2))
    assert(rows(1).getTimestamp(3) == rows(2).getTimestamp(2))
    // the open row carries the high-date sentinel, not NULL
    assert(rows(2).getTimestamp(3).toString.startsWith("2200-01-01"))
    assert(rows(2).getBoolean(4))
    assert(rows.count(_.getBoolean(4)) == 1)
  }

  test("prefix join finds EXACTLY the naive all-pairs exact-Jaccard result (lossless)") {
    val docs = graft.Tables.t(spark, sf, "documents")
    val got = graft.dedup.PrefixJoin.qPrefixJoin(spark, sf)
      .select("ia", "ib").as[(Long, Long)].collect().toSet
    // naive truth on the tiny sf: all batch x corpus pairs, exact Jaccard
    val w = docs.select(col("doc_id"), array_distinct(split(col("text"), " ")).as("ws"))
    val truth = w.filter(col("doc_id") <= 25).select(col("doc_id").as("ia"), col("ws").as("wa"))
      .crossJoin(w.select(col("doc_id").as("ib"), col("ws").as("wb")))
      .filter(col("ia") =!= col("ib"))
      .withColumn("i", size(array_intersect(col("wa"), col("wb"))))
      .withColumn("j", col("i").cast("double") / (size(col("wa")) + size(col("wb")) - col("i")))
      .filter(col("j") >= 0.8)
      .select("ia", "ib").as[(Long, Long)].collect().toSet
    assert(got == truth, s"prefix join missed ${truth -- got} / invented ${got -- truth}")
  }

  test("random projection matrix is deterministic +/-1 and search hits real neighbors") {
    val s = graft.search.RandomProjection.signs
    assert(s.length == 16 && s.forall(_.length == 64))
    assert(s.flatten.forall(v => v == 1 || v == -1))
    // not degenerate: both signs occur in every row
    s.foreach(row => assert(row.contains(1) && row.contains(-1)))
    val rp = graft.search.RandomProjection.qRpTopK(spark, sf)
    assert(rp.count() > 0)
    // JL preserves geometry approximately: the projected top-5 should
    // overlap the true cosine top-10 for most queries
    val truth = graft.search.SimSearch.qTopK(spark, sf)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toSet
    val hits = rp.select("q_id", "vec_id").as[(Long, Long)].collect()
      .count(truth.contains)
    assert(hits > 0, "projected search found nothing from the true top-k")
  }

  test("grid-density clusters: touching core cells share a cluster labeled by its min id") {
    val rows = graft.clustering.Density.qDensityGrid(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    val id = (c: (Long, Long, Long, Long)) => c._1 * 10000L + c._2
    val byCluster = rows.groupBy(_._4)
    byCluster.foreach { case (cl, members) =>
      assert(members.map(id).min == cl, s"cluster $cl not labeled by min member id")
    }
    // any two touching cells are in the same cluster
    val cellToCluster = rows.map(c => (c._1, c._2) -> c._4).toMap
    for (((cx, cy), cl) <- cellToCluster; dx <- -1 to 1; dy <- -1 to 1
         if (dx != 0 || dy != 0) && cellToCluster.contains((cx + dx, cy + dy)))
      assert(cellToCluster((cx + dx, cy + dy)) == cl,
        s"touching cells ($cx,$cy) and (${cx + dx},${cy + dy}) split across clusters")
  }

  test("robust scaling zeroes the median and normalizes the IQR of every dim") {
    val scaled = graft.clustering.KMeans.qRobustScale(spark, sf)
    val stats = scaled.agg(
      expr("percentile(r_x1, 0.5D)"), expr("percentile(r_x2, 0.5D)"),
      expr("percentile(r_x1, 0.75D) - percentile(r_x1, 0.25D)"),
      expr("percentile(r_x2, 0.75D) - percentile(r_x2, 0.25D)")).head()
    assert(math.abs(stats.getDouble(0)) < 1e-9)
    assert(math.abs(stats.getDouble(1)) < 1e-9)
    assert(math.abs(stats.getDouble(2) - 1.0) < 1e-9)
    assert(math.abs(stats.getDouble(3) - 1.0) < 1e-9)
  }

  test("per-source KL divergence is non-negative (Gibbs)") {
    val kl = graft.text.CorpusStats.qSourceKl(spark, sf)
      .select("kl_bits").as[Double].collect()
    assert(kl.nonEmpty)
    kl.foreach(v => assert(v >= -1e-9, s"negative KL $v"))
  }

  test("temporal join plans ZERO join operators — the union-window claim") {
    val df = Relational.eventsTemporalJoin(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"temporal join must be join-free:\n${plan.take(400)}")
    assert(plan.contains("Window"), "the state carry must be a window")
  }

  test("prefix join plans only equi-joins — no nested-loop anywhere") {
    val df = graft.dedup.PrefixJoin.qPrefixJoin(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"prefix join must stay equi-join only:\n${plan.take(400)}")
  }

  test("zipf profile: shares bounded, slope negative") {
    val r = graft.text.CorpusStats.qZipf(spark, sf).head()
    val hapax = r.getAs[Double]("hapax_frac")
    val head = r.getAs[Double]("head_share")
    assert(hapax >= 0.0 && hapax <= 1.0)
    assert(head > 0.0 && head <= 1.0)
    assert(r.getAs[Double]("zipf_slope") < 0.0, "frequency must fall with rank")
  }

  test("acf: dense lag ladder, correlations bounded, pair counts capped by series length") {
    val rows = Relational.eventsAcf(spark, sf).collect()
      .map(r => r.getAs[Int]("lag") ->
        (r.getAs[Long]("n_pairs"), r.getAs[Double]("acf"))).toMap
    assert(rows.keySet == (1 to 24).toSet)
    rows.values.foreach { case (n, a) =>
      assert(n > 0)
      assert(a >= -1.0 && a <= 1.0, s"acf out of range: $a")
    }
    // with gaps in the series the counts need not be monotone in lag,
    // but each lag can align at most (distinct hours - lag) pairs
    val hours = graft.Tables.t(spark, sf, "events")
      .select(date_trunc("hour", col("ts"))).distinct().count()
    (1 to 24).foreach { l =>
      assert(rows(l)._1 <= hours - l, s"lag $l: ${rows(l)._1} pairs vs ${hours - l} max")
    }
  }

  test("bot regularity: moments consistent, flag agrees with the rounded cv") {
    val rows = Analytics.qBotRegularity(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_gaps") >= 20)
      val (m, sd, cv) = (r.getAs[Double]("mean_gap_s"),
        r.getAs[Double]("sd_gap_s"), r.getAs[Double]("cv"))
      assert(m > 0 && sd >= 0)
      assert(math.abs(cv - BigDecimal(sd / m).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
      assert(r.getAs[Boolean]("metronomic") == (cv < 0.3))
    }
  }

  test("holt forecast: independent recomputation from the daily series matches every row") {
    val rows = Analytics.qHoltForecast(spark, sf).collect()
      .sortBy(_.getAs[java.sql.Date]("day").getTime)
    assert(rows.length > 100)
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    var l = rows.head.getAs[Double]("rev")
    var b = 0.0
    assert(rows.head.getAs[Double]("level") == r6(l) && rows.head.isNullAt(4))
    rows.tail.foreach { r =>
      val x = r.getAs[Double]("rev")
      val fc = l + b
      val nl = 0.5 * x + 0.5 * (l + b)
      val nb = 0.3 * (nl - l) + 0.7 * b
      assert(r.getAs[Double]("forecast") == r6(fc))
      assert(r.getAs[Double]("level") == r6(nl))
      assert(r.getAs[Double]("trend") == r6(nb))
      l = nl; b = nb
    }
  }

  test("discount OLS: closed form recomputes from exact decimal moments per flag") {
    val raw = graft.Tables.t(spark, sf, "lineitem")
      .select("l_returnflag", "l_discount", "l_quantity").collect()
      .map(r => (r.getString(0), BigDecimal(r.getDouble(1)).setScale(2),
        BigDecimal(r.getDouble(2)).setScale(2)))
      .groupBy(_._1)
    val rows = Analytics.qDiscountOls(spark, sf).collect()
    assert(rows.length == raw.size)
    rows.foreach { r =>
      val g = raw(r.getAs[String]("l_returnflag"))
      val n = g.size.toDouble
      val (sx, sy) = (g.map(_._2).sum.toDouble, g.map(_._3).sum.toDouble)
      val sxy = g.map(t => t._2 * t._3).sum.toDouble
      val sxx = g.map(t => t._2 * t._2).sum.toDouble
      val syy = g.map(t => t._3 * t._3).sum.toDouble
      val num = n * sxy - sx * sy
      val den = n * sxx - sx * sx
      assert(r.getAs[Long]("n") == g.size)
      assert(math.abs(r.getAs[Double]("slope") - num / den) < 1e-5)
      assert(math.abs(r.getAs[Double]("intercept") - (sy - (num / den) * sx) / n) < 1e-5)
      val r2 = (num * num) / (den * (n * syy - sy * sy))
      assert(math.abs(r.getAs[Double]("r2") - r2) < 1e-5)
      assert(r2 >= 0 && r.getAs[Double]("r2") <= 1.0 + 1e-9)
    }
  }

  test("markov attribution: severing any channel can only hurt conversion; shares normalize") {
    val rows = Relational.qAttributionMarkov(spark, sf).collect()
    assert(rows.nonEmpty)
    val full = rows.head.getAs[Double]("conv_full")
    assert(full > 0 && full <= 1.0)
    rows.foreach { r =>
      assert(r.getAs[Double]("conv_full") == full, "one chain, one full probability")
      val rem = r.getAs[Double]("conv_removed")
      assert(rem >= 0 && rem <= full + 1e-6,
        s"${r.getAs[String]("channel")}: severing a channel cannot raise conversion")
      val eff = r.getAs[Double]("removal_effect")
      assert(math.abs(eff - (1.0 - rem / full)) < 1e-5)
      assert(eff >= -1e-6 && eff <= 1.0)
    }
    assert(math.abs(rows.map(_.getAs[Double]("attribution_share")).sum - 1.0) < 1e-4,
      "normalized shares sum to 1")
    assert(rows.map(_.getAs[String]("channel")).sorted.toSeq ==
      rows.map(_.getAs[String]("channel")).distinct.sorted.toSeq)
  }

  test("weekday index: 7 dense days, day counts cover the calendar, indexes mean-weighted to 1") {
    val rows = Analytics.qWeekdayIndex(spark, sf).collect()
      .map(r => r.getAs[Int]("dow") ->
        (r.getAs[Long]("n_days"), r.getAs[Double]("day_mean"), r.getAs[Double]("seasonal_index")))
    assert(rows.map(_._1).sorted.toSeq == (1 to 7))
    val totalDays = rows.map(_._2._1).sum
    assert(totalDays > 100, "a multi-year order calendar")
    rows.foreach { case (_, (nd, dm, idx)) =>
      assert(nd > 0 && dm > 0 && idx > 0)
    }
    // weighted by day counts, the seasonal indexes average to 1
    val weighted = rows.map { case (_, (nd, _, idx)) => nd * idx }.sum / totalDays
    assert(math.abs(weighted - 1.0) < 1e-3, s"weighted mean index $weighted")
  }
}
