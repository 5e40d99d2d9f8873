package graft.relational

import graft.clustering.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral checks on crafted data for the round-6 statistical wave
  * (the oracles pin exactness on the testdata; these pin SEMANTICS). */
class AnalyticsSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"

  test("MAD gate is robust where the z-score gate is not") {
    // 99 values at 10.0 and one wild 1e9: the mean/stddev move to the
    // outlier's scale, the median/MAD do not
    val vs = Seq.fill(99)(10.0) :+ 1e9
    val med = Quantiles.exact(vs.toDF("v"), "v", Seq(0.5))(0.5)
    assert(med == 10.0, s"median unmoved by the outlier: $med")
    val dev = vs.map(v => math.abs(v - med))
    val mad = Quantiles.exact(dev.toDF("v"), "v", Seq(0.5))(0.5)
    assert(mad == 0.0, "MAD of a constant-with-outlier column is 0")
    // the driver query runs end-to-end on testdata and flags something
    val out = Analytics.qMadAnomaly(spark, sf).collect()
    assert(out.nonEmpty && out.forall(_.getLong(1) >= 0))
  }

  test("incremental aggregate merge equals full recompute") {
    val merged = Analytics.qAggIncremental(spark, sf)
      .orderBy("o_orderpriority").collect()
    val full = graft.Tables.t(spark, sf, "orders")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_orders"), round(sum("o_totalprice"), 1).as("revenue"))
      .orderBy("o_orderpriority").collect()
    assert(merged.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      full.map(r => (r.getString(0), r.getLong(1))).toSeq)
  }

  test("pagerank on a crafted star graph ranks the hub highest") {
    // star: 1 is the bucket keeper for 2,3,4 (the candidate shape)
    val cands = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("ia", "ib")
    val und = cands.select(explode(array(
      struct(col("ia").as("s"), col("ib").as("d")),
      struct(col("ib").as("s"), col("ia").as("d")))).as("e"))
      .select(col("e.s").as("s"), col("e.d").as("d"))
    val deg = und.groupBy("s").agg(count(lit(1)).as("deg"))
    var rank = deg.select(col("s").as("node"), lit(1.0).as("r"))
    for (_ <- 1 to 3) {
      rank = und.join(deg, "s")
        .join(rank.withColumnRenamed("node", "s"), "s")
        .select(col("d").as("node"), (col("r") / col("deg")).as("c"))
        .groupBy("node").agg((lit(0.15) + lit(0.85) * sum("c")).as("r"))
    }
    val rs = rank.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(rs(1L) > rs(2L) && rs(2L) == rs(3L) && rs(3L) == rs(4L),
      s"hub outranks identical leaves: $rs")
    // hand trace: r0 = 1 everywhere; hub_1 = .15 + .85*3*(1/1) = 2.7,
    // leaf_1 = .15 + .85*(1/3); hub_2 = .15+.85*3*leaf_1; leaf_2 =
    // .15+.85*hub_1/3; hub_3 = .15+.85*3*leaf_2; leaf_3 = .15+.85*hub_2/3
    val leaf1 = 0.15 + 0.85 * (1.0 / 3.0)
    val hub1 = 0.15 + 0.85 * 3.0
    val hub2 = 0.15 + 0.85 * 3.0 * leaf1
    val leaf2 = 0.15 + 0.85 * hub1 / 3.0
    val hub3 = 0.15 + 0.85 * 3.0 * leaf2
    val leaf3 = 0.15 + 0.85 * hub2 / 3.0
    assert(math.abs(rs(1L) - hub3) < 1e-12 && math.abs(rs(2L) - leaf3) < 1e-12,
      s"3-iteration trace: hub $hub3 leaf $leaf3 vs $rs")
  }

  test("per-user entropy: uniform two-type user scores exactly 1 bit") {
    val rows = Analytics.qUserEntropy(spark, sf).collect()
    assert(rows.nonEmpty)
    // entropy bounded by log2(n_types)
    rows.foreach { r =>
      val (nt, h) = (r.getLong(2), r.getDouble(3))
      assert(h >= -1e-9 && h <= math.log(nt.toDouble) / math.log(2.0) + 1e-6,
        s"0 <= H <= log2(n_types): $nt $h")
    }
  }

  test("chi2 of an independent crafted table is ~0") {
    // perfectly proportional rows => expected == observed => chi2 = 0
    spark.createDataFrame(
      (for (tp <- Seq("a", "b"); h <- 0 until 4; _ <- 0 until (if (tp == "a") 2 else 4))
        yield (tp, java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:00:00"), 0L))
    ).toDF("event_type", "ts", "event_id")
      .createOrReplaceTempView("chi2_src")
    val obs = spark.table("chi2_src")
      .groupBy(col("event_type"), hour(col("ts")).as("hr"))
      .agg(count(lit(1)).cast("double").as("o"))
    val rowT = obs.groupBy("event_type").agg(sum("o").as("rt"))
    val colT = obs.groupBy("hr").agg(sum("o").as("ct"))
    val grand = obs.agg(sum("o").as("n"))
    val chi2 = obs.join(rowT, "event_type").join(colT, "hr").crossJoin(grand)
      .withColumn("e", col("rt") * col("ct") / col("n"))
      .agg(sum((col("o") - col("e")) * (col("o") - col("e")) / col("e")))
      .head().getDouble(0)
    assert(math.abs(chi2) < 1e-9, s"independent table must score ~0: $chi2")
  }

  test("k-core peeling: triangle survives the 2-core, pendant path does not") {
    // triangle 1-2-3 plus a pendant path 3-4-5: peeling the 2-core
    // drops 5 (deg 1), then 4 — classic cascade the one-shot degree
    // filter gets wrong (4 has degree 2 before 5 is removed... it has
    // degree 2? edges 3-4,4-5: deg(4)=2 only counting 5; after 5 goes,
    // deg(4)=1 and it must cascade out)
    val e = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("ia", "ib")
    val r2 = Graph.kCoreOf(e, 2).collect()(0)
    assert(r2.getAs[Long]("n_core_nodes") == 3 && r2.getAs[Long]("n_core_edges") == 3,
      s"2-core must be exactly the triangle: $r2")
    val r3 = Graph.kCoreOf(e, 3).collect()(0)
    assert(r3.getAs[Long]("n_core_nodes") == 0 && r3.getAs[Long]("n_core_edges") == 0,
      "no 3-core in a triangle-plus-path")
  }

  test("PSI surfaces a fully one-sided type instead of dropping it") {
    // type "only_day" has ZERO night events — the maximal-drift case
    // the metric exists to catch; the round-8 inner-join formulation
    // dropped it from the report entirely. "balanced" is identical in
    // both halves and must score ~0.
    // concentrated in bin 0 — a UNIFORM one-sided type would tie the
    // smoothed-empty half's uniform 1/10 rates and genuinely score 0
    val rows =
      (0 until 40).map(i => ("only_day",
        java.sql.Timestamp.valueOf(f"2024-01-01 ${i % 12}%02d:00:00"), 1.0)) ++
      (0 until 40).map(i => ("balanced",
        java.sql.Timestamp.valueOf(f"2024-01-01 ${(i % 2) * 12 + 3}%02d:00:00"),
        ((i / 2) % 10) * 20.0 + 1))
    val psi = Analytics.psiOf(rows.toDF("event_type", "ts", "value"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(psi.contains("only_day"), "one-sided type must appear in the report")
    assert(psi("only_day") > 1.0 && !psi("only_day").isInfinite,
      s"one-sided type must score large finite PSI: ${psi("only_day")}")
    assert(math.abs(psi("balanced")) < 1e-9, s"balanced type ~0: ${psi("balanced")}")
  }

  test("common-neighbor hub cap bounds per-center wedge fan-out") {
    // two hubs (0 and 200) each verified-paired with the same 100
    // leaves: every leaf pair shares both hubs (cn = 2), and the hub
    // pair (0,200) is predicted through every leaf center. Uncapped
    // that is C(100,2) + 1 = 4951 links; with MUTUAL cap 32 each hub
    // keeps its FIRST 32 leaves (and those leaves keep both hubs), so
    // the output must be exactly C(32,2) leaf pairs from 1..32 plus
    // (0,200) — the per-center bound that holds no matter how large a
    // boilerplate family grows.
    val leaves = (1L to 100L)
    val e = (leaves.map(i => (0L, i)) ++ leaves.map(i => (i, 200L))).toDF("ia", "ib")
    val uncapped = Graph.commonNeighborsOf(e, cap = 1000).collect()
    assert(uncapped.length == 4951, s"uncapped wedge count: ${uncapped.length}")
    val capped = Graph.commonNeighborsOf(e, cap = 32).collect()
    assert(capped.length == 497, s"capped wedge count: ${capped.length}")
    assert(capped.forall(r => (r.getLong(0) <= 32 && r.getLong(1) <= 32) ||
      (r.getLong(0) == 0L && r.getLong(1) == 200L)),
      "capped pairs must come from each hub's first 32 neighbors")
    // the mutual cap keeps cn <= min(dp, dq), so every score is a true
    // truncated-neighborhood Jaccard — here leaf pairs share both of
    // their 2 hubs and the hubs share all 32 of their kept leaves, so
    // everything scores exactly 1.0 (one-sided capping would have put
    // the hub pair at cn=100 over capped degree 32: score < 0)
    assert(capped.forall(r => r.getDouble(3) == 1.0))
    assert(capped.filter(r => r.getLong(0) == 0L).forall(_.getLong(2) == 32L))
    // below-cap graphs are EXACTLY the uncapped statistic
    val small = Seq((0L, 1L), (0L, 2L), (0L, 3L), (1L, 9L), (2L, 9L), (3L, 9L))
      .toDF("ia", "ib")
    val a = Graph.commonNeighborsOf(small, cap = 32).orderBy("p", "q").collect()
    val b = Graph.commonNeighborsOf(small, cap = 1000).orderBy("p", "q").collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq && a.nonEmpty)
  }
}
