package graft.clustering

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class GkaPsoSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"

  test("roulette prefix pick lands on the weight-proportional row") {
    val df = Seq((1L, 1.0), (2L, 2.0), (3L, 3.0), (4L, 4.0)).toDF("rid", "w")
    // prefix sums: 1, 3, 6, 10
    assert(Roulette.pickByPrefix(df, "rid", "w", 0.5) == 1L)
    assert(Roulette.pickByPrefix(df, "rid", "w", 2.9) == 2L)
    assert(Roulette.pickByPrefix(df, "rid", "w", 3.0) == 3L)
    assert(Roulette.pickByPrefix(df, "rid", "w", 9.99) == 4L)
    assert(Roulette.pickByPrefix(df, "rid", "w", 99.0) == 4L, "past-total falls to last row")
  }

  test("batched roulette picks equal one-at-a-time picks on the same frame") {
    val df = (1 to 500).map(i =>
      (i.toLong, (i % 7 + 1).toDouble, ((i * 3) % 11 + 1).toDouble))
      .toDF("rid", "w0", "w1").repartition(5).cache()
    try {
      df.count()
      val targets = Seq(123.4, 777.7)
      val batched = Roulette.pickManyByPrefixInPlace(df, "rid", Seq("w0", "w1"), targets)
      val oneByOne = Seq(
        Roulette.pickByPrefixInPlace(df.select("rid", "w0"), "rid", "w0", targets(0)),
        Roulette.pickByPrefixInPlace(df.select("rid", "w1"), "rid", "w1", targets(1)))
      assert(batched == oneByOne, s"$batched vs $oneByOne")
    } finally { df.unpersist(); () }
  }

  test("withRid disambiguates duplicate pids deterministically") {
    val pts = Points.withRid(Points.lineitem4d(spark, sf)).cache()
    val n = pts.count()
    assert(pts.select("rid").distinct().count() == n, "rid must be unique")
    pts.unpersist()
  }

  test("withRid fails loudly when a pid group exceeds the 99-row encoding") {
    val big = (1 to 120).map(_ => (7L, 1.0, 2.0, 3.0, 4.0))
      .toDF("pid", "x1", "x2", "x3", "x4")
    // count() would let Catalyst prune the rid column; aggregate it so
    // the guard expression actually evaluates
    val e = intercept[Exception] { Points.withRid(big).agg(max("rid")).head() }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    assert(msgs(e).exists(m => m != null && m.contains("rid encoding would collide")),
      s"expected a loud rid-collision error, got: ${e.getMessage}")
  }

  test("gka and pso loops run at 64 dims through the same generic code path") {
    val pts = Points.embeddings64(spark, sf)
    val gka = GKA.full(Points.withRid(pts, Points.embedDims),
      k = 2, p = 2, iters = 1, pm = 0.5, cm = 2.0, seed = 42,
      ds = Points.embedDims).collect()
    assert(gka.length == 1 && gka.head.getDouble(1) > 0, "one generation, positive objective")
    val pso = PSO.full(pts, k = 2, p0 = 2, iters = 1, seed = 42,
      ds = Points.embedDims).collect()
    assert(pso.length == 1 && pso.head.getDouble(1) > 0)
  }

  test("gka centersFromAssign matches a direct groupBy") {
    val pts = Points.lineitem4d(spark, sf)
    val centers = GKA.centersFromAssign(pts, pmod(col("pid"), lit(4)))
    assert(centers.length == 4)
    val direct = pts.filter(pmod(col("pid"), lit(4)) === 0)
      .agg(round(avg("x1"), 6)).as[Double].head()
    assert(centers(0)(0) == direct)
  }

  test("gka empty classes keep their index via +inf sentinels") {
    import org.apache.spark.sql.functions._
    val pts = Points.lineitem4d(spark, sf)
    // everyone assigned to class 2 -> classes 0,1,3 are empty
    val centers = GKA.centersFromAssign(pts, lit(2))
    assert(centers.length == 4, "class indices must be preserved")
    assert(centers(0).forall(_.isPosInfinity) && centers(3).forall(_.isPosInfinity))
    assert(centers(2).forall(v => !v.isInfinity), "the populated class has a real center")
    // argmin never picks a sentinel class
    val ks = KMeans.assign(pts, centers).select("k").distinct()
      .as[Int].collect().toSet
    assert(ks == Set(2))
  }

  test("gka full GA improves best objective monotonically") {
    val out = GKA.qFull(spark, sf).orderBy("iter").select("best").as[Double].collect()
    assert(out.length == 3)
    assert(out.zip(out.tail).forall { case (a, b) => b <= a + 1e-9 }, out.mkString(","))
  }

  test("pso objectives: one agg returns every particle's objective") {
    val pts = Points.lineitem4d(spark, sf)
    val particles = PSO.initParticles(pts, 3)
    val (n, objs) = PSO.objectives(pts, particles)
    assert(n == 6000L && objs.length == 3 && objs.forall(_ > 0))
  }

  test("pso full loop: gbest never worsens") {
    val out = PSO.qFull(spark, sf).orderBy("iter").select("best").as[Double].collect()
    assert(out.length == 4)
    assert(out.zip(out.tail).forall { case (a, b) => b <= a + 1e-9 })
  }

  // ---- independent trace oracles for the seeded loops ------------------
  // gka_full / pso_full stay rows-only in the driver harness (seeded
  // RNG is not SQL-expressible), so the loop MATH is pinned here
  // instead: a from-scratch driver-array reimplementation (the
  // reference's own architecture) replays the identical RNG protocol
  // on a crafted 10-point set and must produce the same per-iteration
  // (objective, best) trace as the distributed loop. Only the initial
  // hash assignments and the physical row order are read from Spark —
  // inputs, not math.

  private val tracePts = Seq(
    (1L, 1.0, 2.0), (2L, 2.0, 1.5), (3L, 8.0, 9.0), (4L, 9.0, 8.5),
    (5L, 1.5, 1.0), (6L, 8.5, 9.5), (7L, 2.5, 2.0), (8L, 9.5, 9.0),
    (9L, 1.2, 2.2), (10L, 8.2, 8.8))
  private val ds2 = Seq("x1", "x2")

  private def r6(x: Double) =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def dist(x: Array[Double], c: Array[Double]): Double =
    math.sqrt(x.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum)

  test("gka full trace equals an independent driver-array GA replay") {
    val (k, p, iters, pm, cm, seed) = (2, 2, 2, 0.7, 2.0, 7L)
    // coalesce(1) makes row order (the roulette walk order and every
    // aggregation's fp-sum order) deterministic and observable
    val pts1 = Points.withRid(tracePts.toDF("pid", "x1", "x2"), ds2).coalesce(1).cache()
    try {
      val got = GKA.full(pts1, k = k, p = p, iters = iters, pm = pm, cm = cm,
        seed = seed, ds = ds2)
        .orderBy("iter").select("iter", "objective", "best")
        .as[(Int, Double, Double)].collect()

      // inputs from Spark: walk order + the hash init assignments
      val init = pts1.select(
        (col("rid") +: ds2.map(col)) ++
          (0 until p).map(i =>
            pmod(xxhash64(col("rid"), lit(i), lit(seed)), lit(k)).cast("int").as(s"s$i")): _*)
        .collect()
      val walk: Array[(Long, Array[Double])] =
        init.map(r => (r.getLong(0), ds2.indices.map(j => r.getDouble(1 + j)).toArray))
      var s: Array[Map[Long, Int]] = Array.tabulate(p)(i =>
        init.map(r => r.getLong(0) -> r.getInt(1 + ds2.length + i)).toMap)

      val rng = new scala.util.Random(seed)
      val n = walk.length
      var best = Double.MaxValue
      val trace = scala.collection.mutable.ListBuffer.empty[(Int, Double, Double)]
      for (iter <- 1 to iters) {
        // centers (rounded means, +inf sentinel for empty classes)
        val centers = Array.tabulate(p) { i =>
          Array.tabulate(k) { ki =>
            val members = walk.filter { case (rid, _) => s(i)(rid) == ki }
            if (members.isEmpty) Array.fill(ds2.length)(Double.PositiveInfinity)
            else Array.tabulate(ds2.length)(j =>
              r6(members.map(_._2(j)).sum / members.length))
          }
        }
        // reassign: first-argmin, per-row min dist
        val d = Array.tabulate(p) { i =>
          walk.map { case (rid, x) =>
            val da = centers(i).map(c => dist(x, c))
            rid -> da
          }.toMap
        }
        s = Array.tabulate(p) { i =>
          walk.map { case (rid, _) =>
            val da = d(i)(rid); rid -> da.indexOf(da.min)
          }.toMap
        }
        val dmin = Array.tabulate(p)(i => walk.map { case (rid, _) => d(i)(rid).min })
        val fitness = dmin.map(v => v.sum / n)
        val dmax = dmin.map(_.max)
        best = math.min(best, fitness.min)
        trace += ((iter, fitness.min, best))
        // mutation: same RNG protocol, prefix-walk in row order
        val muts = (0 until p).flatMap { i =>
          if (rng.nextDouble() < pm) {
            val dart = rng.nextDouble() * (n * (cm * dmax(i) - fitness(i)))
            Some((i, dart, rng.nextInt(k)))
          } else None
        }
        val mutated = s.map(identity)
        for ((i, dart, flip) <- muts) {
          var acc = 0.0
          var picked = walk.last._1
          var done = false
          for (((rid, _), idx) <- walk.zipWithIndex if !done) {
            acc += cm * dmax(i) - d(i)(rid).min
            if (acc > dart) { picked = rid; done = true }
          }
          mutated(i) = mutated(i) + (picked -> flip)
        }
        // selection: wheel over 1/fitness, identical fp-fold
        val iv = fitness.map(1.0 / _)
        val tot = iv.sum
        val cum = iv.scanLeft(0.0)(_ + _).tail.map(_ / tot)
        val picks = (0 until p).map { _ =>
          val f = rng.nextDouble()
          cum.indexWhere(f < _) match { case -1 => p - 1; case j => j }
        }
        s = Array.tabulate(p)(i => mutated(picks(i)))
      }

      assert(got.length == iters)
      for (((gi, go, gb), (ti, to_, tb)) <- got.zip(trace)) {
        assert(gi == ti)
        assert(math.abs(go - to_) < 1e-9, s"iter $gi objective: spark $go vs trace ${to_}")
        assert(math.abs(gb - tb) < 1e-9, s"iter $gi best: spark $gb vs trace $tb")
      }
    } finally { pts1.unpersist(); () }
  }

  test("pso full trace equals an independent driver-array swarm replay") {
    val (k, pN, iters, wMax, wMin, c1, c2, seed) = (2, 2, 2, 0.9, 0.4, 2.0, 2.0, 11L)
    val pts1 = tracePts.toDF("pid", "x1", "x2").coalesce(1)
    val got = PSO.full(pts1, k = k, p0 = pN, iters = iters, wMax = wMax,
      wMin = wMin, c1 = c1, c2 = c2, seed = seed, ds = ds2)
      .orderBy("iter").select("iter", "objective", "best")
      .as[(Int, Double, Double)].collect()

    // row order (fp-sum order for objectives) read from the frame
    val walk = tracePts.map { case (_, a, b) => Array(a, b) }
    val D = ds2.length
    val sorted = tracePts.sortBy(_._1) // firstKCenters order: pid (unique here)
    var pos = sorted.take(pN * k).map { case (_, a, b) => Array(a, b) }
      .grouped(k).map(_.toArray).toArray
    val vMax = Array.tabulate(D)(j =>
      (walk.map(_(j)).max - walk.map(_(j)).min) / 10.0)
    def objective(centers: Array[Array[Double]]): Double =
      walk.map(x => centers.map(c => dist(x, c)).min).sum / walk.length
    val rng = new scala.util.Random(seed)
    val vel = Array.fill(pN, k, D)(0.0)
    var objs = pos.map(objective)
    val pbest = pos.map(_.map(_.clone))
    val pbestObj = objs.clone()
    var gbest = pos(objs.indices.minBy(objs)).map(_.clone)
    var gbestObj = objs.min
    val trace = scala.collection.mutable.ListBuffer.empty[(Int, Double, Double)]
    for (iter <- 1 to iters) {
      val w = wMax - (wMax - wMin) / iters * (iter - 1)
      for (p <- 0 until pN; i <- 0 until k; j <- 0 until D) {
        var v = w * vel(p)(i)(j) +
          c1 * rng.nextDouble() * (pbest(p)(i)(j) - pos(p)(i)(j)) +
          c2 * rng.nextDouble() * (gbest(i)(j) - pos(p)(i)(j))
        if (v > vMax(j)) v = vMax(j) else if (v < -vMax(j)) v = -vMax(j)
        vel(p)(i)(j) = v
        pos(p)(i)(j) += v
      }
      objs = pos.map(objective)
      for (p <- 0 until pN) {
        if (objs(p) < pbestObj(p)) {
          pbestObj(p) = objs(p)
          pbest(p) = pos(p).map(_.clone)
        }
        if (objs(p) < gbestObj) { gbestObj = objs(p); gbest = pos(p).map(_.clone) }
      }
      trace += ((iter, objs.min, gbestObj))
    }

    assert(got.length == iters)
    for (((gi, go, gb), (ti, to_, tb)) <- got.zip(trace)) {
      assert(gi == ti)
      assert(math.abs(go - to_) < 1e-9, s"iter $gi objective: spark $go vs trace ${to_}")
      assert(math.abs(gb - tb) < 1e-9, s"iter $gi best: spark $gb vs trace $tb")
    }
  }
}
