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
}
