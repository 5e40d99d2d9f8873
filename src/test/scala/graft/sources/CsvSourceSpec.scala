package graft.sources

import graft.clustering.{KMeans, SparkTestSession}
import org.scalatest.funsuite.AnyFunSuite

/** Runs the engine against the reference's OWN dataset files — the
  * exact end-to-end path a user of the reference would migrate. */
class CsvSourceSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._
  private val iris = "/root/reference/dataset/iris.txt"

  test("reads the reference's iris.txt with stable line-order pids") {
    val df = CsvNumericSource.read(spark, iris, 4).cache()
    assert(df.count() == 150)
    assert(df.select("pid").distinct().count() == 150)
    val first = df.orderBy("pid").limit(1).select("x1", "x2", "x3", "x4")
      .as[(Double, Double, Double, Double)].head()
    assert(first == ((5.1, 3.5, 1.4, 0.2)))
    df.unpersist()
  }

  test("per-dim stats match the known iris ranges") {
    val df = CsvNumericSource.read(spark, iris, 4)
    val s = CsvNumericSource.stats(df, 4).head()
    assert(s.getAs[Long]("n") == 150)
    assert(s.getAs[Double]("min_x1") == 4.3 && s.getAs[Double]("max_x1") == 7.9)
    assert(s.getAs[Double]("min_x4") == 0.1 && s.getAs[Double]("max_x4") == 2.5)
  }

  test("GKA fitness kernel runs on the reference's iris points") {
    import org.apache.spark.sql.functions._
    val df = CsvNumericSource.read(spark, iris, 4)
    val centers = graft.clustering.GKA.centersFromAssign(df, pmod(col("pid"), lit(4)))
    assert(centers.length == 4)
    val obj = df.select(graft.clustering.GKA.minDist(centers).as("d"))
      .agg(avg("d")).as[Double].head()
    assert(obj > 0 && obj < 10, s"iris-scale objective expected, got $obj")
  }

  test("PSO objectives evaluate on the reference's iris points") {
    val df = CsvNumericSource.read(spark, iris, 4)
    val particles = graft.clustering.PSO.initParticles(df, 2)
    val (n, objs) = graft.clustering.PSO.objectives(df, particles)
    assert(n == 150 && objs.length == 2 && objs.forall(o => o > 0 && o < 10))
  }

  test("wine.txt (13 dims) and shuttle.txt (10 dims) read with their real shapes") {
    val wine = CsvNumericSource.read(spark, "/root/reference/dataset/wine.txt", 13)
    assert(wine.columns.length == 14) // pid + x1..x13
    assert(wine.count() == 178, "UCI wine has 178 rows")
    val ws = CsvNumericSource.stats(wine, 13).head()
    assert(ws.getAs[Double]("max_x5") > 100, "wine x5 (magnesium) is three-digit")

    val shuttle = CsvNumericSource.read(spark, "/root/reference/dataset/shuttle.txt", 10)
    assert(shuttle.columns.length == 11)
    assert(shuttle.count() > 10000, "shuttle is the large reference set")

    val finland = CsvNumericSource.read(spark,
      "/root/reference/dataset/User-locations-Finland_N13467-D2.txt", 2)
    assert(finland.columns.length == 3)
    assert(finland.count() == 13467, "Finland user-locations point count (per the filename)")
  }

  test("the generic k-means clusters wine end-to-end at its native 13 dims") {
    val ds = (1 to 13).map(i => s"x$i")
    val wine = CsvNumericSource.read(spark, "/root/reference/dataset/wine.txt", 13)
    val out = KMeans.lloyd(wine, 3, 3, ds).collect()
    assert(out.map(_.getAs[Long]("n")).sum == 178)
    assert(out.length == 3)
  }

  test("short or non-numeric lines fail loudly, not silently skew the points") {
    val dir = java.nio.file.Files.createTempDirectory("graft_csv").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/bad_short.txt"),
      "1.0,2.0,3.0,4.0\n5.0,6.0\n".getBytes)
    val short = intercept[Exception] {
      CsvNumericSource.read(spark, s"$dir/bad_short.txt", 4).count()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(short).exists(_.contains("fields")), short.getMessage)

    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/bad_alpha.txt"),
      "1.0,2.0,x,4.0\n".getBytes)
    intercept[Exception] {
      CsvNumericSource.read(spark, s"$dir/bad_alpha.txt", 4).count()
    }
  }

  test("the generic k-means clusters iris into sane partitions") {
    val df = CsvNumericSource.read(spark, iris, 4)
    val out = KMeans.lloyd(df, 3, 10).collect()
    assert(out.map(_.getAs[Long]("n")).sum == 150)
    assert(out.length == 3, "three non-empty clusters expected on iris")
    // total SSE after 10 iterations should be in the known k=3 range
    val centers = out.map(r => (0 until 4).map(i => r.getDouble(2 + i)).toArray)
    assert(centers.forall(_.forall(v => v > 0 && v < 10)))
  }
}
