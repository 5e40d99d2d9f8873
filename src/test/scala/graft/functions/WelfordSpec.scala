package graft.functions

import graft.clustering.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class WelfordSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("typed Welford aggregator matches built-in var_samp per group") {
    val vals = graft.Tables.t(spark, "/root/testdata/sf0.001", "lineitem")
      .select($"l_returnflag", $"l_quantity").as[(String, Double)]
    val welford = vals.groupByKey(_._1)
      .mapValues(_._2)
      .agg(WelfordVariance.toColumn)
      .collect().map { case (k, r) => k -> r }.toMap
    val builtin = graft.Tables.t(spark, "/root/testdata/sf0.001", "lineitem")
      .groupBy("l_returnflag")
      .agg(org.apache.spark.sql.functions.var_samp("l_quantity").as("v"),
        org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    assert(welford.keySet == builtin.keySet)
    welford.foreach { case (k, r) =>
      val (v, n) = builtin(k)
      assert(r.n == n)
      assert(math.abs(r.variance - v) < 1e-8 * math.max(1.0, v), s"$k: ${r.variance} vs $v")
    }
  }

  test("welford is numerically stable on large-offset data") {
    val base = 1e9
    val xs = (1 to 1000).map(i => base + (i % 10)).toSeq
    val r = xs.toDS().select(WelfordVariance.toColumn).head()
    // true sample variance of 0..9 repeated evenly
    val mean = xs.sum / xs.length
    val want = xs.map(x => (x - mean) * (x - mean)).sum / (xs.length - 1)
    // naive sum-of-squares at offset 1e9 would lose ~all precision;
    // Welford/Chan keeps relative error at the merge-noise level
    assert(math.abs(r.variance - want) / want < 1e-6)
  }
}
