package graft.relational

import graft.clustering.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral specs for the one-way ANOVA F report. */
class AnovaSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def f(rows: Seq[(String, Long)]) =
    Anova.anovaOf(rows.toDF("grp", "c")).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(5), r.getDouble(6),
          r.getDouble(7))))
      .toMap

  test("hand-computed two-group F: separated means, equal spread -> F = 8") {
    // a=(100,200) mean 150, b=(300,400) mean 350, grand 250
    // SSW = 10000, SSB = 40000, F = (40000/1)/(10000/2) = 8
    val m = f(Seq(("a", 100L), ("a", 200L), ("b", 300L), ("b", 400L)))
    assert(m("a") == ((2L, 150L, 10000.0, 40000.0, 8.0)))
    assert(m("b")._2 == 350L)
  }

  test("identical group distributions -> SSB 0, F 0") {
    val m = f(Seq(("a", 10L), ("a", 30L), ("b", 10L), ("b", 30L)))
    assert(m("a")._4 == 0.0) // ssb
    assert(m("a")._5 == 0.0) // f
  }
}
