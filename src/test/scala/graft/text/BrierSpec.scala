package graft.text

import graft.clustering.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral specs for the Brier score / skill report. */
class BrierSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def report(rows: Seq[(Int, Double)]) = {
    val r = QualityClf.brierOf(rows.toDF("label", "clf_score")).collect()(0)
    (r.getLong(0), r.getLong(1),
      r.getDouble(2),
      Option(r.get(3)).map(_.asInstanceOf[Double]),
      Option(r.get(4)).map(_.asInstanceOf[Double]))
  }

  test("perfect classifier: brier 0, skill 1") {
    val (n, pos, brier, base, skill) =
      report(Seq((1, 1.0), (0, 0.0), (1, 1.0), (0, 0.0)))
    assert(n == 4 && pos == 2 && brier == 0.0)
    assert(base.contains(0.25) && skill.contains(1.0))
  }

  test("uninformative 0.5 forecaster at r=0.5: brier = base, skill 0") {
    val (_, _, brier, base, skill) =
      report(Seq((1, 0.5), (0, 0.5), (1, 0.5), (0, 0.5)))
    assert(brier == 0.25 && base.contains(0.25) && skill.contains(0.0))
  }

  test("degenerate label distribution: base/skill NULL, brier still scored") {
    val (_, pos, brier, base, skill) = report(Seq((1, 0.9), (1, 0.7)))
    assert(pos == 2 && base.isEmpty && skill.isEmpty)
    assert(math.abs(brier - ((0.01 + 0.09) / 2)) < 1e-9)
  }

  test("anti-classifier scores worse than the prior: negative skill") {
    val (_, _, brier, base, skill) =
      report(Seq((1, 0.0), (0, 1.0), (1, 0.0), (0, 1.0)))
    assert(brier == 1.0 && base.contains(0.25) && skill.exists(_ < 0.0))
  }
}
