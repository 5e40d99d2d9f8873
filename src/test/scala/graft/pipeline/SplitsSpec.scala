package graft.pipeline

import graft.clustering.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class SplitsSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"

  test("mix gate downsamples odd sources below even ones, deterministically") {
    val rows = Mix.qMix(spark, sf).collect()
    assert(rows.length == 20, "one row per source")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_kept") <= r.getAs[Long]("n_docs"))
      val rate = r.getAs[Double]("realized_rate")
      assert(rate >= 0.0 && rate <= 1.0)
    }
    def meanRate(parity: Int): Double = {
      val rs = rows.filter(_.getAs[String]("source").drop(3).toInt % 2 == parity)
        .map(_.getAs[Double]("realized_rate"))
      rs.sum / rs.length
    }
    assert(meanRate(0) > meanRate(1) + 0.2,
      s"even sources target 75%, odd 25%: even=${meanRate(0)} odd=${meanRate(1)}")
    // pure hash gate: a second run is bit-identical
    val again = Mix.qMix(spark, sf).collect()
    assert(rows.map(_.toString).sorted.sameElements(again.map(_.toString).sorted))
  }

  test("train/val/test partitions every document exactly once, roughly 80/10/10") {
    val out = Splits.qSplit(spark, sf)
      .select("split", "n_docs").as[(String, Long)].collect().toMap
    val total = graft.Tables.t(spark, sf, "documents").count()
    assert(out.keySet == Set("train", "val", "test"))
    assert(out.values.sum == total, "splits must partition the corpus")
    assert(out("train") > out("val") && out("train") > out("test"),
      s"train must dominate: $out")
    val trainFrac = out("train").toDouble / total
    assert(trainFrac > 0.7 && trainFrac < 0.9, s"~80% expected, got $trainFrac")
  }

  test("split assignment is a pure function of the id — stable across runs") {
    val a = Splits.qSplit(spark, sf).collect().map(_.toSeq).toSet
    val b = Splits.qSplit(spark, sf).collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("event sampling keeps roughly 10% per stratum") {
    val sampled = Splits.qSampleEvents(spark, sf)
      .select("n_sampled").as[Long].collect().sum
    val total = graft.Tables.t(spark, sf, "events").count()
    val frac = sampled.toDouble / total
    assert(frac > 0.05 && frac < 0.15, s"~10% expected, got $frac")
  }
}
