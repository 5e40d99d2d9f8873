package graft.text

import graft.clustering.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class QualityClfSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  // crafted corpus with genuinely separable vocabularies: "good"
  // reference docs use one word set, "bad" crawl docs another —
  // the regime a fastText-style curation classifier is built for
  private def crafted = {
    val good = Seq(
      "clear prose reads well structured argument flows clear prose",
      "well structured argument clear reads prose flows argument well",
      "prose argument flows structured well clear reads reads flows",
      "flows clear structured prose well argument reads clear well")
    val bad = Seq(
      "buy click spam free winner click buy spam free spam",
      "winner free spam buy click spam winner buy click free",
      "spam click buy free winner buy spam click winner spam",
      "free winner click spam buy winner free spam buy click")
    (good.map((_, "en")) ++ bad.map((_, "xx"))).zipWithIndex
      .map { case ((text, lang), i) => (i.toLong, s"src$i", lang, text) }
      .toDF("doc_id", "source", "lang", "text")
  }

  test("GD separates a crafted good/bad corpus") {
    val feats = QualityClf.featurizeDocs(crafted)
    val w = QualityClf.trainOn(feats)
    assert(w.exists(_ != 0.0), "training left all weights at zero")
    val rows = QualityClf.scoreOn(feats, w).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Int]("label"), r.getAs[Double]("clf_score"), r.getAs[Boolean]("keep")))
      .toMap
    val goodScores = rows.values.filter(_._1 == 1).map(_._2)
    val badScores = rows.values.filter(_._1 == 0).map(_._2)
    assert(goodScores.min > badScores.max,
      s"classifier failed to separate: good ${goodScores.toSeq.sorted} " +
        s"vs bad ${badScores.toSeq.sorted}")
    rows.values.foreach { case (label, _, keep) =>
      assert(keep == (label == 1), "keep flag must follow the learned boundary")
    }
  }

  test("training is deterministic and scores are round-6 stable") {
    val feats = QualityClf.featurizeDocs(crafted)
    val w1 = QualityClf.trainOn(feats)
    val w2 = QualityClf.trainOn(feats)
    assert(w1.toSeq == w2.toSeq, "same corpus must yield bit-identical weights")
    w1.foreach { wf =>
      assert(wf == BigDecimal(wf).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
        s"weight $wf not on the round-6 grid")
    }
    val scores = QualityClf.scoreOn(feats, w1).collect().map(_.getAs[Double]("clf_score"))
    scores.foreach { s =>
      assert(s > 0.0 && s < 1.0)
      assert(s == BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
  }

  test("calibration report: bins partition the corpus, ECE recomputes from its own rows") {
    val feats = QualityClf.featurizeDocs(crafted)
    val scored = QualityClf.scoreOn(feats, QualityClf.trainOn(feats))
    val rows = QualityClf.calibrationOf(scored).collect()
    assert(rows.length >= 2, "separated good/bad scores must span >= 2 bins")
    assert(rows.map(_.getAs[Long]("n_docs")).sum == 8L, "bins must partition the docs")
    val n = rows.map(_.getAs[Long]("n_docs")).sum.toDouble
    val ece = rows.map(r => r.getAs[Long]("n_docs") * r.getAs[Double]("abs_gap")).sum / n
    val reported = rows.head.getAs[Double]("ece")
    assert(rows.forall(_.getAs[Double]("ece") == reported), "ece must be global")
    assert(math.abs(ece - reported) < 1e-6, s"ece $reported != recomputed $ece")
    rows.foreach { r =>
      assert(r.getAs[Double]("mean_score") >= 0.0 && r.getAs[Double]("mean_score") <= 1.0)
      assert(r.getAs[Double]("label_rate") >= 0.0 && r.getAs[Double]("label_rate") <= 1.0)
    }
  }

  test("AUC machinery: perfect separation, reversal, and ties match pairwise truth") {
    def auc(rows: Seq[(Int, Double)]): Double = {
      val scored = rows.zipWithIndex
        .map { case ((l, s), i) => (i.toLong, l, s) }.toDF("doc_id", "label", "clf_score")
      val r = QualityClf.aucParts(scored).collect()(0)
      r.getAs[Double]("u") / (r.getAs[Long]("n_pos") * r.getAs[Long]("n_neg"))
    }
    // brute-force pairwise truth: P(score_pos > score_neg) + 0.5 P(tie)
    def truth(rows: Seq[(Int, Double)]): Double = {
      val pos = rows.filter(_._1 == 1).map(_._2); val neg = rows.filter(_._1 == 0).map(_._2)
      pos.flatMap(p => neg.map(n => if (p > n) 1.0 else if (p == n) 0.5 else 0.0))
        .sum / (pos.length * neg.length)
    }
    val perfect = Seq((1, 0.9), (1, 0.8), (0, 0.2), (0, 0.1))
    assert(auc(perfect) == 1.0)
    val reversed = perfect.map { case (l, s) => (1 - l, s) }
    assert(auc(reversed) == 0.0)
    val tied = Seq((1, 0.5), (0, 0.5), (1, 0.7), (0, 0.3), (1, 0.3), (0, 0.9))
    assert(auc(tied) == truth(tied), s"${auc(tied)} vs pairwise ${truth(tied)}")
  }

  test("corpus query: one score per document, all on the round-6 grid") {
    val rows = QualityClf.qQualityClf(spark, "/root/testdata/sf0.001").collect()
    assert(rows.length == 500)
    assert(rows.map(_.getAs[Long]("doc_id")).distinct.length == 500)
    assert(rows.forall { r =>
      val s = r.getAs[Double]("clf_score"); s > 0.0 && s < 1.0
    })
  }
}
