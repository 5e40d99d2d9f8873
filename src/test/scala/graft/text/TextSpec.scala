package graft.text

import graft.clustering.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class TextSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"

  test("quality metrics are internally consistent") {
    val rows = TextAnalysis.qQuality(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nWords = r.getAs[Long]("n_words")
      val nDistinct = r.getAs[Long]("n_distinct")
      assert(nDistinct <= nWords)
      assert(r.getAs[Double]("ttr") > 0 && r.getAs[Double]("ttr") <= 1.0)
      assert(r.getAs[Double]("stop_ratio") >= 0 && r.getAs[Double]("stop_ratio") <= 1.0)
    }
  }

  test("fingerprint is word-order invariant") {
    import org.apache.spark.sql.functions._
    val a = Seq((1L, "alpha beta gamma"), (2L, "gamma alpha beta beta")).toDF("doc_id", "text")
    a.createOrReplaceTempView("documents_tmp")
    val fps = a.select(md5(array_join(array_sort(array_distinct(split(col("text"), " "))), " ")))
      .as[String].collect()
    assert(fps(0) == fps(1))
  }

  test("tfidf keeps exactly 3 top terms per document with valid ranks") {
    val out = TextAnalysis.qTfidf(spark, sf).cache()
    val perDoc = out.groupBy("doc_id").count().select("count").as[Long].collect()
    assert(perDoc.forall(_ == 3))
    assert(out.filter($"rk" < 1 || $"rk" > 3).count() == 0)
    assert(out.filter($"tfidf" < 0).count() == 0)
    out.unpersist()
  }

  test("langid falls back to 'und' only when no marker matches") {
    val out = TextAnalysis.qLangId(spark, sf)
    val bad = out.filter(
      ($"pred_lang" === "und" && ($"s_en" + $"s_de" + $"s_fr" + $"s_es" + $"s_zh") > 0) ||
        ($"pred_lang" =!= "und" && ($"s_en" + $"s_de" + $"s_fr" + $"s_es" + $"s_zh") === 0))
    assert(bad.count() == 0)
  }

  test("clean-corpus pipeline output respects its own gates") {
    val out = graft.pipeline.CleanCorpus.qClean(spark, sf)
    assert(out.count() > 0)
    assert(out.filter($"n_words" < 20 || $"stop_ratio" > 0.5).count() == 0)
  }
}
