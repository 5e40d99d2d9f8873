package graft.pipeline

import graft.clustering.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral specs for deterministic minority-class oversampling. */
class OversampleSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def run(rows: Seq[(Long, String)]) =
    Splits.oversampleOf(rows.toDF("doc_id", "lang"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap

  test("factor is floor(max/n); majority class keeps factor 1") {
    // en: 6 docs, fr: 2 docs, de: 4 docs -> factors 1, 3, 1
    val rows = (1L to 6L).map(_ -> "en") ++ Seq(7L -> "fr", 8L -> "fr") ++
      (9L to 12L).map(_ -> "de")
    val m = run(rows)
    assert(m("en") == ((6L, 1L, 6L, (1L to 6L).sum)))
    assert(m("fr")._2 == 3L && m("fr")._3 == 6L)
    // fr checksum: each doc x replicas 1..3 -> sum(doc * (1+2+3)) = (7+8)*6
    assert(m("fr")._4 == 90L)
    assert(m("de") == ((4L, 1L, 4L, (9L to 12L).sum)))
  }

  test("no document is dropped and n_after = n_before * factor") {
    val rows = (1L to 10L).map(_ -> "a") ++ (11L to 13L).map(_ -> "b")
    val m = run(rows)
    m.values.foreach { case (before, f, after, _) =>
      assert(f >= 1L && after == before * f)
    }
  }

  test("rerun-stable (no RNG state)") {
    val rows = (1L to 9L).map(i => i -> s"l${i % 3}")
    assert(run(rows) == run(rows))
  }
}
