package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Longest-duplicate-span report (round-16, verdict-15 demand #5):
  * per document, the LENGTH of the longest substring it provably
  * shares with any OTHER document — the maximal-span statistic from
  * the public exact-substring-dedup literature (Lee et al. 2022,
  * "Deduplicating Training Data Makes Language Models Better", which
  * dedups at the 50-token span grain rather than the document grain).
  * `dedup_repeated_spans` (#139) reports the FRACTION of a doc's
  * fixed-64 windows that recur; this reports the maximal contiguous
  * extent — the number that decides span-level vs doc-level dedup
  * for a release (a 10 kB doc with one 6 kB shared span is a span
  * cut; the same doc with scattered 64-char matches is not).
  *
  * Method: anchor on the SAME strided 64-char window hashes #139
  * censuses (width 64, stride 8, raw text), then extend each anchor
  * to its maximal run in CLOSED FORM — for a fixed (doc, partner,
  * alignment offset), matched window positions form stride-8
  * arithmetic runs, and a gaps-and-islands pass (position minus
  * stride x row_number is constant exactly on a consecutive run)
  * yields every maximal run in one window pass, no iterative
  * extension join. A run of k consecutive matched windows proves a
  * shared span of 64 + 8(k-1) chars. Windows held by more than CAP
  * total occurrences corpus-wide are boilerplate and excluded before
  * pairing (the CDC posting-cap discipline) — at 100 TB a viral
  * license header would otherwise quadratically explode the match
  * join.
  *
  * Grid granularity: spans are measured on the stride-8 hash grid,
  * so a planted aligned copy of length L reports at least L - stride
  * + 1 - (stride - 1) = L - 14 in the worst grid phase and >= L - 7
  * when grid-aligned (LongestSpanSpec pins >= L - stride on aligned
  * plants); unaligned copies are the stride trade-off every strided
  * fingerprinting scheme (winnowing included) makes for a 1/stride
  * index.
  *
  * Determinism: md5 window hashes, integer run arithmetic, and a
  * (span DESC, partner ASC) row_number pick — no floating point
  * anywhere. Scale shape: one corpus projection into strided window
  * hashes (codegen HOF, zero shuffle), one hash-key census, one
  * cap-bounded equi-join on the window hash (fan-out <= CAP per
  * window), one bounded window pass per (doc, partner, offset)
  * group, one per-doc rollup. */
object LongestSpan {

  private val WIDTH = 64
  private val STRIDE = 8
  private val CAP = 16

  def qLongestSpan(spark: SparkSession, dir: String): DataFrame =
    longestSpanOf(t(spark, dir, "documents"))

  /** The report over any (doc_id, text) frame. */
  private[dedup] def longestSpanOf(docs: DataFrame): DataFrame = {
    val wins = docs
      .filter(length(col("text")) >= WIDTH)
      .select(col("doc_id"), explode(expr(
        s"transform(sequence(1, length(text) - ${WIDTH - 1}, $STRIDE), " +
          s"i -> named_struct('p', i, 'wh', md5(substring(text, i, $WIDTH))))"))
        .as("w"))
      .select(col("doc_id"), col("w.p").as("p"), col("w.wh").as("wh"))
    val eligible = wins.join(
      wins.groupBy("wh").agg(count(lit(1)).as("n_occ"))
        .filter(col("n_occ") <= CAP)
        .select("wh"),
      "wh")
    val matches = eligible
      .select(col("wh"), col("doc_id").as("da"), col("p").as("pa"))
      .join(eligible.select(col("wh"), col("doc_id").as("db"), col("p").as("pb")),
        "wh")
      .filter(col("da") =!= col("db"))
      .select(col("da"), col("db"), col("pa"), (col("pb") - col("pa")).as("off"))
    val byRun = Window.partitionBy("da", "db", "off").orderBy("pa")
    val spans = matches
      .withColumn("grp", col("pa") - lit(STRIDE) * row_number().over(byRun))
      .groupBy("da", "db", "off", "grp")
      .agg(count(lit(1)).as("k"))
      .select(col("da").as("doc_id"), col("db").as("partner"),
        (lit(WIDTH.toLong) + lit(STRIDE.toLong) * (col("k") - 1))
          .cast("long").as("span"))
    val perPartner = spans.groupBy("doc_id", "partner")
      .agg(max("span").as("span"))
    val pick = Window.partitionBy("doc_id")
      .orderBy(col("span").desc, col("partner").asc)
    perPartner
      .withColumn("__r", row_number().over(pick))
      .filter(col("__r") === 1)
      .select(col("doc_id"), col("partner"), col("span").as("longest_span"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_longest_span" -> (qLongestSpan _))

  val oracleSql: Map[String, String] = Map(
    "dedup_longest_span" ->
      s"""WITH w0 AS (SELECT doc_id, unnest(range(1, len(text) - ${WIDTH - 2}, $STRIDE)) AS p, text
         |  FROM documents WHERE len(text) >= $WIDTH),
         |w AS (SELECT doc_id, p,
         |    md5(substr(text, CAST(p AS INT), $WIDTH)) AS wh FROM w0),
         |elig AS (SELECT w.doc_id, w.p, w.wh FROM w
         |  JOIN (SELECT wh FROM w GROUP BY wh HAVING count(*) <= $CAP) c
         |  USING (wh)),
         |m AS (SELECT a.doc_id AS da, b.doc_id AS db, a.p AS pa,
         |    b.p - a.p AS off
         |  FROM elig a JOIN elig b ON a.wh = b.wh AND a.doc_id != b.doc_id),
         |runs AS (SELECT da, db, off, pa,
         |    pa - $STRIDE * row_number() OVER (
         |      PARTITION BY da, db, off ORDER BY pa) AS grp
         |  FROM m),
         |spans AS (SELECT da AS doc_id, db AS partner,
         |    CAST($WIDTH + $STRIDE * (count(*) - 1) AS BIGINT) AS span
         |  FROM runs GROUP BY da, db, off, grp),
         |per AS (SELECT doc_id, partner, max(span) AS span
         |  FROM spans GROUP BY doc_id, partner),
         |rk AS (SELECT doc_id, partner, span, row_number() OVER (
         |    PARTITION BY doc_id ORDER BY span DESC, partner ASC) AS r
         |  FROM per)
         |SELECT doc_id, partner, span AS longest_span FROM rk WHERE r = 1""".stripMargin)
}
