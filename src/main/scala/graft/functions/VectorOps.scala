package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns, done with
  * codegen'd higher-order functions (zip_with/aggregate) — no UDFs, no
  * shuffle, stays inside WholeStageCodegen.
  *
  * Every operation is mirrored by a SQL fragment generator used by the
  * DuckDB oracles; elements are cast float->double BEFORE arithmetic
  * on both sides (exact widening), and the fold is left-to-right, so
  * per-row results agree across engines to the last ulp (then round 6
  * absorbs any residual list_sum reordering).
  */
object VectorOps {

  /** Left-fold dot product of two array<float> columns, in doubles. */
  def dot(a: String, b: String): Column = expr(
    s"aggregate(zip_with($a, $b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), " +
      "CAST(0 AS DOUBLE), (acc, v) -> acc + v)")

  /** Cosine similarity rounded to 6 decimals (SURVEY.md §4), through
    * the NATIVE codegen'd expression (graft.functions.CosineSimilarity
    * — one fused loop inside WholeStageCodegen; the HOF formulation
    * above pays lambda dispatch + an intermediate array per pair). The
    * expression reproduces the HOF fold order bitwise, so the DuckDB
    * mirrors below are unchanged; CosineSpec asserts the equivalence. */
  def cosine(a: String, b: String): Column =
    round(GraftFunctions.cosineSim(col(a), col(b)), 6)

  /** The HOF formulation, kept as the reference for the equivalence
    * spec (and for sessions without the extension registered). */
  def cosineHof(a: String, b: String): Column =
    round(dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b))), 6)

  /** Sign-LSH bucket key from the first `bits` dimensions. At scale the
    * production variant hashes random projections; coordinate signs
    * keep the oracle engine-portable while exercising the identical
    * bucket-join plan shape. */
  def signBucket(e: String, bits: Int): Column =
    concat((1 to bits).map(i =>
      when(expr(s"element_at($e, $i)") >= 0, lit("1")).otherwise(lit("0"))): _*)

  // ---- SQL mirrors -----------------------------------------------------

  def dotSql(a: String, b: String): String =
    s"list_sum(list_transform(list_zip($a, $b), x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))"

  def cosineSql(a: String, b: String): String =
    s"round(${dotSql(a, b)} / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)})), 6)"

  def signBucketSql(e: String, bits: Int): String =
    "concat(" + (1 to bits).map(i =>
      s"CASE WHEN $e[$i] >= 0 THEN '1' ELSE '0' END").mkString(", ") + ")"
}
