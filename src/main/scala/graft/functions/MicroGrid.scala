package graft.functions

/** Exact micro-grid (1e-6) fixed-point arithmetic — the §4 "grid sum"
  * discipline packaged: quantize doubles to integer micro-units with a
  * SCALE-0 rounding decision (exact in both engines on the identical
  * IEEE double — unlike scale-6 rounding, which DuckDB implements with
  * a floating multiply by 1e6 that can cross a midpoint), accumulate
  * order-free integer sums, and make every final round-6 decision as
  * an exact integer division. This is the fix for the round-12
  * cross-host hash flips (embed_covariance, pipeline_length_buckets):
  * no order-dependent double sum is ever rounded again.
  *
  * Cross-engine contract, verified term by term:
  *  - `x * 1e6` is one IEEE multiply → bit-identical in JVM and DuckDB.
  *  - scale-0 HALF_UP on that double: Spark/Scala BigDecimal decides on
  *    the value's decimal expansion; DuckDB round(DOUBLE) is
  *    std::round (ties away from zero). For |y| < 2^52 every tie value
  *    k+0.5 is itself a representable double, so both make the same
  *    exact decision on the same number.
  *  - integer sums/products are exact and associative (order-free);
  *    per-partition Long partials overflow-check with Math.addExact
  *    and merge into BigInt, so a layout change can only crash loudly,
  *    never flip a digit.
  *  - round-6 of a rational num/den is the exact integer
  *    q = (2|num| + den) div (2 den) with the sign reapplied
  *    (HALF_UP = ties away from zero), mirrored in DuckDB with
  *    HUGEINT `//` on the same nonnegative operands. */
object MicroGrid {

  /** round-half-away(x * scaleFactor) as Long — the exact scale-0
    * decision at any power-of-ten grid (coarser grids for larger
    * magnitudes: the decision is only exact while |x*scale| < 2^52,
    * where every tie value k+0.5 is itself a representable double). */
  def quantizeAt(x: Double, scaleFactor: Double): Long = {
    val y = x * scaleFactor
    require(math.abs(y) < 4.5e15, s"value $x outside grid range at scale $scaleFactor")
    BigDecimal(y).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
  }

  /** round-half-away(x * 1e6) as Long — the exact scale-0 decision. */
  def quantize(x: Double): Long = quantizeAt(x, 1e6)

  /** [[quantizeAt]] without the Long-range bound: above 2^52 every
    * double is already integral, so round(y) is the identity in both
    * engines and the decision stays exact at ANY magnitude (the grid
    * merely coarsens to the double's own ulp); BigInt holds the
    * result. DuckDB mirror: CAST(round(y) AS HUGEINT). */
  def quantizeBig(x: Double, scaleFactor: Double): BigInt = {
    val y = x * scaleFactor
    require(!y.isNaN && !y.isInfinite, s"cannot quantize $x at scale $scaleFactor")
    BigDecimal(y).setScale(0, BigDecimal.RoundingMode.HALF_UP).toBigInt
  }

  /** Exact HALF_UP round of (num/den)/1e6 → the round-6 double.
    * `den` must be positive. */
  def roundDiv6(num: BigInt, den: BigInt): Double = {
    require(den > 0, "roundDiv6 needs a positive denominator")
    val q = (num.abs * 2 + den) / (den * 2)
    (if (num < 0) -q else q).toDouble / 1e6
  }

  /** DuckDB mirror of [[quantize]] for a DOUBLE-typed SQL expression
    * (result HUGEINT so products never overflow). */
  def sqlQuantize(x: String): String =
    s"CAST(round(($x) * 1000000.0) AS HUGEINT)"

  /** DuckDB mirror of [[roundDiv6]]; operands must be HUGEINT-typed
    * (DuckDB `//` truncates toward zero = floor on the nonnegative
    * operands used here). */
  def sqlRoundDiv6(num: String, den: String): String =
    s"""(CAST(CASE WHEN ($num) >= 0
       |  THEN  ((2 * ($num) + ($den)) // (2 * ($den)))
       |  ELSE -((2 * (-($num)) + ($den)) // (2 * ($den))) END
       |  AS DOUBLE) / 1000000.0)""".stripMargin
}
