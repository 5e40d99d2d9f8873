package graft.functions

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the exact fixed-point layer every round-13
  * determinism fix rides on. The reference implementation for all
  * rounding claims is BigDecimal on the double's exact value.
  * Fixed-seed scalacheck sampling (the PropertySpec convention). */
class MicroGridSpec extends AnyFunSuite {

  private def samples[A](g: Gen[A], n: Int, seed: Long): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(seed + i)))

  private def refRound0(y: Double): BigInt =
    BigDecimal(y).setScale(0, BigDecimal.RoundingMode.HALF_UP).toBigInt

  test("quantize matches the exact scale-0 HALF_UP decision (random range)") {
    samples(Gen.choose(-4.4e9, 4.4e9), 500, 1L).foreach { x =>
      assert(BigInt(MicroGrid.quantize(x)) == refRound0(x * 1e6), s"x=$x")
    }
  }

  test("quantize ties round away from zero (std::round semantics)") {
    assert(BigInt(MicroGrid.quantizeAt(2.5, 1.0)) == BigInt(3))
    assert(BigInt(MicroGrid.quantizeAt(-2.5, 1.0)) == BigInt(-3))
    assert(MicroGrid.quantizeBig(1234567.5, 1.0) == BigInt(1234568))
    assert(MicroGrid.quantizeBig(-1234567.5, 1.0) == BigInt(-1234568))
  }

  test("roundDiv6 is the exact HALF_UP round of (num/den)/1e6") {
    val nums = samples(Gen.choose(-1000000000000L, 1000000000000L), 500, 2L)
    val dens = samples(Gen.choose(1L, 999983L), 500, 3L)
    nums.zip(dens).foreach { case (n, d) =>
      val expect = (BigDecimal(n) / BigDecimal(d) / BigDecimal(1000000))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(MicroGrid.roundDiv6(BigInt(n), BigInt(d)) == expect, s"$n/$d")
    }
  }

  test("roundDiv6 ties away from zero on exact midpoints") {
    // num/den = 1.5 -> 1.5e-6, a scale-6 midpoint at scale 7
    assert(MicroGrid.roundDiv6(BigInt(3), BigInt(2)) == 2e-6)
    assert(MicroGrid.roundDiv6(BigInt(-3), BigInt(2)) == -2e-6)
  }

  test("fp fast path floor(y+0.5) is bit-equal to round-half-away for 0 <= y < 2^52") {
    // the kmeans_bic / calinski-harabasz quantization claim
    samples(Gen.choose(0.0, 4.4e15), 500, 4L).foreach { y =>
      assert(BigInt(math.floor(y + 0.5).toLong) == refRound0(y), s"y=$y")
    }
    // adversarial: just below a tie, exactly a tie, just above
    for (k <- Seq(1.0, 1e6, 1e12, 4.0e15)) {
      val tie = k + 0.5
      if (tie - k == 0.5) // tie representable at this magnitude
        assert(math.floor(tie + 0.5).toLong == refRound0(tie).toLong, s"tie k=$k")
      val below = Math.nextDown(tie)
      assert(BigInt(math.floor(below + 0.5).toLong) == refRound0(below), s"below k=$k")
      val above = Math.nextUp(tie)
      assert(BigInt(math.floor(above + 0.5).toLong) == refRound0(above), s"above k=$k")
    }
  }

  test("quantizeBig is exact at any magnitude (integral doubles above 2^52)") {
    samples(Gen.choose(4.6e15, 1e18), 300, 5L).foreach { y =>
      // above 2^52 every double is integral: round is the identity
      assert(MicroGrid.quantizeBig(y, 1.0) == BigDecimal(y).toBigInt, s"y=$y")
    }
  }

  test("sqlRoundDiv6 integer formula (2|num|+den) div (2den) equals roundDiv6") {
    val nums = samples(Gen.choose(-100000000L, 100000000L), 500, 6L)
    val dens = samples(Gen.choose(1L, 99991L), 500, 7L)
    nums.zip(dens).foreach { case (n, d) =>
      val q = (BigInt(n).abs * 2 + d) / (BigInt(d) * 2)
      val viaFormula = (if (n < 0) -q else q).toDouble / 1e6
      assert(viaFormula == MicroGrid.roundDiv6(BigInt(n), BigInt(d)), s"$n/$d")
    }
  }
}
