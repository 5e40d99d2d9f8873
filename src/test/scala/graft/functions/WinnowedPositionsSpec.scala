package graft.functions

import graft.clustering.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Equivalence + guarantee specs for the native WinnowedPositions
  * codegen expression (the PQEncodeSpec discipline: the hot native
  * path is pinned against an independent reimplementation of the
  * declarative semantics, plus the paper's selection guarantees). */
class WinnowedPositionsSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark

  private val MOD = 1000000007L
  private val PACK = 1L << 21

  /** Straight-line reimplementation of the declarative formulation
    * (the DuckDB oracle's list_transform/list_min chain). */
  private def reference(text: String, k: Int, w: Int): Seq[Int] = {
    val cps = text.codePoints().toArray
    val nk = cps.length - (k - 1)
    if (nk < w) return Seq.empty
    val hs = (1 to nk).map { i =>
      (0 until k).foldLeft(0L)((h, j) => (h * 31 + cps(i - 1 + j)) % MOD)
    }
    (1 to nk - w + 1).map { s =>
      (s until s + w).map(j => hs(j - 1) * PACK + (PACK - 1 - j)).min
    }.distinct.map(x => (PACK - 1 - (x % PACK)).toInt)
  }

  private def native(text: String, k: Int, w: Int): Seq[Int] = {
    val a = WinnowedPositions.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString(text), k, w)
    (0 until a.numElements()).map(a.getInt)
  }

  test("native == declarative reimplementation on random strings") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 200) {
      val n = rnd.nextInt(300)
      val s = (0 until n).map(_ => ('a' + rnd.nextInt(8)).toChar).mkString
      for ((k, w) <- Seq((5, 4), (32, 16), (8, 8)))
        assert(native(s, k, w) == reference(s, k, w),
          s"k=$k w=$w len=$n")
    }
  }

  test("non-ascii codepoints hash like the SQL ascii() (codepoint, not UTF-16 unit)") {
    val s = "héllo wörld ünïcode — 測試 " * 8
    assert(native(s, 5, 4) == reference(s, 5, 4))
  }

  test("paper guarantee: any shared substring >= k + w - 1 shares a selected k-gram") {
    val rnd = new scala.util.Random(7)
    val shared = (0 until 64).map(_ => ('a' + rnd.nextInt(20)).toChar).mkString
    val a = "xx1yy2zz3" + shared + "qq4rr5"
    val b = "mmmmmmmmmmmmmmmmmmmmmmmm" + shared + "nn"
    val (k, w) = (32, 16)
    def grams(text: String) =
      native(text, k, w).map(p => text.substring(p - 1, p - 1 + k)).toSet
    assert(grams(a).intersect(grams(b)).nonEmpty,
      "a 64-char shared substring must share a selected 32-gram at w=16")
  }

  test("short and null-ish inputs: below k+w-1 chars selects nothing") {
    assert(native("", 32, 16).isEmpty)
    assert(native("a" * 46, 32, 16).isEmpty)
    assert(native("a" * 47, 32, 16).nonEmpty)
  }

  test("selected positions are valid 1-based k-gram starts, distinct") {
    val s = ('a' to 'z').mkString * 20
    val ps = native(s, 32, 16)
    assert(ps.distinct == ps)
    assert(ps.forall(p => p >= 1 && p + 32 - 1 <= s.length))
  }
}
