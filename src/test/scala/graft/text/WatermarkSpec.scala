package graft.text

import graft.clustering.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral specs for the green-list watermark detector. */
class WatermarkSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  /** The operator's green test, recomputed independently. */
  private def green(w: String): Boolean = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(w.getBytes("UTF-8"))
    val nib = (d(0) >> 4) & 0xf
    nib % 4 == 0
  }

  private def rows(texts: String*) =
    Watermark.watermarkOf(
        texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("doc_id", "text"))
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4))))
      .toMap

  test("green counts match an independent md5-nibble recompute") {
    val words = Seq("alpha", "beta", "gamma", "delta", "epsilon",
      "zeta", "eta", "theta", "iota", "kappa")
    val m = rows(words.mkString(" "))
    val (n, g, _, _) = m(0L)
    assert(n == words.size)
    assert(g == words.count(green))
  }

  test("a crafted all-green document is flagged, all-red is not") {
    // brute-force words on each side of the green test
    val vocab = (0 until 2000).map(i => s"w$i")
    val greens = vocab.filter(green).take(40)
    val reds = vocab.filterNot(green).take(40)
    assert(greens.size == 40 && reds.size == 40)
    val m = rows(greens.mkString(" "), reds.mkString(" "))
    val (gn, gg, gz, gf) = m(0L)
    assert(gn == 40 && gg == 40 && gf, s"all-green: $gz")
    // z = (4*40 - 40)/sqrt(120) ≈ 10.95 > 2
    assert(math.abs(gz - 120.0 / math.sqrt(120.0)) < 1e-4)
    val (_, rg, rz, rf) = m(1L)
    assert(rg == 0 && !rf && rz < 0)
  }

  test("the flag is the exact integer form of z > 2") {
    // excess = 4g - n; flagged iff excess > 0 and excess^2 > 12n.
    // n = 16, g = 7 -> excess 12, 144 > 192 false -> not flagged
    // n = 16, g = 8 -> excess 16, 256 > 192 true  -> flagged
    val vocab = (0 until 5000).map(i => s"v$i")
    val gs = vocab.filter(green)
    val rs = vocab.filterNot(green)
    def doc(g: Int, n: Int) = (gs.take(g) ++ rs.take(n - g)).mkString(" ")
    val m = rows(doc(7, 16), doc(8, 16))
    assert(!m(0L)._4 && m(0L)._1 == 16 && m(0L)._2 == 7)
    assert(m(1L)._4 && m(1L)._2 == 8)
  }

  test("empty and whitespace-only documents score zero, unflagged") {
    val m = rows("", " ")
    Seq(0L, 1L).foreach { id =>
      assert(m(id) == ((0L, 0L, 0.0, false)))
    }
  }
}
