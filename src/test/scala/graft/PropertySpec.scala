package graft

import graft.clustering.SparkTestSession
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-style checks over the hash/signature operators using
  * scalacheck generators with a FIXED seed (deterministic CI). All
  * cases for a property are batched into one DataFrame pass, so
  * dozens of generated inputs cost a single Spark job.
  */
class PropertySpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  private val word = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.take(8).mkString)
  private val sentence = Gen.nonEmptyListOf(word).map(_.take(30).mkString(" "))

  test("minhash signatures are invariant under word permutation and duplication") {
    val texts = sample(Gen.listOfN(60, sentence), 11L)
    val rng = new scala.util.Random(7)
    val rows = texts.zipWithIndex.flatMap { case (t, i) =>
      val shuffled = (rng.shuffle(t.split(" ").toList) ++ t.split(" ").take(2)).mkString(" ")
      Seq((i.toLong * 2, t), (i.toLong * 2 + 1, shuffled))
    }
    val sig = dedup.Dedup.signatures(rows.toDF("doc_id", "text")).collect()
      .map(r => r.getLong(0) -> r.toSeq.tail).toMap
    texts.indices.foreach { i =>
      assert(sig(i.toLong * 2) == sig(i.toLong * 2 + 1),
        s"signature changed under permutation for doc $i")
    }
  }

  test("hamming is a metric on generated bitstrings: bounds, symmetry, triangle") {
    val bits = Gen.listOfN(16, Gen.oneOf('0', '1')).map(_.mkString)
    val triples = sample(Gen.listOfN(80, Gen.zip(bits, bits, bits)), 13L)
    val df = triples.toDF("a", "b", "c")
    import graft.functions.GraftFunctions.hamming
    val out = df.select(
      hamming($"a", $"b").as("ab"), hamming($"b", $"a").as("ba"),
      hamming($"a", $"c").as("ac"), hamming($"c", $"b").as("cb"),
      hamming($"a", $"a").as("aa")).collect()
    out.foreach { r =>
      val (ab, ba, ac, cb, aa) =
        (r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4))
      assert(aa == 0, "identity")
      assert(ab == ba, "symmetry")
      assert(ab >= 0 && ab <= 16, "bounds")
      assert(ab <= ac + cb, "triangle inequality")
    }
  }

  test("chunking tiles generated documents exactly (50-word windows, stride 40)") {
    import org.apache.spark.sql.functions._
    val longSentence = Gen.nonEmptyListOf(word).map(_.take(130).mkString(" "))
    val texts = sample(Gen.listOfN(25, longSentence), 19L)
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val out = df.select(col("doc_id"), split(col("text"), " ").as("ws"))
      .select(col("doc_id"), col("ws"),
        explode(expr("sequence(0, greatest(size(ws) - 1, 0), 40)")).as("st"))
      .select(col("doc_id"), expr("st div 40").cast("long").as("chunk_id"),
        expr("array_join(slice(ws, st + 1, 50), ' ')").as("chunk"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .groupBy(_._1)
    texts.zipWithIndex.foreach { case (t, i) =>
      val words = t.split(" ")
      val chunks = out(i.toLong).sortBy(_._2)
      chunks.foreach { case (_, cid, chunk) =>
        val expect = words.slice(cid.toInt * 40, cid.toInt * 40 + 50).mkString(" ")
        assert(chunk == expect, s"doc $i chunk $cid")
      }
      assert(chunks.map(_._2).toSeq == (0L until chunks.length.toLong),
        s"doc $i: consecutive ids")
    }
  }

  test("native cosine equals the HOF fold on generated vectors incl. edge values") {
    import graft.functions.{GraftFunctions, VectorOps}
    val edgeFloat = Gen.oneOf(
      Gen.chooseNum(-10f, 10f), Gen.oneOf(0f, -0f, 1e30f, -1e30f, 1e-30f))
    val vec = Gen.listOfN(8, edgeFloat).map(_.toArray)
    val pairs = sample(Gen.listOfN(100, Gen.zip(vec, vec)), 23L)
    val out = pairs.toDF("a", "b").select(
      GraftFunctions.cosineSim($"a", $"b").as("native"),
      VectorOps.cosineHof("a", "b").as("hof_rounded"),
      org.apache.spark.sql.functions.round(
        GraftFunctions.cosineSim($"a", $"b"), 6).as("native_rounded"))
      .collect()
    out.foreach { r =>
      val (h, n) = (r.getDouble(1), r.getDouble(2))
      assert((h.isNaN && n.isNaN) || h == n, s"native $n vs hof $h")
    }
  }

  test("simhash fingerprints are word-multiset-order invariant") {
    val texts = sample(Gen.listOfN(40, sentence), 17L)
    val rows = texts.zipWithIndex.flatMap { case (t, i) =>
      val doubled = (t.split(" ") ++ t.split(" ").reverse).mkString(" ")
      Seq((i.toLong * 2, t), (i.toLong * 2 + 1, doubled))
    }
    val fp = dedup.Dedup.simhashOf(rows.toDF("doc_id", "text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    texts.indices.foreach { i =>
      assert(fp(i.toLong * 2) == fp(i.toLong * 2 + 1), s"simhash changed for doc $i")
    }
  }

  test("native intersect_size equals size(array_intersect) on generated arrays with dups and nulls") {
    import org.apache.spark.sql.functions._
    val elem: Gen[String] = Gen.frequency(
      9 -> Gen.oneOf("a", "b", "c", "d", "e", "f", "g", "h"), // forced collisions
      1 -> Gen.const(null))
    val arr = Gen.listOfN(12, elem).map(_.take(12))
    val pairs = sample(Gen.listOfN(150, Gen.zip(arr, arr)), 29L)
    val out = pairs.toDF("a", "b").select(
      graft.functions.GraftFunctions.intersectSize($"a", $"b").as("native"),
      size(array_intersect($"a", $"b")).as("builtin")).collect()
    out.zip(pairs).foreach { case (r, p) =>
      assert(r.getInt(0) == r.getInt(1), s"mismatch on $p")
    }
  }

  test("ewma matches the driver-side recursion and stays inside the window's range") {
    import java.sql.Timestamp
    val series = Gen.listOfN(25, Gen.chooseNum(-100.0, 100.0))
    val vals = sample(Gen.listOfN(8, series), 31L)
    val rows = vals.zipWithIndex.flatMap { case (vs, u) =>
      vs.zipWithIndex.map { case (v, i) =>
        (u.toLong * 1000 + i, new Timestamp(1700000000000L + i * 60000L), u.toLong, "t", v, "{}")
      }
    }
    val got = relational.Relational.ewmaOf(
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    vals.zipWithIndex.foreach { case (vs, u) =>
      vs.indices.foreach { i =>
        val window = vs.slice(math.max(0, i - 9), i + 1)
        val expect = window.tail.foldLeft(window.head)((acc, x) => 0.5 * x + 0.5 * acc)
        val g = got(u.toLong * 1000 + i)
        assert(g == expect, s"user $u row $i: $g vs $expect")
        assert(g >= window.min - 1e-9 && g <= window.max + 1e-9, "convexity bound")
      }
    }
  }

  test("morton codes are bounded and exactly invertible to their buckets") {
    val coord = Gen.chooseNum(-50.0, 150.0) // includes out-of-range values
    val pts = sample(Gen.listOfN(300, Gen.zip(coord, coord)), 17L)
    val df = pts.zipWithIndex.map { case ((x, y), i) => (i.toLong, x, y) }
      .toDF("id", "x", "y")
    val (lo, hi) = (0.0, 100.0)
    val got = df.select($"id", $"x", $"y",
      graft.sources.Sinks.mortonCode($"x", lo, hi, $"y", lo, hi).as("z"))
      .as[(Long, Double, Double, Int)].collect()
    def bucket(v: Double): Int =
      math.max(0, math.min(255, math.floor((v - lo) / (hi - lo) * 256.0).toInt))
    got.foreach { case (_, x, y, z) =>
      assert(z >= 0 && z < 65536, s"code out of 16-bit range: $z")
      // de-interleave the bits back into the two bucket ids
      var (xb, yb) = (0, 0)
      (0 until 8).foreach { b =>
        xb |= ((z >> (2 * b + 1)) & 1) << b
        yb |= ((z >> (2 * b)) & 1) << b
      }
      assert(xb == bucket(x) && yb == bucket(y),
        s"morton($x, $y) = $z deinterleaves to ($xb, $yb), expected (${bucket(x)}, ${bucket(y)})")
    }
  }

  test("nfc normalization is idempotent and Normalizer-exact on generated unicode") {
    // valid (non-surrogate) code points incl. combining marks, so the
    // generated strings exercise real composition cases
    val cp = Gen.frequency(
      (4, Gen.chooseNum(0x20, 0x7e)),       // ascii
      (2, Gen.chooseNum(0xc0, 0x17f)),      // latin-1/extended (é, ñ, ...)
      (2, Gen.chooseNum(0x300, 0x36f)),     // combining diacritics
      (1, Gen.chooseNum(0x3b1, 0x3c9)),     // greek
      (1, Gen.const(0x200b)))               // zero-width space
    val str = Gen.listOfN(24, cp).map(_.map(_.toChar).mkString)
    val texts = sample(Gen.listOfN(120, str), 23L)
    val got = texts.zipWithIndex.map(_.swap).toDF("i", "s")
      .select($"i",
        functions.GraftFunctions.nfcNormalize($"s").as("once"),
        functions.GraftFunctions.nfcNormalize(
          functions.GraftFunctions.nfcNormalize($"s")).as("twice"))
      .collect().map(r => r.getInt(0) -> (r.getString(1), r.getString(2))).toMap
    texts.zipWithIndex.foreach { case (s, i) =>
      val want = java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)
      assert(got(i)._1 == want, s"case $i disagrees with Normalizer")
      assert(got(i)._2 == got(i)._1, s"case $i not idempotent")
    }
  }

  test("fused normalize_text equals the composed regexp formulation on generated unicode") {
    // the round-11 fused expression must be bitwise-equal to
    // regexp_replace(nfc_normalize(s), ZW_CONTROL_CLASS, '') — the
    // formulation it replaced, which remains the DuckDB oracle mirror.
    // Generator covers ascii, composition cases, every stripped code
    // point class (ZW/BOM, C0 controls, DEL) and the KEPT whitespace.
    val cp = Gen.frequency(
      (6, Gen.chooseNum(0x20, 0x7e)),       // ascii
      (2, Gen.chooseNum(0xc0, 0x17f)),      // latin-1/extended
      (2, Gen.chooseNum(0x300, 0x36f)),     // combining diacritics
      (1, Gen.oneOf(0x200b, 0x200c, 0x200d, 0xfeff)), // stripped ZW/BOM
      (1, Gen.oneOf(0x00, 0x01, 0x08, 0x0b, 0x0c, 0x0e, 0x1f, 0x7f)), // stripped controls
      (1, Gen.oneOf(0x09, 0x0a, 0x0d)))     // kept \t \n \r
    val str = Gen.listOfN(24, cp).map(_.map(_.toChar).mkString)
    val texts = sample(Gen.listOfN(150, str), 31L)
    val bad = texts.zipWithIndex.map(_.swap).toDF("i", "s")
      .select($"i",
        functions.GraftFunctions.normalizeText($"s").as("fused"),
        org.apache.spark.sql.functions.regexp_replace(
          functions.GraftFunctions.nfcNormalize($"s"),
          text.TextAnalysis.ZW_CONTROL_CLASS, "").as("composed"))
      .collect().filter(r => r.getString(1) != r.getString(2))
    assert(bad.isEmpty, s"fused != composed on ${bad.length} generated strings, " +
      s"first: ${bad.headOption.map(_.getString(1).map(_.toInt.toHexString))}")
  }

  test("the canonical content key is invariant to NFC/NFD re-encoding") {
    import org.apache.spark.sql.functions.col
    val base = sample(Gen.listOfN(60, sentence), 29L)
    // decompose a composed accent into each text (e -> e + U+0301 via
    // NFD of an injected é), pairing every doc with its re-encoding
    val rows = base.zipWithIndex.flatMap { case (t, i) =>
      val accented = t + " café"
      val nfd = java.text.Normalizer.normalize(accented, java.text.Normalizer.Form.NFD)
      Seq((i.toLong * 2, accented), (i.toLong * 2 + 1, nfd))
    }
    assert(rows.grouped(2).forall { case Seq(a, b) => a._2 != b._2 })
    val keys = rows.toDF("doc_id", "text")
      .select($"doc_id", dedup.Dedup.contentHash(col("text")).as("k"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    base.indices.foreach { i =>
      assert(keys(i.toLong * 2) == keys(i.toLong * 2 + 1),
        s"content key changed under NFD re-encoding for doc $i")
    }
  }
}
