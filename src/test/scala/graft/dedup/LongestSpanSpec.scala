package graft.dedup

import graft.clustering.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral specs for the longest-duplicate-span report. */
class LongestSpanSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  // Deterministic filler with no 64-char self-similarity: a counter
  // stream, so distinct regions never collide on a window hash.
  private def filler(seed: Int, n: Int): String =
    Iterator.from(seed).map(i => s"<$i>").flatten.take(n).mkString

  test("planted aligned copy of length L reports >= L - stride") {
    for (l <- Seq(64, 71, 100, 200, 321)) {
      val shared = filler(1000, l)
      // distinct boundary chars so the TRUE shared prefix is exactly L
      // (both fillers start with '<', which would extend it by one)
      val d = docs(
        (1L, shared + "A" + filler(5000, 120)),
        (2L, shared + "B" + filler(9000, 80)))
      val got = LongestSpan.longestSpanOf(d).collect()
        .map(r => r.getLong(0) -> r.getLong(2)).toMap
      assert(got.keySet == Set(1L, 2L))
      assert(got(1L) >= l - 8, s"L=$l got ${got(1L)}")
      assert(got(1L) <= l, s"span cannot exceed the plant: L=$l got ${got(1L)}")
      assert(got(2L) == got(1L), "span is symmetric for an aligned prefix plant")
    }
  }

  test("scattered matches do not merge: two separate 64-windows beat no run") {
    // doc 1 and doc 2 share two DISALIGNED 64-char blocks separated by
    // differing filler: each anchors its own run, longest stays ~64.
    val b1 = filler(100, 64).take(64)
    val b2 = filler(300, 64).take(64)
    val d = docs(
      (1L, b1 + filler(7000, 160) + b2),
      (2L, b1 + filler(8000, 240) + b2))
    val got = LongestSpan.longestSpanOf(d).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got(1L) >= 64 && got(1L) < 128,
      s"separated blocks must not chain into one span: ${got(1L)}")
  }

  test("no cross-doc collision -> empty report; self-repeats do not count") {
    // doc 3 repeats its own block twice but shares nothing with doc 4.
    val b = filler(400, 80).take(80)
    val d = docs(
      (3L, b + filler(6000, 100) + b),
      (4L, filler(12000, 300)))
    assert(LongestSpan.longestSpanOf(d).collect().isEmpty)
  }

  test("partner tie-break picks the smallest partner id at the max span") {
    val shared = filler(2000, 96)
    val d = docs(
      (1L, shared + filler(5000, 50)),
      (2L, shared + filler(5500, 60)),
      (3L, shared + filler(5800, 70)))
    val got = LongestSpan.longestSpanOf(d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got(1L)._1 == 2L, s"doc 1 ties at 2 and 3, must pick 2: ${got(1L)}")
    assert(got(2L)._1 == 1L && got(3L)._1 == 1L)
  }

  test("span mass: one aligned plant yields one island of the detected span") {
    val shared = filler(2000, 200)
    val d = docs(
      (1L, shared + "A" + filler(5000, 120)),
      (2L, shared + "B" + filler(9000, 80)))
    val mass = LongestSpan.spanMassOf(d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val longest = LongestSpan.longestSpanOf(d).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    for (id <- Seq(1L, 2L)) {
      val (nIslands, chars, len) = mass(id)
      assert(nIslands == 1, s"doc $id islands $nIslands")
      assert(chars == longest(id),
        s"single plant: mass must equal the longest span ($chars vs ${longest(id)})")
      assert(chars <= len)
    }
  }

  test("span mass: two separated plants sum, longest does not") {
    val b1 = filler(100, 96)
    val b2 = filler(300, 96)
    val d = docs(
      (1L, b1 + "A" + filler(7000, 159) + "C" + b2),
      (2L, b1 + "B" + filler(8000, 239) + "D" + b2))
    // both plants grid-aligned in doc 1: b2 starts at 96+1+159+1+1 = 257 (mod 8 = 1)
    val mass = LongestSpan.spanMassOf(d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val longest = LongestSpan.longestSpanOf(d).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(longest(1L) <= 96, "separated plants must not chain in longest")
    assert(mass(1L)._2 > longest(1L),
      s"mass must count BOTH plants: ${mass(1L)._2} vs longest ${longest(1L)}")
  }

  test("rebuild: the loser's cut excises the span, winners and clean docs pass through") {
    val shared = filler(2000, 200) // detected span 200 (grid-aligned prefix)
    val t1 = shared + "A" + filler(5000, 120)
    val t2 = shared + "B" + filler(9000, 80)
    val t3 = filler(12000, 300)
    val d = docs((1L, t1), (2L, t2), (3L, t3))
    val got = LongestSpan.spanRebuildOf(d).collect()
      .map(r => r.getLong(0) ->
        (r.getBoolean(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getString(5)))
      .toMap
    assert(got.keySet == Set(1L, 2L, 3L), "rebuild outputs the FULL corpus")
    // doc 2 loses to doc 1 (doc_id > partner), span 200 >= MIN_CUT
    val (cut2, start2, len2, after2, md5b) = got(2L)
    assert(cut2 && start2 == 1L && len2 == 200L)
    assert(after2 == t2.length - 200)
    val expected2 = t2.substring(200) // cut [1, 200] 1-based = drop first 200 chars
    assert(md5b == java.security.MessageDigest.getInstance("MD5")
      .digest(expected2.getBytes("UTF-8")).map("%02x".format(_)).mkString)
    // doc 1 wins (partner 2 > 1): untouched; doc 3 clean: untouched
    assert(!got(1L)._1 && got(1L)._4 == t1.length)
    assert(!got(3L)._1 && got(3L)._4 == t3.length)
  }

  test("rebuild: a sub-MIN_CUT shared span is kept (64-char match, no cut)") {
    val b = filler(100, 64)
    val d = docs(
      (1L, b + "A" + filler(7000, 100)),
      (2L, b + "B" + filler(8000, 100)))
    val got = LongestSpan.spanRebuildOf(d).collect()
    assert(got.forall(!_.getBoolean(1)), "64 < MIN_CUT must not cut")
  }

  test("winnowed: a plant at a NON-grid offset reports >= L - (k + w)") {
    // offsets 13 and 29 are both off the stride-8 grid AND different
    // from each other — the fixed-grid detector's blind spot; the
    // winnowing anchors are position-independent (k=32, w=16)
    for (l <- Seq(120, 200, 321)) {
      val shared = filler(1000, l)
      val d = docs(
        (1L, filler(5000, 13) + shared + "A" + filler(6000, 60)),
        (2L, filler(9000, 29) + shared + "B" + filler(7000, 40)))
      val got = LongestSpan.spanWinnowedOf(d).collect()
        .map(r => r.getLong(0) -> r.getLong(2)).toMap
      assert(got.keySet == Set(1L, 2L), s"L=$l missing docs: $got")
      assert(got(1L) >= l - 48, s"L=$l got ${got(1L)} (guarantee L-(k+w))")
      assert(got(1L) <= l, s"claimed span cannot exceed the plant: $got")
      assert(got(2L) == got(1L), "winnowed span is symmetric")
    }
  }

  test("winnowed sees what the grid cannot: unaligned copy with edits every ~60 chars") {
    // identical 60-char segments separated by a one-char edit: every
    // 64-char grid window straddles an edit, so the grid report is
    // empty; each 60-char segment clears the winnowing guarantee
    // (k + w - 1 = 47) and anchors a span
    val segs = (0 until 5).map(i => filler(2000 + 100 * i, 60))
    val t1 = filler(5000, 13) + segs.zipWithIndex.map { case (s, i) => s + ('A' + i).toChar }.mkString
    val t2 = filler(9000, 29) + segs.zipWithIndex.map { case (s, i) => s + ('a' + i).toChar }.mkString
    val d = docs((1L, t1), (2L, t2))
    assert(LongestSpan.longestSpanOf(d).collect().isEmpty,
      "the stride-8/64 grid must miss sub-64 edited segments")
    val won = LongestSpan.spanWinnowedOf(d).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(won.keySet == Set(1L, 2L), s"winnowed must detect the segments: $won")
    assert(won(1L) >= 60 - 48 && won(1L) <= 60, s"got ${won(1L)}")
  }

  test("winnowed: clean docs stay silent") {
    val d = docs((1L, filler(5000, 300)), (2L, filler(9000, 300)))
    assert(LongestSpan.spanWinnowedOf(d).collect().isEmpty)
  }

  test("rebuild_all: every qualifying span is excised, not just the maximal one") {
    // doc 2 (the loser) shares TWO disjoint 200-char spans with doc 1,
    // both grid-aligned in both docs (starts == 1 mod 8)
    val s1 = filler(2000, 200)
    val s2 = filler(3000, 200)
    val t1 = s1 + "A" + filler(5000, 118) + "C" + s2 + "E" + filler(5500, 40)
    val t2 = s1 + "B" + filler(8000, 158) + "D" + s2 + "F" + filler(8500, 24)
    val t3 = filler(12000, 300)
    val d = docs((1L, t1), (2L, t2), (3L, t3))
    def md5Of(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val all = LongestSpan.spanRebuildAllOf(d).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))).toMap
    assert(all.keySet == Set(1L, 2L, 3L), "rebuild_all outputs the FULL corpus")
    // loser: both [1,201) and [361,561) cut
    val (n2, chars2, after2, md2) = all(2L)
    assert(n2 == 2L && chars2 == 400L, s"expected 2 cuts of 400 chars: $n2/$chars2")
    val expected2 = t2.substring(200, 360) + t2.substring(560)
    assert(after2 == expected2.length && md2 == md5Of(expected2),
      "multi-splice must be byte-exact")
    // the single-cut variant removes only ONE of the two spans
    val single = LongestSpan.spanRebuildOf(d).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(single(2L) == 200L)
    assert(chars2 > single(2L), "multi-cut savings must exceed single-cut")
    // winner + clean doc pass through byte-identically
    assert(all(1L) == ((0L, 0L, t1.length.toLong, md5Of(t1))))
    assert(all(3L) == ((0L, 0L, t3.length.toLong, md5Of(t3))))
  }

  test("rebuild_all: overlapping runs merge into one interval before splicing") {
    // two runs over the SAME region from two partners overlap: the
    // interval union must excise the region once, not corrupt offsets
    val s = filler(2000, 240)
    val d = docs(
      (1L, s + "A" + filler(5000, 60)),
      (2L, s.substring(0, 200) + "X" + filler(6000, 99)),
      (3L, s + "B" + filler(7000, 80)))
    // doc 3 loses to 1 (span 240) and to 2 (span >= 192, same region)
    val got = LongestSpan.spanRebuildAllOf(d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got(3L)._1 == 1L, s"overlapping cuts must merge: ${got(3L)}")
    assert(got(3L)._2 == 240L, s"merged interval covers the union: ${got(3L)}")
  }

  test("winnowed rebuild excises an UNALIGNED plant the grid rebuild keeps") {
    val shared = filler(2000, 200)
    // offsets 13/30 DIFFER by 17 — not a multiple of the stride, so no
    // grid window pair can align (both sides' windows sit at ≡1 mod 8,
    // forcing aligned diffs ≡0 mod 8) and the grid family sees
    // nothing, while the winnowed runs prove the copy and cut it from
    // the loser (doc 2)
    val t1 = filler(5000, 13) + shared + "A" + filler(6000, 60)
    val t2 = filler(9000, 30) + shared + "B" + filler(7000, 40)
    val d = docs((1L, t1), (2L, t2))
    assert(LongestSpan.spanRebuildAllOf(d).collect()
      .forall(_.getLong(1) == 0L), "grid rebuild must see nothing here")
    val got = LongestSpan.spanRebuildWinnowedOf(d).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))).toMap
    val (n2, chars2, after2, md2) = got(2L)
    assert(n2 == 1L, s"loser must lose the unaligned copy: $got")
    assert(chars2 >= 200 - 48 && chars2 <= 200, s"cut ~the plant: $chars2")
    assert(after2 == t2.length - chars2)
    // winner untouched
    assert(got(1L)._1 == 0L && got(1L)._3 == t1.length.toLong)
    // the cut really is a contiguous splice of t2: md5 must match a
    // JVM recompute over SOME [s, s+chars2) window inside the plant
    def md5Of(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val candidates = (0 to t2.length - chars2.toInt).iterator
      .map(s => md5Of(t2.substring(0, s) + t2.substring(s + chars2.toInt)))
    assert(candidates.contains(md2), "rebuilt text must be a single splice of t2")
  }

  test("winnowed mass: an unaligned plant's covered chars track the detected span") {
    val shared = filler(1000, 200)
    val d = docs(
      (1L, filler(5000, 13) + shared + "A" + filler(6000, 60)),
      (2L, filler(9000, 30) + shared + "B" + filler(7000, 40)))
    val mass = LongestSpan.spanWinnowedMassOf(d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val longest = LongestSpan.spanWinnowedOf(d).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    for (id <- Seq(1L, 2L)) {
      val (nIslands, chars, len) = mass(id)
      assert(nIslands == 1, s"doc $id islands $nIslands")
      assert(chars == longest(id),
        s"single unaligned plant: mass must equal the winnowed span ($chars vs ${longest(id)})")
      assert(chars <= len)
    }
    // clean docs stay silent
    assert(LongestSpan.spanWinnowedMassOf(
      docs((3L, filler(3000, 300)), (4L, filler(4000, 300)))).collect().isEmpty)
  }

  test("real corpus: the multi-cut savings KPI dominates the single-cut KPI") {
    val all = ReleaseGate.qSpanSavingsAll(spark, sf).head
    val one = ReleaseGate.qSpanSavings(spark, sf).head
    // columns: savings_all = (n_docs, n_cut, n_cuts_total, before, after, saved, frac)
    //          savings     = (n_docs, n_cut, before, after, saved, frac)
    assert(all.getLong(0) == one.getLong(0), "same corpus spine")
    assert(all.getAs[Long]("chars_saved") >= one.getAs[Long]("chars_saved"))
    assert(all.getAs[Long]("n_cuts_total") >= all.getAs[Long]("n_cut"))
  }

  test("real corpus: rebuild_all savings >= single-cut savings; winnowed rows sane") {
    val allCut = LongestSpan.qSpanRebuildAll(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val oneCut = LongestSpan.qSpanRebuild(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(oneCut.keySet == allCut.keySet)
    oneCut.foreach { case (id, len) =>
      assert(allCut(id) >= len, s"doc $id: multi-cut ${allCut(id)} < single $len")
    }
    LongestSpan.qSpanWinnowed(spark, sf).collect().foreach { r =>
      assert(r.getLong(2) >= 32, "a winnowed span is at least one anchor k-gram")
      assert(r.getLong(0) != r.getLong(1))
    }
  }

  test("real corpus: rows are sane and consistent with repeated_spans") {
    val rows = LongestSpan.qLongestSpan(spark, sf).collect()
    val repeated = Dedup.qRepeatedSpans(spark, sf).collect()
      .filter(_.getLong(2) > 0).map(_.getLong(0)).toSet
    rows.foreach { r =>
      assert(r.getLong(2) >= 64 && r.getLong(2) % 8 == 0,
        "spans live on the 64 + 8k grid")
      assert(r.getLong(0) != r.getLong(1))
    }
    // every doc with a cross-doc maximal span has >= 1 repeated window
    // (the converse is false: repeated_spans also counts boilerplate
    // windows the CAP excludes and self-repeats)
    val spanDocs = rows.map(_.getLong(0)).toSet
    assert(spanDocs.subsetOf(repeated),
      s"span docs outside the repeated-window census: ${spanDocs.diff(repeated).take(5)}")
  }
}
