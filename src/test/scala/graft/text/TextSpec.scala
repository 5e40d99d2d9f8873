package graft.text

import graft.clustering.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class TextSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"

  test("quality metrics are internally consistent") {
    val rows = TextAnalysis.qQuality(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nWords = r.getAs[Long]("n_words")
      val nDistinct = r.getAs[Long]("n_distinct")
      assert(nDistinct <= nWords)
      assert(r.getAs[Double]("ttr") > 0 && r.getAs[Double]("ttr") <= 1.0)
      assert(r.getAs[Double]("stop_ratio") >= 0 && r.getAs[Double]("stop_ratio") <= 1.0)
    }
  }

  test("repetition filters flag degenerate docs and keep prose") {
    val docs = Seq(
      (1L, "spam spam spam spam spam"),              // one-word loop
      (2L, "buy now buy now buy now buy now"),       // bigram loop
      (3L, "the quick brown fox jumps over lazy dog"), // clean
      (4L, "x")).toDF("doc_id", "text")               // one word: no bigrams
    val m = Repetition.repetitionOf(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(m(1L).getAs[Double]("top_word_ratio") == 1.0 && !m(1L).getAs[Boolean]("keep"))
    assert(m(2L).getAs[Double]("dup_2gram_frac") > 0.5 && !m(2L).getAs[Boolean]("keep"))
    assert(m(3L).getAs[Boolean]("keep"))
    assert(m(4L).getAs[Double]("dup_2gram_frac") == 0.0, "no bigrams -> no dup frac")
  }

  test("vocab head is complete, ordered, and consistent") {
    val rows = CorpusStats.qVocabTopK(spark, sf).collect()
    assert(rows.length == 20)
    val occ = rows.map(_.getAs[Long]("n_occurrences"))
    assert(occ.sliding(2).forall { case Array(a, b) => a >= b; case _ => true })
    rows.foreach(r => assert(r.getAs[Long]("n_docs") <= r.getAs[Long]("n_occurrences")))
  }

  test("unigram logprob is negative and bounded by the corpus") {
    val rows = CorpusStats.qUnigramLogprob(spark, sf).collect()
    assert(rows.length == 500)
    rows.foreach(r => assert(r.getAs[Double]("avg_log2p") < 0.0,
      "every word probability < 1 -> mean log2 p < 0"))
  }

  test("token fertility per language is consistent with per-doc token counts") {
    import org.apache.spark.sql.functions.{col, sum => ssum}
    val langs = graft.Tables.t(spark, sf, "documents").select(col("doc_id"), col("lang"))
    val fromDocs = TextAnalysis.qTokens(spark, sf).join(langs, "doc_id")
      .groupBy("lang").agg(ssum("n_tokens").as("w"), ssum("n_subtokens").as("st"))
      .collect()
      .map(r => r.getAs[String]("lang") -> (r.getAs[Long]("w"), r.getAs[Long]("st"))).toMap
    val fert = TextAnalysis.qTokenFertility(spark, sf).collect()
    assert(fert.nonEmpty && fert.length == fromDocs.size)
    fert.foreach { r =>
      val (w, st) = fromDocs(r.getAs[String]("lang"))
      assert(r.getAs[Long]("n_words") == w && r.getAs[Long]("n_subtokens") == st)
      assert(math.abs(r.getAs[Double]("fertility") - st.toDouble / w) < 1e-6)
    }
  }

  test("DSIR importance weights tilt toward the target (en) slice") {
    import org.apache.spark.sql.functions.{avg, col}
    val langs = graft.Tables.t(spark, sf, "documents").select(col("doc_id"), col("lang"))
    val byTarget = CorpusStats.qDsirWeights(spark, sf).join(langs, "doc_id")
      .groupBy((col("lang") === "en").as("is_target"))
      .agg(avg("avg_log2_ratio").as("mean_w")).collect()
      .map(r => r.getAs[Boolean]("is_target") -> r.getAs[Double]("mean_w")).toMap
    assert(byTarget(true) > byTarget(false),
      "target-slice docs must out-score off-target docs under the target LM ratio")
    assert(byTarget(true) > 0.0, "en docs read like the en LM -> positive mean ratio")
  }

  test("entropy drops empty docs and rolling hash zeroes them (sequence(1,0) guard)") {
    val docs = Seq((1L, ""), (2L, "aabb"), (3L, "x")).toDF("doc_id", "text")
    val ent = TextAnalysis.entropyOf(docs).collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // empty text yields NO row (matching DuckDB's empty range), not Infinity/NaN
    assert(!ent.contains(1L))
    assert(math.abs(ent(2L) - 1.0) < 1e-9)      // two symbols, equal counts
    assert(ent(3L) == 0.0)                       // single symbol
    val rh = TextAnalysis.rollingHashOf(docs).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rh(1L) == 0L)                         // empty fold = zero element
    assert(rh(3L) == 'x'.toLong)                 // h = 0*31 + ascii('x')
    assert(rh(2L) == (((('a'.toLong * 31 + 'a') % 1000000007) * 31 + 'b') % 1000000007 * 31 + 'b') % 1000000007)
  }

  test("fingerprint is word-order invariant") {
    import org.apache.spark.sql.functions._
    val a = Seq((1L, "alpha beta gamma"), (2L, "gamma alpha beta beta")).toDF("doc_id", "text")
    a.createOrReplaceTempView("documents_tmp")
    val fps = a.select(md5(array_join(array_sort(array_distinct(split(col("text"), " "))), " ")))
      .as[String].collect()
    assert(fps(0) == fps(1))
  }

  test("tfidf keeps exactly 3 top terms per document with valid ranks") {
    val out = TextAnalysis.qTfidf(spark, sf).cache()
    val perDoc = out.groupBy("doc_id").count().select("count").as[Long].collect()
    assert(perDoc.forall(_ == 3))
    assert(out.filter($"rk" < 1 || $"rk" > 3).count() == 0)
    assert(out.filter($"tfidf" < 0).count() == 0)
    out.unpersist()
  }

  test("langid falls back to 'und' only when no marker matches") {
    val out = TextAnalysis.qLangId(spark, sf)
    val bad = out.filter(
      ($"pred_lang" === "und" && ($"s_en" + $"s_de" + $"s_fr" + $"s_es" + $"s_zh") > 0) ||
        ($"pred_lang" =!= "und" && ($"s_en" + $"s_de" + $"s_fr" + $"s_es" + $"s_zh") === 0))
    assert(bad.count() == 0)
  }

  test("clean-corpus pipeline output respects its own gates") {
    val out = graft.pipeline.CleanCorpus.qClean(spark, sf)
    assert(out.count() > 0)
    assert(out.filter($"n_words" < 20 || $"stop_ratio" > 0.5).count() == 0)
  }

  test("scrub redacts emails and digit runs, collapses spaces, and is idempotent") {
    import org.apache.spark.sql.functions._
    val docs = Seq(
      (1L, "Contact Bob.Smith+x@example.COM  or  call 5551234567 now"),
      (2L, "plain text stays    plain 12345")).toDF("doc_id", "text")
    docs.createOrReplaceTempView("t_scrub_in")
    def scrub(df: org.apache.spark.sql.DataFrame) = df.select(
      col("doc_id"),
      trim(regexp_replace(regexp_replace(regexp_replace(lower(col("text")),
        "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}", "<email>"),
        "[0-9]{6,}", "<num>"),
        "  +", " ")).as("clean"))
    val out = scrub(docs).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "contact <email> or call <num> now")
    assert(out(2L) == "plain text stays plain 12345", "short digit runs survive")
    // idempotent: scrubbing the scrubbed text changes nothing
    val again = scrub(scrub(docs).withColumnRenamed("clean", "text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(again == out)
  }

  test("packing conserves words and orders bins consecutively per doc") {
    import org.apache.spark.sql.functions._
    val packed = TextAnalysis.qPack(spark, sf)
    val packTotal = packed.agg(sum("n_words_packed")).head().getLong(0)
    val chunkTotal = TextAnalysis.qChunk(spark, sf).agg(sum("n_words")).head().getLong(0)
    assert(packTotal == chunkTotal, "every chunk word lands in exactly one bin")
    val byDoc = packed.select("doc_id", "bin_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
    byDoc.foreach { case (doc, bins) =>
      val ids = bins.map(_._2).sorted.toSeq
      assert(ids == (0L until ids.length.toLong), s"doc $doc bins: $ids")
    }
  }

  test("rolling hash matches a direct JVM fold and is order-sensitive") {
    def ref(s: String): Long =
      s.foldLeft(0L)((h, c) => (h * 31 + c.toInt) % 1000000007L)
    val docs = Seq((1L, "hello world"), (2L, "world hello"), (3L, "hello world"))
      .toDF("doc_id", "text")
    docs.createOrReplaceTempView("t_rh")
    import org.apache.spark.sql.functions._
    val out = docs.select(col("doc_id"),
      expr("aggregate(transform(sequence(1, length(text)), i -> ascii(substring(text, i, 1))), " +
        "CAST(0 AS BIGINT), (h, c) -> (h * 31 + c) % 1000000007)").as("rh"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) == ref("hello world"))
    assert(out(1L) == out(3L), "identical text, identical hash")
    assert(out(1L) != out(2L), "order-sensitive, unlike the vocab fingerprint")
  }

  test("readability: syllable floor holds and both scores recompute from the row's own counts") {
    val rows = TextAnalysis.qReadability(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nw, ns, nsy) = (r.getAs[Long]("n_words"),
        r.getAs[Long]("n_sentences"), r.getAs[Long]("n_syllables"))
      assert(nsy >= nw, "every non-empty word carries at least one syllable")
      assert(ns >= 1)
      val wps = nw.toDouble / ns
      val spw = nsy.toDouble / nw
      assert(math.abs(r.getAs[Double]("flesch_ease")
        - (206.835 - 1.015 * wps - 84.6 * spw)) < 1e-5)
      assert(math.abs(r.getAs[Double]("fk_grade")
        - (0.39 * wps + 11.8 * spw - 15.59)) < 1e-5)
    }
  }

  test("dup-gram mass: occurrence accounting consistent with its own histogram") {
    val r = CorpusStats.qDupGramMass(spark, sf).collect()(0)
    val (nd, no, dup, mx) = (r.getAs[Long]("n_distinct_grams"),
      r.getAs[Long]("n_occurrences"), r.getAs[Long]("dup_occurrences"),
      r.getAs[Long]("max_occ"))
    assert(nd > 0 && no >= nd, "occurrences cover every distinct gram at least once")
    assert(dup >= 0 && dup <= no)
    assert((dup > 0) == (mx >= 2), "dup mass exists iff some gram repeats")
    // a duplicated gram contributes ALL its occurrences (>= 2 each)
    assert(dup != 1, "dup mass can never be a single occurrence")
    val f = r.getAs[Double]("dup_frac")
    assert(math.abs(f - dup.toDouble / no) < 1e-6)
  }

  test("char entropy separates uniform, natural and degenerate strings") {
    import org.apache.spark.sql.functions._
    val docs = Seq(
      (1L, "aaaaaaaaaaaaaaaa"), // one symbol -> H = 0
      (2L, "abababababababab"), // two equiprobable -> H = 1
      (3L, "abcdefghijklmnop")) // 16 distinct -> H = 4
      .toDF("doc_id", "text")
    val ch = docs.select(col("doc_id"), length(col("text")).cast("double").as("n"),
      explode(expr("transform(sequence(1, length(text)), i -> substring(text, i, 1))")).as("ch"))
    val out = ch.groupBy("doc_id", "n", "ch").agg(count(lit(1)).cast("double").as("c"))
      .groupBy("doc_id")
      .agg(round(-sum((col("c") / col("n")) * log2(col("c") / col("n"))), 6).as("h"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out(1L) == 0.0 && out(2L) == 1.0 && out(3L) == 4.0)
    // and on the real corpus: word-soup text sits in a sane band
    val real = TextAnalysis.qEntropy(spark, sf).select("char_entropy")
      .collect().map(_.getDouble(0))
    assert(real.forall(h => h > 2.0 && h < 6.0), s"range ${real.min}..${real.max}")
  }

  test("chunks tile the document: stride-40 windows of <= 50 words cover every word") {
    val out = TextAnalysis.qChunk(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    assert(out.forall(_._4 <= 50), "no chunk exceeds the window")
    val docs = graft.Tables.t(spark, sf, "documents")
      .selectExpr("doc_id", "size(split(text, ' ')) AS n").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val byDoc = out.groupBy(_._1)
    assert(byDoc.keySet == docs.keySet, "every doc chunks")
    byDoc.foreach { case (id, chunks) =>
      val n = docs(id)
      // chunk c starts at 40c; last chunk must reach the final word
      val maxEnd = chunks.map(c => c._2 * 40 + c._4).max
      assert(maxEnd == n, s"doc $id: chunks end at $maxEnd of $n words")
      // consecutive chunk ids, starting at 0
      val ids = chunks.map(_._2).sorted.toSeq
      assert(ids == (0L until ids.length.toLong), s"doc $id ids: $ids")
    }
  }

  test("kneser-ney bigram score matches the hand-computed closed form") {
    // corpus "a b a c": bigrams (a,b) (b,a) (a,c), all counts 1;
    // c(a .) = 2, c(b .) = 1; 3 bigram types; N1+(a .) = 2,
    // N1+(b .) = 1; continuation contexts: b<-{a}, a<-{b}, c<-{a}
    // => P_cont = 1/3 each. With D = 0.75:
    //   P(b|a) = (1-.75)/2 + (.75*2/2)*(1/3) = 0.375
    //   P(a|b) = (1-.75)/1 + (.75*1/1)*(1/3) = 0.5
    //   P(c|a) = 0.375
    val docs = Seq((1L, "a b a c")).toDF("doc_id", "text")
    val r = graft.text.CorpusStats.knLogprobOf(docs).collect()(0)
    assert(r.getAs[Long]("n_bigrams") == 3L)
    val want = BigDecimal(
      (math.log(0.375) / math.log(2) + math.log(0.5) / math.log(2)
        + math.log(0.375) / math.log(2)) / 3
    ).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getAs[Double]("avg_log2p") == want,
      s"got ${r.getAs[Double]("avg_log2p")}, want $want")
    // discount mass is genuinely reserved: total observed-continuation
    // probability per context stays strictly below 1
    assert(0.375 + 0.375 < 1.0 && 0.5 < 1.0)
  }

  test("mattr: all-repeat doc scores 1/wlen, all-distinct doc scores 1.0") {
    val docs = Seq(
      (1L, (1 to 60).map(_ => "a").mkString(" ")), // 60 tokens, 1 type
      (2L, (1 to 30).map(i => s"w$i").mkString(" ")), // 30 distinct, short doc
      (3L, (1 to 100).map(i => s"t${i % 50}").mkString(" "))) // every 50-window distinct
      .toDF("doc_id", "text")
    val m = graft.text.TextAnalysis.mattrOf(docs).collect()
      .map(r => r.getLong(0) -> ((r.getAs[Int]("n_windows"), r.getAs[Double]("mattr")))).toMap
    assert(m(1L) == ((1, 0.02)), "60x'a': one window, 1 distinct / 50")
    assert(m(2L) == ((1, 1.0)), "short doc degrades to plain TTR")
    assert(m(3L) == ((3, 1.0)), "period-50 text: every window fully distinct")
  }
}
