package graft.multimodal

import graft.clustering.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"

  test("media view carries real binary image payloads with typed metadata") {
    val ms = Multimodal.mediaView(spark, sf).take(8)
    assert(ms.map(_.format).toSet == Set("ppm", "bmp", "png", "jpg"))
    ms.foreach { m =>
      assert(m.payload.nonEmpty)
      // the payload IS the container: magic bytes match the format
      val magic = new String(m.payload.take(2), "US-ASCII")
      m.format match {
        case "ppm" => assert(magic == "P6")
        case "bmp" => assert(magic == "BM")
        case "png" => assert((m.payload(0) & 0xff) == 0x89 && m.payload(1) == 'P')
        case "jpg" => assert((m.payload(0) & 0xff) == 0xff && (m.payload(1) & 0xff) == 0xd8)
      }
    }
  }

  test("ImageIO round-trip: PNG decodes losslessly, JPEG decodes at real dims") {
    val rgb = Array.tabulate(8 * 8 * 3)(i => (i * 7 % 256).toByte)
    val png = Multimodal.decodeBytes(Multimodal.MediaRecord(
      1L, "png", Multimodal.encodeImageIo(8, 8, rgb, "png")))
    assert(png.format == "png" && png.width == 8 && png.height == 8 && png.n_frames == 1)
    // PNG is lossless: channel means match the raw bytes exactly
    val exact = Multimodal.decodeBytes(Multimodal.MediaRecord(
      1L, "ppm", Multimodal.encodePpm(8, 8, rgb)))
    for (j <- 0 until 4)
      assert(math.abs(png.feature(j) - exact.feature(j)) < 1e-6, s"channel $j")
    // JPEG is lossy: dims exact, channel means close
    val jpg = Multimodal.decodeBytes(Multimodal.MediaRecord(
      2L, "jpg", Multimodal.encodeImageIo(8, 8, rgb, "jpg")))
    assert(jpg.format == "jpg" && jpg.width == 8 && jpg.height == 8)
    for (j <- 0 until 3)
      assert(math.abs(jpg.feature(j) - exact.feature(j)) < 0.1, s"jpeg channel $j drifted")
  }

  test("corrupt ImageIO payloads quarantine to zeros, never crash the task") {
    // valid magic, garbage body — ImageIO throws or returns null
    val fakePng = Array[Byte](0x89.toByte, 'P', 'N', 'G', 13, 10, 26, 10, 1, 2, 3)
    val fp = Multimodal.decodeBytes(Multimodal.MediaRecord(3L, "png", fakePng))
    assert(fp.width == 0 && fp.height == 0 && fp.feature.forall(_ == 0f))
    val truncatedJpg = Multimodal.encodeImageIo(
      8, 8, Array.fill(8 * 8 * 3)(42.toByte), "jpg").take(20)
    val tj = Multimodal.decodeBytes(Multimodal.MediaRecord(4L, "jpg", truncatedJpg))
    assert(tj.width == 0 && tj.height == 0 && tj.feature.forall(_ == 0f))
    // resize quarantines them unchanged too
    val r = Multimodal.resize(Multimodal.MediaRecord(5L, "png", fakePng), 4, 4)
    assert(r.payload.sameElements(fakePng))
  }

  test("ImageIO resize re-encodes at target dims in the source format") {
    val rgb = Array.tabulate(8 * 8 * 3)(i => (if ((i / 3) % 2 == 0) 200 else 40).toByte)
    for (fmt <- Seq("png", "jpg")) {
      val src = Multimodal.MediaRecord(1L, fmt, Multimodal.encodeImageIo(8, 8, rgb, fmt))
      val out = Multimodal.resize(src, 4, 4)
      val f = Multimodal.decodeBytes(out)
      assert(f.format == fmt && f.width == 4 && f.height == 4,
        s"$fmt: ${f.format} ${f.width}x${f.height}")
    }
  }

  test("decode parses real PPM bytes it writes itself") {
    val rgb = Array.tabulate(6 * 4 * 3)(i => (i * 11 % 256).toByte)
    val ppm = Multimodal.encodePpm(6, 4, rgb)
    val f = Multimodal.decodeBytes(Multimodal.MediaRecord(1L, "ppm", ppm))
    assert(f.width == 6 && f.height == 4 && f.n_frames == 1)
    assert(f.n_bytes == ppm.length.toLong)
    // channel means computed from the actual pixel bytes
    val meanR = (0 until 24).map(p => rgb(p * 3) & 0xff).sum / 24.0 / 255.0
    assert(math.abs(f.feature(0) - meanR) < 1e-6)
    assert(f.feature(3) == 1.5f, "aspect ratio w/h")
  }

  test("decode parses real BMP bytes it writes itself (bottom-up, padded rows)") {
    val rgb = Array.tabulate(5 * 3 * 3)(i => (i * 7 % 256).toByte) // w=5 forces row padding
    val bmp = Multimodal.encodeBmp(5, 3, rgb)
    val f = Multimodal.decodeBytes(Multimodal.MediaRecord(2L, "bmp", bmp))
    assert(f.width == 5 && f.height == 3 && f.n_frames == 1)
    val meanG = (0 until 15).map(p => rgb(p * 3 + 1) & 0xff).sum / 15.0 / 255.0
    assert(math.abs(f.feature(1) - meanG) < 1e-6)
  }

  test("ppm and bmp of identical pixels decode to identical channel features") {
    val rgb = Array.tabulate(8 * 8 * 3)(i => (i * 13 % 256).toByte)
    val a = Multimodal.decodeBytes(Multimodal.MediaRecord(1L, "ppm", Multimodal.encodePpm(8, 8, rgb)))
    val b = Multimodal.decodeBytes(Multimodal.MediaRecord(1L, "bmp", Multimodal.encodeBmp(8, 8, rgb)))
    assert(a.feature.sameElements(b.feature),
      s"${a.feature.toSeq} vs ${b.feature.toSeq}")
  }

  test("resize re-encodes at the target dims in the source container format") {
    // a half-red half-blue 8x8: downsizing must keep the split and means
    val rgb = Array.tabulate(8 * 8 * 3) { i =>
      val pix = i / 3
      val left = pix % 8 < 4
      ((i % 3, left) match {
        case (0, true) => 200; case (2, false) => 200; case _ => 0
      }).toByte
    }
    for (mk <- Seq(
      Multimodal.MediaRecord(1L, "ppm", Multimodal.encodePpm(8, 8, rgb)),
      Multimodal.MediaRecord(2L, "bmp", Multimodal.encodeBmp(8, 8, rgb)))) {
      val small = Multimodal.resize(mk, 4, 4)
      val f = Multimodal.decodeBytes(small)
      assert(f.width == 4 && f.height == 4, s"${mk.format}: ${f.width}x${f.height}")
      // half the pixels red 200, half blue 200 -> mean 100/255 each
      assert(math.abs(f.feature(0) - 100 / 255.0) < 1e-6, s"${mk.format} red mean")
      assert(math.abs(f.feature(2) - 100 / 255.0) < 1e-6, s"${mk.format} blue mean")
    }
    // undecodable payloads pass through unchanged
    val junk = Multimodal.MediaRecord(3L, "ppm", Array[Byte](9, 9))
    assert(Multimodal.resize(junk, 4, 4) eq junk)
    // a TRUNCATED payload with a VALID header (decodeBytes still reports
    // positive dims) must be quarantined, not crash the task
    val cut = Multimodal.MediaRecord(4L, "ppm",
      Multimodal.encodePpm(8, 8, Array.fill(8 * 8 * 3)(7.toByte)).take(30))
    assert(Multimodal.decodeBytes(cut).width == 8, "header parses")
    assert(Multimodal.resize(cut, 4, 4) eq cut, "truncated pixels -> pass through")
    val cutBmp = Multimodal.MediaRecord(5L, "bmp",
      Multimodal.encodeBmp(8, 8, Array.fill(8 * 8 * 3)(7.toByte)).take(60))
    assert(Multimodal.resize(cutBmp, 4, 4) eq cutBmp)
  }

  test("resizeAll keeps the per-partition batch shape over the corpus view") {
    val media = Multimodal.mediaView(spark, sf).repartition(4)
    val resized = Multimodal.resizeAll(media, 6, 6)
    assert(resized.rdd.getNumPartitions == 4, "no reshuffle")
    val dims = Multimodal.decode(resized).collect()
    assert(dims.forall(f => f.width == 6 && f.height == 6))
  }

  test("frame-sampled decode reads every k-th frame of a multi-frame container") {
    def solidFrame(v: Int) =
      Multimodal.encodePpm(4, 4, Array.fill(4 * 4 * 3)(v.toByte))
    val anim = Multimodal.encodeFrames(Seq(solidFrame(10), solidFrame(250), solidFrame(30)))
    val f = Multimodal.decodeFramesSampled(
      Multimodal.MediaRecord(9L, "gfv", anim), everyK = 2)
    assert(f.n_frames == 3, "container frame count from the header")
    assert(f.width == 4 && f.height == 4)
    // frames 0 and 2 sampled, frame 1 (value 250) skipped entirely
    val expect = ((10 / 255.0) + (30 / 255.0)) / 2.0
    assert(math.abs(f.feature(0) - expect) < 1e-6,
      s"mean over sampled frames only: ${f.feature(0)} vs $expect")
  }

  test("truncated or foreign containers frame-decode to zeros") {
    val garbage = Multimodal.decodeFramesSampled(
      Multimodal.MediaRecord(1L, "gfv", Array[Byte](1, 2, 3)), 1)
    assert(garbage.n_frames == 0 && garbage.feature.forall(_ == 0f))
    val truncated = Multimodal.encodeFrames(
      Seq(Multimodal.encodePpm(2, 2, new Array[Byte](12)))).take(10)
    val t = Multimodal.decodeFramesSampled(
      Multimodal.MediaRecord(2L, "gfv", truncated), 1)
    assert(t.n_bytes == 10, "reports what it saw, does not crash")
  }

  test("wav audio round-trips: header facts and signal statistics") {
    // a full-scale square wave: rms = peak = 1 (well, 32767/32768),
    // crossing every sample
    val square = Array.tabulate(1000)(i => if (i % 2 == 0) 32767 else -32768)
      .map(_.toShort)
    val f = Multimodal.decodeWavBytes(
      Multimodal.AudioRecord(1L, Multimodal.encodeWav(16000, 1, square)))
    assert(f.sample_rate == 16000 && f.n_channels == 1 && f.n_samples == 1000)
    assert(math.abs(f.rms - 1.0f) < 1e-3, s"square-wave rms ~1: ${f.rms}")
    assert(math.abs(f.peak - 1.0f) < 1e-3)
    assert(math.abs(f.zcr - 1.0f) < 1e-3, s"alternating signal crosses every step: ${f.zcr}")
    // stereo: frames = samples / channels
    val st = Multimodal.decodeWavBytes(
      Multimodal.AudioRecord(2L, Multimodal.encodeWav(8000, 2, new Array[Short](64))))
    assert(st.n_channels == 2 && st.n_samples == 32)
    assert(st.rms == 0f && st.zcr == 0f, "silence")
  }

  test("wav decimation halves the rate, keeps channels, passes junk through") {
    // stereo ramp: frame f = (f*100, -f*100); decimate by 2
    val stereo = Array.tabulate(200)(i =>
      (if (i % 2 == 0) (i / 2) * 100 else -(i / 2) * 100).toShort)
    val rec = Multimodal.AudioRecord(1L, Multimodal.encodeWav(8000, 2, stereo))
    val half = Multimodal.resampleWav(rec, 2)
    val f = Multimodal.decodeWavBytes(half)
    assert(f.sample_rate == 4000 && f.n_channels == 2 && f.n_samples == 50,
      s"100 frames / 2 at half rate: $f")
    // kept frames are the even originals, channel interleaving intact
    val buf = java.nio.ByteBuffer.wrap(half.payload)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    assert(buf.getShort(44) == 0 && buf.getShort(46) == 0)
    assert(buf.getShort(48) == 200 && buf.getShort(50) == -200,
      "frame 1 of the decimated stream is original frame 2")
    // k=1 is an exact re-encode; junk passes through untouched
    assert(Multimodal.resampleWav(rec, 1).payload.toSeq == rec.payload.toSeq)
    val junk = Multimodal.AudioRecord(2L, Array[Byte](9, 9, 9))
    assert(Multimodal.resampleWav(junk, 2) eq junk)
    // distributed path
    import spark.implicits._
    val ds = spark.createDataset(Seq(rec, junk))
    assert(Multimodal.resampleAll(ds, 2).collect().length == 2)
  }

  test("truncated and corrupt wav payloads quarantine to zeros") {
    val good = Multimodal.encodeWav(8000, 1, Array.tabulate(100)(i => (i * 300).toShort))
    val cut = Multimodal.decodeWavBytes(Multimodal.AudioRecord(3L, good.take(60)))
    assert(cut.sample_rate == 8000, "header still parses")
    assert(cut.n_samples == 8, "reads only the samples present")
    val junk = Multimodal.decodeWavBytes(Multimodal.AudioRecord(4L, Array[Byte](1, 2, 3)))
    assert(junk.sample_rate == 0 && junk.rms == 0f)
    // a WAV fed to the IMAGE pipeline is quarantined, not mangled
    val asImage = Multimodal.MediaRecord(5L, "wav", good)
    assert(Multimodal.decodeBytes(asImage).width == 0)
    assert(Multimodal.resize(asImage, 4, 4) eq asImage)
  }

  test("audio corpus view decodes per-partition with varied rates and channels") {
    val audio = Multimodal.audioView(spark, sf).repartition(4)
    val feats = Multimodal.decodeAudio(audio).collect()
    assert(feats.nonEmpty)
    assert(feats.forall(f => f.sample_rate > 0 && f.n_samples > 0))
    assert(feats.map(_.sample_rate).distinct.sorted.toSeq == Seq(8000, 16000, 24000))
    assert(feats.map(_.n_channels).distinct.sorted.toSeq == Seq(1, 2))
  }

  test("corrupt and unknown payloads decode to zeros, not crashes") {
    val garbage = Multimodal.decodeBytes(
      Multimodal.MediaRecord(3L, "ppm", Array[Byte](1, 2, 3)))
    assert(garbage.width == 0 && garbage.feature.forall(_ == 0f))
    val truncated = Multimodal.decodeBytes(Multimodal.MediaRecord(4L, "ppm",
      Multimodal.encodePpm(4, 4, new Array[Byte](48)).take(20)))
    assert(truncated.width == 4, "header still parses")
    val empty = Multimodal.decodeBytes(Multimodal.MediaRecord(5L, "bmp", Array.empty))
    assert(empty.width == 0 && empty.n_bytes == 0)
  }

  test("decode is deterministic, schema-stable and partition-preserving") {
    val media = Multimodal.mediaView(spark, sf).repartition(6)
    val feats = Multimodal.decode(media).cache()
    assert(feats.rdd.getNumPartitions == 6, "decode must not reshuffle")
    assert(feats.count() == 500)
    val f = feats.filter(_.doc_id == 1L).head()
    val f2 = Multimodal.decode(media).filter(_.doc_id == 1L).head()
    assert(f.width == f2.width && f.height == f2.height)
    assert(f.feature.take(3).forall(x => x >= 0f && x <= 1f))
    // decoded dims match the view's generation rule — parsed from the
    // container bytes, not carried metadata
    assert(f.width == 4 + (1 % 12) && f.height == 4 + ((1 / 3) % 12))
    feats.unpersist()
  }

  test("aHash: identical pixels collide across PPM/BMP/PNG containers") {
    val rgb = Array.tabulate(16 * 16 * 3)(i => (i * 37 % 256).toByte)
    val hp = Multimodal.aHash64(Multimodal.MediaRecord(1L, "ppm", Multimodal.encodePpm(16, 16, rgb))).get
    val hb = Multimodal.aHash64(Multimodal.MediaRecord(2L, "bmp", Multimodal.encodeBmp(16, 16, rgb))).get
    val hg = Multimodal.aHash64(Multimodal.MediaRecord(3L, "png", Multimodal.encodeImageIo(16, 16, rgb, "png"))).get
    assert(hp == hb && hb == hg,
      s"same pixels, three containers: $hp / $hb / $hg")
    // JPEG is lossy: near, not equal — within a few hamming bits
    val hj = Multimodal.aHash64(Multimodal.MediaRecord(4L, "jpg", Multimodal.encodeImageIo(16, 16, rgb, "jpg"))).get
    assert(java.lang.Long.bitCount(hp ^ hj) <= 8,
      s"jpeg re-encode drifted ${java.lang.Long.bitCount(hp ^ hj)} bits")
  }

  test("aHash: corrupt payload quarantines as None, never merging with a flat image") {
    // an unreadable payload is NOT a hash value — the old 0L sentinel
    // merged it with legitimately flat images (no cell above the
    // mean), which also hash to 0L (ADVICE r8)
    assert(Multimodal.aHash64(Multimodal.MediaRecord(9L, "png", Array[Byte](1, 2, 3))).isEmpty)
    val flat = Array.fill(16 * 16 * 3)(77.toByte)
    assert(Multimodal.aHash64(Multimodal.MediaRecord(8L, "ppm",
      Multimodal.encodePpm(16, 16, flat))).contains(0L))
    val out = Multimodal.qPhashDedup(spark, sf).collect()
    val total = out.map(_.getAs[Long]("n_images")).sum
    assert(total == graft.Tables.t(spark, sf, "documents").count())
    out.foreach(r => assert(r.getAs[Long]("keep_id") >= 0))
    // quarantined rows (none on this corpus — every generated payload
    // decodes) would appear as decoded=false singleton groups
    out.filter(!_.getAs[Boolean]("decoded"))
      .foreach(r => assert(r.getAs[Long]("n_images") == 1L))
  }

  test("phash pairs: 8x8-bit any-band catches what the 16-bit prefix probe misses") {
    // the banded layout's pigeonhole guarantee: hd <= 7 over 8 bytes
    // leaves at least one byte untouched, so ANY such pair shares a
    // band bucket. Measured on the honest JPEG drift population
    // (lossless encode vs jpeg re-encode per doc — NO byte-identical
    // pairs): banded recall must clear 0.9 where the single prefix
    // probe measures ~0.3 (and 0.022 for the text gate, #113). These
    // tiny images drift hard under JPEG, so only a minority of docs
    // land within hd <= 8 — the population is small but every member
    // is genuine drift.
    val r = Multimodal.qPhashRecall(spark, sf).collect()(0)
    assert(r.getAs[Long]("n_true_pairs") >= 20, "truth set must be non-trivial")
    val banded = r.getAs[Double]("recall_band8x8")
    assert(banded >= 0.9, s"banded recall $banded below the gate bar")
    assert(banded >= r.getAs[Double]("recall_prefix16"),
      "banding must dominate the single prefix probe")
    // the SHIPPED pipeline (keeper star + verify + family labels), not
    // just bucket collision, must also clear the bar — and can never
    // exceed the collision upper bound (round-10 ADVICE)
    val shipped = r.getAs[Double]("recall_pipeline")
    assert(shipped >= 0.9, s"shipped-pipeline recall $shipped below the gate bar")
    assert(shipped <= banded + 1e-9,
      "pipeline recall cannot beat its own bucket-collision bound")
    // and the pair query itself verifies: every emitted pair is a true
    // near-dup (hd <= 8), ia < ib, no duplicates
    val pairs = Multimodal.qPhashPairs(spark, sf).collect()
    assert(pairs.forall(p => p.getAs[Int]("hd") <= 8 &&
      p.getAs[Long]("ia") < p.getAs[Long]("ib")))
    assert(pairs.map(p => (p.getLong(0), p.getLong(1))).distinct.length == pairs.length)
    // a crafted corpus with a genuine near-dup image pair: the banded
    // gate finds it even when the drift crosses the top-16-bit prefix
    // (the case the round-8 single-probe design structurally missed)
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rgb = Array.tabulate(16 * 16 * 3)(i => (i * 37 % 256).toByte)
    val base = Multimodal.aHash64(
      Multimodal.MediaRecord(0L, "ppm", Multimodal.encodePpm(16, 16, rgb))).get
    // partner hash: flip 3 bits INSIDE the top 16 (prefix probe blind)
    // and 3 elsewhere — hd 6, must be caught by any-band
    val drifted = base ^ (1L << 63) ^ (1L << 55) ^ (1L << 50) ^ (1L << 20) ^ (1L << 9) ^ 1L
    val h = Seq((1L, base), (2L, drifted)).toDF("doc_id", "phash")
    val w = org.apache.spark.sql.expressions.Window.partitionBy("band", "bv")
    val found = h.select(col("doc_id"), explode(array((0 until 8).map(i =>
        struct(lit(i).as("band"),
          shiftright(col("phash"), i * 8).bitwiseAND(lit(255L)).as("bv"))): _*)).as("e"))
      .select(col("doc_id"), col("e.band").as("band"), col("e.bv").as("bv"))
      .withColumn("ia", min("doc_id").over(w))
      .filter(col("doc_id") > col("ia"))
      .select("ia", "doc_id").distinct().collect()
    assert(found.map(r2 => (r2.getLong(0), r2.getLong(1))).contains((1L, 2L)),
      "any-band bucketing must pair the drifted re-encode with its source")
    assert(java.lang.Long.bitCount(base ^ drifted) == 6)
    assert((base >>> 48) != (drifted >>> 48), "drift crosses the old prefix probe")
  }

  test("audio VAD reads back every doc's injected bit-pattern exactly") {
    // segment j (5 frames of 80 samples) is a tone iff bit j of doc_id:
    // voiced frames = 5 * popcount(id & 0xff), longest run = 5 * longest
    // 1-run in the low 8 bits
    val rows = Multimodal.qAudioVad(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_frames"), r.getAs[Long]("n_voiced"),
          r.getAs[Double]("voiced_frac"), r.getAs[Long]("longest_run"))))
    assert(rows.nonEmpty)
    rows.foreach { case (id, (nf, nv, frac, run)) =>
      assert(nf == 40)
      val bits = (0 until 8).map(j => (id >> j) & 1L)
      assert(nv == 5 * bits.sum, s"doc $id")
      var best = 0; var cur = 0
      bits.foreach { b =>
        if (b == 1L) { cur += 1; best = math.max(best, cur) } else cur = 0
      }
      assert(run == 5L * best, s"doc $id")
      assert(math.abs(frac - math.rint(nv * 1e6 / 40) / 1e6) < 1e-12)
    }
  }

  test("scene cuts match every container's known scene boundaries") {
    val rows = Multimodal.qSceneCuts(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_frames"), r.getAs[Long]("n_cuts"), r.getAs[Long]("first_cut_frame")))
    assert(rows.nonEmpty)
    rows.foreach { case (id, (nf, cuts, first)) =>
      assert(nf == 6)
      val sceneLen = 2 + (id % 2)
      val expectedCuts = (6 + sceneLen - 1) / sceneLen - 1
      assert(cuts == expectedCuts,
        s"doc $id (sceneLen $sceneLen): $cuts cuts vs $expectedCuts expected")
      assert(first == sceneLen,
        s"doc $id: first cut at frame $first, scene length $sceneLen")
    }
  }
}
