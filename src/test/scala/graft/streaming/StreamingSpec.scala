package graft.streaming

import java.sql.Timestamp

import graft.clustering.SparkTestSession
import graft.dedup.Dedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

class StreamingSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(min: Long) = new Timestamp(1700000000000L + min * 60000L)

  test("streaming sessionize splits on a 30-minute gap across batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Streams.Ev]
    val q = Streams.sessionize(input.toDS())
      .writeStream.format("memory").queryName("sess_out")
      .outputMode(OutputMode.Append).start()
    try {
      // batch 1: two events 5 min apart (one open session)
      input.addData(Streams.Ev(1L, ts(0), 1.0), Streams.Ev(1L, ts(5), 2.0))
      q.processAllAvailable()
      assert(spark.table("sess_out").count() == 0, "session still open")
      // batch 2: an event 40 min later -> closes the first session
      input.addData(Streams.Ev(1L, ts(45), 3.0))
      q.processAllAvailable()
      val rows = spark.table("sess_out").as[Streams.SessionOut].collect()
      assert(rows.length == 1)
      assert(rows.head.n_events == 2 && rows.head.sum_value == 3.0)
      assert(rows.head.sess_start == ts(0) && rows.head.sess_end == ts(5))
    } finally q.stop()
  }

  test("built-in session_window closes a session once the watermark passes") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Double)]
    val df = input.toDF().toDF("user_id", "ts", "value")
    val q = Streams.sessionWindowCounts(df)
      .writeStream.format("memory").queryName("sesswin_out")
      .outputMode(OutputMode.Append).start()
    try {
      // one session: events 0 and 10 min (gap 30 min keeps them merged)
      input.addData((1L, ts(0), 1.0), (1L, ts(10), 2.0))
      q.processAllAvailable()
      // far-future event pushes the watermark past the session's close
      input.addData((1L, ts(300), 9.0))
      q.processAllAvailable()
      val rows = spark.table("sesswin_out")
        .select("user_id", "sess_start", "sess_end", "n_events", "sum_value")
        .as[(Long, Timestamp, Timestamp, Long, Double)].collect()
      assert(rows.length == 1, s"exactly the closed session emits: ${rows.mkString}")
      val r = rows.head
      assert(r._1 == 1L && r._2 == ts(0) && r._3 == ts(40) && r._4 == 2L && r._5 == 3.0)
    } finally q.stop()
  }

  test("drift monitor: matching window scores ~0 KL, skewed window scores higher") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val df = input.toDF().toDF("ts", "event_type")
    val baseline = Seq(("a", 0.5), ("b", 0.5)).toDF("event_type", "p_base")
    val q = Streams.driftMonitor(df, baseline)
      .writeStream.format("memory").queryName("drift_out")
      .outputMode(OutputMode.Append).start()
    try {
      // window 0: 2xa + 2xb matches the baseline exactly (KL = 0);
      // window 1 (hour 2): 4xa is maximally skewed (KL = 1 bit), plus
      // 2 out-of-baseline "z" events that must surface as n_unknown
      // (NOT silently renormalize away) while KL stays over the
      // matched types
      input.addData((ts(0), "a"), (ts(1), "a"), (ts(2), "b"), (ts(3), "b"))
      input.addData((ts(120), "a"), (ts(121), "a"), (ts(122), "a"), (ts(123), "a"),
        (ts(124), "z"), (ts(125), "z"))
      q.processAllAvailable()
      // far-future event closes both windows past the 2h watermark
      input.addData((ts(600), "a"))
      q.processAllAvailable()
      val rows = spark.table("drift_out")
        .select("window_start", "n_events", "n_unknown", "kl_bits")
        .as[(Timestamp, Long, Long, Double)].collect().sortBy(_._1.getTime)
      assert(rows.length >= 2, s"both closed windows emit: ${rows.mkString}")
      assert(rows(0)._2 == 4L && rows(0)._3 == 0L && math.abs(rows(0)._4) < 1e-9,
        s"matching window must score KL 0: ${rows(0)}")
      assert(rows(1)._2 == 6L && rows(1)._3 == 2L && math.abs(rows(1)._4 - 1.0) < 1e-9,
        s"all-a window vs 50/50 baseline is 1 bit with 2 unknowns visible: ${rows(1)}")
    } finally q.stop()
  }

  test("checkpointed stream restarts exactly-once: no loss, no replay across restart") {
    import java.nio.file.Files
    val in = Files.createTempDirectory("graft_ckpt_in").toString
    val out = Files.createTempDirectory("graft_ckpt_out").toString
    val ckpt = Files.createTempDirectory("graft_ckpt_state").toString
    val schema = "id LONG, v STRING"
    def start() = Streams.parquetSink(
      spark.readStream.schema(schema).parquet(in)
        .withColumn("tag", org.apache.spark.sql.functions.lit("x")),
      out, ckpt)
    // generation 1 lands, stream consumes it, stream STOPS
    Seq((1L, "a"), (2L, "b")).toDF("id", "v").coalesce(1).write.mode("append").parquet(in)
    val q1 = start()
    q1.processAllAvailable(); q1.stop()
    // generation 2 lands while the stream is DOWN
    Seq((3L, "c")).toDF("id", "v").coalesce(1).write.mode("append").parquet(in)
    // restart from the same checkpoint: only the new file is processed
    val q2 = start()
    q2.processAllAvailable(); q2.stop()
    val rows = spark.read.parquet(s"$out/*").select("id").as[Long].collect().sorted
    assert(rows.toSeq == Seq(1L, 2L, 3L),
      s"restart must deliver every row exactly once, got ${rows.mkString(",")}")
  }

  test("watermark drops events later than the horizon") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val df = input.toDF().toDF("ts", "event_type", "value")
    val q = Streams.hourlyCounts(df)
      .writeStream.format("memory").queryName("late_out")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData((ts(0), "click", 1.0))
      q.processAllAvailable()
      // advance the watermark far past hour 0's close (2h watermark)
      input.addData((ts(600), "view", 1.0))
      q.processAllAvailable()
      // a straggler INSIDE the closed hour-0 window: must be dropped
      input.addData((ts(5), "click", 100.0))
      q.processAllAvailable()
      val clicks = spark.table("late_out")
        .filter($"event_type" === "click")
        .select("n_events", "sum_value").as[(Long, Double)].collect()
      assert(clicks.toSeq == Seq((1L, 1.0)),
        s"late click must not reopen the emitted window: ${clicks.mkString}")
    } finally q.stop()
  }

  test("streaming hourly counts over a memory stream match the batch twin") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val df = input.toDF().toDF("ts", "event_type", "value")
    val q = Streams.hourlyCounts(df)
      .writeStream.format("memory").queryName("hourly_out")
      .outputMode(OutputMode.Update).start()
    try {
      input.addData((ts(0), "click", 1.0), (ts(10), "click", 2.0), (ts(70), "view", 5.0))
      q.processAllAvailable()
      val rows = spark.table("hourly_out")
        .select("event_type", "n_events", "sum_value")
        .as[(String, Long, Double)].collect().toSet
      assert(rows == Set(("click", 2L, 3.0), ("view", 1L, 5.0)))
    } finally q.stop()
  }

  test("streaming dedup keeps the first occurrence within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val df = input.toDF().toDF("ts", "content_hash", "value")
    val q = Streams.dedupStream(df)
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData((ts(0), "h1", 1.0), (ts(1), "h1", 2.0), (ts(2), "h2", 3.0))
      q.processAllAvailable()
      input.addData((ts(3), "h1", 4.0), (ts(4), "h3", 5.0))
      q.processAllAvailable()
      val vals = spark.table("dedup_out").select("content_hash", "value")
        .as[(String, Double)].collect().toMap
      assert(vals.keySet == Set("h1", "h2", "h3"))
      assert(vals("h1") == 1.0, "first h1 must win")
    } finally q.stop()
  }

  test("streaming dedup runs on the RocksDB state store (the production state backend)") {
    // the default in-memory state store holds every key on-heap — at
    // 100 TB stream scale the state must spill; RocksDB is Spark's
    // production provider and ships in this build (rocksdbjni). Same
    // operator, one config — proven here to actually engage by the
    // provider's own metrics in the query progress.
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[(Timestamp, String, Double)]
    val df = input.toDF().toDF("ts", "content_hash", "value")
    val q = Streams.dedupStream(df)
      .writeStream.format("memory").queryName("rocksdb_dedup_out")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData((ts(0), "h1", 1.0), (ts(1), "h1", 2.0), (ts(2), "h2", 3.0))
      q.processAllAvailable()
      val out = spark.table("rocksdb_dedup_out").select("content_hash", "value")
        .as[(String, Double)].collect().toSet
      assert(out == Set(("h1", 1.0), ("h2", 3.0)), s"first wins under RocksDB: $out")
      val metrics = q.lastProgress.stateOperators.head.customMetrics.keySet()
      assert(metrics.toString.contains("rocksdb"),
        s"RocksDB provider must actually engage, got metrics: $metrics")
    } finally {
      q.stop()
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("streaming incremental dedup drops corpus-known hashes then dedups within the stream") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val df = input.toDF().toDF("ts", "content_hash", "value")
    val corpusIndex = Seq("h_old1", "h_old2").toDF("content_hash")
    val q = Streams.incrementalDedupStream(df, corpusIndex)
      .writeStream.format("memory").queryName("incdedup_out")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(
        (ts(0), "h_old1", 1.0), // known to the corpus: dropped
        (ts(1), "h_new", 2.0),  // genuinely new: survives
        (ts(2), "h_new", 3.0))  // in-stream duplicate: dropped
      q.processAllAvailable()
      input.addData((ts(3), "h_old2", 4.0), (ts(4), "h_new2", 5.0))
      q.processAllAvailable()
      val vals = spark.table("incdedup_out").select("content_hash", "value")
        .as[(String, Double)].collect().toMap
      assert(vals.keySet == Set("h_new", "h_new2"))
      assert(vals("h_new") == 2.0, "first in-stream occurrence wins")
    } finally q.stop()
  }

  test("ingest pipeline gates quality then dedups against corpus and stream") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, String)]
    val df = input.toDF().toDF("ts", "content_hash", "text")
    val corpusIndex = Seq("h_known").toDF("content_hash")
    val good = Array.fill(25)("alpha").mkString(" ") // 25 words, no stopwords
    val q = Streams.ingestPipeline(df, corpusIndex)
      .writeStream.format("memory").queryName("ingest_out")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(
        (ts(0), "h_short", "too short"),               // fails min-words
        (ts(1), "h_stopny", Array.fill(30)("the").mkString(" ")), // stopword-dense
        (ts(2), "h_known", good),                      // corpus-known: dropped
        (ts(3), "h_new", good),                        // survives
        (ts(4), "h_new", good))                        // in-stream dup: dropped
      q.processAllAvailable()
      val out = spark.table("ingest_out").select("content_hash")
        .as[String].collect().toSeq
      assert(out == Seq("h_new"), s"only new clean unique content lands: $out")
    } finally q.stop()
  }

  test("PII-safe front door scrubs before hashing: redacted twins dedup, raw PII never lands") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, String)]
    val df = input.toDF().toDF("ts", "content_hash", "text")
    val filler = Array.fill(24)("alpha").mkString(" ")
    // two documents identical up to their (different) phone numbers:
    // after redaction they carry the same content key and must dedup
    val piiA = s"$filler call (415) 555-0101"
    val piiB = s"$filler call (415) 555-0202"
    val clean = s"$filler nothing sensitive here"
    val q = Streams.ingestPipelineScrubbed(df, Seq.empty[String].toDF("content_hash"))
      .writeStream.format("memory").queryName("pii_ingest_out")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(
        (ts(0), "ignored0", piiA),
        (ts(1), "ignored1", piiB),   // redacted twin of piiA: dropped
        (ts(2), "ignored2", clean))
      q.processAllAvailable()
      val out = spark.table("pii_ingest_out").select("text").as[String].collect()
      assert(out.length == 2, s"redacted twins must land once: ${out.toSeq}")
      assert(out.count(_.contains("[PHONE]")) == 1)
      assert(!out.exists(_.matches(""".*\d{3}.*""")), "raw PII digits landed")
      // the landed content key is the hash of the SCRUBBED text
      val keyed = spark.table("pii_ingest_out").select("content_hash", "text")
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      keyed.foreach { case (h, text) =>
        val expect = Seq(text).toDF("text")
          .select(Dedup.contentHash(org.apache.spark.sql.functions.col("text")))
          .collect()(0).getString(0)
        assert(h == expect, "content key must be derived from the scrubbed text")
      }
    } finally q.stop()
  }

  test("trained classifier serves in-stream: below-threshold docs never land") {
    implicit val sqlCtx = spark.sqlContext
    // train once on a static reference corpus with separable vocab
    val corpus = Seq(
      (0L, "s", "en", "clear prose reads well structured argument flows clear prose"),
      (1L, "s", "en", "well structured argument clear reads prose flows argument well"),
      (2L, "s", "xx", "buy click spam free winner click buy spam free spam"),
      (3L, "s", "xx", "winner free spam buy click spam winner buy click free"))
      .toDF("doc_id", "source", "lang", "text")
    val w = graft.text.QualityClf.trainOn(graft.text.QualityClf.featurizeDocs(corpus))
    val input = MemoryStream[(Timestamp, String)]
    val df = input.toDF().toDF("ts", "text")
    val q = Streams.clfScoreGate(df, w, 0.5)
      .writeStream.format("memory").queryName("clf_gate_out")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(
        (ts(0), "structured prose argument flows well and reads clear"),
        (ts(1), "spam click winner buy free spam click buy"),
        (ts(2), ""))                                     // no words: dropped
      q.processAllAvailable()
      val out = spark.table("clf_gate_out").select("text").as[String].collect()
      assert(out.length == 1 && out.head.contains("prose"),
        s"only the reference-like doc lands: ${out.toSeq}")
      val scores = spark.table("clf_gate_out").select("clf_score")
        .as[Double].collect()
      assert(scores.forall(_ >= 0.5))
    } finally q.stop()
  }

  test("rate-source ingress drives the ingest pipeline end-to-end (non-memory source)") {
    // The real front door: a rate-limited source (rowsPerSecond is the
    // maxOffsetsPerTrigger analog), explicit trigger cadence, and the
    // SAME ingestPipeline as the MemoryStream tests — proving the
    // pipeline is source-agnostic and the throughput/trigger knobs are
    // where backpressure is configured.
    import org.apache.spark.sql.streaming.Trigger
    val corpusIndex = Seq.empty[String].toDF("content_hash")
    val ingress = Streams.rateIngress(spark, rowsPerSecond = 200, numPartitions = 2)
    val q = Streams.ingestPipeline(ingress, corpusIndex)
      .writeStream.format("memory").queryName("rate_ingest_out")
      .outputMode(OutputMode.Append)
      .trigger(Trigger.ProcessingTime("250 milliseconds"))
      .start()
    try {
      // wait (bounded) until at least two duplicate families landed
      val deadline = System.currentTimeMillis() + 30000
      var n = 0L
      while (n < 2 && System.currentTimeMillis() < deadline) {
        Thread.sleep(300)
        n = spark.table("rate_ingest_out").count()
      }
      assert(n >= 2, s"rate ingress produced $n rows in 30s")
      val rows = spark.table("rate_ingest_out")
        .select("doc_id", "content_hash")
        .as[(Long, String)].collect()
      // in-stream dedup held: one survivor per 3-tick duplicate family
      val hashes = rows.map(_._2)
      assert(hashes.distinct.length == hashes.length,
        "duplicate content_hash leaked through the watermarked dedup")
      val families = rows.map { case (id, _) => id - id % 3 }
      assert(families.distinct.length == families.length,
        "two ticks of the same 3-tick family both landed")
    } finally q.stop()
  }

  test("streaming upsert sink: latest version wins across batches AND restarts") {
    import java.nio.file.Files
    implicit val sqlCtx = spark.sqlContext
    val standing = Files.createTempDirectory("graft_upsert_standing").toString + "/t"
    val ckpt = Files.createTempDirectory("graft_upsert_ckpt").toString
    val input = MemoryStream[(Long, Long, String)]
    def start() = Streams.upsertSink(
      input.toDF().toDF("k", "version", "payload"), standing, ckpt, "k", "version")
    val q1 = start()
    try {
      input.addData((1L, 1L, "a1"), (2L, 1L, "b1"))
      q1.processAllAvailable()
      input.addData((1L, 2L, "a2"), (3L, 1L, "c1"))
      q1.processAllAvailable()
    } finally q1.stop()
    // restart on the same checkpoint: replayed/new batches stay idempotent
    val q2 = start()
    try {
      input.addData((2L, 3L, "b3"), (2L, 2L, "b2-stale"))
      q2.processAllAvailable()
    } finally q2.stop()
    val rows = Streams.readStanding(spark, standing)
      .select("k", "version", "payload").as[(Long, Long, String)]
      .collect().sortBy(_._1)
    assert(rows.toSeq == Seq((1L, 2L, "a2"), (2L, 3L, "b3"), (3L, 1L, "c1")),
      s"latest version per key survives restart: ${rows.mkString(", ")}")
    // retired generations are actually deleted: exactly one remains
    val gens = new java.io.File(standing).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("gen="))
    assert(gens.length == 1,
      s"old generations must be retired after the swap: ${gens.mkString(", ")}")
  }

  test("stream-static enrichment joins the broadcast dimension per batch") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Double)]
    val stream = input.toDF().toDF("user_id", "value")
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "tier")
    val q = Streams.enrich(stream, dim, "user_id")
      .writeStream.format("memory").queryName("enrich_out")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData((1L, 10.0), (2L, 20.0), (3L, 30.0))
      q.processAllAvailable()
      val rows = spark.table("enrich_out").select("user_id", "tier")
        .as[(Long, String)].collect().toSet
      assert(rows == Set((1L, "gold"), (2L, "basic")), "inner join drops unknown user 3")
    } finally q.stop()
  }

  test("stream-stream interval join pairs clicks with recent views only") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Long, Timestamp)]
    val views = MemoryStream[(Long, Timestamp)]
    val q = Streams.clickViewJoin(
      clicks.toDF().toDF("c_user", "click_ts"),
      views.toDF().toDF("v_user", "view_ts"))
      .writeStream.format("memory").queryName("cv_out")
      .outputMode(OutputMode.Append).start()
    try {
      views.addData((1L, ts(0)), (1L, ts(55)), (2L, ts(1)))
      clicks.addData((1L, ts(5)), (1L, ts(60)))
      q.processAllAvailable()
      val rows = spark.table("cv_out").select("c_user", "click_ts", "view_ts")
        .as[(Long, Timestamp, Timestamp)].collect().toSet
      // click@5 pairs with view@0 (within 10 min); click@60 with view@55;
      // user 2's view never pairs; click@60 does NOT reach back to view@0
      assert(rows == Set((1L, ts(5), ts(0)), (1L, ts(60), ts(55))), rows.toString)
    } finally q.stop()
  }

  test("foreachBatch parquet sink lands each micro-batch idempotently by id") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_sink").toString
    val input = MemoryStream[(Long, Double)]
    val q = Streams.parquetSink(input.toDF().toDF("id", "v"),
      s"$dir/data", s"$dir/ckpt")
    try {
      input.addData((1L, 1.0), (2L, 2.0))
      q.processAllAvailable()
      input.addData((3L, 3.0))
      q.processAllAvailable()
      val out = spark.read.parquet(s"$dir/data").select("id").as[Long].collect().toSet
      assert(out == Set(1L, 2L, 3L))
      val dirs = new java.io.File(s"$dir/data").listFiles().map(_.getName)
        .filter(_.startsWith("batch_id=")).sorted.toSeq
      assert(dirs.size >= 2, s"one dir per micro-batch: $dirs")
    } finally q.stop()
  }

  test("batch events_hourly and streaming hourlyCounts agree on real data") {
    val batch = graft.Tables.t(spark, "/root/testdata/sf0.001", "events")
      .select($"ts", $"event_type", $"value")
    val viaStreamOp = Streams.hourlyCounts(batch)
      .groupBy("event_type").count().as[(String, Long)].collect().toMap
    val direct = graft.relational.Relational.eventsHourly(spark, "/root/testdata/sf0.001")
      .groupBy("event_type").count().as[(String, Long)].collect().toMap
    assert(viaStreamOp == direct)
  }

  test("DataSourceV2 doclog source: admission control, offsets, restart") {
    import scala.jdk.CollectionConverters._
    import java.nio.file.{Files, StandardOpenOption}
    val dir = Files.createTempDirectory("graft_doclog")
    val log = dir.resolve("log.txt")
    val ckpt = dir.resolve("ckpt").toString
    def append(lines: Seq[String]): Unit =
      Files.write(log, lines.asJava,
        StandardOpenOption.CREATE, StandardOpenOption.APPEND)
    def source() = spark.readStream.format("graft.streaming.DocLog")
      .option("path", log.toString)
      .option("maxRowsPerTrigger", "2")
      .load()
    append((0 until 5).map(i => s"doc line $i"))
    // the memory sink cannot recover a checkpoint, so the restart
    // proof goes through the foreachBatch parquet sink
    val out = dir.resolve("out").toString
    def start() = Streams.parquetSink(source(), out, ckpt)
    def landedOffsets() = spark.read.parquet(out)
      .select("offset").as[Long].collect().sorted.toSeq
    // phase 1: 5 records through a 2-row admission cap -> >= 3 batches
    val q1 = start()
    try {
      q1.processAllAvailable()
      assert(landedOffsets() == (0L until 5L),
        s"all offsets exactly once: ${landedOffsets().mkString(", ")}")
      val rows = spark.read.parquet(out)
        .select("offset", "doc_id", "text").as[(Long, Long, String)].collect()
      assert(rows.forall { case (o, d, t) => d == o && t == s"doc line $o" })
      val sized = q1.recentProgress.map(_.numInputRows).filter(_ > 0)
      assert(sized.forall(_ <= 2), s"admission cap respected: ${sized.mkString(",")}")
      assert(sized.length >= 3, s"5 rows under a 2-row cap need >= 3 batches: ${sized.mkString(",")}")
    } finally q1.stop()
    // phase 2: append a backlog, restart on the SAME checkpoint -> only
    // the new offsets land (the committed position survives restart;
    // no batch re-emits 0-4)
    append((5 until 8).map(i => s"doc line $i"))
    val q2 = start()
    try {
      q2.processAllAvailable()
      assert(landedOffsets() == (0L until 8L),
        s"restart resumes past the committed offset, each offset exactly once: ${landedOffsets().mkString(",")}")
    } finally q2.stop()
  }

  test("streaming near-dup gate drops simhash-bucket collisions within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val base = (1 to 200).map(i => s"word$i").mkString(" ")
    // deterministically pick a one-word addition that keeps the
    // 16-bit simhash prefix (most do on a 200-word doc; the batch
    // computation finds one, so the collapse case is guaranteed)
    val candidates = (1 to 50).map(i => base + s" extra$i")
    val pre = Dedup.simhashOf(
      (base +: candidates).zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r.getString(1).take(16)).toMap
    val variant = candidates.zipWithIndex
      .find { case (_, i) => pre((i + 1).toLong) == pre(0L) }
      .map(_._1).getOrElse(fail("no prefix-preserving one-word variant in 50"))
    val texts = Seq(base, variant,
      (1 to 200).map(i => s"other$i").mkString(" ")) // genuinely different
    val buckets = Dedup.simhashOf(
      texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r.getString(1).take(16)).toMap
    val expected = texts.zipWithIndex
      .groupBy { case (_, i) => buckets(i.toLong) }
      .values.map(_.minBy(_._2)._1).toSet
    assert(expected.contains(texts(2)), "the different doc must be its own bucket")
    val input = MemoryStream[(Timestamp, String)]
    val q = Streams.nearDupStream(input.toDF().toDF("ts", "text"))
      .writeStream.format("memory").queryName("neardup_out")
      .outputMode(OutputMode.Append).start()
    try {
      // separate batches pin arrival order
      texts.zipWithIndex.foreach { case (t, i) =>
        input.addData((ts(i.toLong), t)); q.processAllAvailable()
      }
      val landed = spark.table("neardup_out").select("text").as[String].collect().toSet
      assert(landed == expected, s"landed $landed vs expected $expected")
      assert(landed.size < texts.size, "the near-dup pair must collapse")
    } finally q.stop()
  }

  test("tx upsert sink: latest version wins across batches, snapshot-committed") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_txupsert")
    val input = MemoryStream[(Long, Long, String)]
    val q = Streams.txUpsertSink(input.toDF().toDF("k", "ver", "payload"),
      dir.resolve("table").toString, dir.resolve("ckpt").toString, "k", "ver")
    try {
      input.addData((1L, 1L, "one-v1"), (2L, 1L, "two-v1"))
      q.processAllAvailable()
      input.addData((1L, 2L, "one-v2"), (3L, 1L, "three-v1"))
      q.processAllAvailable()
      val got = graft.sources.TxTable.read(spark, dir.resolve("table").toString)
        .select("k", "ver", "payload").as[(Long, Long, String)]
        .collect().sortBy(_._1).toSeq
      assert(got == Seq((1L, 2L, "one-v2"), (2L, 1L, "two-v1"), (3L, 1L, "three-v1")))
      // two batches -> two committed versions, each a complete snapshot
      assert(graft.sources.TxTable.currentVersion(dir.resolve("table").toString).contains(1L))
    } finally q.stop()
  }

  test("verified near-dup gate: recall >= 0.9 vs the batch hd<=12 truth, no unverified drops") {
    val sf = "/root/testdata/sf0.001"
    val docs = graft.Tables.t(spark, sf, "documents").select("doc_id", "text")
    val emptyIndex = Streams.simhashBandRows(docs.limit(0), 8)
      .select($"band", $"bv", $"doc_id".as("keeper_id"), $"sim".as("keeper_sim"))
    val (flagged, survivors, newIndex) =
      Streams.verifiedNearDupBatch(docs, emptyIndex)
    val flaggedIds = flagged.select("doc_id").as[Long].collect().toSet
    // recall vs the batch truth: of the docs that are the LATER member
    // of a verified hd<=12 pair (arrival = doc_id order), the gate
    // must flag at least 90% — the whole point of band+verify over the
    // single-prefix probe (measured 0.022 at this truth)
    val laterMembers = Dedup.simhashPairs(spark, sf)
      .select("ib").as[Long].collect().toSet
    val recall = laterMembers.count(flaggedIds).toDouble / laterMembers.size
    assert(recall >= 0.9, s"gate recall $recall over ${laterMembers.size} true later-members")
    // no unverified drops: every flagged doc names a keeper within the
    // hamming budget, and flagged + survivors partition the batch
    assert(flagged.filter($"hd" > 12 || $"dup_of" === $"doc_id").count() == 0)
    assert(flaggedIds.size + survivors.count() == docs.count())
    // the index stays bucket-capped
    assert(newIndex.groupBy("band", "bv").count().filter($"count" > 16).count() == 0)
  }

  test("verified near-dup sink: cross-batch catch via the standing band index") {
    implicit val sqlCtx = spark.sqlContext
    val base = (1 to 200).map(i => s"word$i").mkString(" ")
    // a 3-word substitution flips several simhash bits — pick one that
    // lands in the verify window (1 < hd <= 12) so the single-prefix
    // gate's near-identical case does NOT cover it
    val variants = (1 to 50).map(v =>
      ((1 to 200).map(i => if (i % 67 == v % 67) s"sub${v}_$i" else s"word$i")).mkString(" "))
    val sims = Dedup.simhashOf((base +: variants).zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    def hd(a: String, b: String) = a.zip(b).count { case (x, y) => x != y }
    val variant = variants.zipWithIndex
      .find { case (_, i) =>
        val d = hd(sims((i + 1).toLong), sims(0L)); d > 1 && d <= 12 }
      .map(_._1).getOrElse(fail("no 1<hd<=12 three-word variant in 50"))
    val distinct = (1 to 200).map(i => s"other$i").mkString(" ")
    val dir = java.nio.file.Files.createTempDirectory("graft_vgate")
    val input = MemoryStream[(Long, String)]
    val q = Streams.verifiedNearDupSink(input.toDF().toDF("doc_id", "text"),
      dir.resolve("index").toString, dir.resolve("out").toString,
      dir.resolve("ckpt").toString)
    try {
      input.addData((1L, base)); q.processAllAvailable()
      input.addData((2L, variant), (3L, distinct)); q.processAllAvailable()
      val landed = spark.read.parquet(dir.resolve("out").toString)
        .select("doc_id").as[Long].collect().toSet
      // the near-dup of batch-1's doc is caught ACROSS batches by the
      // standing index; the distinct doc lands
      assert(landed == Set(1L, 3L), s"landed $landed")
    } finally q.stop()
  }

  test("full streaming front door: doclog -> ingestPipeline -> upsert landing") {
    import scala.jdk.CollectionConverters._
    import java.nio.file.{Files, StandardOpenOption}
    val dir = Files.createTempDirectory("graft_doclog_e2e")
    val log = dir.resolve("log.txt")
    val words = (1 to 24).map(i => s"w$i").mkString(" ")
    // dup pair of A, corpus-known K, gated short line, fresh B
    Files.write(log, Seq(s"$words A", s"$words A", s"$words K",
      "too short", s"$words B").asJava,
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
    val stream = spark.readStream.format("graft.streaming.DocLog")
      .option("path", log.toString).option("maxRowsPerTrigger", "2").load()
      .withColumn("content_hash", org.apache.spark.sql.functions.md5($"text"))
    val corpusIndex = Seq(s"$words K").toDF("text")
      .select(org.apache.spark.sql.functions.md5($"text").as("content_hash"))
    val q = Streams.upsertSink(
      Streams.ingestPipeline(stream, corpusIndex),
      dir.resolve("standing").toString, dir.resolve("ckpt").toString,
      "content_hash", "doc_id")
    try {
      q.processAllAvailable()
      val landed = Streams.readStanding(spark, dir.resolve("standing").toString)
        .select("text").as[String].collect().sorted.toSeq
      assert(landed == Seq(s"$words A", s"$words B"),
        s"admission-capped source -> gate -> anti-join -> dedup -> landing: $landed")
    } finally q.stop()
  }

  test("doclog source drives ingestPipeline end-to-end") {
    import scala.jdk.CollectionConverters._
    import java.nio.file.{Files, StandardOpenOption}
    val dir = Files.createTempDirectory("graft_doclog_pipe")
    val log = dir.resolve("log.txt")
    // 24 distinct words pass the quality gate (>= 20 words, no stopwords);
    // docs arrive as duplicate PAIRS; doc "known" is already in the corpus
    val words = (1 to 24).map(i => s"w$i").mkString(" ")
    val lines = Seq(s"$words known", s"$words fresh0", s"$words fresh0",
      s"$words fresh1", "too short")
    Files.write(log, lines.asJava,
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
    val stream = spark.readStream.format("graft.streaming.DocLog")
      .option("path", log.toString).option("maxRowsPerTrigger", "3").load()
      .withColumn("content_hash", org.apache.spark.sql.functions.md5($"text"))
    val corpusIndex = Seq(
      org.apache.spark.sql.functions.md5(
        org.apache.spark.sql.functions.lit(s"$words known")))
      .map(_ => s"$words known").toDF("text")
      .select(org.apache.spark.sql.functions.md5($"text").as("content_hash"))
    val q = Streams.ingestPipeline(stream, corpusIndex)
      .writeStream.format("memory").queryName("doclog_pipe_out")
      .outputMode(OutputMode.Append).start()
    try {
      q.processAllAvailable()
      val texts = spark.table("doclog_pipe_out").select("text").as[String]
        .collect().sorted.toSeq
      // corpus-known dropped, in-stream dup deduped, short line gated
      assert(texts == Seq(s"$words fresh0", s"$words fresh1"),
        s"landed: ${texts.mkString(" | ")}")
    } finally q.stop()
  }

  test("transformWithState quota gate admits up to the quota per key across batches") {
    implicit val sqlCtx = spark.sqlContext
    val saved = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    // transformWithState requires the RocksDB state store provider
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[Streams.QEv]
    val q = Streams.quotaGate(input.toDS(), quota = 2L)
      .writeStream.format("memory").queryName("quota_out")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(Streams.QEv(1L, 10L), Streams.QEv(1L, 11L), Streams.QEv(1L, 12L),
        Streams.QEv(2L, 20L))
      q.processAllAvailable()
      // batch 2: user 1 already over quota; user 2 gets one more slot
      input.addData(Streams.QEv(1L, 13L), Streams.QEv(2L, 21L), Streams.QEv(2L, 22L))
      q.processAllAvailable()
      val rows = spark.table("quota_out").as[Streams.QuotaOut].collect()
        .map(r => r.event_id -> r.admitted).toMap
      assert(rows == Map(10L -> true, 11L -> true, 12L -> false, 13L -> false,
        20L -> true, 21L -> true, 22L -> false), rows.toString)
    } finally {
      q.stop()
      saved match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("transformWithState cusum gate accumulates drift across batches and alerts") {
    implicit val sqlCtx = spark.sqlContext
    val saved = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[Streams.CEv]
    // mu = 5, threshold = 4: each +2 event adds 2 drift; alert on the 3rd
    val q = Streams.cusumGate(input.toDS(), mu = 5.0, threshold = 4.0)
      .writeStream.format("memory").queryName("cusum_out")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(Streams.CEv(1L, 10L, 7.0), Streams.CEv(1L, 11L, 7.0),
        Streams.CEv(2L, 20L, 3.0))
      q.processAllAvailable()
      // the state (user 1: S=4; user 2: S=0) must survive into batch 2
      input.addData(Streams.CEv(1L, 12L, 7.0), Streams.CEv(2L, 21L, 7.0))
      q.processAllAvailable()
      val rows = spark.table("cusum_out").as[Streams.CusumOut].collect()
        .map(r => r.event_id -> ((r.cusum, r.alert))).toMap
      assert(rows == Map(
        10L -> ((2.0, false)), 11L -> ((4.0, false)), // accumulating, not yet over
        20L -> ((0.0, false)), // below-mean clamps at zero
        12L -> ((6.0, true)), // batch-2 fold continues from checkpointed S=4
        21L -> ((2.0, false))), rows.toString)
    } finally {
      q.stop()
      saved match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("transformWithState cadence gate: metronomic key flags, bursty key does not, boundary gap counted") {
    implicit val sqlCtx = spark.sqlContext
    val saved = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[Streams.CadEv]
    val q = Streams.cadenceGate(input.toDS(), minGaps = 4L, cvCut = 0.3)
      .writeStream.format("memory").queryName("cad_out")
      .outputMode(OutputMode.Append).start()
    try {
      // user 1: perfect 10s metronome; user 2: bursts and pauses
      input.addData(
        (0 to 2).map(i => Streams.CadEv(1L, 10L + i, 100.0 + 10.0 * i)) ++
          Seq(Streams.CadEv(2L, 20L, 100.0), Streams.CadEv(2L, 21L, 101.0),
            Streams.CadEv(2L, 22L, 200.0)): _*)
      q.processAllAvailable()
      // too few gaps (2 each): nothing emitted yet
      assert(spark.table("cad_out").count() == 0)
      // batch 2 continues both streams; the gap SPANNING the batch
      // boundary (120 -> 130 for user 1) must count
      input.addData(
        (3 to 5).map(i => Streams.CadEv(1L, 10L + i, 100.0 + 10.0 * i)) ++
          Seq(Streams.CadEv(2L, 23L, 201.0), Streams.CadEv(2L, 24L, 350.0)): _*)
      q.processAllAvailable()
      val rows = spark.table("cad_out").as[Streams.CadOut].collect()
        .map(r => r.user_id -> r).toMap
      assert(rows(1L).n_gaps == 5 && rows(1L).cv < 1e-9 && rows(1L).metronomic,
        s"metronome must flag: ${rows(1L)}")
      assert(math.abs(rows(1L).mean_gap_s - 10.0) < 1e-9)
      assert(rows(2L).n_gaps == 4 && !rows(2L).metronomic,
        s"bursty must not flag: ${rows(2L)}")
    } finally {
      q.stop()
      saved match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("streaming heavy hitters: bounded state, one-sided estimates, heavy key surfaces") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Streams.TypedEv]
    val q = Streams.heavyHitters(input.toDS(), capacity = 4, k = 2)
      .writeStream.format("memory").queryName("hh_out")
      .outputMode(OutputMode.Update).start()
    try {
      // batch 1: user 7 dominates type a; 12 distinct light users
      // overflow the capacity-4 summary
      input.addData(
        (1 to 10).map(_ => Streams.TypedEv("a", 7L)) ++
          (101 to 112).map(u => Streams.TypedEv("a", u.toLong)): _*)
      q.processAllAvailable()
      val r1 = spark.table("hh_out").as[Streams.HHOut].collect()
      assert(r1.length == 2, s"top-2 emitted: ${r1.toSeq}")
      val top = r1.minBy(_.rank)
      assert(top.user_id == 7L, s"dominant user surfaces: ${r1.toSeq}")
      assert(top.est_count >= 10L, "SpaceSaving estimates are one-sided (est >= true)")
      // batch 2: user 7 keeps dominating across batches (state persists)
      input.addData((1 to 5).map(_ => Streams.TypedEv("a", 7L)): _*)
      q.processAllAvailable()
      val r2 = spark.table("hh_out").as[Streams.HHOut].collect()
        .filter(_.rank == 1).maxBy(_.est_count)
      assert(r2.user_id == 7L && r2.est_count >= 15L, s"$r2")
    } finally q.stop()
  }
}
