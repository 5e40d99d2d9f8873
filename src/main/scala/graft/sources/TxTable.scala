package graft.sources

import java.nio.file.{Files, Paths, StandardCopyOption, StandardOpenOption}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Minimal transactional table: atomic MULTI-FILE commits and snapshot
  * reads over plain parquet — the commit-log protocol the standing-
  * corpus maintenance paths (streaming upsert, compaction) need so a
  * crash mid-rewrite can never serve a half-rewritten table. The same
  * public design every lakehouse table format (the Iceberg/Delta
  * family) builds on, reduced to its two essential pieces:
  *
  *   table/
  *     data-&lt;id&gt;/part-….parquet   immutable data files, never edited
  *     _commits/vN.manifest       the file list of snapshot N
  *     _commits/CURRENT           pointer file: the committed version
  *
  * A commit (1) writes NEW data files (never touching live ones),
  * (2) writes manifest vN+1 with CREATE_NEW — the optimistic lock: of
  * two racing committers exactly one creates the file, the loser gets
  * FileAlreadyExistsException and must retry on the new snapshot —
  * then (3) atomically renames a temp file onto CURRENT. Readers
  * resolve CURRENT -> manifest -> exactly that file set, so every
  * read is a consistent snapshot: a crash anywhere before (3) leaves
  * CURRENT pointing at the previous complete version, and files are
  * only deleted by an explicit vacuum() of unreferenced ones — never
  * by the commit path, so in-flight readers of the old snapshot
  * finish correctly.
  *
  * On a real deployment the `_commits` directory lives on the object
  * store and the rename is the store's atomic-put/conditional-put;
  * the protocol is unchanged. Local-mode uses the filesystem's atomic
  * rename the same way.
  */
object TxTable {

  private val CommitsDir = "_commits"

  case class Snapshot(version: Long, files: Seq[String])

  /** The committed version, if the table has ever committed. */
  def currentVersion(tableDir: String): Option[Long] = {
    val cur = Paths.get(tableDir, CommitsDir, "CURRENT")
    if (Files.exists(cur)) Some(new String(Files.readAllBytes(cur)).trim.toLong)
    else None
  }

  /** The committed snapshot: version + table-relative data files. */
  def snapshot(tableDir: String): Option[Snapshot] =
    currentVersion(tableDir).map { v =>
      Snapshot(v, Files.readAllLines(
        Paths.get(tableDir, CommitsDir, s"v$v.manifest")).asScala.toSeq
        .filter(_.nonEmpty))
    }

  /** Snapshot read: exactly the committed file set, nothing else —
    * concurrent staged-but-uncommitted files are invisible. */
  def read(spark: SparkSession, tableDir: String): DataFrame =
    snapshot(tableDir) match {
      case Some(s) if s.files.nonEmpty =>
        spark.read.parquet(s.files.map(f => s"$tableDir/$f"): _*)
      case _ => spark.emptyDataFrame
    }

  /** All commit versions whose manifests are still resolvable,
    * ascending — the time-travel catalog. Bounded by retention:
    * vacuum() deletes manifests older than CURRENT, exactly the
    * lakehouse formats' retention-window contract. */
  def versions(tableDir: String): Seq[Long] = {
    val commits = Paths.get(tableDir, CommitsDir).toFile
    Option(commits.listFiles()).getOrElse(Array.empty)
      .map(_.getName)
      .collect { case n if n.matches("v\\d+\\.manifest") =>
        n.stripPrefix("v").stripSuffix(".manifest").toLong }
      .sorted.toSeq
  }

  /** TIME-TRAVEL read: the exact committed file set of HISTORICAL
    * version `version` — manifests are immutable and data files are
    * never edited, so any still-retained version reads back exactly
    * as it committed (snapshot isolation across time, not just across
    * concurrent writers). Fails loudly once vacuum() has GC'd the
    * version rather than serving a partial file set. */
  def readAsOf(spark: SparkSession, tableDir: String, version: Long): DataFrame = {
    val m = Paths.get(tableDir, CommitsDir, s"v$version.manifest")
    require(Files.exists(m),
      s"version $version of $tableDir is not retained (have: ${versions(tableDir).mkString(",")})")
    val files = Files.readAllLines(m).asScala.toSeq.filter(_.nonEmpty)
    if (files.isEmpty) spark.emptyDataFrame
    else spark.read.parquet(files.map(f => s"$tableDir/$f"): _*)
  }

  /** Snapshot CHANGELOG (CDC-style): the per-key difference between
    * two retained versions — inserted / deleted / updated rows, the
    * release-to-release diff a dataset consumer audits before
    * re-training. One full outer join on the key between the two
    * snapshot reads; change detection hashes the concatenated payload
    * columns (md5 over null-sentineled values), so any column change
    * surfaces without comparing columns one by one. */
  def diff(spark: SparkSession, tableDir: String, fromVersion: Long,
           toVersion: Long, key: String): DataFrame = {
    val a = readAsOf(spark, tableDir, fromVersion)
    val b = readAsOf(spark, tableDir, toVersion)
    def hashed(df: DataFrame, as: String) = {
      val payload = df.columns.filterNot(_ == key).sorted
        .map(c => coalesce(col(c).cast("string"), lit("\u0000null")))
      df.select(col(key), md5(concat_ws("\u0001", payload: _*)).as(as))
    }
    hashed(a, "__ha").join(hashed(b, "__hb"), Seq(key), "full_outer")
      .withColumn("change",
        when(col("__ha").isNull, "inserted")
          .when(col("__hb").isNull, "deleted")
          .when(col("__ha") =!= col("__hb"), "updated"))
      .filter(col("change").isNotNull)
      .select(col(key), col("change"))
  }

  /** Step 2 of the protocol — write manifest vN+1 under CREATE_NEW
    * (the optimistic concurrency check). Package-visible so the spec
    * can stop between prepare and swap (the crash point). */
  private[graft] def prepare(tableDir: String, dataFiles: Seq[String],
                             atLeast: Long = 0L): Long = {
    val next = math.max(currentVersion(tableDir).map(_ + 1).getOrElse(0L), atLeast)
    val commits = Paths.get(tableDir, CommitsDir)
    Files.createDirectories(commits)
    Files.write(commits.resolve(s"v$next.manifest"),
      dataFiles.mkString("\n").getBytes("UTF-8"), StandardOpenOption.CREATE_NEW)
    next
  }

  /** Step 3 — the atomic pointer swap: write CURRENT.tmp, rename onto
    * CURRENT. Rename of a single file is atomic, so readers see
    * either the old or the new version, never a torn pointer. The
    * swap is MONOTONIC: a claimant whose swap arrives after a higher
    * version has committed must not move the pointer backward (the
    * check-then-rename window is the local-FS stand-in for an object
    * store's conditional-put, where claim and commit are one op). */
  private[graft] def swap(tableDir: String, version: Long): Unit = {
    if (currentVersion(tableDir).exists(_ >= version)) return
    val commits = Paths.get(tableDir, CommitsDir)
    val tmp = commits.resolve(s"CURRENT.tmp.$version")
    Files.write(tmp, version.toString.getBytes("UTF-8"))
    Files.move(tmp, commits.resolve("CURRENT"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    ()
  }

  /** Commit a prepared file list: manifest + pointer swap. */
  def commit(tableDir: String, dataFiles: Seq[String]): Long = {
    val v = prepare(tableDir, dataFiles)
    swap(tableDir, v)
    v
  }

  /** Commit for REPLACE-style writers — the file list does NOT depend
    * on the standing snapshot, so on a manifest collision (a racing
    * committer, or an ORPHANED claim left by a run that died between
    * claim and swap) it is safe to advance past the taken slot and
    * claim the next one. Merge-style writers must NOT do this: their
    * payload derives from the snapshot they read, and skipping ahead
    * of an in-flight winner would clobber its batch — they block on
    * the slot and re-read instead (mergeRetry). This is what lets a
    * CLI re-run recover a table whose previous run crashed mid-commit
    * without operator intervention. */
  def commitReplace(tableDir: String, dataFiles: Seq[String]): Long = {
    var floor = 0L
    var attempts = 0
    while (attempts < 100) {
      try {
        val v = prepare(tableDir, dataFiles, floor)
        swap(tableDir, v)
        // the monotonic swap is a silent no-op when a HIGHER version
        // committed concurrently — returning v then would claim files
        // that are not (and never will be) the current snapshot.
        // Re-claim above the winner with the same file list until our
        // manifest IS the pointer (each retry claims strictly higher,
        // so two replace-writers converge with last-claimant-wins).
        if (currentVersion(tableDir).contains(v)) return v
        attempts += 1
        floor = versions(tableDir).lastOption.getOrElse(-1L) + 1
      } catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          attempts += 1
          floor = versions(tableDir).lastOption.getOrElse(-1L) + 1
      }
    }
    sys.error(s"commit contention on $tableDir after $attempts attempts")
  }

  private def listParquet(dir: String): Seq[java.io.File] =
    Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
      .sortBy(_.getName).toSeq

  /** Stage arbitrary-format files through the protocol's immutable-
    * data-dir choreography: run `write` into a fresh `data-<label>-…`
    * dir under the table, return the table-relative paths of the
    * files it produced with the given extension (sorted). The commit
    * protocol itself is format-agnostic — only the manifest and
    * CURRENT matter — so jsonl and CSV hand-offs share this one
    * staging path with the parquet tables instead of re-implementing
    * the UUID/list/relative-path dance per format. */
  def stageWith(tableDir: String, label: String, ext: String)
               (write: String => Unit): Seq[String] = {
    val dataDir = s"data-$label-${java.util.UUID.randomUUID().toString.take(8)}"
    write(s"$tableDir/$dataDir")
    Option(new java.io.File(s"$tableDir/$dataDir").listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(ext))
      .map(f => s"$dataDir/${f.getName}").sorted.toSeq
  }

  /** Stage `df` as a fresh immutable data directory; returns the
    * table-relative file paths (no commit — callers compose). */
  private def stage(df: DataFrame, tableDir: String, label: String): Seq[String] =
    stageWith(tableDir, label, ".parquet") { p =>
      df.write.mode("errorifexists").parquet(p)
    }

  /** Full-snapshot REPLACE: stage `df`'s files, commit them as the new
    * version. The building block for merge/compaction below. */
  def replace(df: DataFrame, tableDir: String): Long =
    commit(tableDir, stage(df, tableDir, "r"))

  // ---- zone-map data skipping ------------------------------------------

  /** Per-file [min, max] zone maps for `col`, stored as a version
    * sidecar next to the manifest — the Iceberg/Delta-family
    * data-skipping stats, reduced to essentials: a predicate read
    * consults the sidecar and never opens a file whose range cannot
    * match. Stats are collected at WRITE time (one bounded aggregate
    * per staged file, the pass every stats-collecting writer pays
    * once) and live under the same crash-safety rule as the manifest:
    * written BEFORE the pointer swap, invisible until it. */
  private def statsPath(tableDir: String, version: Long, col: String) =
    Paths.get(tableDir, CommitsDir, s"v$version.stats.$col")

  private def writeStats(spark: SparkSession, tableDir: String, version: Long,
                         files: Seq[String], col: String): Unit = {
    import org.apache.spark.sql.functions.{min => fmin, max => fmax, col => fcol}
    val lines = files.map { f =>
      val r = spark.read.parquet(s"$tableDir/$f")
        .agg(fmin(fcol(col)).cast("double"), fmax(fcol(col)).cast("double")).head()
      // Two wrong-skip hazards (round-8 advice), both resolved toward
      // "scan more, never less":
      // - an empty staged file or all-null stats column aggregates to
      //   null; getDouble would NPE mid-commit (after staging, before
      //   the pointer swap) — emit an always-scan sentinel instead
      // - the double cast rounds int64/decimal values beyond 2^53 to
      //   NEAREST, which can pull a file's true max down (or min up)
      //   and silently skip matching rows — widen one ulp outward so
      //   the stored range always CONTAINS the true range (rounding
      //   error is at most half an ulp)
      val (mn, mx) =
        if (r.isNullAt(0) || r.isNullAt(1))
          (Double.NegativeInfinity, Double.PositiveInfinity)
        else (Math.nextDown(r.getDouble(0)), Math.nextUp(r.getDouble(1)))
      s"$f\t$mn\t$mx"
    }
    Files.write(statsPath(tableDir, version, col),
      lines.mkString("\n").getBytes("UTF-8"), StandardOpenOption.CREATE_NEW)
    ()
  }

  /** Replace-commit WITH zone maps on `statsCol`. */
  def replaceWithStats(df: DataFrame, tableDir: String, statsCol: String): Long = {
    val files = stage(df, tableDir, "r")
    val v = prepare(tableDir, files)
    writeStats(df.sparkSession, tableDir, v, files, statsCol)
    swap(tableDir, v)
    v
  }

  /** Zone maps of the CURRENT version for `col`, if collected:
    * (file, min, max) per data file. */
  def zoneMaps(tableDir: String, col: String): Option[Seq[(String, Double, Double)]] =
    currentVersion(tableDir).flatMap { v =>
      val p = statsPath(tableDir, v, col)
      if (!Files.exists(p)) None
      else Some(Files.readAllLines(p).asScala.toSeq.filter(_.nonEmpty).map { l =>
        val Array(f, lo, hi) = l.split("\t")
        (f, lo.toDouble, hi.toDouble)
      })
    }

  /** Predicate read with file skipping: only files whose [min, max]
    * intersects [lo, hi] are opened; the residual filter still
    * applies row-level (zone maps prune FILES, not rows). Returns the
    * frame plus (scanned, total) file counts so callers — and the
    * spec — can see the skipping happen. Falls back to a full
    * filtered read when no stats were collected. */
  def readRange(spark: SparkSession, tableDir: String, col: String,
                lo: Double, hi: Double): (DataFrame, Int, Int) = {
    import org.apache.spark.sql.functions.{col => fcol}
    val all = snapshot(tableDir).map(_.files).getOrElse(Seq.empty)
    val survivors = zoneMaps(tableDir, col) match {
      case Some(zm) => zm.filter { case (_, mn, mx) => mx >= lo && mn <= hi }.map(_._1)
      case None => all
    }
    val df =
      if (all.isEmpty) spark.emptyDataFrame
      else if (survivors.isEmpty)
        // every file pruned: an empty frame that keeps the table schema
        spark.read.parquet(s"$tableDir/${all.head}")
          .filter(fcol(col) >= lo && fcol(col) <= hi).limit(0)
      else spark.read.parquet(survivors.map(f => s"$tableDir/$f"): _*)
        .filter(fcol(col) >= lo && fcol(col) <= hi)
    (df, survivors.size, all.size)
  }

  /** SCD-1 latest-wins MERGE of a batch into the standing table — the
    * transactional twin of the streaming upsert sink's generation
    * swap: per key the greatest `version` wins; re-applying a replayed
    * batch commits an identical snapshot (idempotent in effect). */
  def merge(spark: SparkSession, tableDir: String, batch: DataFrame,
            key: String, version: String): Long = {
    val standing = read(spark, tableDir)
    val unioned =
      if (standing.isEmpty) batch else standing.unionByName(batch)
    val payload = unioned.columns.filterNot(c => c == key || c == version)
    val aggCols = max(col(version)).as(version) +:
      payload.map(c => max_by(col(c), col(version)).as(c)).toSeq
    val merged = unioned.groupBy(key).agg(aggCols.head, aggCols.tail: _*)
    replace(merged, tableDir)
  }

  /** [[merge]] with optimistic-concurrency RETRY — the full protocol
    * loop a multi-writer deployment runs: losing the manifest CAS
    * (another committer created vN+1 first) means waiting for the
    * winner's pointer swap, re-reading the NEW current snapshot and
    * re-merging against it, so the loser's batch lands on top of the
    * winner's instead of clobbering it. `onConflict` runs between
    * attempts (default: a short backoff; the spec injects the
    * winner's swap there to drive the race deterministically). A
    * claimant that died between claim and swap leaves its version
    * slot orphaned until an operator removes the manifest — an
    * object-store deployment with conditional-put has no such window
    * because claim and commit are one operation. */
  def mergeRetry(spark: SparkSession, tableDir: String, batch: DataFrame,
                 key: String, version: String, maxRetries: Int = 5,
                 onConflict: () => Unit = () => Thread.sleep(50)): Long = {
    var attempt = 0
    while (attempt < maxRetries) {
      try return merge(spark, tableDir, batch, key, version)
      catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          attempt += 1
          onConflict()
      }
    }
    merge(spark, tableDir, batch, key, version) // last attempt propagates
  }

  /** Transactional COMPACTION: FFD bin-pack the CURRENT snapshot's
    * files (metadata only), rewrite each group as one file, commit the
    * compacted file set as the next version. Old files stay on disk
    * for in-flight readers of the old snapshot until vacuum(). A crash
    * anywhere before the pointer swap leaves CURRENT on the previous
    * complete version — the spec drives exactly that crash point. */
  def compactCommit(spark: SparkSession, tableDir: String,
                    targetBytes: Long): Long = {
    val (staged, version) = compactPrepare(spark, tableDir, targetBytes)
    swap(tableDir, version)
    version
  }

  /** Steps 1+2 of compaction (stage rewritten files + manifest), NO
    * pointer swap — the crash point the spec stops at. */
  private[graft] def compactPrepare(spark: SparkSession, tableDir: String,
                                    targetBytes: Long): (Seq[String], Long) = {
    val snap = snapshot(tableDir).getOrElse(
      throw new IllegalStateException(s"compact: no committed snapshot in $tableDir"))
    val sized = snap.files.map(f => f -> new java.io.File(s"$tableDir/$f").length())
    val groups = Sinks.planFiles(sized, targetBytes)
    val dataDir = s"data-c${snap.version + 1}-${java.util.UUID.randomUUID().toString.take(8)}"
    val staged = groups.flatMap { g =>
      spark.read.parquet(g.files.map(f => s"$tableDir/$f"): _*)
        .coalesce(1)
        .write.mode("errorifexists").parquet(s"$tableDir/$dataDir/group_${g.groupId}")
      listParquet(s"$tableDir/$dataDir/group_${g.groupId}")
        .map(f => s"$dataDir/group_${g.groupId}/${f.getName}")
    }
    (staged, prepare(tableDir, staged))
  }

  /** Delete data files no committed manifest references and manifests
    * older than CURRENT — the explicit GC step, separated from commit
    * so old-snapshot readers are never pulled out from under. */
  def vacuum(tableDir: String): Unit = snapshot(tableDir) match {
    case None => ()
    case Some(cur) =>
      val root = Paths.get(tableDir)
      val live = cur.files.map(f => root.resolve(f).normalize).toSet
      val liveDirs = live.map(_.getParent)
      val walk = Files.walk(root)
      val doomed =
        try walk.iterator().asScala
          .filter(p => Files.isRegularFile(p))
          .filterNot(p => p.startsWith(root.resolve(CommitsDir)))
          .filter { p =>
            val name = p.getFileName.toString
            (name.endsWith(".parquet") && !live.contains(p.normalize)) ||
              (name == "_SUCCESS" && !liveDirs.contains(p.getParent.normalize))
          }.toList
        finally walk.close()
      doomed.foreach(p => Files.delete(p))
      Option(Paths.get(tableDir, CommitsDir).toFile.listFiles()).getOrElse(Array.empty)
        .filter(f => f.getName.matches("v\\d+\\.manifest") &&
          f.getName.stripPrefix("v").stripSuffix(".manifest").toLong < cur.version)
        .foreach(f => { f.delete(); () })
  }
}
