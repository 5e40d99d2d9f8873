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

  /** Step 2 of the protocol — write manifest vN+1 under CREATE_NEW
    * (the optimistic concurrency check). Package-visible so the spec
    * can stop between prepare and swap (the crash point). */
  private[graft] def prepare(tableDir: String, dataFiles: Seq[String]): Long = {
    val next = currentVersion(tableDir).map(_ + 1).getOrElse(0L)
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

  private def listParquet(dir: String): Seq[java.io.File] =
    Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
      .sortBy(_.getName).toSeq

  /** Stage `df` as a fresh immutable data directory; returns the
    * table-relative file paths (no commit — callers compose). */
  private def stage(df: DataFrame, tableDir: String, label: String): Seq[String] = {
    val dataDir = s"data-$label-${java.util.UUID.randomUUID().toString.take(8)}"
    df.write.mode("errorifexists").parquet(s"$tableDir/$dataDir")
    listParquet(s"$tableDir/$dataDir").map(f => s"$dataDir/${f.getName}")
  }

  /** Full-snapshot REPLACE: stage `df`'s files, commit them as the new
    * version. The building block for merge/compaction below. */
  def replace(df: DataFrame, tableDir: String): Long =
    commit(tableDir, stage(df, tableDir, "r"))

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
