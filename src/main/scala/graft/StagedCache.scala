package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Per-(JVM, dataset) staged-parquet cache — the §2 #112 "derived
  * index" discipline, shared by every staged family (span matches,
  * basket items/pairs): build a derived frame ONCE, materialize it to
  * a `graft-staged` temp parquet dir (the Bench staging flag keys on
  * that prefix), and serve every later consumer a plain parquet scan,
  * exactly as a deployment stores derived indexes at ingest.
  *
  * The cache key includes a FINGERPRINT of the dataset dir (entry
  * names + sizes + mtimes), not just its path: if the data under a dir
  * is regenerated within one JVM (re-scaled benches, test fixtures),
  * consumers must rebuild rather than silently read frames derived
  * from the old data (advice r16 on BasketStage/LongestSpan). */
object StagedCache {

  private val staged =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Cheap dataset-dir fingerprint: a bounded recursive walk hashing
    * every FILE's relative path + size + mtime. Recursive, not a
    * top-level listing — a table written as a parquet DIRECTORY whose
    * part files are overwritten in place leaves the subdir's own
    * size/mtime untouched, which a shallow listing would read as
    * "unchanged" and keep serving stale staged frames (the r16
    * staleness class this key exists to prevent). Spark/duckdb writers
    * also rename part files per write, so the name set alone moves on
    * any regeneration. Depth-bounded: dataset dirs are dir/table/part
    * shaped, never deep trees. */
  private def fingerprint(dir: String): String = {
    val p = java.nio.file.Paths.get(dir)
    if (!java.nio.file.Files.isDirectory(p)) return "absent"
    val s = java.nio.file.Files.walk(p, 4)
    try {
      import scala.jdk.CollectionConverters._
      val sig = s.iterator().asScala
        .filter(java.nio.file.Files.isRegularFile(_))
        .map { e =>
          val size = try java.nio.file.Files.size(e) catch { case _: Throwable => -1L }
          val mtime = try java.nio.file.Files.getLastModifiedTime(e).toMillis
            catch { case _: Throwable => -1L }
          s"${p.relativize(e)}:$size:$mtime"
        }.toSeq.sorted.mkString("|")
      Integer.toHexString(scala.util.hashing.MurmurHash3.stringHash(sig))
    } finally s.close()
  }

  /** The staged frame named `name` derived from dataset `dir`:
    * built + written once per (JVM, dir, dir-fingerprint), read as
    * parquet ever after. */
  def parquet(spark: SparkSession, dir: String, name: String)
             (build: => DataFrame): DataFrame = {
    val key = s"$name|$dir|${fingerprint(dir)}"
    val path = staged.computeIfAbsent(key, { _ =>
      val p = java.nio.file.Files.createTempDirectory("graft-staged")
      p.toFile.deleteOnExit()
      build.write.mode("overwrite").parquet(p.toString)
      p.toString
    })
    spark.read.parquet(path)
  }
}
