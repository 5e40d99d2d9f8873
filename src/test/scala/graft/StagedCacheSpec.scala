package graft

import graft.clustering.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** The staged-parquet cache must rebuild when the DATA under a dataset
  * dir changes within one JVM (advice r16: the old dir-keyed caches
  * served stale staged frames to every consumer after a regeneration —
  * tests, re-scaled benches). */
class StagedCacheSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark

  test("a regenerated dataset dir invalidates the staged frame") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("staged-cache-spec")
    def write(rows: Seq[Long]): Unit =
      rows.toDF("v").coalesce(1).write.mode("overwrite")
        .parquet(dir.resolve("data.parquet").toString)

    write(Seq(1L, 2L, 3L))
    def staged() = StagedCache.parquet(spark, dir.toString, "spec-frame") {
      spark.read.parquet(dir.resolve("data.parquet").toString)
        .agg(org.apache.spark.sql.functions.sum("v").as("s"))
    }
    assert(staged().head.getLong(0) == 6L)
    // same data, same fingerprint: served from the stage (no rebuild
    // observable, but the value stays right)
    assert(staged().head.getLong(0) == 6L)

    // regenerate with different content; ensure the mtime moves even
    // on coarse filesystem clocks
    write(Seq(10L, 20L))
    val f = dir.resolve("data.parquet").toFile
    f.setLastModified(f.lastModified() + 5000)
    assert(staged().head.getLong(0) == 30L,
      "stale staged frame served after the dataset dir was regenerated")
  }

  test("distinct stage names under one dir do not collide") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("staged-cache-spec2")
    Seq(7L).toDF("v").write.mode("overwrite")
      .parquet(dir.resolve("t.parquet").toString)
    val a = StagedCache.parquet(spark, dir.toString, "frame-a") {
      spark.read.parquet(dir.resolve("t.parquet").toString)
        .selectExpr("v * 2 AS v")
    }
    val b = StagedCache.parquet(spark, dir.toString, "frame-b") {
      spark.read.parquet(dir.resolve("t.parquet").toString)
        .selectExpr("v * 3 AS v")
    }
    assert(a.head.getLong(0) == 14L && b.head.getLong(0) == 21L)
  }
}
