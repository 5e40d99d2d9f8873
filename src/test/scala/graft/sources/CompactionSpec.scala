package graft.sources

import graft.clustering.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Compaction planner/executor and schema-evolution union. */
class CompactionSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("compaction packs small files under the target and preserves every row") {
    val dir = Files.createTempDirectory("graft_compact_in").toString
    val out = Files.createTempDirectory("graft_compact_out").toString
    // land deliberately fragmented output: 20 writer tasks
    graft.Tables.t(spark, "/root/testdata/sf0.001", "lineitem")
      .repartition(20).write.mode("overwrite").parquet(dir)
    val inFiles = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet"))
    assert(inFiles.length >= 15, s"fragmented input expected, got ${inFiles.length}")
    val target = inFiles.map(_.length()).sum / 4 + inFiles.map(_.length()).max
    val plan = Sinks.compactionPlan(dir, target)
    // FFD invariants: every file appears exactly once; no group over target
    val planned = plan.flatMap(_.files)
    assert(planned.length == inFiles.length && planned.distinct.length == planned.length)
    assert(plan.forall(_.bytes <= target))
    assert(plan.length < inFiles.length, "compaction must reduce file count")
    Sinks.compact(spark, plan, out)
    val before = spark.read.parquet(dir).count()
    val after = spark.read.parquet(s"$out/*").count()
    assert(before == after, s"rows lost: $before -> $after")
    // each group landed as a single file
    plan.foreach { g =>
      val n = new java.io.File(s"$out/group_${g.groupId}").listFiles()
        .count(_.getName.endsWith(".parquet"))
      assert(n == 1, s"group ${g.groupId} has $n files")
    }
  }

  test("unionEvolved aligns drifted schemas with nulls for missing columns") {
    val v1 = Seq((1L, "a")).toDF("id", "text")
    val v2 = Seq((2L, "b", "en")).toDF("id", "text", "lang")
    val v3 = Seq((3L, "c", 0.5)).toDF("id", "text", "quality")
    val u = Sinks.unionEvolved(Seq(v1, v2, v3)).orderBy("id").collect()
    assert(u.length == 3)
    assert(u.map(_.schema.fieldNames.toSet).forall(_ == Set("id", "text", "lang", "quality")))
    assert(u(0).isNullAt(u(0).fieldIndex("lang")) && u(0).isNullAt(u(0).fieldIndex("quality")))
    assert(u(1).getString(u(1).fieldIndex("lang")) == "en")
    assert(u(2).getDouble(u(2).fieldIndex("quality")) == 0.5)
  }

  test("mergeSchema reads evolved parquet generations as one frame") {
    val dir = Files.createTempDirectory("graft_evolve").toString
    Seq((1L, "a")).toDF("id", "text").write.parquet(s"$dir/gen=1")
    Seq((2L, "b", "en")).toDF("id", "text", "lang").write.parquet(s"$dir/gen=2")
    val df = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(df.columns.toSet == Set("id", "text", "lang", "gen"))
    assert(df.count() == 2)
    assert(df.filter(col("lang").isNull).count() == 1)
  }
}
