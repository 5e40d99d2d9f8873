package graft.sources

import java.nio.file.{Files, Paths}

import graft.clustering.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

/** Partitioned/sorted/size-bounded landing sink: directory layout,
  * per-file record cap, within-file sortedness, and partition pruning
  * on read-back — the write-side half of the 100 TB pruning story. */
class SinkSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark

  test("writePartitioned lays out pruned, sorted, size-bounded files") {
    val dir = Files.createTempDirectory("graft_sink").toString
    val docs = graft.Tables.t(spark, "/root/testdata/sf0.001", "documents")
    Sinks.writePartitioned(docs, dir, "lang", "doc_id", maxRecordsPerFile = 20)

    // partition directories exist for every lang value
    val langs = docs.select("lang").distinct().collect().map(_.getString(0)).toSet
    val subdirs = Files.list(Paths.get(dir)).iterator().asScala
      .map(_.getFileName.toString).filter(_.startsWith("lang=")).toSet
    assert(subdirs == langs.map("lang=" + _))

    // every file respects the record cap and is sorted by doc_id
    val back = spark.read.parquet(dir)
    val rows = back.select(input_file_name().as("f"), col("doc_id"))
      .groupBy("f").agg(collect_list("doc_id").as("ids")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val ids = r.getSeq[Long](1)
      assert(ids.size <= 20, s"file ${r.getString(0)} exceeds maxRecordsPerFile: ${ids.size}")
      assert(ids == ids.sorted, s"file ${r.getString(0)} not sorted by doc_id")
    }

    // round trip is lossless
    assert(back.count() == docs.count())

    // a lang filter prunes partitions at plan time
    val pruned = back.filter(col("lang") === langs.head)
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") && scan.contains("lang"),
      "lang filter must reach PartitionFilters:\n" + scan.take(800))
  }

  test("manifest fingerprints a landed dataset and detects a dropped row") {
    val docs = graft.Tables.t(spark, "/root/testdata/sf0.001", "documents")
    val dirA = Files.createTempDirectory("graft_manifest_a").toString
    val dirB = Files.createTempDirectory("graft_manifest_b").toString
    Sinks.writePartitioned(docs, dirA, "lang", "doc_id", maxRecordsPerFile = 20)
    Sinks.writePartitioned(docs, dirB, "lang", "doc_id", maxRecordsPerFile = 20)
    val mA = Sinks.manifest(spark, dirA).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDecimal(2)))
    val mB = Sinks.manifest(spark, dirB).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDecimal(2)))
    // row totals reconcile against the source
    assert(mA.map(_._2).sum == docs.count())
    // an identical rewrite yields the identical fingerprint multiset
    // (file UUIDs differ; counts+fingerprints must not)
    assert(mA.map(t => (t._2, t._3)).sortBy(_._2.toString).toSeq ==
      mB.map(t => (t._2, t._3)).sortBy(_._2.toString).toSeq,
      "deterministic layout => reproducible manifest")
    // dropping one row shifts the dataset-level fingerprint
    val dirC = Files.createTempDirectory("graft_manifest_c").toString
    val dropped = docs.orderBy("doc_id").limit(docs.count().toInt - 1)
    Sinks.writePartitioned(dropped, dirC, "lang", "doc_id", maxRecordsPerFile = 20)
    val totalA = mA.map(_._3.toBigInteger).reduce(_ add _)
    val totalC = Sinks.manifest(spark, dirC).collect()
      .map(_.getDecimal(2).toBigInteger).reduce(_ add _)
    assert(totalA != totalC, "a dropped row must shift the total fingerprint")
  }
}
