package graft.sources

import graft.clustering.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** The hand-rolled Avro container source/sink (Avro core API, no
  * spark-avro module): round trip, parallel whole-file reads, corrupt-
  * container quarantine, and operators running unchanged over the
  * Avro-backed frame. */
class AvroDocsSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"

  test("documents round-trip through Avro containers, one file per partition") {
    val docs = graft.Tables.t(spark, sf, "documents").select("doc_id", "text")
      .repartition(4)
    val dir = java.nio.file.Files.createTempDirectory("graft_avro").toString + "/docs"
    AvroDocsSource.write(docs, dir)
    val files = Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".avro"))
    assert(files.length == 4, s"one container per partition: ${files.length}")
    val back = AvroDocsSource.read(spark, dir)
    assert(back.schema.fieldNames.toSeq == Seq("doc_id", "text"))
    assert(back.count() == docs.count())
    assert(back.exceptAll(docs).count() == 0 && docs.exceptAll(back).count() == 0)
    // the Avro container is REAL: the file starts with the magic bytes
    val head = java.nio.file.Files.readAllBytes(files(0).toPath).take(4)
    assert(head.sameElements(Array[Byte]('O', 'b', 'j', 1)), "Avro magic Obj\\x01")
  }

  test("null text and non-ascii survive the container round trip") {
    val docs = Seq((1L, "café résumé"), (2L, null), (3L, "plain")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_avro").toString + "/n"
    AvroDocsSource.write(docs.coalesce(1), dir)
    val got = AvroDocsSource.read(spark, dir).collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(got == Map(1L -> Some("café résumé"), 2L -> None, 3L -> Some("plain")))
  }

  test("a corrupt container quarantines to zero rows, never a job failure") {
    val docs = Seq((1L, "alpha"), (2L, "beta")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_avro").toString + "/q"
    AvroDocsSource.write(docs.coalesce(1), dir)
    // drop a junk .avro beside the real one
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "part-junk.avro"),
      Array[Byte](1, 2, 3, 4, 5))
    val (back, quarantined) = AvroDocsSource.readCounted(spark, dir)
    assert(back.count() == 2, "real rows survive, junk file contributes none")
    assert(quarantined.value == 1L,
      "the dropped container must be counted, not silently swallowed")
  }

  test("engine operators run unchanged over an Avro-backed corpus") {
    val docs = graft.Tables.t(spark, sf, "documents").select("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_avro").toString + "/ops"
    AvroDocsSource.write(docs, dir)
    val back = AvroDocsSource.read(spark, dir)
    val viaAvro = graft.dedup.Dedup.exactOf(back).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    val viaParquet = graft.dedup.Dedup.exactOf(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    assert(viaAvro == viaParquet)
  }
}
