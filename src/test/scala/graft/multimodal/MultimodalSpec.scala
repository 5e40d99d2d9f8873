package graft.multimodal

import graft.clustering.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"

  test("media view carries binary payloads with typed metadata") {
    val m = Multimodal.mediaView(spark, sf).head()
    assert(m.payload.nonEmpty)
    assert(Set("jpeg", "png", "webp").contains(m.format))
  }

  test("decode is deterministic, schema-stable and partition-preserving") {
    val media = Multimodal.mediaView(spark, sf).repartition(6)
    val feats = Multimodal.decode(media).cache()
    assert(feats.rdd.getNumPartitions == 6, "decode must not reshuffle")
    assert(feats.count() == 500)
    val f = feats.filter(_.doc_id == 1L).head()
    val f2 = Multimodal.decode(media).filter(_.doc_id == 1L).head()
    assert(f.width == f2.width && f.height == f2.height)
    assert(f.feature.length == 4 && f.feature.forall(x => x >= 0f && x <= 1f))
    assert(f.width >= 64 && f.width < 640 && f.height >= 64 && f.height < 640)
    feats.unpersist()
  }

  test("fake decoder maps bytes deterministically") {
    val r = Multimodal.MediaRecord(7L, "webp", "hello".getBytes("UTF-8"))
    val a = Multimodal.fakeDecode(r)
    val b = Multimodal.fakeDecode(r)
    assert(a == b.copy(feature = a.feature) && a.feature.sameElements(b.feature))
    assert(a.n_bytes == 5 && a.n_frames == 6)
  }
}
