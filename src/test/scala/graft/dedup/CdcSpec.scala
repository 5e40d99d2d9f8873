package graft.dedup

import graft.clustering.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral specs for content-defined chunking dedup. */
class CdcSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private val body = (1 to 40).map(i => s"sentence number $i flows on").mkString(" ")

  private def report(docs: Seq[(Long, String, String)]) =
    Cdc.cdcChunksOf(docs.toDF("doc_id", "text", "source")).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))))
      .toMap

  test("identical documents duplicate every chunk; disjoint ones none") {
    val m = report(Seq(
      (1L, body, "a"), (2L, body, "b"),
      (3L, "Q" * 300, "c"))) // runs of one char: no shared chunks with body
    assert(m("a")._5 == 1.0 && m("b")._5 == 1.0)
    assert(m("a")._1 > 1L) // body long enough to split into several chunks
    assert(m("c")._4 == 0L) // no duplicated chars
  }

  test("boundaries resynchronize after a prefix insertion") {
    val m = report(Seq(
      (1L, body, "a"),
      (2L, "0123456789" + body, "b")))
    // fixed-size blocking would share ~nothing; CDC re-syncs after the
    // first content-defined boundary, so most of a's chunk mass recurs
    assert(m("a")._4 > m("a")._2 / 2) // dup_chars > half of n_chars
  }

  test("short documents fall back to a single whole-text chunk") {
    val m = report(Seq((1L, "tiny", "s"), (2L, "tiny", "s")))
    assert(m("s") == ((2L, 8L, 2L, 8L, 1.0)))
  }

  test("near-dup pairs: copies pair up, disjoint docs never do") {
    val rows = Cdc.cdcPairsOf(Seq(
        (1L, body, "a"), (2L, body, "b"),          // full copies
        (3L, "0123456789" + body, "c"),            // prefix-shifted copy
        (4L, "Z" * 400, "d")).toDF("doc_id", "text", "source"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(rows.contains((1L, 2L))) // identical docs share all chunks
    assert(rows.contains((1L, 3L))) // re-synced chunks carry the pair
    assert(rows.keys.forall { case (a, b) => a != 4L && b != 4L })
  }

  test("pair evidence requires MIN_SHARED chunks of MIN_CHUNK length") {
    // two docs sharing only short/few chunks stay unpaired
    val rows = Cdc.cdcPairsOf(Seq(
        (1L, "abcdefgh", "s"), (2L, "abcdefgh", "s")) // one 8-char chunk
        .toDF("doc_id", "text", "source"))
      .collect()
    assert(rows.isEmpty)
  }
}
