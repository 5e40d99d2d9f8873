package graft.streaming

import graft.clustering.SparkTestSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

/** Streaming HLL uniques: the live sketch must BE the batch sketch. */
class StreamingHllSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  /** transformWithState requires the RocksDB state store provider. */
  private def withRocks[T](body: => T): T = {
    val saved = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body finally saved match {
      case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("streamed estimate across micro-batches equals the batch operator's") {
    withRocks {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[Streams.HEv]
      val q = Streams.hllUniques(input.toDS())
        .writeStream.format("memory").queryName("hll_out")
        .outputMode(OutputMode.Append).start()
      try {
        input.addData((1L to 900L).map(k => Streams.HEv("a", k)): _*)
        q.processAllAvailable()
        // second batch overlaps the first (replayed items must not move
        // the registers) and adds fresh ones
        input.addData((500L to 1500L).map(k => Streams.HEv("a", k)): _*)
        q.processAllAvailable()
        val last = spark.table("hll_out").as[Streams.HllUniquesOut]
          .collect().maxBy(_.n_events)
        assert(last.n_events == 1901L) // raw events, not uniques
        val batch = graft.relational.Hll.hllOf(
            (1L to 1500L).map(k => ("a", k)).toDF("event_type", "k"))
          .collect().head
        val batchEst = batch.getDouble(4)
        // batch rounds 6; the stream emits the raw double of the SAME
        // register bank -> equal after the same rounding
        assert(BigDecimal(last.estimate)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble == batchEst)
      } finally q.stop()
    }
  }

  test("groups keep independent register banks") {
    withRocks {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[Streams.HEv]
      val q = Streams.hllUniques(input.toDS())
        .writeStream.format("memory").queryName("hll_out2")
        .outputMode(OutputMode.Append).start()
      try {
        input.addData((1L to 400L).map(k => Streams.HEv("x", k)) ++
          Seq(Streams.HEv("y", 7L)): _*)
        q.processAllAvailable()
        val rows = spark.table("hll_out2").as[Streams.HllUniquesOut]
          .collect().map(r => r.group -> r).toMap
        assert(rows("y").n_events == 1L)
        assert(math.abs(rows("y").estimate - 1.0) < 0.01) // linear-count regime
        assert(rows("x").estimate > 250.0)
      } finally q.stop()
    }
  }
}
