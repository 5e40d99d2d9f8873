package graft.relational

import graft.clustering.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral specs for the bounded-depth multi-source BFS and the
  * filtered-ANN report. */
class BfsSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"

  test("bfs on a crafted path graph walks exactly one hop per round") {
    // path 0-1-2-...-9, both directions; seeds = 8 smallest ids = 0..7
    val und = (0L until 9L).flatMap(i => Seq((i, i + 1), (i + 1, i)))
      .toDF("s", "d")
    val got = Graph.bfsDistancesOf(und, depth = 4).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    // from seed 0 the path yields exactly one node per distance 0..4
    (0 to 4).foreach(k => assert(got((0L, k)) == 1L, s"seed 0 dist $k"))
    // an interior seed (4) reaches two nodes per distance 1..4
    (1 to 4).foreach(k => assert(got((4L, k)) == 2L, s"seed 4 dist $k"))
    // nothing beyond the depth bound
    assert(got.keys.forall(_._2 <= 4))
  }

  test("bfs distance histogram on the real graph: dist-0 rows are the seeds themselves") {
    val rows = Graph.qBfsDistances(spark, sf).collect()
    val d0 = rows.filter(_.getInt(1) == 0)
    assert(d0.length >= 1 && d0.forall(_.getLong(2) == 1L))
    assert(rows.forall(r => r.getInt(1) >= 0 && r.getInt(1) <= 4 && r.getLong(2) > 0))
  }

  test("filtered ann: truth size is min(5, label peers); candidates never exceed peers") {
    val rows = graft.search.SimSearch.qFilteredAnn(spark, sf).collect()
    assert(rows.nonEmpty)
    val emb = graft.Tables.t(spark, sf, "embeddings")
    val labelOf = emb.filter(org.apache.spark.sql.functions.col("vec_id") <= 5)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    val perLabel = emb.groupBy("label").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val peers = perLabel(labelOf(r.getLong(0))) - 1
      assert(r.getLong(2) == math.min(5L, peers), r.toString)       // k
      assert(r.getLong(1) <= peers, r.toString)                     // n_candidates
      assert(r.getLong(3) <= r.getLong(2))                          // n_hit <= k
      assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0)
    }
  }
}
