package graft.relational

import graft.clustering.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral specs for resource-allocation link prediction. */
class ResourceAllocSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def ra(edges: Seq[(Long, Long)]) =
    Graph.resourceAllocOf(edges.toDF("ia", "ib")).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap

  test("4-cycle: both diagonals scored 2 * 1/deg(2) = 1.0") {
    // 1-2, 2-3, 3-4, 1-4: diagonals (1,3) and (2,4) share two deg-2 hubs
    val m = ra(Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L)))
    assert(m((1L, 3L)) == ((2L, 1000000000000L, 1.0)))
    assert(m((2L, 4L)) == ((2L, 1000000000000L, 1.0)))
    assert(m.size == 2)
  }

  test("hub wedges are discounted: high-degree centers score lower") {
    // p and q share centers h (hub, deg 6) and c (deg 2):
    // ra = 1/6 + 1/2; the pure-hub pair elsewhere would score 2/6
    val hub = Seq((1L, 100L), (2L, 100L), (3L, 100L), (4L, 100L)) // 100 = hub
    val edges = hub ++ Seq((1L, 50L), (2L, 50L)) // 50 = small center
    val m = ra(edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) })
    // pair (1,2): common {100, 50}, deg(100)=4+2? -> compute from output
    val (cn, e12, score) = m((1L, 2L))
    assert(cn == 2L)
    // 1/deg(100) + 1/deg(50) with deg(100)=4, deg(50)=2
    assert(e12 == 1000000000000L / 4 + 1000000000000L / 2)
    assert(score == 0.75)
    // hub-only pairs, e.g. (3,4): single common neighbor -> filtered (cn>=2)
    assert(!m.contains((3L, 4L)))
  }
}
