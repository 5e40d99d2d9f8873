package graft.relational

import graft.clustering.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral specs for synchronous min-tie-break label propagation. */
class LabelPropagationSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def und(pairs: (Long, Long)*) =
    pairs.flatMap { case (a, b) => Seq((a, b), (b, a)) }.toDF("s", "d")

  test("two triangles joined by a bridge settle into two size-3 communities") {
    // hand-simulated: after 3 synchronous sweeps with (count DESC,
    // label ASC) ties, labels are {1,2,3}->1 and {4,5,6}->3
    val e = und((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L), (4L, 6L), (3L, 4L))
    val out = Graph.labelPropagationOf(e, 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(3L -> 2L))
  }

  test("a clique converges to one community labeled by its minimum node") {
    val nodes = (1L to 5L)
    val e = und(nodes.combinations(2).map(p => (p(0), p(1))).toSeq: _*)
    val out = Graph.labelPropagationOf(e, 3).collect()
    assert(out.length == 1 && out(0).getLong(0) == 5L && out(0).getLong(1) == 1L)
  }

  test("disconnected cliques never merge") {
    val a = (1L to 3L).combinations(2).map(p => (p(0), p(1))).toSeq
    val b = (10L to 13L).combinations(2).map(p => (p(0), p(1))).toSeq
    val out = Graph.labelPropagationOf(und(a ++ b: _*), 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(3L -> 1L, 4L -> 1L))
  }
}
