package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, TypedColumn}
import org.apache.spark.sql.expressions.Aggregator

/** Typed Aggregator folding embedding vectors directly into the
  * upper-triangle Gram-matrix sums (one flat D*(D+1)/2 buffer):
  * the same distributed-covariance result as the declarative
  * explode-pairs formulation (the embed_gram oracle still runs that
  * form in DuckDB), but each input row updates the buffer in a tight
  * fused loop instead of materializing its 2080 pair-product structs
  * through an exploded aggregate — per-partition state is ONE buffer,
  * and only D^2-sized partials move in the merge, nothing row-shaped.
  *
  * Since round 13 the buffer is MicroGrid-exact (§4): components
  * quantize to integer micro-units on entry and the sums are
  * overflow-checked Long integers, so the merged result is identical
  * under ANY partition layout or merge order — the raw-double version
  * of this buffer was the class that flipped embed_covariance's hash
  * across hosts in round 12. Sums are in 1e-12 units; divide by 1e12
  * (via MicroGrid.roundDiv6) to report. */
object GramMatrix {

  case class State(n: Long, sums: Array[Long])
  case class Result(n: Long, sums: Seq[Long])

  val aggregator: Aggregator[Seq[Float], State, Result] =
    new Aggregator[Seq[Float], State, Result] {
      override def zero: State = State(0L, Array.empty)

      override def reduce(s: State, e: Seq[Float]): State = {
        val d = e.length
        val buf =
          if (s.sums.nonEmpty) s.sums else Array.ofDim[Long](d * (d + 1) / 2)
        val q = new Array[Long](d)
        var i = 0
        while (i < d) { q(i) = MicroGrid.quantize(e(i).toDouble); i += 1 }
        var t = 0
        i = 0
        while (i < d) {
          val qi = q(i)
          var j = i
          while (j < d) {
            buf(t) = Math.addExact(buf(t), Math.multiplyExact(qi, q(j)))
            t += 1; j += 1
          }
          i += 1
        }
        State(s.n + 1, buf)
      }

      override def merge(a: State, b: State): State = {
        if (a.sums.isEmpty) b
        else if (b.sums.isEmpty) a
        else {
          var t = 0
          while (t < a.sums.length) {
            a.sums(t) = Math.addExact(a.sums(t), b.sums(t)); t += 1
          }
          State(a.n + b.n, a.sums)
        }
      }

      override def finish(s: State): Result = Result(s.n, s.sums.toSeq)
      override def bufferEncoder: Encoder[State] = Encoders.product[State]
      override def outputEncoder: Encoder[Result] = Encoders.product[Result]
    }

  def toColumn: TypedColumn[Seq[Float], Result] = aggregator.toColumn
}
