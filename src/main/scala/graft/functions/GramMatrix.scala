package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, TypedColumn}
import org.apache.spark.sql.expressions.Aggregator

/** Typed Aggregator folding embedding vectors directly into the
  * upper-triangle Gram-matrix sums (one flat D*(D+1)/2 double buffer):
  * the same distributed-covariance result as the declarative
  * explode-pairs formulation (the embed_gram oracle still runs that
  * form in DuckDB), but each input row updates the buffer in a tight
  * fused loop instead of materializing its 2080 pair-product structs
  * through an exploded aggregate — per-partition state is ONE buffer,
  * and only D^2-sized partials move in the merge, nothing row-shaped.
  * Sub-ulp sum-order differences vs the exploded form are absorbed by
  * the report's round-6, exactly like every other aggregated-double
  * operator (SURVEY §4).
  */
object GramMatrix {

  case class State(n: Long, sums: Array[Double])
  case class Result(n: Long, sums: Seq[Double])

  val aggregator: Aggregator[Seq[Float], State, Result] =
    new Aggregator[Seq[Float], State, Result] {
      override def zero: State = State(0L, Array.empty)

      override def reduce(s: State, e: Seq[Float]): State = {
        val d = e.length
        val buf =
          if (s.sums.nonEmpty) s.sums else Array.ofDim[Double](d * (d + 1) / 2)
        val x = new Array[Double](d)
        var i = 0
        while (i < d) { x(i) = e(i).toDouble; i += 1 }
        var t = 0
        i = 0
        while (i < d) {
          val xi = x(i)
          var j = i
          while (j < d) { buf(t) += xi * x(j); t += 1; j += 1 }
          i += 1
        }
        State(s.n + 1, buf)
      }

      override def merge(a: State, b: State): State = {
        if (a.sums.isEmpty) b
        else if (b.sums.isEmpty) a
        else {
          var t = 0
          while (t < a.sums.length) { a.sums(t) += b.sums(t); t += 1 }
          State(a.n + b.n, a.sums)
        }
      }

      override def finish(s: State): Result = Result(s.n, s.sums.toSeq)
      override def bufferEncoder: Encoder[State] = Encoders.product[State]
      override def outputEncoder: Encoder[Result] = Encoders.product[Result]
    }

  def toColumn: TypedColumn[Seq[Float], Result] = aggregator.toColumn
}
