package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, TypedColumn}
import org.apache.spark.sql.expressions.Aggregator

/** Typed Aggregator computing streaming mean + sample variance with
  * Welford/Chan parallel merging — numerically stable where the naive
  * sum-of-squares formula cancels catastrophically on large-magnitude
  * data. Demonstrates the Dataset typed-aggregation surface
  * (KeyValueGroupedDataset.agg(welford.toColumn)).
  */
object WelfordVariance {

  case class State(n: Long, mean: Double, m2: Double)
  case class Result(n: Long, mean: Double, variance: Double)

  val aggregator: Aggregator[Double, State, Result] =
    new Aggregator[Double, State, Result] {
      override def zero: State = State(0L, 0.0, 0.0)

      override def reduce(s: State, x: Double): State = {
        val n = s.n + 1
        val d = x - s.mean
        val mean = s.mean + d / n
        State(n, mean, s.m2 + d * (x - mean))
      }

      // Chan et al. parallel combine
      override def merge(a: State, b: State): State = {
        if (a.n == 0) b
        else if (b.n == 0) a
        else {
          val n = a.n + b.n
          val d = b.mean - a.mean
          val mean = a.mean + d * b.n / n
          State(n, mean, a.m2 + b.m2 + d * d * a.n * b.n / n)
        }
      }

      override def finish(s: State): Result =
        Result(s.n, s.mean, if (s.n > 1) s.m2 / (s.n - 1) else Double.NaN)

      override def bufferEncoder: Encoder[State] = Encoders.product[State]
      override def outputEncoder: Encoder[Result] = Encoders.product[Result]
    }

  def toColumn: TypedColumn[Double, Result] = aggregator.toColumn
}
