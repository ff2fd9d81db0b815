package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

final case class WelfordState(n: Long, mean: Double, m2: Double)

/** Typed `Aggregator` (SURVEY.md §7.3: "an Aggregator[...] only if we
  * want single-pass elegance" — A12's coefficient of variation in ONE
  * pass via Chan's parallel variance update, vs the two-aggregate
  * stddev/avg composition).
  *
  * The merge step implements the numerically stable pairwise update, so
  * partial aggregates combine associatively across partitions — the
  * property that makes it safe under Spark's partial aggregation at any
  * parallelism. Registered with `functions.udaf` for SQL/DataFrame use.
  */
object WelfordCV extends Aggregator[Double, WelfordState, Double] {

  override def zero: WelfordState = WelfordState(0L, 0.0, 0.0)

  override def reduce(s: WelfordState, x: Double): WelfordState = {
    val n = s.n + 1
    val d = x - s.mean
    val mean = s.mean + d / n
    WelfordState(n, mean, s.m2 + d * (x - mean))
  }

  override def merge(a: WelfordState, b: WelfordState): WelfordState = {
    if (a.n == 0) b
    else if (b.n == 0) a
    else {
      val n = a.n + b.n
      val d = b.mean - a.mean
      val mean = a.mean + d * b.n / n
      val m2 = a.m2 + b.m2 + d * d * a.n * b.n / n
      WelfordState(n, mean, m2)
    }
  }

  /** CV = sample stddev / mean (QBReadStats.R:344-349 semantics). */
  override def finish(s: WelfordState): Double =
    if (s.n < 2 || s.mean == 0.0) Double.NaN
    else math.sqrt(s.m2 / (s.n - 1)) / s.mean

  override def bufferEncoder: Encoder[WelfordState] = Encoders.product[WelfordState]
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
