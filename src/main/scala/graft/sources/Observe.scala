package graft.sources

import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Free data-quality counters via `Dataset.observe`: aggregate metrics
  * (row/null counts, value range) are computed DURING whatever action
  * the query already runs — a `CollectMetrics` node in the plan, no
  * second pass over the data. At 100 TB this is the difference between
  * profiling-as-you-write and re-scanning the table for a quality
  * report (the one-off full profile is `s14_profile`; this is the
  * always-on per-job variant a production pipeline attaches to every
  * write).
  *
  * Caveat (Spark 4.1): the first `observe` on a session initializes its
  * lazy `ObservationManager`, which is not java-serializable. A closure
  * that later captures THAT session object (e.g. a spark.ml model whose
  * training summary holds a session reference, used inside a transform)
  * will then fail closure cleaning. Attach observations on a dedicated
  * `spark.newSession()` when the same session's object graph can end up
  * inside task closures.
  */
object Observe {

  /** Attach quality counters for (key, value) to `df`. The returned
    * frame is semantically identical to `df`; the `Observation`
    * resolves after the next action on it. One Observation instance is
    * single-use — attach a fresh one per executed query. */
  def withQualityMetrics(df: DataFrame, keyCol: String,
                         valueCol: String): (DataFrame, Observation) = {
    val obs = Observation()
    val observed = df.observe(obs,
      count(lit(1)).as("n_rows"),
      sum(col(keyCol).isNull.cast("long")).as("n_null_keys"),
      sum(col(valueCol).isNull.cast("long")).as("n_null_values"),
      min(col(valueCol)).as("min_value"),
      max(col(valueCol)).as("max_value"))
    (observed, obs)
  }
}
