package graft.sources

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** `Observe.withQualityMetrics`: counters ride the query's own action
  * (CollectMetrics in the plan), and match a directly-computed profile.
  *
  * Runs on its OWN SparkSession (same SparkContext): `observe`
  * initializes the session's lazy ObservationManager, and that manager
  * is not java-serializable — a later suite that serializes the shared
  * session inside a task closure (spark.ml model summaries hold a
  * session reference) would then fail closure cleaning. Session
  * isolation keeps the shared session's field uninitialized. */
class ObserveSpec extends SparkSpec {
  private lazy val obsSession = spark.newSession()

  test("observed quality metrics match a direct aggregate, in one action") {
    val e = Tables.load(obsSession, sfDir, "events")
    val (observed, obs) = Observe.withQualityMetrics(e, "event_id", "value")
    // the observed frame is the SAME relation
    assert(observed.schema == e.schema)
    // one action resolves both the query result and the metrics
    observed.write.format("noop").mode("overwrite").save()
    val m = obs.get
    val direct = e.agg(
      count(lit(1)).as("n_rows"),
      sum(col("event_id").isNull.cast("long")).as("n_null_keys"),
      sum(col("value").isNull.cast("long")).as("n_null_values"),
      min(col("value")).as("min_value"),
      max(col("value")).as("max_value")).collect()(0)
    assert(m("n_rows") == direct.getAs[Long]("n_rows"))
    assert(m("n_null_keys") == direct.getAs[Long]("n_null_keys"))
    assert(m("n_null_values") == direct.getAs[Long]("n_null_values"))
    assert(m("min_value") == direct.getAs[Double]("min_value"))
    assert(m("max_value") == direct.getAs[Double]("max_value"))
  }

  test("metrics are collected inside the plan, not by a second scan") {
    val e = Tables.load(obsSession, sfDir, "events")
    val (observed, obs) = Observe.withQualityMetrics(e, "event_id", "value")
    val plan = observed.queryExecution.analyzed.toString
    assert(plan.contains("CollectMetrics"),
      s"expected a CollectMetrics node, got:\n$plan")
    // complete the observation lifecycle: a registered-but-never-resolved
    // Observation stays in the session's ObservationManager and poisons
    // later closure-cleaning (the manager is not serializable)
    observed.write.format("noop").mode("overwrite").save()
    assert(obs.get("n_rows").asInstanceOf[Long] > 0L)
  }
}
