package graft

import org.apache.spark.sql.SparkSession

/** The library's front door: a SparkSession wired for the graft engine.
  *
  * `Graft.session()` (or `Graft.configure` on an existing builder)
  * installs the engine's Catalyst extensions — `within_dist` +
  * its pushdown rule, the codegen `cosine_sim`, the GroupTopK planner
  * strategy, and the SQL function registrations — and sets the confs
  * the engine is designed against:
  *
  *  - AQE on with skew-join handling (runtime re-plan is the default
  *    scale path; manual salting stays available via a17's pattern)
  *  - `nanosAsLong` for TIMESTAMP(NANOS) parquet (see `Tables.load`)
  *  - UTC session timezone (determinism across engines/sites)
  *
  * Shuffle partitioning is left to the deployment (set
  * `spark.sql.shuffle.partitions` ≈ 2-3× total executor cores; the
  * local harnesses pin it to the core count).
  */
object Graft {

  /** Apply the engine's configuration to an existing builder. */
  def configure(b: SparkSession.Builder): SparkSession.Builder = b
    .config("spark.sql.extensions", "graft.plans.GraftExtensions")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.skewJoin.enabled", "true")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.session.timeZone", "UTC")

  /** A ready session; `master` defaults to whatever the environment
    * provides (spark-submit) and falls back to all local cores. */
  def session(master: Option[String] = None): SparkSession = {
    val base = SparkSession.builder()
    val withMaster = master.fold(
      if (sys.props.contains("spark.master") || sys.env.contains("SPARK_MASTER"))
        base
      else base.master("local[*]")
    )(base.master)
    val s = configure(withMaster).getOrCreate()
    // getOrCreate can return a pre-existing session whose extensions
    // were fixed at creation — make installation idempotent either way
    graft.plans.GraftExtensions.install(s)
    s
  }
}
