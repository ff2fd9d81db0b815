package graft

import org.apache.spark.sql.SparkSession

/** Harness-facing reset for every session-scoped memo the engine keeps.
  *
  * Three operators memoize per-session state so that queries sharing a
  * sub-plan (d2/d5/x18 share near-dup pairs; x18/x19 share pipeline stage
  * frames; x34/x38 share the trained BPE merge table) compute it once:
  * [[graft.operators.NearDupPairs]], [[graft.queries.PipelineQueries]]
  * and [[graft.queries.BpeQueries]]. That sharing is the right production
  * shape — but a BENCHMARK that times "query X" must not hand X a result
  * another query already paid for, and a long-lived JVM must be able to
  * release the pinned frames. `reset` evicts both memos for the session
  * and clears the session cache manager, returning the session to a
  * cold-plan (but warm-JVM) state.
  */
object Caches {
  def reset(spark: SparkSession): Unit = {
    graft.operators.NearDupPairs.evict(spark)
    graft.queries.PipelineQueries.evictStages(spark)
    graft.queries.BpeQueries.evictMerges(spark)
    spark.catalog.clearCache()
  }
}
