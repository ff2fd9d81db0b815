package graft.operators

import graft.IsolatedSparkSpec
import org.apache.spark.sql.functions._

/** The bench pins `spark.sql.shuffle.partitions = cpus`, which is the
  * right static choice for a 32-core dev box — but at 100 TB the operative
  * mechanism is the opposite direction: you OVER-partition statically
  * (thousands of reducers so no single partition can exceed executor
  * memory on the biggest day) and let AQE's `CoalesceShufflePartitions`
  * merge the resulting small shuffle maps back to the advisory size at
  * runtime. This spec pins the plan evidence that the coalesce actually
  * fires — the `AQEShuffleRead coalesced` node — on a deliberately
  * over-partitioned aggregation, beside AqeSkewJoinSpec's split evidence
  * (the two runtime re-plans that make static partition counts safe to
  * overshoot).
  *
  * Thresholds: advisory size is left at a value far above the miniature
  * shuffle's bytes so ALL 512 static partitions collapse; the mechanism
  * (map-output-size stats → contiguous-partition merge → fewer reduce
  * tasks) is byte-threshold-scaled, not size-specific.
  */
class AqeCoalesceSpec extends IsolatedSparkSpec {

  test("AQE coalesces a deliberately over-partitioned aggregation") {
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
      // the 100 TB posture under test: static reducer count overshoots
      "spark.sql.shuffle.partitions" -> "512",
      "spark.sql.adaptive.coalescePartitions.initialPartitionNum" -> "512",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8m",
      "spark.sql.adaptive.coalescePartitions.parallelismFirst" -> "false")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      import spark.implicits._
      val agg = spark.range(100000)
        .select(($"id" % 1000).as("k"), $"id".as("v"))
        .groupBy("k").agg(sum("v").as("total"))
      // execute THIS Dataset's own QueryExecution (a separate count()
      // would leave agg's adaptive plan unfinalized)
      val n = agg.collect().length
      assert(n == 1000)
      val plan = agg.queryExecution.executedPlan.toString
      assert(plan.contains("isFinalPlan=true"), "AQE did not finalize the plan")
      assert(plan.contains("AQEShuffleRead coalesced"),
        s"AQE partition coalescing did not fire; final plan:\n${plan.take(3000)}")
      // and it really reduced the reduce-side task count: the coalesced
      // read must plan fewer partitions than the 512 static reducers
      val coalesced = agg.rdd.getNumPartitions
      assert(coalesced < 512,
        s"coalesced read still has $coalesced partitions (static 512)")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
