package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Runtime re-planning evidence (AQE): the engine leans on manual skew
  * handling where semantics demand determinism (a17's salting), but at
  * cluster scale the default path is AQE — these specs pin that the
  * local configuration actually exercises it, so the behavior carries
  * to a real cluster unchanged.
  *
  * Runs on an isolated session: the thresholds set here are
  * test-aggressive (tiny data must trigger skew/coalesce logic sized
  * for gigabytes). */
class AqeSpec extends SparkSpec {

  private lazy val s = {
    val s = spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "true")
    s.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.0")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8192")
    s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8192")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.shuffle.partitions", "8")
    s
  }

  test("AQE splits a skewed sort-merge join partition at runtime") {
    import s.implicits._
    // one hot key carrying ~99% of the rows
    val left = s.range(0, 60000)
      .select((when($"id" % 100 === 0, $"id" % 7).otherwise(lit(0L))).as("k"),
              $"id".as("payload"))
    val right = s.range(0, 7).select($"id".as("k"), ($"id" * 10).as("dim"))
    val joined = left.join(right, "k")
    // execute THIS queryExecution (write() would plan a separate one
    // and leave this plan isFinalPlan=false)
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("skew=true"),
      s"expected a skew-split SMJ in the final adaptive plan:\n$plan")
  }

  test("AQE coalesces undersized shuffle partitions at runtime") {
    import s.implicits._
    val tiny = s.range(0, 1000).select(($"id" % 50).as("k"), $"id".as("v"))
      .groupBy("k").agg(sum("v").as("t"))
    tiny.collect()
    val plan = tiny.queryExecution.executedPlan.toString
    assert(plan.contains("AQEShuffleRead") && plan.contains("coalesced"),
      s"expected a coalesced AQEShuffleRead in the final adaptive plan:\n$plan")
  }
}
