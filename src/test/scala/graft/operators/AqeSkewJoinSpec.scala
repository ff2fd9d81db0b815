package graft.operators

import graft.IsolatedSparkSpec
import org.apache.spark.sql.functions._

/** j15 proves the MANUAL salt for skewed joins; this spec demonstrates the
  * sibling path — leaving the join unsalted and letting AQE's
  * `OptimizeSkewedJoin` split the hot partition at runtime — and pins the
  * plan evidence that the split actually happens.
  *
  * When to rely on which (the operational rule, also in COVERAGE.md):
  * AQE handles skew that is *discovered at runtime* on a plain shuffle
  * join, splitting oversized partitions against replicated counterparts —
  * zero code, but it only fires on sort-merge/shuffled-hash joins and
  * only splits at partition granularity. The manual salt (SaltedJoin) is
  * for skew you *know about* and must bound deterministically — it
  * spreads one hot key across `salts` sub-keys before the exchange, works
  * under any join strategy, and keeps the plan static (no runtime
  * re-plan), which matters when the skewed stage feeds further stages
  * whose partitioning you want to reuse.
  *
  * Thresholds are lowered so the miniature fixture crosses them; the
  * mechanism (partition-size stats → skewed-partition split → replicated
  * reads on the other side) is byte-threshold-scaled, not size-specific.
  */
class AqeSkewJoinSpec extends IsolatedSparkSpec {

  test("AQE splits the hot partition of the unsalted skewed join") {
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "65536",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16384",
      // keep the join a shuffle join: broadcast would sidestep the skew
      // machinery entirely (that IS the right fix when one side is small
      // — x14 does exactly that — but here we demonstrate the AQE path)
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      import spark.implicits._
      // 100k-row fact side with 95% of rows on key 0; 2k-row dim side
      // too big to broadcast (disabled anyway), so: SMJ on a hot key
      val fact = spark.range(100000).select(
        when($"id" % 20 =!= 0, lit(0L)).otherwise($"id" % 2000).as("k"),
        concat(lit("payload_padding_payload_padding_"), $"id").as("payload"))
      val dim = spark.range(2000).select($"id".as("k"), ($"id" * 2).as("v"))
      val joined = fact.join(dim, "k")
      // execute THIS Dataset's own QueryExecution (count() would plan a
      // separate query and leave joined's adaptive plan unfinalized)
      val n = joined.collect().length
      assert(n == 100000) // every row matches exactly one dim row
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("isFinalPlan=true"), "AQE did not finalize the plan")
      assert(plan.contains("skew=true"),
        s"AQE skew-join split did not fire; final plan:\n${plan.take(3000)}")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("the salted join produces identical results to the plain join") {
    import spark.implicits._
    val fact = spark.range(20000).select(
      when($"id" % 10 =!= 0, lit(0L)).otherwise($"id" % 500).as("k"),
      $"id".as("payload"))
    val dim = spark.range(500).select($"id".as("k"), ($"id" * 3).as("v"))
    val plain = fact.join(dim, "k").select("k", "payload", "v")
    val salted = SaltedJoin.inner(fact, dim, Seq("k"),
        saltBy = col("payload"), salts = 8)
      .select("k", "payload", "v")
    assert(plain.exceptAll(salted).isEmpty && salted.exceptAll(plain).isEmpty,
      "salted join diverged from the plain join")
  }
}
