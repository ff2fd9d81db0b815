package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit salted equi-join for probe-side key skew.
  *
  * A shuffled join on a low-cardinality or hot-keyed column sends every
  * row of the hot key to ONE reducer — the partition that never
  * finishes at 100 TB. AQE's skew-join split handles this at runtime
  * for batch sort-merge joins, but is unavailable when the plan is
  * fixed up front (Structured Streaming micro-batches, cached plan
  * reuse) or when the skew sits in a single unsplittable key group.
  * The static fix: spread the probe side over `salts` sub-keys with a
  * deterministic hash of a high-cardinality column, replicate the
  * build side once per salt, and join on (key, salt) — the hot key's
  * rows land on `salts` reducers instead of one, at the cost of
  * build-side replication (×salts), which is why the build side should
  * be the small one.
  *
  * The salt never affects the result: every probe row still meets
  * exactly one copy of its matching build rows. The sort-merge hint
  * pins the shuffled-join shape the operator exists for (with a
  * broadcastable build side Spark would rightly skip the shuffle
  * entirely — then salting is pointless).
  */
object SaltedJoin {
  def inner(probe: DataFrame, build: DataFrame, keys: Seq[String],
            saltBy: Column, salts: Int): DataFrame = {
    require(salts > 0, s"salts must be positive, got $salts")
    val salted = probe.withColumn("__salt",
      pmod(xxhash64(saltBy), lit(salts)).cast("int"))
    val replicated = build.withColumn("__salt",
      explode(array((0 until salts).map(lit): _*)))
    salted.join(replicated.hint("merge"), keys :+ "__salt").drop("__salt")
  }
}
