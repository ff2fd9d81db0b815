package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact J ≥ 0.7 near-dup pairs over a shingled frame `(doc_id, s)` via
  * hashed PPJoin-style prefix filtering (reference dedups by full-text
  * equality only; this is the corpus-scale generalization).
  *
  * Shingles hash to 64-bit keys (string equality ⇔ hash equality up to a
  * ~n²/2⁶⁵ collision), each doc sorts its hash set (any shared total order
  * works) and indexes only the first L − ⌈0.7·L⌉ + 1 — two docs with
  * J ≥ 0.7 MUST share a prefix element (prefix-filter theorem), so the
  * candidate join touches ~30% of the inverted index at ~10% of the naive
  * candidate volume. Size-ratio prune (min/max ≥ 0.7) inside the join,
  * exact Jaccard on the full hash sets afterwards. Never materializes the
  * O(n²) cross product: the join shuffles on uniform 8-byte hash keys.
  *
  * Returns (doc_a, doc_b, jraw) with doc_a < doc_b and jraw ≥ 0.7.
  */
object NearDupPairs {

  /** Memoized per (session, canonicalized input plan): d2, d5 and the x18
    * pipeline all ask for pairs over semantically identical shingle
    * frames — one computation serves them all, and only the SMALL pairs
    * result stays resident (the wide hashed-shingle cache is released as
    * soon as the pairs materialize).
    *
    * Lifetime: entries live until [[evict]] (harness-driven — `graft.Caches
    * .reset` between bench runs, or at session teardown in tests). In a
    * long-lived multi-session JVM the map would otherwise accumulate one
    * small checkpointed frame per (session, plan), and a memoized result
    * goes stale if the files under the input path change mid-session —
    * both acceptable for the bench/verify harness this serves, both
    * released by eviction. */
  private val memo = scala.collection.concurrent.TrieMap
    .empty[(org.apache.spark.sql.SparkSession,
            org.apache.spark.sql.catalyst.plans.logical.LogicalPlan), DataFrame]

  def over(shingled: DataFrame): DataFrame =
    memo.getOrElseUpdate(
      (shingled.sparkSession, shingled.queryExecution.analyzed.canonicalized),
      compute(shingled))

  /** Drop every memo entry for `session`, releasing the checkpointed pairs
    * frames for GC/BlockManager cleanup. */
  def evict(session: org.apache.spark.sql.SparkSession): Unit =
    memo.keys.filter(_._1 eq session).foreach(memo.remove)

  private def compute(shingled: DataFrame): DataFrame = {
    // `sh` is read three times (inverted index + both verify-join sides),
    // so it caches for the duration of the call; the small pairs result is
    // materialized eagerly (localCheckpoint) so the cache can be released
    // before returning — otherwise every invocation pinned another copy of
    // the hashed-shingle frame in storage memory for the session lifetime.
    val sh = shingled
      .select(col("doc_id"), sort_array(transform(col("s"), xxhash64(_))).as("hs"))
      .withColumn("sz", size(col("hs")))
      .cache()
    val inv = sh.select(col("doc_id"), col("sz"),
      explode(slice(col("hs"), lit(1),
        (col("sz") - ceil(col("sz") * 0.7) + 1).cast("int"))).as("sh_h"))
    val cand = inv.as("a")
      .join(inv.as("b"),
        col("a.sh_h") === col("b.sh_h") && col("a.doc_id") < col("b.doc_id") &&
        col("a.sz") * lit(10) >= col("b.sz") * 7 &&
        col("b.sz") * lit(10) >= col("a.sz") * 7)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    val pairs = cand
      .join(sh.select(col("doc_id").as("doc_a"), col("hs").as("ha"), col("sz").as("sza")), "doc_a")
      .join(sh.select(col("doc_id").as("doc_b"), col("hs").as("hb"), col("sz").as("szb")), "doc_b")
      .withColumn("c", size(array_intersect(col("ha"), col("hb"))))
      .withColumn("jraw", col("c").cast("double") / (col("sza") + col("szb") - col("c")))
      .filter(col("jraw") >= 0.7)
      .select(col("doc_a"), col("doc_b"), col("jraw"))
      .localCheckpoint(eager = true)
    sh.unpersist(blocking = false)
    pairs
  }
}
