package graft

import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.execution.window.WindowExec

/** Automated plan audit over every registered relational query: the
  * scale anti-patterns the round reviews hunt by hand become a failing
  * test. Checked on the pre-adaptive physical plan (subqueries included):
  *
  *  - CartesianProduct: never acceptable — an unkeyed shuffled cross
  *    product does O(n*m) work through a full shuffle of both sides.
  *  - BroadcastNestedLoopJoin: acceptable ONLY as a deliberate expansion
  *    against a broadcast tiny side (a scalar, a config table, a centroid
  *    table) — each allowlisted name documents its tiny build side.
  *  - WindowExec with an empty partitionSpec: moves ALL rows to one
  *    partition — acceptable only when a prior limit bounds the input to
  *    a constant row count.
  *
  * ML and domain-pipeline queries are excluded: constructing their frames
  * trains models (covered by QueriesSmokeSpec); their plans are pipeline
  * compositions, not single relational operators.
  */
class PlanHygieneSpec extends SparkSpec {

  /** Deliberate broadcast-tiny expansions: name -> the tiny build side. */
  private val bnljAllowed: Map[String, String] = Map(
    "x12_negative_sampling" -> "1-row corpus-count scalar",
    "x13_bm25"              -> "1-row corpus-stats scalar",
    "x15_domain_mix"        -> "1-row budget/weight scalar",
    "v6_semdedup"           -> "k-row centroid table",
    "v7_mmr_topk"           -> "1-row probe vector (greedy rounds are TakeOrdered scans)",
    "v1_cosine_topk"        -> "8-row query-vector table (corpus scanned once map-side)",
    "v9_ann_pq_topk"        -> "8-row prepped-query table with ADC lookup tables (codes scan stays map-side)",
    "v4_ann_ivf_topk"       -> "nCells-row trained-centroid table",
    "v8_ann_ivf_persisted"  -> "nCells-row trained-centroid table (persisted-index probe)",
    "w17_funnel"            -> "1-row stage-count scalars (conversion-rate join)",
    "a16_global_scalars"    -> "1-row scalar join",
    "s16_snapshot_diff"     -> "1-row snapshot-version scalar",
    "x21_heavy_hitters"     -> "1-row total-token-count scalar",
    "s14_profile"           -> "six 1-row per-column distinct-count scalars (assembled cross of single-row aggs)",
    "x25_lm_perplexity"     -> "1-row vocabulary-size scalar",
    "x26_moore_lewis"       -> "two 1-row LM-normalizer scalars",
    "x27_domain_kl"         -> "vocab-sized corpus-distribution table + 1-row normalizer (the domains x vocab grid IS the summed quantity)",
    "x29_tfidf_topk"        -> "1-row corpus-count scalar",
    "x31_heaps_growth"      -> "1-row max-doc-id scalar",
    "x32_epoch_shuffle"     -> "1-row corpus-count scalar (epoch offset fold)",
    "j18_editdist_docs"     -> "alphabet-bounded DISTINCT short-value block (len <= q(k+1)-1 = 17, |Sigma|^17-bounded by construction; empty on this corpus - min doc len 48)",
    "x36_temperature_mix"   -> "1-row temperature-normalizer scalar (s_sum, tok_all)",
    "v10_ann_filtered"      -> "8-row query table x nCells-row trained-centroid table (probe scoring)",
    "x37_corpus_diff"       -> "1-row corpus-totals scalar (na, nb)",
  )

  /** Global windows fed by a constant-bounded input. */
  private val globalWindowAllowed: Map[String, String] = Map(
    "w8_topk_offset"     -> "window input is limit(33) via TakeOrderedAndProject",
    "s11_html_sink"      -> "window input is limit(33) via TakeOrderedAndProject",
    "a10_share_of_total" -> "window input is the grouped aggregate (bounded by enum-key cardinality)",
    "a11_entropy"        -> "window input is the grouped aggregate (bounded by enum-key cardinality)",
    "a14_freq_pct"       -> "window input is the grouped aggregate (bounded by enum-key cardinality)",
    "x30_zipf_slope"     -> "window input is limit(1000) via TakeOrderedAndProject",
    "x31_heaps_growth"   -> "window input is the decile aggregate (10 rows)",
  )

  private def excluded(name: String): Boolean =
    name.startsWith("bdb_") ||
    (name.head == 'm' && name.length > 1 && name(1).isDigit) ||
    name == "k2_openness" // MC kernel: typed Dataset map, not a relational plan

  /** Pre-adaptive traversal including subquery plans, tolerant of
    * UNPLANNED dynamic-pruning subqueries: before execution a DPP
    * filter's PlanExpression still holds a LOGICAL plan, which
    * `collectWithSubqueries` would try to cast to SparkPlan and crash.
    * Those logical probe sides duplicate a join input that is already
    * present (and audited) in the physical tree, so skipping them loses
    * no coverage. */
  private def physNodes(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] = {
    val subPlans = p.expressions
      .flatMap(_.collect {
        case pe: org.apache.spark.sql.catalyst.expressions.PlanExpression[_] => pe.plan
      })
      .collect { case sp: org.apache.spark.sql.execution.SparkPlan => sp }
    (p +: p.children.flatMap(physNodes)) ++ subPlans.flatMap(physNodes)
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1) if !excluded(name)) {
    test(s"plan hygiene: $name") {
      val nodes = physNodes(fn(spark, sfDir).queryExecution.sparkPlan)
      val cart = nodes.collect { case c: CartesianProductExec => c }
      assert(cart.isEmpty, s"CartesianProduct in $name — unkeyed O(n*m) shuffle join")
      val bnlj = nodes.collect { case j: BroadcastNestedLoopJoinExec => j }
      if (!bnljAllowed.contains(name))
        assert(bnlj.isEmpty,
          s"BroadcastNestedLoopJoin in $name without a documented tiny build side")
      val gw = nodes.collect {
        case w: WindowExec if w.partitionSpec.isEmpty => w
      }
      if (!globalWindowAllowed.contains(name))
        assert(gw.isEmpty,
          s"unpartitioned Window in $name — single-partition sort at scale")
    }
  }
}
