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
    "a30_hll_union"         -> "#groups-row (3) sketch table self-paired on an inequality — register files, not data",
    "a31_ams_joinsize"      -> "two 1-row sketch/scalar frames crossed (est × true-size) — register files, not data",
    "a34_kmv_intersect"     -> "#groups-row (3) sketch table self-paired on an inequality — register files, not data (a30's shape)",
    "a35_bloom_filter"      -> "1-row bloom-bitmap aggregate broadcast against the probe sets + the 1-row stats scalars crossed back onto the word table",
    "a32_ams_f2"            -> "two 1-row sketch/scalar frames crossed (est × true-F2) — register files, not data",
    "x13_bm25"              -> "1-row corpus-stats scalar",
    "x15_domain_mix"        -> "1-row budget/weight scalar",
    "v6_semdedup"           -> "k-row centroid table",
    "v7_mmr_topk"           -> "1-row probe vector (greedy rounds are TakeOrdered scans)",
    "v1_cosine_topk"        -> "8-row query-vector table (corpus scanned once map-side)",
    "v13_ann_recall"        -> "8-row query-vector table (v1's ground-truth side) + 40-row approx top-k table",
    "v9_ann_pq_topk"        -> "8-row prepped-query table with ADC lookup tables (codes scan stays map-side)",
    "v4_ann_ivf_topk"       -> "nCells-row trained-centroid table",
    "v8_ann_ivf_persisted"  -> "nCells-row trained-centroid table (persisted-index probe)",
    "v16_ann_index_update"  -> "nCells-row trained-centroid table (same probe as v8, over the incrementally-updated index)",
    "v17_quantizer_drift"   -> "1-row base-register scalar (bn, bs) crossed onto the 2-row per-part aggregate",
    "v18_ann_delete_search" -> "nCells-row trained-centroid table (v8's probe over the tombstone-aware index)",
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
    "x42_calibration_bins"  -> "1-row ECE scalar over the <=10-row bin frame",
  )

  /** Same-spec Window stacks where the later window CONSUMES the
    * earlier one's output (a genuine data dependency CollapseWindow
    * must not merge). Currently empty: every registered multi-window
    * plan carries distinct specs. Round 8's w21 fix is the cautionary
    * tale this rule encodes — chained withColumn window expressions
    * interpose Projects that defeat CollapseWindow, silently planning
    * N buffered passes over one sort where one suffices. */
  private val stackedWindowAllowed: Map[String, String] = Map(
    "d7_dup_ngram_spans" -> ("gaps-and-islands: island = running sum of " +
      "the FIRST window's brk flag — the upper window consumes the " +
      "lower's output, inexpressible in one Window node (one sort, two " +
      "passes, no extra exchange)"),
    "s19_scd2" -> ("SCD2 collapse: eff_to = lead(version) over the rows " +
      "SURVIVING the change filter, which itself needs lag(price) — the " +
      "intervening Filter is semantic, not a projection artifact"),
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
    "x40_stratified_sample" -> ("stratum prefix offsets: window input is " +
      "the per-source count aggregate (bounded by source cardinality); " +
      "the FACT ranking runs as GlobalRank, not a window"),
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
      // stacked same-spec windows: a Window DIRECTLY over another (only
      // Project/Filter between) with the same partition+order is a
      // second buffered pass over one sort. Legitimate when the upper
      // window consumes the lower's output (gaps-and-islands, rank-
      // then-dedup) — those are allowlisted with the dependency named;
      // anything else is CollapseWindow defeated by chained withColumn
      // projections (round 8's w21: four passes where one sufficed).
      // Same-spec windows in SEPARATE subtrees (e.g. the two sides of a
      // join ranking their own inputs) are fine and not flagged.
      def spec(w: WindowExec) = (w.partitionSpec.map(_.sql), w.orderSpec.map(_.sql))
      def windowBelow(p: org.apache.spark.sql.execution.SparkPlan)
          : Option[WindowExec] = p match {
        case w: WindowExec => Some(w)
        case pr: org.apache.spark.sql.execution.ProjectExec => windowBelow(pr.child)
        case f: org.apache.spark.sql.execution.FilterExec => windowBelow(f.child)
        case _ => None
      }
      val stacked = nodes.collect {
        case w: WindowExec if w.children.headOption.flatMap(windowBelow)
          .exists(lower => spec(lower) == spec(w)) => spec(w)
      }
      if (!stackedWindowAllowed.contains(name))
        assert(stacked.isEmpty,
          s"$name stacks Window execs over identical partition+order " +
          s"specs ($stacked) — CollapseWindow was defeated (usually " +
          s"chained withColumn window exprs); project them in one select, " +
          s"or allowlist a genuine inter-window data dependency")
    }
  }
}
