package graft.domain

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.catalyst.expressions.{AttributeSet, ScalaUDF}
import org.apache.spark.sql.execution.{ProjectExec, SparkPlan}
import org.apache.spark.sql.execution.exchange.{REPARTITION_BY_NUM, ShuffleExchangeExec}
import org.apache.spark.sql.functions._

/** The compute-dense-UDF starvation class as a failing test (round-8
  * verdict ask #2): a kernel UDF (K1/K2 — ~10³-10⁵ flops per ROW)
  * behind a tiny row count defeats every rows-based partitioning
  * heuristic in the stack — a coalesce(1) fixture scans as one task,
  * and AQE's size-based coalescing folds the few-KB shuffle back to ~1
  * partition — so the kernel silently serializes (bdb_radius_stage:
  * 2.9 s → 22.1 s in the r8 driver bench). Every kernel call site must
  * route through [[Kernels.spread]]; this spec makes the omission red:
  *
  *  1. REGISTRY SWEEP — any registered query that plans a marked
  *     kernel UDF (`Kernels.markers`; kernel udfs must be `.withName`d)
  *     must carry a REPARTITION_BY_NUM exchange with > 1 partitions
  *     BELOW the UDF projection. REPARTITION_BY_NUM is the load-bearing
  *     origin: it is the one shuffle origin AQE's
  *     CoalesceShufflePartitions never coalesces, so the spread
  *     survives adaptive re-planning; an ENSURE_REQUIREMENTS or
  *     REPARTITION_BY_COL shuffle in the same place would be folded
  *     back to ~1 partition at runtime and MUST NOT satisfy this spec.
  *  2. RUNTIME SPREAD — on the bdb fixture (the exact r8 regression
  *     input: a coalesce(1) parquet scan), the spread that feeds
  *     RadiusStage's kernel actually lands rows on > 1 partition.
  *
  * ML-training queries (m*, bdb_coverage_model, bdb_disguise) are
  * excluded because CONSTRUCTING their frames fits models; they contain
  * no kernel UDFs (kernels live in KernelQueries + RadiusStage, both
  * swept here).
  */
class KernelSpreadSpec extends SparkSpec {

  private def mlExcluded(name: String): Boolean =
    (name.head == 'm' && name.length > 1 && name(1).isDigit) ||
    name == "bdb_coverage_model" || name == "bdb_disguise"

  private def nodes(p: SparkPlan): Seq[SparkPlan] = p +: p.children.flatMap(nodes)

  private def hasKernelUdf(p: SparkPlan): Boolean =
    p.expressions.exists(_.exists {
      case u: ScalaUDF => u.udfName.exists(Kernels.markers.contains)
      case _ => false
    })

  /** True iff a multi-partition REPARTITION_BY_NUM exchange sits on the
    * child chain that actually FEEDS the kernel UDF (round-9 ADVICE: the
    * old whole-subtree scan would be satisfied by a repartition on an
    * unrelated join branch while the kernel's own input stayed
    * single-partition). The walk follows, from the kernel projection
    * down, only children whose output carries the attributes the kernel
    * reads, re-deriving the needed set through Project aliases. */
  private def spreadBelow(p: SparkPlan): Boolean = {
    val kernelRefs = AttributeSet(p.expressions.flatMap(_.collect {
      case u: ScalaUDF if u.udfName.exists(Kernels.markers.contains) => u.references
    }).flatten)

    def isSpread(n: SparkPlan): Boolean = n match {
      case se: ShuffleExchangeExec =>
        se.shuffleOrigin == REPARTITION_BY_NUM &&
        se.outputPartitioning.numPartitions > 1
      case _ => false
    }
    // attributes of `node`'s input needed to produce `needed` at its output
    def inputRefs(node: SparkPlan, needed: AttributeSet): AttributeSet = node match {
      case proj: ProjectExec =>
        AttributeSet(proj.projectList
          .filter(ne => needed.contains(ne.toAttribute)).flatMap(_.references))
      case _ => needed
    }
    def walk(node: SparkPlan, needed: AttributeSet): Boolean =
      node.children.exists { c =>
        c.outputSet.intersect(needed).nonEmpty &&
        (isSpread(c) || walk(c, inputRefs(c, needed.intersect(c.outputSet))))
      }
    walk(p, kernelRefs)
  }

  test("every registered kernel-UDF query spreads before the kernel") {
    val kernelQueries = SparkEntry.queries.toSeq.sortBy(_._1).collect {
      case (name, fn) if !mlExcluded(name) =>
        val plan = fn(spark, sfDir).queryExecution.sparkPlan
        val kernelNodes = nodes(plan).filter(hasKernelUdf)
        (name, kernelNodes)
    }.filter(_._2.nonEmpty)
    // the sweep must actually see the known kernel call sites — if the
    // UDFs lose their marker names, the whole check silently vacuates
    val seen = kernelQueries.map(_._1).toSet
    assert(Set("k1_intercept_radius", "k2_openness", "bdb_radius_stage")
             .subsetOf(seen),
      s"kernel sweep lost its known call sites (saw $seen) — did a " +
      "kernel udf drop its .withName(Kernels.K*Name) marker?")
    for ((name, kns) <- kernelQueries; kn <- kns)
      assert(spreadBelow(kn),
        s"$name plans a kernel UDF with no multi-partition " +
        s"REPARTITION_BY_NUM exchange below it — route the kernel input " +
        s"through Kernels.spread(df, seedKeys…) (r8's 22 s serialized " +
        s"bdb_radius_stage is this failure)")
  }

  test("spread lands fixture rows on multiple partitions at runtime") {
    // the r8 regression input verbatim: the coalesce(1) parquet replica
    val fix = graft.bdb.BdbMini.writeFixture(spark)
    val cleaned = graft.bdb.OpennessPrep(
      spark.read.parquet(s"$fix/tracking"),
      spark.read.parquet(s"$fix/plays"),
      spark.read.parquet(s"$fix/player_play"))
    val spread = Kernels.spread(cleaned,
      col("gameId"), col("playId"), col("frameId"), col("nflId"))
    // partition layout only — .select keeps the UDF out of this probe
    val keysRdd = spread.select("gameId").rdd
    assert(keysRdd.getNumPartitions ==
             math.max(2, spark.sparkContext.defaultParallelism))
    val nonEmpty = keysRdd
      .mapPartitions(it => Iterator(if (it.hasNext) 1 else 0)).sum()
    assert(nonEmpty > 1,
      s"kernel input landed on $nonEmpty non-empty partition(s) — " +
      "the MC kernel would serialize")
  }
}
