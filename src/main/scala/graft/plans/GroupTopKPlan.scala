package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, Descending, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.LongType

import scala.collection.mutable

/** SURVEY.md §7.3 case (c) — whole-operator semantics as a native
  * Catalyst operator: exact per-group top-k planned as a
  * partial/final pair, the grouped analog of how Spark plans
  * aggregation (partial HashAggregate → Exchange → final) and of
  * TakeOrderedAndProject for global ORDER BY + LIMIT.
  *
  *   GroupTopKPartialExec — map-side: one size-k bounded heap per group
  *     key per input partition; emits only local top-k. No distribution
  *     requirement, runs wherever the child is.
  *   GroupTopKFinalExec — requires ClusteredDistribution(groupExprs), so
  *     the planner inserts an Exchange of ONLY the partial survivors
  *     (≤ k · partitions per key, vs the full input for the equivalent
  *     Window plan); re-selects top-k per key and appends a 1-based
  *     BIGINT rank column.
  *
  * Correct because per-group top-k is a mergeable reduction: the global
  * top-k of a union is contained in the union of local top-k's. The
  * order (sort expr asc/desc, tie expr asc) must be total per group for
  * a deterministic result — callers pass a tie-break, like any
  * row_number use.
  */
case class GroupTopKPlan(
    groupExprs: Seq[Expression], sortExpr: Expression, tieExpr: Expression,
    k: Int, descending: Boolean, child: LogicalPlan,
    rankAttr: Attribute = AttributeReference("rnk", LongType, nullable = false)())
  extends UnaryNode {
  require(k > 0, "GroupTopK requires k > 0")
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr)
  override protected def withNewChildInternal(newChild: LogicalPlan): LogicalPlan =
    copy(child = newChild)
}

object GroupTopKExec {
  def sortOrders(sortExpr: Expression, tieExpr: Expression,
                 descending: Boolean): Seq[SortOrder] =
    Seq(SortOrder(sortExpr, if (descending) Descending else Ascending),
        SortOrder(tieExpr, Ascending))

  /** Per-partition bounded selection shared by both phases. The heap's
    * max under the row ordering is the row that sorts LAST — the
    * eviction candidate. */
  def localTopK(iter: Iterator[InternalRow], groupProj: UnsafeProjection,
                ord: Ordering[InternalRow], k: Int): Iterator[(InternalRow, mutable.PriorityQueue[InternalRow])] = {
    val heaps = mutable.LinkedHashMap.empty[InternalRow, mutable.PriorityQueue[InternalRow]]
    iter.foreach { r =>
      val key = groupProj(r)
      val h = heaps.get(key) match {
        case Some(h) => h
        case None =>
          val h = mutable.PriorityQueue.empty[InternalRow](ord)
          heaps.put(key.copy(), h)
          h
      }
      if (h.size < k) h.enqueue(r.copy())
      else if (ord.compare(r, h.head) < 0) { h.dequeue(); h.enqueue(r.copy()) }
    }
    heaps.iterator
  }
}

case class GroupTopKPartialExec(
    groupExprs: Seq[Expression], sortExpr: Expression, tieExpr: Expression,
    k: Int, descending: Boolean, child: SparkPlan)
  extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val orders = GroupTopKExec.sortOrders(sortExpr, tieExpr, descending)
    val childOutput = child.output
    val gExprs = groupExprs
    val kk = k
    child.execute().mapPartitions({ iter =>
      val groupProj = UnsafeProjection.create(gExprs, childOutput)
      val ord = RowOrdering.create(orders, childOutput)
      GroupTopKExec.localTopK(iter, groupProj, ord, kk)
        .flatMap(_._2.iterator)
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)
}

case class GroupTopKFinalExec(
    groupExprs: Seq[Expression], sortExpr: Expression, tieExpr: Expression,
    k: Int, descending: Boolean, rankAttr: Attribute, child: SparkPlan)
  extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr)

  // empty groupExprs = GLOBAL top-k: every survivor must reach one
  // partition or each partition would emit its own ranked top-k
  override def requiredChildDistribution: Seq[Distribution] =
    if (groupExprs.isEmpty) AllTuples :: Nil
    else ClusteredDistribution(groupExprs) :: Nil

  override def outputPartitioning: Partitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val orders = GroupTopKExec.sortOrders(sortExpr, tieExpr, descending)
    val childOutput = child.output
    val out = output
    val gExprs = groupExprs
    val kk = k
    child.execute().mapPartitions({ iter =>
      val groupProj = UnsafeProjection.create(gExprs, childOutput)
      val ord = RowOrdering.create(orders, childOutput)
      val proj = UnsafeProjection.create(out, out)
      val join = new JoinedRow
      val rankRow = new GenericInternalRow(1)
      GroupTopKExec.localTopK(iter, groupProj, ord, kk).flatMap { case (_, heap) =>
        // best-first emit order with 1-based ranks
        heap.toArray.sorted(ord).iterator.zipWithIndex.map { case (r, i) =>
          rankRow.update(0, i + 1L)
          proj(join(r, rankRow))
        }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)
}

/** Plans GroupTopKPlan as the partial/final pair. Injected via
  * `GraftExtensions` (`injectPlannerStrategy`). */
object GroupTopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case GroupTopKPlan(g, s, t, k, desc, child, rank) =>
      GroupTopKFinalExec(g, s, t, k, desc, rank,
        GroupTopKPartialExec(g, s, t, k, desc, planLater(child))) :: Nil
    case _ => Nil
  }
}
