package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SourceQueriesSpec extends SparkSpec {

  test("bucketed join plans without a shuffle exchange before the join") {
    val df = graft.SparkEntry.queries("s10_bucketed_join")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    val joinIdx = plan.linesIterator.indexWhere(_.contains("SortMergeJoin"))
    assert(joinIdx >= 0, s"expected a SortMergeJoin:\n$plan")
    // no hashpartitioning exchange may feed the join inputs — bucket
    // layout already co-locates both sides on the key
    val joinInputs = plan.linesIterator.drop(joinIdx).mkString("\n")
    assert(!joinInputs.contains("Exchange hashpartitioning"),
      s"bucketing failed to eliminate the shuffle:\n$joinInputs")
    assert(df.count() > 0)
  }

  test("partitioned write prunes to one directory on read-back") {
    val df = graft.SparkEntry.queries("s9_partitioned_prune")(spark, sfDir)
    val scan = df.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(scan.contains("l_returnflag"), scan)
    assert(df.count() > 0)
  }
}
