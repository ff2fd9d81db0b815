package graft.sources

import graft.IsolatedSparkSpec
import graft.bdb.BdbMini
import org.apache.spark.sql.functions._

/** Conf-sensitive DSv2 planning behaviors, on an ISOLATED session
  * (v2-bucketing / broadcast-threshold flips are session-wide and must
  * not leak into other suites' plans):
  *
  *  - storage-partitioned join (`SupportsReportPartitioning` +
  *    `HasPartitionKey`): two graft-bdb tables reporting
  *    `KeyGroupedPartitioning(identity(gameId))` join on gameId with NO
  *    Exchange on either side — the source-native analog of the s10
  *    bucketed join. ON by default in Spark 4
  *    (`spark.sql.sources.v2.bucketing.enabled=true`).
  *  - runtime filtering (`SupportsRuntimeFiltering`): the DPP analog.
  *    With v2 bucketing DISABLED the pruned splits disappear from the
  *    scan (1 partition); with it enabled Spark instead keeps the key
  *    set stable (pushPartValues) so pruned keys become EMPTY
  *    partitions — both correct, different partition-count evidence.
  */
class BdbMiniSpjSpec extends IsolatedSparkSpec {

  private def read(table: String) =
    spark.read.format("graft-bdb").option("table", table).load()

  private def withConfs(confs: (String, String)*)(body: => Unit): Unit = {
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("two graft-bdb tables join on gameId with no shuffle (SPJ)") {
    withConfs(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      // force the sort-merge path: SPJ compatibility is seen there
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      val joined = read("tracking").join(read("plays"), Seq("gameId"))
      val rows = joined.collect()
      // every tracking row matches its game's 6 plays
      val expected = BdbMini.tracking.size * (BdbMini.plays.size / 2)
      assert(rows.length == expected, s"${rows.length} vs $expected")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"storage-partitioned join must not shuffle either side:\n$plan")
      assert(plan.toLowerCase.contains("sortmergejoin") ||
             plan.toLowerCase.contains("shuffledhashjoin"), plan)
    }
  }

  test("grouped agg over the SPJ join plans no Exchange; pushed-agg partitioning drop is pinned") {
    // round-9 verdict ask #8: s12's KeyGroupedPartitioning and the
    // grouped partials were spec'd separately — assert they COMPOSE.
    withConfs(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      // (a) grouped partials DIRECTLY over the scan: the partials push,
      // but Spark's V2ScanPartitioningAndOrdering then DROPS the
      // reported KeyGroupedPartitioning — aggregate pushdown synthesizes
      // fresh output attribute IDs, and the rule requires the resolved
      // partitioning refs to be a subset of the scan relation's output
      // (they resolve against the RELATION's originals). Upstream
      // behavior, not this source: the residual exchange is harmless
      // (it moves one partial row per split, not the row stream), and
      // this canary assert flips when a Spark upgrade starts composing
      // the two — at which point drop the exchange expectation below.
      val agg = read("tracking").groupBy("gameId")
        .agg(count(lit(1)).as("n"), sum("frameId").as("sf"))
      agg.queryExecution.optimizedPlan.foreach {
        case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
          assert(r.keyGroupedPartitioning.isEmpty,
            "Spark now keeps KeyGroupedPartitioning on pushed-agg scans — " +
            "strengthen this test to assert NO exchange here")
        case _ =>
      }
      val aplan = agg.queryExecution.executedPlan.toString
      assert(aplan.contains("PushedAggregates"), aplan)
      val gotA = agg.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val expA = BdbMini.tracking.groupBy(_.gameId).map { case (g, rows) =>
        (g, rows.size.toLong, rows.map(_.frameId.toLong).sum)
      }.toSet
      assert(gotA == expA)
      // (b) grouped agg ABOVE the storage-partitioned join: the SPJ
      // output keeps KeyGroupedPartitioning(gameId), which satisfies
      // the aggregate's clustering too — zero exchanges end to end
      val joined = read("tracking").join(read("plays"), Seq("gameId"))
        .groupBy("gameId").agg(count(lit(1)).as("n"))
      val jplan = joined.queryExecution.executedPlan.toString
      assert(!jplan.contains("Exchange hashpartitioning"),
        s"agg over SPJ join should reuse the join's partitioning:\n$jplan")
      val gotJ = joined.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val playsPerGame = BdbMini.plays.groupBy(_.gameId)
        .view.mapValues(_.size).toMap
      val expJ = BdbMini.tracking.groupBy(_.gameId).map { case (g, rows) =>
        g -> rows.size.toLong * playsPerGame(g)
      }.toMap
      assert(gotJ == expJ)
    }
  }

  test("without v2 bucketing the same join shuffles (SPJ is load-bearing)") {
    withConfs(
      "spark.sql.sources.v2.bucketing.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      val joined = read("tracking").join(read("plays"), Seq("gameId"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("Exchange hashpartitioning"), plan)
    }
  }

  test("runtime filtering: a selective dim join prunes fact splits (DPP analog)") {
    // v2 bucketing off so pruning is visible as a DROPPED split (with it
    // on, pushPartValues keeps the key set and prunes to empty partitions)
    withConfs("spark.sql.sources.v2.bucketing.enabled" -> "false") {
      val phi = BdbMini.games.head.gameId
      val dim = read("games").filter(col("homeTeamAbbr") === "PHI")
      val joined = read("tracking").join(dim, "gameId")
      // execute THROUGH this QueryExecution (collect, not count — count
      // builds a separate execution whose scan instance we can't inspect)
      assert(joined.collect().length == BdbMini.tracking.count(_.gameId == phi))
      // plan evidence: the v2 scan carries a dynamic-pruning runtime filter
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.toLowerCase.contains("runtimefilters") &&
             plan.toLowerCase.contains("dynamicpruning"), plan)
      // split evidence: after execution the fact scan planned ONE split —
      // the PHI game — not one per game
      val scan = collectLeaves(joined.queryExecution.executedPlan).collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec
          if b.scan.description().contains("table=tracking") => b
      }.head
      assert(scan.inputRDD.getNumPartitions == 1,
        s"splits: ${scan.inputRDD.getNumPartitions}")
    }
  }

  /** AQE-tolerant traversal: adaptive plans and materialized query
    * stages hold their substructure in `executedPlan`/`plan`, not
    * `children`. */
  private def collectLeaves(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      collectLeaves(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      collectLeaves(q.plan)
    case other =>
      other +: (other.children ++ other.subqueries).flatMap(collectLeaves)
  }
}
