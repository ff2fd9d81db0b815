package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  private def families: Seq[QueryDef] =
    graft.queries.ProjectFilterQueries.defs ++
    graft.queries.JoinQueries.defs ++
    graft.queries.AggQueries.defs ++
    graft.queries.WindowQueries.defs ++
    graft.queries.ReshapeQueries.defs ++
    graft.queries.ScalarFuncQueries.defs ++
    graft.queries.SourceQueries.defs ++
    graft.queries.KernelQueries.defs ++
    graft.queries.MLQueries.defs ++
    graft.queries.MultimodalQueries.defs ++
    graft.queries.BdbQueries.defs ++
    graft.queries.TextQueries.defs ++
    graft.queries.DedupQueries.defs ++
    graft.queries.SimilarityQueries.defs ++
    graft.queries.PipelineQueries.defs ++
    graft.queries.BpeQueries.defs ++
    graft.queries.GraphQueries.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Star-schema rollup: revenue per region × order priority, with rank of
    * priority inside each region — scan → broadcast dim joins → partial-agg
    * shuffle → window, all in one Catalyst plan.
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val li = Tables.load(spark, dir, "lineitem")
    val o = Tables.load(spark, dir, "orders")
    val c = Tables.load(spark, dir, "customer")
    val n = Tables.load(spark, dir, "nation")
    val r = Tables.load(spark, dir, "region")
    import org.apache.spark.sql.expressions.Window
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy("r_name", "o_orderpriority")
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
           count(lit(1)).as("n_lines"))
      .withColumn("rank_in_region",
        rank().over(Window.partitionBy("r_name").orderBy(desc("revenue"))))
      .orderBy("r_name", "rank_in_region")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    families.map(qd => qd.name -> qd.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    families.flatMap(qd => qd.oracle.map(qd.name -> _)).toMap
}
