package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class GroupTopKSpec extends SparkSpec {

  private lazy val orders = Tables.load(spark, sfDir, "orders")
    .select("o_orderpriority", "o_orderkey", "o_totalprice").cache()

  private def windowTopK(k: Int): Set[String] =
    orders.withColumn("rnk", row_number().over(
        Window.partitionBy("o_orderpriority")
          .orderBy(desc("o_totalprice"), col("o_orderkey"))).cast("long"))
      .filter(col("rnk") <= k)
      .collect().map(_.toString).toSet

  test("GroupTopK equals the window formulation exactly") {
    val got = GroupTopK.topK(orders, Seq("o_orderpriority"),
        "o_totalprice", "o_orderkey", k = 3)
      .select("o_orderpriority", "o_orderkey", "o_totalprice", "rnk")
      .collect().map(_.toString).toSet
    assert(got == windowTopK(3))
  }

  test("GroupTopK is partitioning-independent") {
    def run(df: org.apache.spark.sql.DataFrame) =
      GroupTopK.topK(df, Seq("o_orderpriority"), "o_totalprice", "o_orderkey", 5)
        .collect().map(_.toString).sorted.toSeq
    assert(run(orders) == run(orders.repartition(17)))
  }

  test("native Catalyst GroupTopK equals the window formulation exactly") {
    val native = GroupTopK.topKNative(orders, Seq("o_orderpriority"),
        "o_totalprice", "o_orderkey", k = 3)
    assert(native.columns.toSeq ==
      Seq("o_orderpriority", "o_orderkey", "o_totalprice", "rnk"))
    assert(native.collect().map(_.toString).toSet == windowTopK(3))
  }

  test("native plan is the partial/final pair with the exchange between") {
    val native = GroupTopK.topKNative(orders, Seq("o_orderpriority"),
        "o_totalprice", "o_orderkey", k = 3)
    val plan = native.queryExecution.executedPlan.toString
    assert(plan.contains("GroupTopKPartial"), plan)
    assert(plan.contains("GroupTopKFinal"), plan)
    // the exchange must sit between final and partial (survivors only)
    val iFinal = plan.indexOf("GroupTopKFinal")
    val iEx = plan.indexOf("Exchange", iFinal)
    val iPartial = plan.indexOf("GroupTopKPartial", iFinal)
    assert(iEx >= 0 && iEx < iPartial, plan)
  }

  test("native GroupTopK is partitioning-independent and composes downstream") {
    def run(df: org.apache.spark.sql.DataFrame) =
      GroupTopK.topKNative(df, Seq("o_orderpriority"), "o_totalprice", "o_orderkey", 5)
        .filter(col("rnk") <= 2)                      // composes with filters
        .groupBy("o_orderpriority").count()           // and aggregates
        .collect().map(_.toString).sorted.toSeq
    assert(run(orders) == run(orders.repartition(17)))
  }

  test("native GLOBAL top-k (no group cols) returns one consistent ranking") {
    val native = GroupTopK.topKNative(orders.repartition(7), Seq.empty,
        "o_totalprice", "o_orderkey", k = 5)
      .collect().map(r => (r.getLong(3), r.getLong(1))).sortBy(_._1)
    val expect = orders.orderBy(desc("o_totalprice"), col("o_orderkey"))
      .limit(5).collect().map(_.getLong(1))
    assert(native.map(_._1).toSeq == Seq(1L, 2L, 3L, 4L, 5L)) // no dup ranks
    assert(native.map(_._2).toSeq == expect.toSeq)
  }

  test("null sort values rank NULLS LAST under desc, like the window form") {
    import spark.implicits._
    val df = Seq((1L, "g", Some(5.0)), (2L, "g", None),
                 (3L, "g", Some(7.0)), (4L, "g", Some(1.0)))
      .toDF("id", "grp", "v")
    val got = GroupTopK.topK(df, Seq("grp"), "v", "id", k = 3)
      .orderBy("rnk").collect().map(_.getLong(0)).toSeq
    // desc NULLS LAST: 7.0, 5.0, 1.0 — the null row is ranked 4th, cut
    assert(got == Seq(3L, 1L, 4L))
    val nat = GroupTopK.topKNative(df, Seq("grp"), "v", "id", k = 3)
      .orderBy("rnk").collect().map(_.getLong(0)).toSeq
    assert(nat == got)
  }

  test("ascending order and k larger than group size work") {
    val asc = GroupTopK.topK(orders.limit(100), Seq("o_orderpriority"),
        "o_totalprice", "o_orderkey", k = 100000, descending = false)
    val perGroup = orders.limit(100).groupBy("o_orderpriority").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val gotCounts = asc.groupBy("o_orderpriority").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(gotCounts == perGroup) // k > group size keeps everything
    // ascending rank 1 = group minimum
    val firsts = asc.filter(col("rnk") === 1)
      .select("o_orderpriority", "o_totalprice").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val mins = orders.limit(100).groupBy("o_orderpriority")
      .agg(min("o_totalprice")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(firsts == mins)
  }
}
