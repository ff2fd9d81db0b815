package graft

/** The `Graft` front door: one call yields a session where the custom
  * SQL functions, pushdown rule, planner strategy, and engine confs are
  * all live. */
class GraftSessionSpec extends SparkSpec {

  test("Graft.session exposes the engine surface") {
    val s = Graft.session() // getOrCreate joins the suite's context
    assert(s.conf.get("spark.sql.adaptive.enabled") == "true")
    assert(s.conf.get("spark.sql.legacy.parquet.nanosAsLong") == "true")
    // custom functions callable from plain SQL
    val r = s.sql(
      "SELECT within_dist(3.0, 4.0, 0.0, 0.0, 5.0) AS hit, " +
      "cosine_sim(array(1.0F, 0.0F), array(1.0F, 0.0F)) AS cs").collect()(0)
    assert(r.getBoolean(0))
    assert(math.abs(r.getDouble(1) - 1.0) < 1e-9)
    // the GroupTopK planner strategy is installed
    val topk = graft.operators.GroupTopK.topKNative(
      Tables.load(s, sfDir, "orders")
        .select("o_orderpriority", "o_orderkey", "o_totalprice"),
      groupCols = Seq("o_orderpriority"), sortCol = "o_totalprice",
      tieCol = "o_orderkey", k = 2)
    assert(topk.count() > 0)
  }
}
