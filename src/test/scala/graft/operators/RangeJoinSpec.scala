package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {

  test("bucketed range join equals the naive theta join, incl. bucket edges") {
    import spark.implicits._
    // times straddle bucket boundaries of width 10s (10_000_000 µs)
    val mk = (id: Long, k: Long, sec: Double) =>
      (id, k, new java.sql.Timestamp((sec * 1000).toLong))
    val left = Seq(mk(1, 1, 20.0), mk(2, 1, 25.0), mk(3, 2, 10.0))
      .toDF("id", "k", "ts")
    val right = Seq(mk(10, 1, 10.0), mk(11, 1, 15.0), mk(12, 1, 20.0),
        mk(13, 1, 9.9), mk(14, 2, 0.5), mk(15, 3, 12.0))
      .toDF("id", "k", "ts")
    val got = RangeJoin.within(left, right, Seq("k"), "ts", "ts", 10L)
      .select("id", "r_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = left.as("l").join(right.as("r"),
        col("l.k") === col("r.k") &&
        col("r.ts") >= col("l.ts") - expr("INTERVAL 10 SECONDS") &&
        col("r.ts") <= col("l.ts"))
      .select(col("l.id"), col("r.id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == naive)
    assert(got.contains((1L, 10L))) // exactly window-width apart: inclusive
    assert(got.contains((1L, 12L))) // simultaneous: inclusive
    assert(!got.contains((1L, 13L))) // just outside the window
    assert(!got.exists(_._2 == 15L)) // key isolation
  }

  test("range join plans as an equi-join, not a nested loop") {
    import spark.implicits._
    val df = Seq((1L, 1L, new java.sql.Timestamp(1000L))).toDF("id", "k", "ts")
    val plan = RangeJoin.within(df, df, Seq("k"), "ts", "ts", 60L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
