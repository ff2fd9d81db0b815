package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SaltedJoinSpec extends SparkSpec {

  private def li = graft.Tables.load(spark, sfDir, "lineitem")
    .select("l_orderkey", "l_linenumber", "l_partkey", "l_returnflag")
  private def stats = graft.Tables.load(spark, sfDir, "lineitem")
    .groupBy("l_returnflag").agg(count(lit(1)).as("n_flag"))

  test("salted join result equals the plain join (salt-invariance)") {
    val salted = SaltedJoin.inner(li, stats, Seq("l_returnflag"),
      saltBy = col("l_orderkey"), salts = 8)
      .select("l_orderkey", "l_linenumber", "l_partkey", "n_flag")
    val plain = li.join(stats, "l_returnflag")
      .select("l_orderkey", "l_linenumber", "l_partkey", "n_flag")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("join shuffles on (key, salt): hot key spread across sub-keys") {
    val joined = SaltedJoin.inner(li, stats, Seq("l_returnflag"),
      saltBy = col("l_orderkey"), salts = 8)
    val phys = joined.queryExecution.sparkPlan.toString
    // the shuffled join must key on the salt too — that IS the spread
    assert(phys.contains("SortMergeJoin"), s"expected a sort-merge join:\n$phys")
    assert(phys.contains("__salt"), s"salt missing from the join keys:\n$phys")
    assert(!phys.contains("BroadcastHashJoin"), "build side must not broadcast")
    // every (flag, salt) sub-key is populated — the hot flag really
    // lands on all 8 reducur groups, not one
    val spread = SaltedJoin.inner(
        li.withColumn("__keep_salt", lit(1)), stats, Seq("l_returnflag"),
        saltBy = col("l_orderkey"), salts = 8)
    val subkeys = li
      .withColumn("s", pmod(xxhash64(col("l_orderkey")), lit(8)))
      .groupBy("l_returnflag", "s").count()
    assert(subkeys.count() == stats.count() * 8,
      "some (key, salt) sub-key is empty — salt not spreading")
    assert(spread.count() == li.count())
  }

  test("salts=1 degenerates to the plain join") {
    val one = SaltedJoin.inner(li, stats, Seq("l_returnflag"),
      saltBy = col("l_orderkey"), salts = 1)
    assert(one.count() == li.count())
  }

  test("result is invariant across salt counts") {
    val expected = li.count()
    for (s <- Seq(2, 3, 5, 16)) {
      val n = SaltedJoin.inner(li, stats, Seq("l_returnflag"),
        saltBy = col("l_orderkey"), salts = s).count()
      assert(n == expected, s"salts=$s changed the result cardinality: $n != $expected")
    }
  }
}
