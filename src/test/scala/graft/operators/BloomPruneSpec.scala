package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class BloomPruneSpec extends SparkSpec {

  private lazy val li = Tables.load(spark, sfDir, "lineitem")
    .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
  private lazy val sel = Tables.load(spark, sfDir, "orders")
    .filter(col("o_orderpriority") === "1-URGENT" && col("o_totalprice") > 100000)

  test("bloom-pruned semi join equals the exact semi join") {
    val pruned = BloomPrune.semiJoin(li, "l_orderkey", sel, "o_orderkey",
      expectedItems = 10000L)
    val exact = li.join(sel.select(col("o_orderkey").as("l_orderkey")),
      Seq("l_orderkey"), "left_semi")
    assert(pruned.exceptAll(exact).isEmpty && exact.exceptAll(pruned).isEmpty)
  }

  test("the filter prunes most non-matching rows map-side") {
    val total = li.count()
    val matched = li.join(sel.select(col("o_orderkey").as("l_orderkey")),
      Seq("l_orderkey"), "left_semi").count()
    val afterBloom = BloomPrune.pruneOnly(li, "l_orderkey", sel, "o_orderkey",
      expectedItems = 10000L).count()
    assert(afterBloom >= matched, "bloom filter must never drop a true match")
    // fpp=0.03: surviving non-matches should be a small fraction of the cut
    assert(afterBloom - matched <= math.max(50L, (total - matched) / 10),
      s"bloom pass-through too high: total=$total matched=$matched after=$afterBloom")
  }

  test("a tighter fpp prunes at least as hard and stays exact") {
    val loose = BloomPrune.pruneOnly(li, "l_orderkey", sel, "o_orderkey",
      expectedItems = 10000L, fpp = 0.1).count()
    val tight = BloomPrune.pruneOnly(li, "l_orderkey", sel, "o_orderkey",
      expectedItems = 10000L, fpp = 0.001).count()
    assert(tight <= loose)
  }
}
