package graft.operators

import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {

  test("matches latest prior right row; inclusive at equal time; null when none") {
    import spark.implicits._
    val left = Seq((1L, 10L, "p1"), (1L, 20L, "p2"), (2L, 5L, "p3"))
      .toDF("k", "t", "lv")
    val right = Seq((1L, 8L, "c1"), (1L, 10L, "c2"), (1L, 15L, "c3"), (3L, 1L, "c4"))
      .toDF("k", "t", "rv")
    val got = AsOfJoin(left, right, Seq("k"), "t", "t")
      .select("lv", "asof_rv").collect()
      .map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(got("p1").contains("c2")) // equal time wins over earlier c1
    assert(got("p2").contains("c3")) // latest ≤ 20
    assert(got("p3").isEmpty)        // no right rows for key 2
  }

  test("column collisions are prefixed, left columns unchanged") {
    import spark.implicits._
    val left = Seq((1L, 10L)).toDF("k", "t")
    val right = Seq((1L, 9L)).toDF("k", "t")
    val out = AsOfJoin(left, right, Seq("k"), "t", "t")
    assert(out.columns.toSeq == Seq("k", "t", "asof_k", "asof_t"))
    val r = out.head
    assert(r.getLong(1) == 10L && r.getLong(3) == 9L)
  }
}
