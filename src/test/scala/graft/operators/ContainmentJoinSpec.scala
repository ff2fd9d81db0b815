package graft.operators

import graft.SparkSpec

class ContainmentJoinSpec extends SparkSpec {

  private def brute(docs: Seq[(Long, Seq[String])], tNum: Int, tDen: Int)
      : Set[(Long, Long)] =
    (for {
      (ia, sa) <- docs; (ib, sb) <- docs if ia != ib
      inter = sa.toSet.intersect(sb.toSet).size
      if inter * tDen >= tNum * sa.toSet.size
    } yield (ia, ib)).toSet

  private def run(docs: Seq[(Long, Seq[String])], tNum: Int, tDen: Int)
      : Set[(Long, Long)] = {
    import spark.implicits._
    ContainmentJoin.selfJoin(
        docs.map { case (i, s) => (i, s.distinct) }.toDF("id", "sh"),
        "id", "sh", tNum, tDen)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  private val corpus = {
    // overlapping shingle sets with hot shared elements (boilerplate) and
    // strict subset relations (the asymmetric case the operator exists for)
    val rnd = new scala.util.Random(11)
    val vocab = (0 until 30).map(i => s"s$i")
    val random = (0L until 60L).map { i =>
      i -> rnd.shuffle(vocab).take(3 + rnd.nextInt(8)).toSeq
    }
    val contained = Seq(
      100L -> Seq("s1", "s2", "s3"),                        // subset of 101
      101L -> Seq("s1", "s2", "s3", "s4", "s5", "s6"),
      102L -> Seq("s1", "s2", "s3", "s4", "s5", "s6"),      // exact dup of 101
      103L -> vocab.take(20),                               // superset of many
      104L -> Seq("s9"))                                    // singleton
    random ++ contained
  }

  test("prefix-filtered containment join is lossless vs brute force (t=4/5 and t=1/2)") {
    for ((tn, td) <- Seq((4, 5), (1, 2)))
      assert(run(corpus, tn, td) == brute(corpus, tn, td), s"mismatch at t=$tn/$td")
  }

  test("containment is asymmetric: subset scores 1.0 forward, less backward") {
    import spark.implicits._
    val docs = Seq(100L -> Seq("a", "b", "c"),
                   101L -> Seq("a", "b", "c", "d", "e", "f")).toDF("id", "sh")
    val out = ContainmentJoin.selfJoin(docs, "id", "sh", 1, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(out.contains((100L, 101L, 1.0)))   // A fully inside B
    assert(out.contains((101L, 100L, 0.5)))   // B only half-covered by A
  }

  test("verify comparisons are integer-exact: boundary pair neither lost nor inflated") {
    import spark.implicits._
    // |A|=5, |A∩B|=4 → containment exactly 4/5: must pass t=4/5
    val docs = Seq(1L -> Seq("a", "b", "c", "d", "e"),
                   2L -> Seq("a", "b", "c", "d", "x", "y")).toDF("id", "sh")
    val out = ContainmentJoin.selfJoin(docs, "id", "sh", 4, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out.contains((1L, 2L)))
    assert(!out.contains((2L, 1L)))           // 4/6 < 4/5
  }
}
