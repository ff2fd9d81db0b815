package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EditDistanceJoinSpec extends SparkSpec {

  /** Brute-force ground truth: full cross join + exact levenshtein. */
  private def brute(strs: Seq[(Long, String)], k: Int): Set[(Long, Long, Long)] =
    (for {
      (ia, a) <- strs; (ib, b) <- strs if ia < ib
      d = {
        // classic DP, the spec's independent implementation
        val m = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
          if (i == 0) j else if (j == 0) i else 0
        }
        for (i <- 1 to a.length; j <- 1 to b.length)
          m(i)(j) = math.min(math.min(m(i - 1)(j) + 1, m(i)(j - 1) + 1),
            m(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
        m(a.length)(b.length)
      } if d <= k
    } yield (ia, ib, d.toLong)).toSet

  private def run(strs: Seq[(Long, String)], k: Int): Set[(Long, Long, Long)] = {
    import spark.implicits._
    EditDistanceJoin.selfJoin(strs.toDF("id", "s"), "id", "s", k = k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
  }

  private def runDel(strs: Seq[(Long, String)], k: Int): Set[(Long, Long, Long)] = {
    import spark.implicits._
    EditDistanceJoin.deletionSelfJoin(strs.toDF("id", "s"), "id", "s", k = k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
  }

  private val adversarial = {
    // small alphabet, lengths 0..8, repeated grams, shared prefixes —
    // the cases that break naive gram blocking
    val rnd = new scala.util.Random(7)
    (0L until 120L).map { i =>
      val len = rnd.nextInt(9)
      i -> (0 until len).map(_ => "ab!c"(rnd.nextInt(4))).mkString
    } ++ Seq(200L -> "aaaaaaaa", 201L -> "aaaaaaa", 202L -> "aaaaaaab",
             203L -> "", 204L -> "a", 205L -> "b", 206L -> "ab")
  }

  test("prefix filter is lossless vs brute force on adversarial strings (k=1 and k=2)") {
    for (k <- Seq(1, 2))
      assert(run(adversarial, k) == brute(adversarial, k), s"mismatch at k=$k")
  }

  test("deletion-neighbourhood path is lossless on the same adversarial strings (k=1 and k=2)") {
    for (k <- Seq(1, 2))
      assert(runDel(adversarial, k) == brute(adversarial, k), s"mismatch at k=$k")
  }

  test("both algorithms agree on structured ids (the j17 shape)") {
    val strs = (0L until 80L).map(i => i -> f"Customer#$i%09d")
    val expect = brute(strs, 1)
    assert(run(strs, 1) == expect)
    assert(runDel(strs, 1) == expect)
  }

  test("finds exactly the substitution neighbours on structured ids") {
    val strs = (0L until 50L).map(i => i -> f"Customer#$i%09d")
    val got = run(strs, k = 1)
    // same-length strings at levenshtein 1 differ in exactly one digit
    val expect = brute(strs, 1)
    assert(got == expect)
    assert(got.forall(_._3 == 1L))            // all ids distinct => no dist 0
    assert(got.contains((1L, 2L, 1L)))        // ...001 vs ...002
    assert(!got.exists(p => p._1 == 1L && p._2 == 22L)) // two digits differ
  }

  test("no O(n^2) stage: long-string candidates equi-join on prefix tokens; at most the one bounded-values cartesian") {
    import spark.implicits._
    val strs = (0L until 60L).map(i => i -> f"Customer#$i%09d")
    val phys = EditDistanceJoin.selfJoin(strs.toDF("id", "s"), "id", "s", k = 1)
      .queryExecution.sparkPlan.toString
    // the gram path's candidate stage must be an equi-join keyed on the
    // (g, occ) prefix tokens — a hash or sort-merge join, with the gram
    // column in its keys
    assert(phys.contains("HashJoin") || phys.contains("SortMergeJoin"),
      s"no equi-join stage in the plan:\n$phys")
    assert("(BroadcastHashJoin|ShuffledHashJoin|SortMergeJoin) \\[g#".r
             .findFirstIn(phys).isDefined,
      s"candidate join is not keyed on the gram tokens:\n$phys")
    // the ONLY permitted cartesian is the short-string block, which runs
    // over DISTINCT VALUES (bounded by |alphabet|^len) — never the rows
    val nCartesian = "CartesianProduct|BroadcastNestedLoopJoin".r
      .findAllIn(phys).length
    assert(nCartesian <= 1,
      s"more than the one documented bounded cartesian:\n$phys")
    val verified = EditDistanceJoin.selfJoin(strs.toDF("id", "s"), "id", "s", k = 1)
    assert(verified.count() > 0)
  }
}
