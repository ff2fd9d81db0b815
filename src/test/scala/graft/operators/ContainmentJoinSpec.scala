package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions.col

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

  // --- JOSIE refinement (round 7): measured, not argued -------------------

  /** Boilerplate-heavy corpus engineered so every pruning lever has real
    * work to do at t = 4/5:
    *  - `normal`+`clique`: every doc shares the 6 hot boilerplate
    *    shingles (in NO prefix → the bloom's target) and a near-dup
    *    clique hides inside;
    *  - `bigs`/`smalls`: bigs' rarest prefix shingles also live in
    *    3-shingle smalls — raw collisions the LENGTH filter kills
    *    (nb·5 < na·4);
    *  - `cDocs`/`dDocs`: share one mid-frequency shingle that sits at
    *    prefix-rank 5 in c but rank 11 in d — a collision only the
    *    POSITIONAL filter kills (1 + min(15, 9) = 10 < ⌈0.8·20⌉ = 16). */
  private val boilerplateCorpus: Seq[(Long, Seq[String])] = {
    val boiler = (0 until 6).map(i => s"hot$i")
    val normal = (0L until 200L).map { i =>
      i -> (boiler ++ (0 until 14).map(j => s"p${i}x$j"))
    }
    val clique = (400L until 420L).map { i =>
      i -> (boiler ++ (0 until 12).map(j => s"dup$j") ++ Seq(s"q${i}"))
    }
    val smalls = (1000L until 1800L).map { i =>
      i -> Seq(s"sh${i % 20}", s"u${i}a", s"u${i}b")
    }
    val bigs = (2000L until 2020L).map { i =>
      i -> (0 until 20).map(k => s"sh$k").toSeq
    }
    val cDocs = (3000L until 3030L).map { i =>
      i -> ((0 until 4).map(j => s"cu${i}x$j") ++ Seq("mid") ++
            (0 until 9).map(j => s"cc$j") ++ boiler)
    }
    val dDocs = (3100L until 3140L).map { i =>
      i -> ((0 until 10).map(j => s"du${i}x$j") ++ Seq("mid") ++
            (0 until 9).map(j => s"sh$j"))
    }
    normal ++ clique ++ smalls ++ bigs ++ cDocs ++ dDocs
  }

  test("JOSIE length+position pruning cuts candidates and stays lossless") {
    import spark.implicits._
    val df = boilerplateCorpus.map { case (i, s) => (i, s.distinct) }.toDF("id", "sh")
    val raw = ContainmentJoin
      .candidatePairs(df, "id", "sh", 4, 5, positional = false).count()
    val pruned = ContainmentJoin
      .candidatePairs(df, "id", "sh", 4, 5, positional = true).count()
    info(s"candidate collision rows: raw=$raw josie=$pruned " +
      f"(${raw.toDouble / pruned}%.1fx cut)")
    assert(pruned * 2 <= raw,
      s"length+position pruning should cut >=2x here (raw=$raw pruned=$pruned)")
    // losslessness on the adversarial corpus, prunes + bloom all on
    assert(run(boilerplateCorpus, 4, 5) == brute(boilerplateCorpus, 4, 5))
    val withBloom = ContainmentJoin.selfJoin(df, "id", "sh", 4, 5,
        indexBloomItems = Some(10000L))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(withBloom == brute(boilerplateCorpus, 4, 5))
  }

  test("bloom prune drops hot boilerplate shingles from the index map-side") {
    import spark.implicits._
    val df = boilerplateCorpus.map { case (i, s) => (i, s.distinct) }.toDF("id", "sh")
    val full = ContainmentJoin.frames(df, "id", "sh", 4, 5, None)._2.count()
    val bloomed = ContainmentJoin
      .frames(df, "id", "sh", 4, 5, Some(10000L))._2.count()
    info(s"index explode rows: full=$full bloom-pruned=$bloomed " +
      f"(${full.toDouble / bloomed}%.1fx cut)")
    // the 6 hot boilerplate shingles sit in NO prefix (max df), so the
    // bloom removes their index rows before the candidate join's exchange
    assert(bloomed < full)
    // index keys are xxhash64(shingle) since round 13 — compare against
    // the hot shingles' hashes, not their strings
    val hotHashes = spark.range(1)
      .select(org.apache.spark.sql.functions.explode(
        org.apache.spark.sql.functions.array(
          (0 until 6).map(i => org.apache.spark.sql.functions.lit(s"hot$i")): _*)).as("s"))
      .select(org.apache.spark.sql.functions.xxhash64(col("s")))
      .collect().map(_.getLong(0)).toSeq
    val hotRows = ContainmentJoin.frames(df, "id", "sh", 4, 5, Some(10000L))._2
      .filter(col("g").isin(hotHashes: _*)).count()
    assert(hotRows == 0, "boilerplate shingles should be bloom-pruned from the index")
  }
}
