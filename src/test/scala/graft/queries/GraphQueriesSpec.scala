package graft.queries

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Semantic contracts for the graph family beyond the oracle hash:
  * PageRank must (approximately) conserve rank mass and respect the
  * teleport floor; triangle counts must come from real closed triples;
  * walks must follow actual edges and alternate bipartite sides.
  */
class GraphQueriesSpec extends SparkSpec {

  private val Scale = 1000000000L

  private def q(name: String) = graft.SparkEntry.queries(name)(spark, sfDir)

  test("g1_pagerank: teleport floor holds and mass is approximately conserved") {
    val out = q("g1_pagerank").cache()
    val n = out.count()
    assert(n > 0)
    // every node holds at least the teleport term (exactly, for sinks)
    assert(out.where(col("pr") < 15 * Scale / 100).count() == 0)
    // fixed-point truncation only LOSES mass, never creates it: each
    // iteration loses < 1 nano-unit per directed edge (the `pr div outdeg`
    // remainder, summed over sources) plus 1 per node (the 85% scaling) —
    // so total stays within 3*(|E| + n) below n * Scale and never above
    val e0 = Tables.load(spark, sfDir, "lineitem")
      .select(col("l_suppkey"), col("l_partkey")).distinct().count()
    val eDirected = 2 * e0
    val total = out.agg(sum("pr")).head.getLong(0)
    assert(total <= n * Scale, s"rank mass grew: $total > ${n * Scale}")
    assert(total >= n * Scale - 3 * (eDirected + n),
      s"rank mass lost more than truncation can explain: $total vs ${n * Scale}")
  }

  test("g1_pagerank: a higher-degree supplier outranks a lower-degree one") {
    val out = q("g1_pagerank")
    val e = Tables.load(spark, sfDir, "lineitem")
      .select((col("l_suppkey").cast("long") * 2).as("src"),
              (col("l_partkey").cast("long") * 2 + 1).as("dst"))
      .distinct()
    val deg = e.groupBy("src").agg(count(lit(1)).as("d"))
    val byDeg = deg.join(out, deg("src") === out("node_id"))
      .select("d", "pr").collect()
    val hi = byDeg.maxBy(_.getLong(0))
    val lo = byDeg.minBy(_.getLong(0))
    assert(hi.getLong(1) > lo.getLong(1),
      s"degree ${hi.getLong(0)} rank ${hi.getLong(1)} should beat " +
        s"degree ${lo.getLong(0)} rank ${lo.getLong(1)}")
  }

  test("g2_triangle_count: reported nodes really close triangles") {
    val out = q("g2_triangle_count").cache()
    assert(out.count() > 0)
    // recompute one node's participation count independently
    val top = out.orderBy(desc("n_tri"), col("node")).head
    val node = top.getLong(0)
    val li = Tables.load(spark, sfDir, "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_partkey").cast("long").as("p"))
    val pairs = li.toDF("ok", "u").join(li.toDF("ok", "v"), Seq("ok"))
      .where(col("u") < col("v"))
      .where((col("u") * 1103515245L + col("v") * 12345L) % 4 === 0)
      .select("u", "v").distinct().cache()
    // undirected adjacency of `node`
    val nbrs = pairs.where(col("u") === node).select(col("v").as("x"))
      .unionByName(pairs.where(col("v") === node).select(col("u").as("x")))
      .distinct()
    // count adjacent pairs among the neighbors = triangles through `node`
    val viaNode = nbrs.toDF("u").join(pairs, "u")
      .join(nbrs.toDF("v"), "v").count()
    assert(viaNode == top.getLong(1),
      s"node $node: recount $viaNode != reported ${top.getLong(1)}")
  }

  /** The DOULION-sampled co-purchase edge set, as local tuples. */
  private def sampledPairs(): Set[(Long, Long)] = {
    val li = Tables.load(spark, sfDir, "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_partkey").cast("long").as("p"))
    li.toDF("ok", "u").join(li.toDF("ok", "v"), Seq("ok"))
      .where(col("u") < col("v"))
      .where((col("u") * 1103515245L + col("v") * 12345L) % 4 === 0)
      .select("u", "v").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("g4_kcore: matches a local 3-round peel, degrees consistent") {
    val got = q("g4_kcore").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.nonEmpty && got.values.forall(_ >= 18))
    // independent driver-side peel on the same sampled graph
    var edges = sampledPairs().flatMap(p => Seq(p, p.swap))
    for (_ <- 1 to 3) {
      val deg = edges.groupBy(_._1).map { case (n, es) => n -> es.size }
      val keep = deg.filter(_._2 >= 18).keySet
      edges = edges.filter { case (a, b) => keep(a) && keep(b) }
    }
    val expected = edges.groupBy(_._1).map { case (n, es) => n -> es.size.toLong }
      .filter(_._2 >= 18)
    assert(got == expected, s"peel mismatch: ${got.size} vs ${expected.size} nodes")
  }

  test("g6_kcore_fixpoint: a true fixpoint, contained in g4's bounded peel") {
    // NB: at sf0.001 the true 18-core is EMPTY (the sampled graph's
    // degrees never reach 18 once the fringe peels) — that is the
    // correct fixpoint, and exactly where g6 differs from g4's bounded
    // upper approximation; the driver gate exercises the non-empty
    // cores at sf0.01/sf0.1 (1856 / 18950 surviving nodes).
    val got = q("g6_kcore_fixpoint").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.values.forall(_ >= 18),
      "at fixpoint EVERY surviving node keeps degree >= k")
    // independent driver-side peel run to ITS fixpoint
    var edges = sampledPairs().flatMap(p => Seq(p, p.swap))
    var n = -1
    while (n != edges.size) {
      n = edges.size
      val deg = edges.groupBy(_._1).map { case (node, es) => node -> es.size }
      val keep = deg.filter(_._2 >= 18).keySet
      edges = edges.filter { case (a, b) => keep(a) && keep(b) }
    }
    val expected = edges.groupBy(_._1).map { case (node, es) => node -> es.size.toLong }
    assert(got == expected, s"fixpoint mismatch: ${got.size} vs ${expected.size} nodes")
    // the bounded 3-round peel (g4) is an UPPER approximation: it may
    // keep extra nodes, never drop one the fixpoint keeps
    val bounded = q("g4_kcore").collect().map(_.getLong(0)).toSet
    assert(got.keySet.subsetOf(bounded),
      "fixpoint core must be contained in the bounded peel's survivors")
  }

  test("g2_triangle_count: est_tri is the 1/p³-scaled sampled count") {
    val rows = q("g2_triangle_count").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("est_tri") == 64L * r.getAs[Long]("n_tri"),
        s"est_tri must be n_tri * 64 (p = 1/4): $r")
    }
  }

  test("g5_link_predict: scores are exact RA sums over non-adjacent pairs") {
    val got = q("g5_link_predict").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
    assert(got.length == 50)
    val pairs = sampledPairs()
    val adj = pairs.flatMap(p => Seq(p, p.swap))
      .groupBy(_._1).map { case (n, es) => n -> es.map(_._2) }
    val deg = adj.map { case (n, ns) => n -> ns.size.toLong }
    got.foreach { case ((u, w), ra) =>
      assert(!pairs((u, w)) && !pairs((w, u)),
        s"($u,$w) is an existing edge — link prediction must exclude it")
      val common = adj.getOrElse(u, Set.empty) intersect adj.getOrElse(w, Set.empty)
      val expected = common.toSeq.map(v => 1000000000L / deg(v)).sum
      assert(ra == expected, s"($u,$w): RA $ra != recomputed $expected")
    }
  }

  test("g3_seeded_walks: paths follow real edges and alternate sides") {
    val out = q("g3_seeded_walks").cache()
    val rows = out.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val starts = rows.map(_._1).distinct
    assert(starts.length == 8 && rows.length == starts.length * 5)
    val e = Tables.load(spark, sfDir, "lineitem")
      .select((col("l_suppkey").cast("long") * 2).as("src"),
              (col("l_partkey").cast("long") * 2 + 1).as("dst"))
      .distinct().collect()
      .flatMap(r => Seq(r.getLong(0) -> r.getLong(1), r.getLong(1) -> r.getLong(0)))
      .toSet
    for (s0 <- starts) {
      val path = rows.filter(_._1 == s0).sortBy(_._2).map(_._3)
      assert(path.head == s0, "walk must start at its start node")
      path.sliding(2).foreach { case Array(a, b) =>
        assert(e.contains(a -> b), s"walk hop $a -> $b is not an edge")
        // bipartite: supplier (even) and part (odd) nodes must alternate
        assert(a % 2 != b % 2, s"hop $a -> $b does not switch sides")
      }
    }
  }
}
