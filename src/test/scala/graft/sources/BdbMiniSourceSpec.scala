package graft.sources

import graft.SparkSpec
import graft.bdb.BdbMini
import org.apache.spark.sql.functions._

class BdbMiniSourceSpec extends SparkSpec {

  private def read(table: String) =
    spark.read.format("graft-bdb").option("table", table).load()

  test("every table matches the in-memory fixture exactly") {
    val (games, plays, players, playerPlay, tracking) = BdbMini.load(spark)
    val pairs = Seq(
      "games" -> games, "plays" -> plays, "players" -> players,
      "player_play" -> playerPlay, "tracking" -> tracking)
    pairs.foreach { case (name, expected) =>
      val got = read(name)
      assert(got.schema == expected.schema, s"$name schema")
      assert(got.collect().map(_.toString).sorted.toSeq ==
        expected.collect().map(_.toString).sorted.toSeq, s"$name rows")
    }
  }

  test("one input partition per game; gameId pushdown prunes splits") {
    val all = read("tracking")
    assert(all.rdd.getNumPartitions == 2)
    val one = read("tracking").filter(col("gameId") === BdbMini.games.head.gameId)
    assert(one.rdd.getNumPartitions == 1)
    assert(one.count() == BdbMini.tracking.count(_.gameId == BdbMini.games.head.gameId))
    // the pushed filter shows up in the scan description
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("pushedGame=Some"), plan)
  }

  test("column pruning reaches the reader (ReadSchema is the projection)") {
    val pruned = read("tracking").select("x", "y")
    val scan = pruned.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }.head
    assert(scan.output.map(_.name) == Seq("x", "y"), scan.toString)
    val r = pruned.agg(sum("x")).head.getDouble(0)
    assert(r > 0)
  }

  test("non-pushable filters still apply after the scan") {
    val df = read("plays").filter(col("isDropback") && col("down") === 1)
    val expected = BdbMini.plays.count(p => p.isDropback && p.down == 1)
    assert(df.count() == expected)
  }

  test("COUNT(*) pushes to the source: scan emits per-split partials only") {
    // correctness: pushed count == fixture count, with and without the
    // pushed gameId filter (filters push before aggregates)
    assert(read("tracking").count() == BdbMini.tracking.size)
    val g = BdbMini.games.head.gameId
    assert(read("tracking").filter(col("gameId") === g).count() ==
      BdbMini.tracking.count(_.gameId == g))
    // plan evidence: the v2 scan's output is the count partial, not rows
    // sparkPlan, not executedPlan: AQE wraps the aggregate's plan and
    // hides the scan from a top-level collect
    val agg = read("tracking").groupBy().count()
    val scan = agg.queryExecution.sparkPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }.head
    assert(scan.output.map(_.name).exists(_.toLowerCase.contains("count")),
      s"scan output should be the count partial: ${scan.output.map(_.name)}")
    assert(scan.toString.contains("PushedAggregates=[COUNT(*)]") ||
           scan.scan.description().contains("PushedAggregates=[COUNT(*)]"),
      "scan description should record the pushed aggregate")
  }

  test("LIMIT pushes to the source: each split emits at most N rows") {
    val df = read("tracking").limit(5)
    assert(df.count() == 5)
    // every returned row is a real fixture row
    val fixture = BdbMini.load(spark)._5.collect().map(_.toString).toSet
    assert(df.collect().map(_.toString).forall(fixture))
    val scan = df.queryExecution.sparkPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }.head
    assert(scan.scan.description().contains("PushedLimit=5"),
      scan.scan.description())
  }

  test("single-column ORDER BY + LIMIT pushes as TopN (partial: per-split cut)") {
    val df = read("tracking").orderBy(desc("x")).limit(3)
    val scan = df.queryExecution.sparkPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }.head
    assert(scan.scan.description().contains("PushedTopN=[x DESC NULLS LAST LIMIT 3]"),
      scan.scan.description())
    // tie-safe correctness: the returned x multiset equals the fixture's
    // global top-3 (the per-split cut is lossless for a global top-k —
    // the GroupTopK mergeability argument)
    val got = df.collect().map(_.getAs[Double]("x")).sorted.toSeq
    val expected = BdbMini.tracking.map(_.x).sorted.reverse.take(3).sorted.toSeq
    assert(got == expected)
  }

  test("TopN pushdown declines multi-column sorts; result still correct") {
    val df = read("tracking").orderBy(desc("x"), col("y")).limit(3)
    val scan = df.queryExecution.sparkPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }.head
    assert(!scan.scan.description().contains("PushedTopN"),
      scan.scan.description())
    val got = df.collect().map(r => (r.getAs[Double]("x"), r.getAs[Double]("y")))
    val expected = BdbMini.tracking.map(t => (t.x, t.y))
      .sortBy { case (x, y) => (-x, y) }.take(3)
    assert(got.toSeq == expected.toSeq)
  }

  test("aggregate pushdown declines unsupported aggregates (sum, non-key group)") {
    // SUM is not in the pushable set: source declines, ordinary row
    // path stays correct
    val s = read("tracking").agg(sum("x")).head.getDouble(0)
    // fold-order tolerance: Spark sums per-partition, the fixture in seq order
    assert(math.abs(s - BdbMini.tracking.map(_.x).sum) < 1e-6)
    val sumScan = read("tracking").agg(sum("x")).queryExecution.sparkPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }.head
    assert(!sumScan.scan.description().contains("PushedAggregates"),
      sumScan.scan.description())
    // grouping on a NON-partition-key column declines too (a split does
    // not hold whole playId groups across tables in general)
    val perPlay = read("tracking").groupBy("playId").count()
    val playScan = perPlay.queryExecution.sparkPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }.head
    assert(!playScan.scan.description().contains("PushedAggregates"),
      playScan.scan.description())
    val got = perPlay.collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val expected = BdbMini.tracking.groupBy(_.playId)
      .view.mapValues(_.size.toLong).toMap
    assert(got == expected)
  }

  test("per-gameId MIN/MAX/COUNT pushes: one partial row per split, no full-row scan") {
    val df = read("tracking").groupBy("gameId")
      .agg(min("x").as("mn"), max("s").as("mx"), count(col("nflId")).as("n"))
    val scan = df.queryExecution.sparkPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }.head
    assert(scan.scan.description().contains("GroupedBy=[gameId]") &&
           scan.scan.description().contains("MIN(x)"),
      scan.scan.description())
    // the scan emits (gameId, partials), never full tracking rows
    assert(scan.output.length == 4,
      s"scan output should be group + 3 partials: ${scan.output.map(_.name)}")
    val got = df.collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2), r.getLong(3)))).toMap
    val expected = BdbMini.tracking.groupBy(_.gameId).map { case (g, rows) =>
      g -> ((rows.map(_.x).min, rows.map(_.s).max,
             rows.count(_.nflId.isDefined).toLong))
    }
    assert(got == expected)
  }

  test("per-gameId SUM pushes for integral columns, declines for double") {
    // integral SUM: per-split Long partials are exactly what the final
    // sum-of-sums expects — pushes alongside count
    val df = read("tracking").groupBy("gameId")
      .agg(sum("frameId").as("sf"), count(lit(1)).as("n"))
    val scan = df.queryExecution.sparkPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }.head
    assert(scan.scan.description().contains("SUM(frameId)"),
      scan.scan.description())
    assert(scan.output.length == 3,
      s"scan output should be group + 2 partials: ${scan.output.map(_.name)}")
    val got = df.collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val expected = BdbMini.tracking.groupBy(_.gameId).map { case (g, rows) =>
      g -> ((rows.map(_.frameId.toLong).sum, rows.size.toLong))
    }
    assert(got == expected)
    // double SUM: a float partial's accumulation split could differ
    // from the row-level plan by ulps — the whole aggregation declines
    // to the ordinary scan, and the result is still correct
    val dbl = read("tracking").groupBy("gameId").agg(sum("dis").as("sd"))
    val dblScan = dbl.queryExecution.sparkPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }.head
    assert(!dblScan.scan.description().contains("PushedAggregates"),
      dblScan.scan.description())
    val gotD = dbl.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val expD = BdbMini.tracking.groupBy(_.gameId)
      .view.mapValues(_.map(_.dis).sum).toMap
    gotD.foreach { case (g, v) => assert(math.abs(v - expD(g)) < 1e-9) }
  }

  test("per-gameId AVG pushes via (sum,count) partials; double AVG declines whole") {
    // Spark's V2ScanRelationPushDown rewrites a partial-pushdown AVG
    // into SUM + COUNT before translating (the exact decomposition the
    // round-8 integral partials support), then divides in the final
    // aggregate — so avg(integral) rides the existing partials with no
    // new source surface. The scan must show BOTH decomposed partials.
    val df = read("tracking").groupBy("gameId").agg(avg("frameId").as("af"))
    val scan = df.queryExecution.sparkPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }.head
    val desc = scan.scan.description()
    assert(desc.contains("SUM(frameId)") && desc.contains("COUNT(frameId)"),
      s"AVG should decompose into pushed SUM+COUNT partials: $desc")
    val got = df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val expected = BdbMini.tracking.groupBy(_.gameId).map { case (g, rows) =>
      g -> rows.map(_.frameId.toDouble).sum / rows.size
    }
    // exact: the division runs once per group on exact Long partials,
    // the same single IEEE op the row-level plan ends in
    got.foreach { case (g, v) => assert(v == expected(g), s"game $g") }
    // float-exactness decline rule: avg(double) decomposes into
    // sum(double) + count, the double SUM partial declines (per-split
    // accumulation order could differ from the row plan by ulps), and
    // aggs.exists(_.isEmpty) fails the WHOLE pushAggregation — ordinary
    // scan, still-correct result
    val dbl = read("tracking").groupBy("gameId").agg(avg("dis").as("ad"))
    val dblScan = dbl.queryExecution.sparkPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }.head
    assert(!dblScan.scan.description().contains("PushedAggregates"),
      dblScan.scan.description())
    val gotD = dbl.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val expD = BdbMini.tracking.groupBy(_.gameId)
      .view.mapValues(rs => rs.map(_.dis).sum / rs.size).toMap
    gotD.foreach { case (g, v) => assert(math.abs(v - expD(g)) < 1e-9) }
  }

  test("per-gameId grouped COUNT(*) pushes and composes with the gameId filter") {
    val g = BdbMini.games.head.gameId
    val df = read("tracking").filter(col("gameId") === g).groupBy("gameId").count()
    val scan = df.queryExecution.sparkPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }.head
    assert(scan.scan.description().contains("GroupedBy=[gameId]"),
      scan.scan.description())
    val rows = df.collect()
    assert(rows.length == 1 && rows.head.getLong(0) == g &&
      rows.head.getLong(1) == BdbMini.tracking.count(_.gameId == g))
  }

  test("TopN on a nullable column honors null ordering without NPE") {
    // jerseyNumber is null on every football row. ASC NULLS LAST (the
    // non-default placement the old comparator NPE'd on): the smallest
    // non-null jerseys win
    val last = read("tracking").orderBy(col("jerseyNumber").asc_nulls_last).limit(3)
    val lastScan = last.queryExecution.sparkPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }.head
    assert(lastScan.scan.description().contains("NULLS LAST"),
      lastScan.scan.description())
    assert(last.collect().map(_.getAs[Int]("jerseyNumber")).toSeq == Seq(9, 9, 9))
    // default ASC = NULLS FIRST: the football rows surface
    val first = read("tracking").orderBy(col("jerseyNumber")).limit(3)
    assert(first.collect().forall(_.isNullAt(first.schema.fieldIndex("jerseyNumber"))))
  }

  test("OFFSET pushes on a single-split scan; composes with TopN (W8 shape)") {
    // round 10 (verdict ask #7): ORDER BY x DESC LIMIT 3 OFFSET 2 on a
    // gameId-pruned scan = ONE split, so the TopN upgrades from partial
    // to COMPLETE and Spark hands the offset down too — the scan itself
    // returns rows [2, 5) of the sorted stream and the plan keeps no
    // Sort/Limit/Offset of its own.
    val g = BdbMini.games.head.gameId
    val df = read("tracking").filter(col("gameId") === g)
      .orderBy(desc("x")).offset(2).limit(3)
    val scan = df.queryExecution.sparkPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }.head
    val d = scan.scan.description()
    assert(d.contains("PushedTopN=[x DESC NULLS LAST LIMIT 5]"), d)
    assert(d.contains("PushedOffset=2"), d)
    val got = df.collect().map(_.getAs[Double]("x")).toSeq
    val expected = BdbMini.tracking.filter(_.gameId == g)
      .map(_.x).sorted.reverse.slice(2, 5)
    assert(got == expected)
  }

  test("bare OFFSET pushes on the single-split players table") {
    val df = read("players").offset(4)
    val scan = df.queryExecution.sparkPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }.head
    assert(scan.scan.description().contains("PushedOffset=4"),
      scan.scan.description())
    assert(df.count() == BdbMini.players.size - 4)
  }

  test("OFFSET declines on a multi-split scan; result still correct") {
    // the decline rule: no gameId prune ⇒ 2 splits ⇒ a per-split offset
    // would drop 2·offset rows, so the source refuses and Spark keeps
    // its own Offset (the TopN stays pushed, but only PARTIALLY — the
    // pushed cut must therefore be limit+offset deep)
    val df = read("tracking").orderBy(desc("x")).offset(2).limit(3)
    val scan = df.queryExecution.sparkPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }.head
    val d = scan.scan.description()
    assert(!d.contains("PushedOffset"), d)
    val got = df.collect().map(_.getAs[Double]("x")).toSeq
    val expected = BdbMini.tracking.map(_.x).sorted.reverse.slice(2, 5)
    assert(got == expected)
  }
}
