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
    assert(scan.scan.description().contains("PushedTopN=[x DESC LIMIT 3]"),
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

  test("aggregate pushdown declines grouped or non-count aggregates") {
    // per-game grouped count is NOT pushed (source declines) but stays
    // correct through the ordinary row path
    val perGame = read("tracking").groupBy("gameId").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = BdbMini.tracking.groupBy(_.gameId)
      .view.mapValues(_.size.toLong).toMap
    assert(perGame == expected)
    val s = read("tracking").agg(sum("x")).head.getDouble(0)
    // fold-order tolerance: Spark sums per-partition, the fixture in seq order
    assert(math.abs(s - BdbMini.tracking.map(_.x).sum) < 1e-6)
  }
}
