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
}
