package graft.bdb

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pipeline stage 6 (SURVEY.md §3.1/§7.1) — `Matchup Information.R`.
  *
  * Route trees (the play's routes concatenated in formation-y order, A9
  * with the sort INSIDE the aggregation — input order is meaningless in
  * a distributed engine) and mirror matching: a self-join of route trees
  * against reversed trees within the same coverage (J7 + F6,
  * `Matchup Information.R:75-84`).
  */
object MatchupAnalysis {

  /** route_tree per (gameId, playId): routes in ascending snap-y order.
    * Tie-break chain (y, nflId) is total ⇒ deterministic. */
  def routeTrees(tracking: DataFrame, playerPlay: DataFrame, plays: DataFrame): DataFrame = {
    val routes = playerPlay.filter(col("wasRunningRoute"))
      .select("gameId", "playId", "nflId", "routeRan")
    val snapY = tracking.filter(col("frameType") === "SNAP")
      .select("gameId", "playId", "nflId", "y")
    routes.join(snapY, Seq("gameId", "playId", "nflId"))
      .groupBy("gameId", "playId")
      .agg(array_join(
        transform(
          array_sort(collect_list(struct(col("y"), col("nflId"), col("routeRan")))),
          r => r.getField("routeRan")),
        " ").as("route_tree"))
      .join(plays.select("gameId", "playId", "pff_passCoverage"), Seq("gameId", "playId"))
  }

  /** Mirror matching: plays whose route tree is the y-reverse of
    * another play's tree under the same coverage (J7 self-join on the
    * derived key; F6 split-reverse-rejoin). */
  def mirrorMatches(trees: DataFrame): DataFrame = {
    val withRev = trees.withColumn("reversed_route",
      array_join(reverse(split(col("route_tree"), " ")), " "))
    val a = withRev.as("a")
    val b = withRev.as("b")
    a.join(b,
        col("a.pff_passCoverage") === col("b.pff_passCoverage") &&
        col("a.route_tree") === col("b.reversed_route") &&
        (col("a.gameId") =!= col("b.gameId") || col("a.playId") =!= col("b.playId")),
        "left")
      .select(col("a.gameId").as("gameId"), col("a.playId").as("playId"),
              col("a.route_tree").as("route_tree"),
              col("b.gameId").as("mirror_gameId"), col("b.playId").as("mirror_playId"))
  }
}
