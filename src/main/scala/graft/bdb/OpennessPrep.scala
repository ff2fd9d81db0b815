package graft.bdb

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pipeline stage 2 (SURVEY.md §3.1.2) — `Openness_Data_Frame_Prep.R`.
  *
  * From tracking ⟕ plays ⋈ player_play, build `cleaned_player_data`:
  * one row per (gameId, playId, frameId, route-runner) on AFTER_SNAP
  * dropback frames, carrying the receiver's kinematics, the 11 defenders'
  * (x, y, s) as an ARRAY-OF-STRUCT (the idiomatic replacement for the
  * reference's x_1..s_11 wide pivot — SURVEY.md §7.4.4), the per-play
  * throw speed (median ball speed over frames +2..+7 after
  * `pass_forward`, `Openness_Data_Frame_Prep.R:71-88`), and the ball
  * position at the throw frame (fx, fy).
  *
  * Scale notes: one shuffle on (gameId, playId) for the plays join
  * (plays broadcasts — 16k rows in the real data), one on
  * (gameId, playId, frameId) for the defender collect_list, and the
  * throw-speed lookup is a tiny per-play aggregate joined back broadcast.
  * The reference's cross-process SQLite fetches disappear into one
  * Catalyst plan. The per-play anchored frame window (W9) is computed
  * per play — fixing the reference's latent cross-play bleed where it
  * indexed physical row positions of the whole sorted table.
  */
object OpennessPrep {

  /** Frames +2..+7 after the play's pass_forward frame: the ball-flight
    * window used for throw speed (W9, per-play anchored). */
  def throwSpeedTable(tracking: DataFrame): DataFrame = {
    val w = Window.partitionBy("gameId", "playId")
    val anchored = tracking
      .withColumn("throw_frame",
        min(when(col("event") === "pass_forward", col("frameId"))).over(w))
    val ball = anchored
      .filter(col("displayName") === "football" && col("throw_frame").isNotNull)
    val speed = ball
      .filter(col("frameId").between(col("throw_frame") + 2, col("throw_frame") + 7))
      .groupBy("gameId", "playId")
      .agg(median(col("s")).as("throw_speed")) // A2: exact median
    val ballAtThrow = ball
      .filter(col("frameId") === col("throw_frame"))
      .select(col("gameId"), col("playId"), col("x").as("fx"), col("y").as("fy"),
              col("throw_frame"))
    speed.join(ballAtThrow, Seq("gameId", "playId"))
  }

  /** Defender (x, y, s) arrays per frame, ordered by nflId for
    * determinism (W10's rep(1:11) recycling, made deterministic —
    * SURVEY.md §7.4.1). */
  def defenderArrays(tracking: DataFrame, plays: DataFrame): DataFrame = {
    val defs = tracking.join(plays.select("gameId", "playId", "defensiveTeam"),
        Seq("gameId", "playId"))
      .filter(col("club") === col("defensiveTeam"))
    defs
      .groupBy("gameId", "playId", "frameId")
      .agg(transform(
        array_sort(collect_list(struct(col("nflId"), col("x"), col("y"), col("s")))),
        d => struct(d.getField("x").as("x"), d.getField("y").as("y"),
                    d.getField("s").as("s"))).as("defenders"))
  }

  /** cleaned_player_data (FIXTURES.md §3 schema). */
  def apply(tracking: DataFrame, plays: DataFrame, playerPlay: DataFrame): DataFrame = {
    val dropbackPlays = plays.filter(col("isDropback"))
    val routeRunners = playerPlay
      .filter(col("wasRunningRoute"))
      .select("gameId", "playId", "nflId", "routeRan",
              "pff_defensiveCoverageAssignment")
    val frames = tracking
      .filter(col("frameType") === "AFTER_SNAP")
      .join(broadcast(dropbackPlays.select("gameId", "playId")), Seq("gameId", "playId"))
    val receiverFrames = frames
      .join(routeRunners, Seq("gameId", "playId", "nflId"))
      .select(col("gameId"), col("playId"), col("frameId"), col("nflId"),
              col("x"), col("y"), col("s"), col("dir"),
              col("routeRan"), col("pff_defensiveCoverageAssignment"))
    receiverFrames
      .join(defenderArrays(frames, dropbackPlays), Seq("gameId", "playId", "frameId"))
      .join(broadcast(throwSpeedTable(tracking)), Seq("gameId", "playId"))
  }
}
