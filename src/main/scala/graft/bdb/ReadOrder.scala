package graft.bdb

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pipeline stage 4 (SURVEY.md §3.1.4) — `BuildingReadOrder.R`.
  *
  * Produces the three lookup tables the reference materializes
  * (`BuildingReadOrder.R:189-196`):
  *  - `vs_coverage`: avg openness by (route, coverage, secondId) (A1);
  *  - `dropback_timing`: per play, the frame where the QB's cumulative
  *    dropback distance reaches dropbackDistance (W3+W4), plus the
  *    five-read frame schedule top + {0,5,10,15,20} (W11,
  *    `BuildingReadOrder.R:116-122`) as an ArrayType column;
  *  - `reads_data`: 1st..5th read target nflIds ordered across the
  *    formation (W2's ±y read order, `BuildingReadOrder.R:148-157`) as
  *    an ArrayType column.
  *
  * Determinism note (SURVEY.md §7.4.1): the reference's read order
  * depends on R's input row order for ties; ours pins the tie-break to
  * (y, nflId) — a defined version of the accidental semantics.
  */
object ReadOrder {

  /** Avg openness lookup by route × coverage × second (A1). */
  def vsCoverage(radiusData: DataFrame): DataFrame =
    radiusData
      .groupBy("routeRan", "pff_defensiveCoverageAssignment", "secondId")
      .agg(avg("open_count").as("avg_openness"))

  /** Per-play QB dropback timing via cumulative kinematic distance
    * (W3 running sum of F4 step distance; W4 conditional min). */
  def dropbackTiming(tracking: DataFrame, plays: DataFrame, players: DataFrame): DataFrame = {
    val qbs = players.filter(col("position") === "QB").select("nflId")
    val qbFrames = tracking
      .join(broadcast(qbs), Seq("nflId"))
      .join(broadcast(plays.filter(col("isDropback"))
        .select("gameId", "playId", "dropbackDistance")), Seq("gameId", "playId"))
      .filter(col("frameType") === "AFTER_SNAP")
    val wOrd = Window.partitionBy("gameId", "playId").orderBy("frameId")
    val wAll = Window.partitionBy("gameId", "playId")
    qbFrames
      .withColumn("step", graft.domain.Kinematics.stepDistance(col("s"), col("a")))
      .withColumn("cum_dist", sum("step").over(
        wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("top_drop_frame",
        min(when(col("cum_dist") >= col("dropbackDistance"), col("frameId"))).over(wAll))
      .groupBy("gameId", "playId")
      .agg(first("top_drop_frame").as("top_drop_frame"))
      // five-read schedule: +5 frames (0.5 s) per subsequent read
      .withColumn("readFrames",
        transform(sequence(lit(0), lit(4)), i => col("top_drop_frame") + i * 5))
  }

  /** 1st..5th read targets by formation order (W2: ±y by first-read
    * side, deterministic tie-break). Side is derived from the targeted
    * receiver's position at the snap frame. */
  def readsData(tracking: DataFrame, playerPlay: DataFrame): DataFrame = {
    val routeRunners = playerPlay.filter(col("wasRunningRoute"))
      .select("gameId", "playId", "nflId", "wasTargettedReceiver")
    val snapPos = tracking.filter(col("frameType") === "SNAP")
      .select("gameId", "playId", "nflId", "y")
    val rrWithPos = routeRunners.join(snapPos, Seq("gameId", "playId", "nflId"))
    val side = rrWithPos.filter(col("wasTargettedReceiver"))
      .select(col("gameId"), col("playId"),
        when(col("y") < 53.3 / 2, "R").otherwise("L").as("firstSide"))
    val ordered = rrWithPos.join(side, Seq("gameId", "playId"))
      .withColumn("read_order", row_number().over(
        Window.partitionBy("gameId", "playId")
          .orderBy(when(col("firstSide") === "R", -col("y")).otherwise(col("y")),
                   col("nflId"))))
    ordered
      .groupBy("gameId", "playId")
      .agg(transform(
        array_sort(collect_list(struct(col("read_order"), col("nflId")))),
        r => r.getField("nflId")).as("targets"))
  }

  /** seconds_data: frame → secondId map (`BuildingReadOrder.R:192`),
    * time_in_sec = ceil((secondId+1)/10) simplification per SURVEY P13. */
  def secondsData(radiusData: DataFrame): DataFrame =
    radiusData.select("gameId", "playId", "frameId", "secondId").distinct()
      .withColumn("time_in_sec", ceil((col("secondId") + 1) / 10.0).cast("int"))
}
