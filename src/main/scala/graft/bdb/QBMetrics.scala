package graft.bdb

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pipeline stage 5 (SURVEY.md §3.1.5) — `QBReadStats.R`.
  *
  * Determines the expected receiver at throw time, scores each throw
  * (correct_read), and aggregates the per-QB PRESS metric
  * (`QBReadStats.R:206-224`):
  *   PRESS = effective_read_pct / mean(effective_read_pct) × 100.
  *
  * Semantics pinned vs R (SURVEY.md §5.6):
  *  - throw_id = bround(timeToThrow, 1) × 10 — R `round` is HALF_EVEN,
  *    Spark `round` is HALF_UP ⇒ `bround` (F15);
  *  - the expected read slot is the argmin of |readFrame − throwFrame|
  *    with FIRST-match tie-break, matching R `max.col(ties="first")`
  *    (R8), via array_position ∘ array_min;
  *  - the slot → nflId lookup is element_at on the targets array (R9) —
  *    no dynamic column names.
  */
object QBMetrics {

  /** One row per dropback play: expected vs targeted receiver. */
  def throwScoring(plays: DataFrame, playerPlay: DataFrame,
                   timing: DataFrame, reads: DataFrame): DataFrame = {
    val dropbacks = plays
      .filter(col("isDropback") && col("dropbackType") === "TRADITIONAL" &&
              !col("unblockedPressure"))
      .select("gameId", "playId", "timeToThrow", "absoluteYardlineNumber")
    val targeted = playerPlay.filter(col("wasTargettedReceiver"))
      .select(col("gameId"), col("playId"), col("nflId").as("targeted_nflId"))
    dropbacks
      .join(timing, Seq("gameId", "playId"))
      .join(reads, Seq("gameId", "playId"))
      .join(targeted, Seq("gameId", "playId"))
      // throw frame offset from dropback top: F15 bround, 10 Hz frames
      .withColumn("throw_frame_abs", col("top_drop_frame") + bround(col("timeToThrow"), 1) * 10)
      // R8: argmin over |readFrames − throw|, first tie wins
      .withColumn("frame_diffs",
        transform(col("readFrames"), f => abs(f - col("throw_frame_abs"))))
      .withColumn("expected_slot",
        array_position(col("frame_diffs"), array_min(col("frame_diffs"))).cast("int"))
      // R9: dynamic lookup by slot index
      .withColumn("expected_nflId", element_at(col("targets"), col("expected_slot")))
      .withColumn("correct_read", col("expected_nflId") === col("targeted_nflId"))
  }

  /** Per-QB PRESS leaderboard (A4 ratio, A10 grand-mean broadcast). */
  def press(throws: DataFrame, playerPlay: DataFrame, players: DataFrame): DataFrame = {
    val qbs = players.filter(col("position") === "QB")
      .select(col("nflId").as("qb_nflId"), col("displayName"))
    val qbOnPlay = playerPlay
      .join(broadcast(qbs), playerPlay("nflId") === qbs("qb_nflId"))
      .select("gameId", "playId", "qb_nflId", "displayName")
    val perQb = throws
      .join(qbOnPlay, Seq("gameId", "playId"))
      .groupBy("qb_nflId", "displayName")
      .agg(count(lit(1)).as("snaps"),
           // avg of 0/1 doubles: the sum is integer-valued (exact in
           // a double), so the pct is one correctly-rounded division —
           // order-independent
           avg(col("correct_read").cast("double")).as("effective_read_pct"))
    // grand mean by SORTED sequential fold, not a window avg: a handful
    // of per-QB doubles summed in partition order could differ by ulps
    // between runs (and engines); sort_array pins one addition order
    // that the DuckDB oracle replays with list_reduce(list_sort(...))
    val grand = perQb.agg(
      expr("aggregate(sort_array(collect_list(effective_read_pct)), " +
           "CAST(0 AS DOUBLE), (acc, x) -> acc + x)").as("pct_sum"),
      count(lit(1)).as("n_qb"))
    perQb
      .crossJoin(broadcast(grand))
      .withColumn("PRESS",
        round(col("effective_read_pct")
          / (col("pct_sum") / col("n_qb")) * 100, 2))
      .drop("pct_sum", "n_qb")
  }

  /** Situational split: Shannon entropy of each QB's expected-read slot
    * distribution (A11, `QBReadStats.R:330-342`). */
  def readEntropy(throws: DataFrame, playerPlay: DataFrame, players: DataFrame): DataFrame = {
    val qbs = players.filter(col("position") === "QB")
      .select(col("nflId").as("qb_nflId"))
    val qbOnPlay = playerPlay
      .join(broadcast(qbs), playerPlay("nflId") === qbs("qb_nflId"))
      .select("gameId", "playId", "qb_nflId")
    val freq = throws.join(qbOnPlay, Seq("gameId", "playId"))
      .groupBy("qb_nflId", "expected_slot").agg(count(lit(1)).as("n"))
      .withColumn("p", col("n").cast("double")
        / sum("n").over(Window.partitionBy("qb_nflId")))
    freq.groupBy("qb_nflId")
      .agg(round(-sum(col("p") * log2(col("p"))), 6).as("read_entropy"))
  }
}
