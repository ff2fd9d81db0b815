package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SURVEY.md §2.11 — the streaming surface. The reference replays 10 Hz
  * tracking frames from files; here the same event-time operators run as
  * a Structured Streaming pipeline over a file source, with the batch
  * twins (w12/w13 in WindowQueries) sharing the exact aggregation
  * expressions — the parity the spec asserts.
  *
  * Scale notes: the file source lists+schedules splits incrementally;
  * watermarking bounds state (only windows newer than watermark stay in
  * the state store); session windows merge in the state store per key.
  * On a cluster this runs identically with a checkpointLocation on
  * shared storage — nothing here is local-mode-specific.
  */
object StreamOps {

  val eventSchema = "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, " +
    "event_type STRING, value DOUBLE, props STRING"

  /** File-source stream over parquet event files. The testdata's ts is
    * TIMESTAMP(NANOS); reading through the nanosAsLong legacy conf and
    * truncating to micros matches Tables.load / the DuckDB oracle. */
  def eventStream(spark: SparkSession, path: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.readStream
      .schema("event_id BIGINT, ts BIGINT, user_id BIGINT, " +
        "event_type STRING, value DOUBLE, props STRING")
      .parquet(path)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }

  /** W12's streaming twin: watermarked tumbling-window counts/sums. */
  def windowedTotals(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total"))
      .select(col("w.start").as("win_start"), col("event_type"), col("n"), col("total"))

  /** W13's streaming twin: watermarked session windows per user. */
  def sessionTotals(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("session_value"))
      .select(col("user_id"), col("w.start").as("session_start"),
              col("n_events"), col("session_value"))

  /** Custom keyed state (mapGroupsWithState territory): cumulative
    * per-user event count and value total, emitted per micro-batch.
    * Uses the streaming aggregation state store (Update mode). */
  def runningUserTotals(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("total_value"))
}
