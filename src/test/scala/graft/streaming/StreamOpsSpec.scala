package graft.streaming

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.Trigger

/** Streaming/batch parity: the streaming pipeline over the same event
  * files must produce exactly the batch result once the stream drains
  * (Trigger.AvailableNow + memory sink). */
class StreamOpsSpec extends SparkSpec {

  /** File-stream sources require a DIRECTORY; stage the single events
    * file into one. */
  private lazy val eventsDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_events")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      dir.resolve("events.parquet"))
    dir.toString
  }

  private def runStream(df: DataFrame, name: String, mode: String = "complete"): DataFrame = {
    val q = df.writeStream
      .format("memory").queryName(name).outputMode(mode)
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation",
        s"${System.getProperty("java.io.tmpdir")}/graft_ck_${name}_${System.nanoTime()}")
      .start()
    q.awaitTermination()
    spark.table(name)
  }

  private def canon(df: DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  test("streaming tumbling-window totals equal the batch result") {
    val streamed = runStream(
      StreamOps.windowedTotals(StreamOps.eventStream(spark, eventsDir)),
      "win_totals")
    val batch = graft.SparkEntry.queries("w12_tumbling_window")(spark, sfDir)
    assert(canon(streamed) == canon(batch))
    assert(streamed.count() > 0)
  }

  test("streaming session windows equal the batch result") {
    val streamed = runStream(
      StreamOps.sessionTotals(StreamOps.eventStream(spark, eventsDir)),
      "sess_totals")
    val batch = graft.SparkEntry.queries("w13_session_window")(spark, sfDir)
    assert(canon(streamed) == canon(batch))
  }

  test("running user totals match a batch groupBy after drain") {
    import org.apache.spark.sql.functions._
    val streamed = runStream(
      StreamOps.runningUserTotals(StreamOps.eventStream(spark, eventsDir)),
      "user_totals")
    val batch = Tables.load(spark, sfDir, "events")
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("total_value"))
    assert(canon(streamed) == canon(batch))
  }
}
