package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** The main-tree twin of the test helper of the same name (and the same
  * file name, which is the ListenerHygieneSpec contract): ALL
  * SparkListener registration goes through a Scoped helper that owns the
  * register → run → drain-bus → remove discipline, so no listener can
  * outlive its measurement and observe unrelated work. Used only by the
  * dev measurement tools ([[StageProfile]]); never on the driver path.
  */
object ScopedStageListener {

  /** Run `body` with `onStage` observing every completed stage, then
    * drain the async listener bus and deregister. Single-JVM dev tools
    * only — no job-group attribution here because the tool owns the
    * whole SparkContext for the duration. */
  def observe[T](spark: SparkSession)(onStage: SparkListenerStageCompleted => Unit)
                (body: => T): T = {
    val l = new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        onStage(sc)
    }
    spark.sparkContext.addSparkListener(l)
    try {
      val r = body
      // deterministic async-bus drain (round 14, ADVICE): the previous
      // poll-until-stable loop (3 × 200 ms with no new events) could
      // declare the bus idle during a GC pause and under-count stage
      // metrics; waitUntilEmpty blocks until every queued event has been
      // delivered (reached via the GraftListenerBridge package escape —
      // the bus API is private[spark]).
      org.apache.spark.GraftListenerBridge.drain(spark.sparkContext)
      r
    } finally spark.sparkContext.removeSparkListener(l)
  }
}
