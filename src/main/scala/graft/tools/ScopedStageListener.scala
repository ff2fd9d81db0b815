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
    @volatile var seen = 0
    val l = new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        onStage(sc); seen += 1
      }
    }
    spark.sparkContext.addSparkListener(l)
    try {
      val r = body
      // async bus drain, the test helper's poll-until-stable pattern
      // (the bus API itself is private[spark])
      var last = -1
      var stable = 0
      while (stable < 3) {
        Thread.sleep(200)
        if (seen == last) stable += 1 else { stable = 0; last = seen }
      }
      r
    } finally spark.sparkContext.removeSparkListener(l)
  }
}
