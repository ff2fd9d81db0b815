package org.apache.spark

/** Package-private-escape bridge (the GraftBenchPlan pattern, round 14 —
  * ADVICE): `SparkContext.listenerBus` is private[spark], but a
  * deterministic drain of the async listener bus beats the dev tools'
  * poll-until-stable loop, which could declare the bus idle during a GC
  * pause and silently under-count stage metrics. Dev measurement tools
  * only; never on the driver path.
  */
object GraftListenerBridge {
  /** Block until every event posted to the async listener bus so far has
    * been delivered to every listener. */
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
