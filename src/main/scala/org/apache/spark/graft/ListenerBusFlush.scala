package org.apache.spark.graft

import org.apache.spark.SparkContext

/** One-method shim into `private[spark]` territory: block until the
  * shared listener bus has delivered every queued event. Needed by
  * [[graft.plans.ScanLedger]] because `QueryExecutionListener`
  * callbacks ride the asynchronous bus — a census read immediately
  * after the last action would race the delivery of that action's
  * `SparkListenerSQLExecutionEnd`. This is the same flush Spark's own
  * test harness uses (`SparkContext.listenerBus.waitUntilEmpty`);
  * only the package placement is ours.
  */
object ListenerBusFlush {
  def waitUntilEmpty(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
