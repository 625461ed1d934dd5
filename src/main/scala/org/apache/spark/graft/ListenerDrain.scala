package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Accessor for the `private[spark]` listener bus drain. SparkListener
  * events are delivered asynchronously on the listener bus, so a metric
  * counter fed by `onTaskEnd` may still be missing late events immediately
  * after an action returns — any probe that asserts on listener-collected
  * metrics must drain the bus first. Same TestUtils-style package-private
  * bridge Spark's own test helpers use.
  */
object ListenerDrain {
  /** Block until all posted listener events are delivered (or timeout). */
  def waitUntilEmpty(sc: SparkContext, timeoutMillis: Long = 30000L): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMillis)
}
