package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Package-internal bridge: `LiveListenerBus.waitUntilEmpty` is
  * `private[spark]`, but per-query task-metric attribution in
  * [[graft.Bench]] needs the bus drained between queries — otherwise a
  * slow query's task-end events can be charged to the next query's
  * window. This is the standard test-support pattern (Spark's own
  * `TestUtils` sits in the same package for the same reason); no other
  * internals are touched.
  */
object ListenerBridge {
  /** Block until all queued listener events have been delivered (or the
    * timeout passes — attribution degrades gracefully to ±timeout). */
  def drain(sc: SparkContext, timeoutMs: Long = 10000L): Unit =
    try sc.listenerBus.waitUntilEmpty(timeoutMs)
    catch { case _: Throwable => () }
}
