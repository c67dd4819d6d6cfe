package org.apache.spark.graftbridge

import org.apache.spark.SparkContext

/** Bridge to `SparkContext.listenerBus` (`private[spark]`): lets the
  * scale-audit harness drain queued listener events before reading its
  * shuffle tallies, instead of sleeping and hoping. Lives inside the
  * `org.apache.spark` package namespace for the access qualifier only —
  * same pattern as `org.apache.spark.sql.graftbridge.ColumnBridge`. */
object ListenerBridge {
  def waitUntilEmpty(sc: SparkContext, timeoutMs: Long): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMs)
}
