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

  /** Stop whatever SparkContext is live (`SparkContext.getActive` is
    * `private[spark]`): used by suites that must rebuild the context
    * with creation-time settings (task maxFailures) — stopping only the
    * session would let getOrCreate silently reuse the old context and
    * ignore the new master string. */
  def stopActiveContext(): Unit = SparkContext.getActive.foreach(_.stop())
}
