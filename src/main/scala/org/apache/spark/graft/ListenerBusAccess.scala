package org.apache.spark.graft

import org.apache.spark.SparkContext

/** `SparkContext.listenerBus` is `private[spark]`; Bench needs to drain it
  * so per-query shuffle-byte attribution isn't racy. This shim is the only
  * file outside the `graft` package and exposes exactly one call.
  */
object ListenerBusAccess {
  def waitUntilEmpty(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
