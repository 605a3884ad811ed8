package org.apache.spark.graft

import org.apache.spark.SparkContext

/** `SparkContext.listenerBus` is `private[spark]`; Bench needs to drain it
  * so per-query shuffle-byte attribution isn't racy. This shim is the only
  * file outside the `graft` package and exposes exactly one call.
  */
object ListenerBusAccess {
  /** Best-effort drain: on a busy bus `waitUntilEmpty` throws
    * TimeoutException after its internal default (~10s); a stale metrics
    * snapshot is preferable to aborting the whole bench run.
    */
  def waitUntilEmpty(sc: SparkContext): Unit =
    try sc.listenerBus.waitUntilEmpty()
    catch { case _: java.util.concurrent.TimeoutException => () }
}
