package org.apache.spark.graftbridge

import org.apache.spark.SparkContext

/** Test-only bridge into the `private[spark]` listener bus: a deterministic
  * "all queued listener events delivered" barrier for specs that count
  * scheduler events (JobCountSpec). Polling the counter for stability can
  * under-count when a GC pause delays delivery past the poll window;
  * `waitUntilEmpty` is the bus's own drain primitive. Lives under
  * `org.apache.spark` for access; contains no Spark code of its own. */
object ListenerBridge {
  def waitUntilListenerBusEmpty(sc: SparkContext, timeoutMillis: Long): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMillis)
}
