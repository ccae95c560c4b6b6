package org.apache.spark.graftglue

import org.apache.spark.SparkContext

/** `SparkContext.listenerBus` is `private[spark]`; this one-file shim in
  * the `org.apache.spark` namespace exposes the single call
  * [[graft.Metrics]] needs: draining queued listener events so that
  * stage metrics observed AFTER an action are complete (the bus is
  * async — without a flush, the last stages' metrics race the read).
  */
object ListenerGlue {
  def flush(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty(30000)
}
