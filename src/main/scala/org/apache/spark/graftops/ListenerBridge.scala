package org.apache.spark.graftops

import org.apache.spark.SparkContext

/** Private-API shim: `SparkContext.listenerBus` is `private[spark]`, but
  * an I/O-accounting tool needs to drain the async listener queue before
  * snapshotting task metrics — otherwise a probe reads bytes from the
  * previous step. Measurement plumbing only.
  */
object ListenerBridge {
  def waitUntilListenerEmpty(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
