package org.apache.spark

/** Test-only shim: `SparkContext.listenerBus` is `private[spark]`,
  * but deterministic assertions over QueryExecutionListener events
  * need a flush — polling with sleeps is the flaky alternative.
  */
object GraftListenerBridge {
  def waitListenerBusEmpty(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
