package org.apache.spark

/** Test-only bridge to `private[spark]` surface: the listener bus flush that
  * makes asynchronous QueryExecutionListener events deterministic in specs
  * (register → run → flush → assert). No production code imports this.
  */
object GraftSparkTestAccess {
  def flushListenerBus(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty(30000)
}
