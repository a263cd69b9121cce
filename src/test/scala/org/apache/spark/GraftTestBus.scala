package org.apache.spark

/** Test-only bridge into `private[spark]` listener-bus draining, so specs
  * can assert on listener-observed task metrics deterministically (the
  * bus delivers events asynchronously; without a drain the assertion
  * races the delivery).
  */
object GraftTestBus {
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
