package org.apache.spark.graftaccess

import org.apache.spark.SparkContext

/** Private[spark] accessor: drain the listener bus so metrics snapshots
  * are complete before reading (same technique Spark's own tests use).
  */
object ListenerBusAccess {
  def waitUntilEmpty(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
