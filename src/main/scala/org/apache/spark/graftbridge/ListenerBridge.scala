package org.apache.spark.graftbridge

import org.apache.spark.SparkContext

/** Bridge into `private[spark]` listener-bus draining: the bench's
  * per-query spill attribution reads metrics accumulated by an async
  * SparkListener, so between queries it must wait for the bus to
  * drain or one query's task-end events bleed into the next query's
  * numbers. Lives under org.apache.spark.* solely for access; contains
  * no Spark-internal logic (the [[org.apache.spark.sql.graftbridge
  * .ColumnBridge]] pattern).
  */
object ListenerBridge {
  def waitUntilListenerBusEmpty(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
