package org.apache.spark.graftbench

import org.apache.spark.SparkContext

/** Accessor for the `private[spark]` listener bus drain.
  *
  * Bench attributes task telemetry (GC time, spill, peak execution memory)
  * to the query that ran it by snapshotting listener counters before and
  * after each timed action. Listener events are delivered asynchronously,
  * so without a drain the last tasks of query N can land in query N+1's
  * window. `LiveListenerBus.waitUntilEmpty` is exactly the needed barrier
  * but is `private[spark]`; this one-method object in the org.apache.spark
  * namespace exposes it to graft.Bench. Bounded wait: a stuck listener
  * queue degrades attribution, never the bench itself.
  */
object BusAccess {
  def drain(sc: SparkContext, timeoutMs: Long = 2000L): Unit =
    try sc.listenerBus.waitUntilEmpty(timeoutMs)
    catch { case _: java.util.concurrent.TimeoutException => () }
}
