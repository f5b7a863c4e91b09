package org.apache.spark.graftbridge

import org.apache.spark.SparkContext

/** Bridge into Spark's `private[spark]` listener-bus drain, for
  * measurement tools that read listener-accumulated metrics (round-19
  * ADVICE): `SparkListenerStageCompleted` events are delivered
  * ASYNCHRONOUSLY, so a tool that finishes a job and immediately reads
  * (or resets) its accumulated spill/peak-memory counters can drop or
  * misattribute events still in flight from the job's final stages.
  * `LiveListenerBus.waitUntilEmpty` is the queue-drain barrier Spark's
  * own test utilities use (`org.apache.spark.TestUtils`, public Spark
  * source) — it blocks until every posted event has been dispatched to
  * every registered listener. It is `private[spark]`, hence this
  * one-method bridge object in the `org.apache.spark` namespace
  * (measurement-tool path only; never a query path).
  */
object ListenerDrain {
  /** Block until all events posted so far are dispatched, or throw
    * after `timeoutMillis`. */
  def drain(sc: SparkContext, timeoutMillis: Long = 10000L): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMillis)
}
