package graft

import org.apache.spark.sql.Dataset

/** Registry of DataFrames persisted inside query builders.
  *
  * Query fns persist shared projections (shingle signatures, quantized
  * vectors) whose lineage is the dominant cost of the query — but the
  * builder returns a lazy DataFrame, so the consuming action (and therefore
  * the right unpersist point) happens in the caller. Builders register each
  * persist here; harnesses call [[releaseAll]] after the action completes,
  * so a long-lived session running registry queries repeatedly never
  * accumulates dead cached projections. Deliberately NOT a memo cache:
  * reusing a projection across repeated runs would let benchmark passes skip
  * the signature pipeline they are supposed to measure.
  */
object CacheTracker {
  private val live = new java.util.concurrent.ConcurrentLinkedQueue[Dataset[_]]()
  private val liveRdds =
    new java.util.concurrent.ConcurrentLinkedQueue[org.apache.spark.rdd.RDD[_]]()

  /** Register a persisted Dataset for later release; returns it unchanged. */
  def track[T <: Dataset[_]](df: T): T = { live.add(df); df }

  /** Register a persisted RDD (the connected-components lineage-cut
    * snapshots — `spark.catalog.clearCache()` does NOT drop RDD-level
    * persists, so untracked they would accumulate across a query sweep).
    */
  def trackRdd[T <: org.apache.spark.rdd.RDD[_]](rdd: T): T = { liveRdds.add(rdd); rdd }

  /** Unpersist every tracked Dataset/RDD and clear the registry. */
  def releaseAll(): Unit = {
    var d = live.poll()
    while (d != null) { d.unpersist(blocking = false); d = live.poll() }
    var r = liveRdds.poll()
    while (r != null) { r.unpersist(blocking = false); r = liveRdds.poll() }
  }
}
