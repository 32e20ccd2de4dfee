package graft.jobs

import java.util.concurrent.atomic.{AtomicLong, LongAdder}

import scala.collection.concurrent.TrieMap

/** In-process metrics registry (G11/T7), mirroring the reference's metric
  * surface (`metrics/LakeViewExtractorMetrics.java:63-117`): counters keyed
  * by name + optional failure-reason tag, and the two per-round gauges. An
  * exporter (Prometheus, StatsD) would read [[snapshot]]; specs read it
  * directly.
  */
final class SyncMetrics {
  private val counters = TrieMap.empty[(String, String), LongAdder]
  val tablesDiscoveredGauge = new AtomicLong(0)
  val tablesProcessedGauge = new AtomicLong(0)

  def inc(name: String, reasonTag: String = ""): Unit =
    counters.getOrElseUpdate((name, reasonTag), new LongAdder).increment()

  def count(name: String, reasonTag: String = ""): Long =
    counters.get((name, reasonTag)).map(_.sum()).getOrElse(0L)

  /** Counter totals keyed `name` or `name{reason=tag}`, plus both gauges. */
  def snapshot: Map[String, Long] =
    counters.readOnlySnapshot().map { case ((n, t), v) =>
      (if (t.isEmpty) n else s"$n{reason=$t}") -> v.sum()
    }.toMap ++ Map(
      SyncMetrics.TablesDiscoveredGauge -> tablesDiscoveredGauge.get(),
      SyncMetrics.TablesProcessedGauge -> tablesProcessedGauge.get())
}

object SyncMetrics {
  private val Prefix = "lakeView_"
  val TableDiscoverySuccess = Prefix + "table_discovery_success"
  val TableDiscoveryFailure = Prefix + "table_discovery_failure"
  val TableSyncSuccess = Prefix + "table_sync_success"
  val TableSyncFailure = Prefix + "table_sync_failure"
  val MetadataUploadSuccess = Prefix + "metadata_upload"
  val FailedOverrideConfig = Prefix + "failed_override_config"
  val TableMetadataProcessingFailure = Prefix + "table_metadata_processing_failure"
  val TablesDiscoveredGauge = Prefix + "tables_discovered"
  val TablesProcessedGauge = Prefix + "tables_processed"

  /** Default registry used when callers don't supply one. */
  val global = new SyncMetrics
}
