package graft.operators

import java.sql.Timestamp

import graft.model.Checkpoint
import org.apache.spark.sql.{SaveMode, SparkSession}

/** Per-(tableId, timelineType) checkpoint store (SURVEY §2.8 T2/T3, §2.1
  * S10/S11) — the engine-local replacement for the reference's checkpoint
  * API (`api/OnehouseApiClient.java:68-96`): an overwrite-by-key Parquet
  * upsert. Writes are driver-coordinated and tiny (one row per table
  * timeline), so a plain read-modify-write snapshot is the right tool — not
  * a streaming state store.
  *
  * JSON codec matches the reference's Jackson shape
  * (`TimelineCommitInstantsUploader.java:99-101`, JavaTimeModule ISO-8601
  * instants) so checkpoints round-trip with reference deployments.
  */
object CheckpointStore {

  final case class Keyed(
      tableId: String,
      timelineType: String,
      batchId: Int,
      checkpointTimestamp: Timestamp,
      lastUploadedFile: String,
      firstIncompleteCommitFile: String,
      archivedCommitsProcessed: Boolean,
      lastArchivedManifestVersion: Int)

  private def toKeyed(tableId: String, tt: String, c: Checkpoint): Keyed =
    Keyed(tableId, tt, c.batchId, c.checkpointTimestamp, c.lastUploadedFile,
      c.firstIncompleteCommitFile, c.archivedCommitsProcessed,
      c.lastArchivedManifestVersion)

  private def toCheckpoint(k: Keyed): Checkpoint =
    Checkpoint(k.batchId, k.checkpointTimestamp, k.lastUploadedFile,
      k.firstIncompleteCommitFile, k.archivedCommitsProcessed,
      k.lastArchivedManifestVersion)

  /** Load all checkpoints (empty map when the store doesn't exist yet). */
  def load(spark: SparkSession, storeDir: String): Map[(String, String), Checkpoint] = {
    import spark.implicits._
    try {
      spark.read.parquet(storeDir).as[Keyed].collect()
        .map(k => (k.tableId, k.timelineType) -> toCheckpoint(k)).toMap
    } catch {
      case _: Throwable => Map.empty
    }
  }

  /** Upsert one checkpoint row (atomic with respect to readers: parquet
    * overwrite into a staging-then-commit directory swap is unnecessary at
    * one-writer metadata scale; the reference likewise POSTs sequentially,
    * `TimelineCommitInstantsUploader.java:623-688`).
    */
  def upsert(
      spark: SparkSession,
      storeDir: String,
      tableId: String,
      timelineType: String,
      checkpoint: Checkpoint): Unit = {
    import spark.implicits._
    val merged = load(spark, storeDir) + ((tableId, timelineType) -> checkpoint)
    val rows = merged.toSeq.map { case ((tid, tt), c) => toKeyed(tid, tt, c) }
    // stage-then-swap: a crash mid-write must never leave a truncated store
    // (a stale checkpoint only re-mirrors one batch, which is idempotent;
    // a corrupt store would reset every table)
    val hadoop = spark.sparkContext.hadoopConfiguration
    val store = new org.apache.hadoop.fs.Path(storeDir)
    val staging = new org.apache.hadoop.fs.Path(storeDir + ".staging")
    val fs = store.getFileSystem(hadoop)
    spark.createDataset(rows).coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(staging.toString)
    if (fs.exists(store)) fs.delete(store, true)
    fs.rename(staging, store)
  }

  // ---- reference-compatible JSON codec ------------------------------------
  def toJson(c: Checkpoint): String = {
    def q(s: String) = if (s == null) "null" else "\"" + s + "\""
    val ts = c.checkpointTimestamp.toInstant.toString
    s"""{"batchId":${c.batchId},"checkpointTimestamp":"$ts",""" +
      s""""lastUploadedFile":${q(c.lastUploadedFile)},""" +
      s""""firstIncompleteCommitFile":${q(c.firstIncompleteCommitFile)},""" +
      s""""archivedCommitsProcessed":${c.archivedCommitsProcessed},""" +
      s""""lastArchivedManifestVersion":${c.lastArchivedManifestVersion}}"""
  }

  private val Field = """"(\w+)"\s*:\s*("(?:[^"\\]|\\.)*"|[^,}]+)""".r

  def fromJson(json: String): Checkpoint = {
    val m = Field.findAllMatchIn(json).map { mm =>
      val v = mm.group(2)
      mm.group(1) -> (if (v.startsWith("\"")) v.substring(1, v.length - 1) else v)
    }.toMap
    Checkpoint(
      batchId = m("batchId").toInt,
      checkpointTimestamp = Timestamp.from(java.time.Instant.parse(m("checkpointTimestamp"))),
      lastUploadedFile = m.get("lastUploadedFile").filter(_ != "null").orNull,
      firstIncompleteCommitFile = m.get("firstIncompleteCommitFile").filter(_ != "null").orNull,
      archivedCommitsProcessed = m("archivedCommitsProcessed").toBoolean,
      lastArchivedManifestVersion = m.get("lastArchivedManifestVersion").map(_.toInt).getOrElse(0))
  }
}
