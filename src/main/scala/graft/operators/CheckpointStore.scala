package graft.operators

import java.sql.Timestamp

import graft.model.Checkpoint
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Per-(tableId, timelineType) checkpoint store (SURVEY §2.8 T2/T3, §2.1
  * S10/S11) — the engine-local replacement for the reference's checkpoint
  * API (`api/OnehouseApiClient.java:68-96`). Layout is one JSON file per
  * key: `storeDir/<tableId>/<timelineType>.json`, written stage-then-rename.
  *
  * The per-key layout is what makes the store scale- and concurrency-safe:
  * an upsert touches exactly one file regardless of table count (the
  * previous whole-store parquet rewrite was O(tables) per batch and a Spark
  * job each), and parallel tables in a batch (G7/G8) write disjoint paths,
  * matching the reference's per-table checkpoint POSTs
  * (`TimelineCommitInstantsUploader.java:623-688`).
  *
  * JSON codec matches the reference's Jackson shape
  * (`TimelineCommitInstantsUploader.java:99-101`, JavaTimeModule ISO-8601
  * instants) so checkpoints round-trip with reference deployments.
  */
object CheckpointStore {

  private val Utf8 = java.nio.charset.StandardCharsets.UTF_8

  /** Load all checkpoints (empty map when the store doesn't exist yet).
    * O(tables) — for inspection and specs; the mirror hot path uses
    * [[loadTable]].
    */
  def load(spark: SparkSession, storeDir: String): Map[(String, String), Checkpoint] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new Path(storeDir)
    val fs = root.getFileSystem(conf)
    if (!fs.exists(root)) Map.empty
    else {
      val out = Map.newBuilder[(String, String), Checkpoint]
      val tables = fs.listStatus(root).filter(_.isDirectory)
      tables.foreach { td =>
        fs.listStatus(td.getPath)
          .filter(f => f.isFile && f.getPath.getName.endsWith(".json"))
          .foreach { f =>
            val tt = f.getPath.getName.stripSuffix(".json")
            out += (td.getPath.getName, tt) -> read(fs, f.getPath)
          }
      }
      out.result()
    }
  }

  /** Fetch one table's checkpoints — the S11 per-table lookup. */
  def loadTable(conf: Configuration, storeDir: String,
      tableId: String): Map[String, Checkpoint] = {
    val dir = new Path(s"${storeDir.stripSuffix("/")}/$tableId")
    val fs = dir.getFileSystem(conf)
    if (!fs.exists(dir)) Map.empty
    else fs.listStatus(dir)
      .filter(f => f.isFile && f.getPath.getName.endsWith(".json"))
      .map(f => f.getPath.getName.stripSuffix(".json") -> read(fs, f.getPath))
      .toMap
  }

  private def read(fs: org.apache.hadoop.fs.FileSystem, p: Path): Checkpoint = {
    val in = fs.open(p)
    val bytes = try in.readAllBytes() finally in.close()
    fromJson(new String(bytes, Utf8))
  }

  /** Upsert one checkpoint: write to a staging file, then rename over the
    * target — a crash mid-write never leaves a truncated checkpoint (a stale
    * one only re-mirrors one batch, which is idempotent by filename).
    */
  def upsert(
      spark: SparkSession,
      storeDir: String,
      tableId: String,
      timelineType: String,
      checkpoint: Checkpoint): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val dir = new Path(s"${storeDir.stripSuffix("/")}/$tableId")
    val fs = dir.getFileSystem(conf)
    fs.mkdirs(dir)
    val target = new Path(dir, s"$timelineType.json")
    val staging = new Path(dir, s".$timelineType.json.staging")
    val out = fs.create(staging, true)
    try out.write(toJson(checkpoint).getBytes(Utf8)) finally out.close()
    if (fs.exists(target)) fs.delete(target, false)
    fs.rename(staging, target)
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
