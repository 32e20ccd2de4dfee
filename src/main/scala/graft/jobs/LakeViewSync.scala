package graft.jobs

import graft.model.{HudiTable, UploadStrategy}
import graft.operators.{TableDiscovery, TimelineMirror}
import graft.sources.HoodiePropertiesReader
import org.apache.spark.sql.SparkSession

/** Library entry point mirroring the reference's sync-tool shape (SURVEY
  * §3.2, `lakeview-sync-tool/.../LakeviewSyncTool.java:88-110`): one call
  * runs discovery -> properties -> mirror with checkpoints, returning the
  * AND-fold of per-table success (G9,
  * `TableMetadataUploaderService.java:85-97`).
  *
  * Tables are processed in fixed-size batches (G7: 20 per batch, cap 50 —
  * `constants/MetadataExtractorConstants.java:42-46`), sequential across
  * batches, parallel-safe within one (each table's mirror is independent).
  */
object LakeViewSync {

  final case class SyncConfig(
      basePaths: Seq[TableDiscovery.BasePath],
      excludePatterns: Seq[String] = Nil,
      mirrorRoot: String,
      checkpointDir: String,
      maxBatchSize: Int = 20,
      tableBatchSize: Int = 20,
      strategy: UploadStrategy = UploadStrategy.BlockOnIncompleteCommit)

  final case class SyncReport(
      tablesDiscovered: Long,
      tablesSynced: Long,
      filesMirrored: Long,
      allSucceeded: Boolean)

  /** ONCE mode (reference JobRunMode.ONCE). */
  def runOnce(spark: SparkSession, config: SyncConfig): SyncReport = {
    val conf = spark.sparkContext.hadoopConfiguration
    val tables: Seq[HudiTable] =
      TableDiscovery.discover(spark, config.basePaths, config.excludePatterns)
        .collect().toSeq.sortBy(_.absoluteTableUri)

    val tableBatch = math.min(config.tableBatchSize, 50)
    var files = 0L
    var ok = 0L
    tables.grouped(tableBatch).foreach { batch =>
      batch.foreach { table =>
        try {
          val props = HoodiePropertiesReader.read(conf,
            s"${table.absoluteTableUri}/.hoodie/hoodie.properties")
          if (props.failureReason == null) {
            val r = TimelineMirror.mirrorTable(spark, table, props,
              config.mirrorRoot, config.checkpointDir,
              config.maxBatchSize, config.strategy)
            files += r.filesMirrored
            ok += 1
          }
        } catch {
          // failure isolates the table, not the run (T7,
          // MetadataExtractorUtils.java:12-30)
          case e: Throwable =>
            System.err.println(s"[lakeview-sync] ${table.absoluteTableUri} failed: ${e.getMessage}")
        }
      }
    }
    SyncReport(tables.size, ok, files, allSucceeded = ok == tables.size)
  }
}
