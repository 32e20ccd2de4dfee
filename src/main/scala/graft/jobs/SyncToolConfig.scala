package graft.jobs

import scala.jdk.CollectionConverters._

import graft.model.UploadStrategy
import graft.operators.TableDiscovery

/** Hudi sync-tool property parsing (SURVEY §3.2): builds a [[LakeViewSync
  * .SyncConfig]] from `hoodie.meta.sync.lakeview.*` typed properties, the
  * shape a Hudi writer passes to a meta-sync tool (reference
  * `lakeview-sync-tool/.../LakeviewSyncConfigHolder.java:17-100`):
  *
  * {{{
  * hoodie.meta.sync.lakeview.metadata_extractor.lakes.<lake>.databases.<db>.base_paths=<p1>,<p2>
  * hoodie.meta.sync.lakeview.metadata_extractor.path_exclusion_patterns=<r1>,<r2>
  * hoodie.meta.sync.lakeview.mirror_root=<uri>        (sink analogue of project/api-key)
  * hoodie.meta.sync.lakeview.checkpoint_dir=<uri>
  * hoodie.meta.sync.lakeview.upload_strategy=BLOCK_ON_INCOMPLETE_COMMIT
  * }}}
  *
  * Falls back to `hoodie.base.path` + `hoodie.table.name` as a single-table
  * parser config when no `lakes.` properties are present, mirroring how the
  * sync tool registers the table it was invoked on.
  */
object SyncToolConfig {

  private val Prefix = "hoodie.meta.sync.lakeview."
  private val LakesPrefix = Prefix + "metadata_extractor.lakes."
  private val LakesPattern = (java.util.regex.Pattern.quote(LakesPrefix) +
    """([^.]+)\.databases\.([^.]+)\.base_paths""").r

  private def csv(v: String): Seq[String] =
    Option(v).map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Nil)

  def fromProperties(props: java.util.Properties): LakeViewSync.SyncConfig = {
    val mirrorRoot = props.getProperty(Prefix + "mirror_root", "")
    val checkpointDir = props.getProperty(Prefix + "checkpoint_dir", "")
    val missing = Seq("mirror_root" -> mirrorRoot, "checkpoint_dir" -> checkpointDir)
      .collect { case (k, v) if v.isEmpty => Prefix + k }
    if (missing.nonEmpty)
      throw new IllegalArgumentException(s"Missing config params: ${missing.mkString(", ")}")

    val lakePaths = props.stringPropertyNames().asScala.toSeq.sorted.flatMap { key =>
      LakesPattern.findFirstMatchIn(key).toSeq.flatMap { m =>
        csv(props.getProperty(key)).map(p =>
          TableDiscovery.BasePath(m.group(1), m.group(2), p))
      }
    }
    val basePaths =
      if (lakePaths.nonEmpty) lakePaths
      else {
        // single-table registration: the table the sync tool was invoked on
        val basePath = props.getProperty("hoodie.base.path", "")
        if (basePath.isEmpty)
          throw new IllegalArgumentException(
            "Missing config params: hoodie.base.path (or lakes.* base_paths)")
        val db = props.getProperty("hoodie.database.name", "default")
        Seq(TableDiscovery.BasePath("default", db, basePath))
      }

    val strategy =
      props.getProperty(Prefix + "upload_strategy", "BLOCK_ON_INCOMPLETE_COMMIT") match {
        case "CONTINUE_ON_INCOMPLETE_COMMIT" => UploadStrategy.ContinueOnIncompleteCommit
        case _                               => UploadStrategy.BlockOnIncompleteCommit
      }

    LakeViewSync.SyncConfig(
      basePaths = basePaths,
      excludePatterns =
        csv(props.getProperty(Prefix + "metadata_extractor.path_exclusion_patterns")),
      mirrorRoot = mirrorRoot,
      checkpointDir = checkpointDir,
      strategy = strategy)
  }
}
