package graft.jobs

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.dataformat.yaml.YAMLFactory
import graft.model.UploadStrategy
import graft.operators.TableDiscovery

/** Versioned-YAML config loader (SURVEY §3.1 / S12). Accepts the reference's
  * ConfigV1 document shape (`config/ConfigLoader.java:27-116`, fixture
  * `validConfigV1S3Filesystem.yaml`): a `version: V1` marker,
  * `metadataExtractorConfig` with `parserConfig` lakes/databases/basePaths,
  * exclusion patterns, job-run mode, upload strategy, and cadence intervals.
  *
  * The reference's `onehouseClientConfig` credential block (which points the
  * uploader at its SaaS API) maps here to `sinkConfig`: where the mirror and
  * checkpoint stores live. The reference's credential-file splice —
  * `onehouseClientConfig.file` merging a second document — is preserved as
  * `sinkConfig.file`.
  */
object ConfigLoader {

  final case class Loaded(
      sync: LakeViewSync.SyncConfig,
      cadence: LakeViewSync.ContinuousConfig,
      jobRunMode: String,
      // sinkConfig.metricsPort: serve Prometheus exposition at /metrics
      // (reference Main starts its HTTPServer the same way)
      metricsPort: Option[Int] = None,
      // ONCE-mode shutdown linger so a scraper can collect the final state
      // (reference waitTimeBeforeShutdown = 120 s,
      // constants/MetadataExtractorConstants.java:40-41)
      shutdownLingerSeconds: Int = 120)

  def loadFile(path: String): Loaded =
    loadString(new String(Files.readAllBytes(Paths.get(path)), UTF_8))

  def loadString(yaml: String): Loaded = {
    val mapper = new ObjectMapper(new YAMLFactory())
    loadNode(mapper.readTree(yaml), mapper)
  }

  /** Parse an already-materialized config tree (used by [[ConfigRefresher]]
    * after merging base + override documents).
    */
  private[jobs] def loadNode(root: JsonNode, mapper: ObjectMapper): Loaded = {
    val version = text(root, "version")
    if (version != "V1")
      throw new UnsupportedOperationException(s"Unsupported config version: $version")

    // sinkConfig + optional file splice (reference ConfigLoader.java:47-70)
    var sink = root.path("sinkConfig")
    val spliceFile = sink.path("file").asText("")
    if (spliceFile.nonEmpty) {
      val spliced = mapper.readTree(
        new String(Files.readAllBytes(Paths.get(spliceFile)), UTF_8))
      val merged = sink.asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode].deepCopy()
      spliced.properties().asScala.foreach(e => merged.set[JsonNode](e.getKey, e.getValue))
      sink = merged
    }
    val mirrorRoot = sink.path("mirrorRoot").asText("")
    val checkpointDir = sink.path("checkpointDir").asText("")
    val missing = Seq(
      "mirrorRoot" -> mirrorRoot,
      "checkpointDir" -> checkpointDir).collect { case (k, v) if v.isEmpty => k }
    if (missing.nonEmpty)
      throw new IllegalArgumentException(s"Missing config params: ${missing.mkString(", ")}")

    val mec = root.path("metadataExtractorConfig")
    val basePaths = mec.path("parserConfig").elements().asScala.flatMap { pc =>
      val lake = text(pc, "lake")
      pc.path("databases").elements().asScala.flatMap { db =>
        val name = text(db, "name")
        db.path("basePaths").elements().asScala.map(bp =>
          TableDiscovery.BasePath(lake, name, bp.asText()))
      }
    }.toSeq
    if (basePaths.isEmpty)
      throw new IllegalArgumentException("parserConfig must declare at least one basePath")

    val exclusions = mec.path("pathExclusionPatterns").elements().asScala.map(_.asText()).toSeq
    val strategy = mec.path("uploadStrategy").asText("BLOCK_ON_INCOMPLETE_COMMIT") match {
      case "CONTINUE_ON_INCOMPLETE_COMMIT" => UploadStrategy.ContinueOnIncompleteCommit
      case _                               => UploadStrategy.BlockOnIncompleteCommit
    }
    val cadence = LakeViewSync.ContinuousConfig(
      discoveryIntervalMinutes = intOr(mec, "tableDiscoveryIntervalMinutes", 30),
      processPollSeconds = intOr(mec, "processTableMetadataSyncDurationSeconds", 30),
      uploadIntervalMinutes = intOr(mec, "tableMetadataUploadIntervalMinutes", 5))
    // positive-integer validation, reference ConfigLoader.java:96-116
    Seq(
      "tableDiscoveryIntervalMinutes" -> cadence.discoveryIntervalMinutes,
      "processTableMetadataSyncDurationSeconds" -> cadence.processPollSeconds,
      "tableMetadataUploadIntervalMinutes" -> cadence.uploadIntervalMinutes,
      "presignedUrlRequestBatchSizeActiveTimeline" ->
        intOr(mec, "presignedUrlRequestBatchSizeActiveTimeline", 20)
    ).foreach { case (k, v) =>
      if (v < 1) throw new IllegalArgumentException(s"$k should be a positive integer")
    }

    // §3.2 catalog chaining: sinkConfig.metastoreDatabase switches on the
    // post-sync SparkCatalogSync hook (the Glue/Hive-sync-tool analog)
    val metastore = sink.path("metastoreDatabase").asText("") match {
      case "" => None
      case db => Some(new SparkCatalogSync(db): MetastoreSync)
    }
    // fail loudly like the interval validation above: asInt() alone turns a
    // non-numeric or negative value into port 0 (ephemeral) silently
    val metricsPort = sink.path("metricsPort") match {
      case n if n.isMissingNode => None
      case n if !n.isIntegralNumber || n.asInt() < 0 || n.asInt() > 65535 =>
        throw new IllegalArgumentException(
          s"metricsPort should be an integer in 0..65535, got: ${n.asText()}")
      case n => Some(n.asInt())
    }

    Loaded(
      sync = LakeViewSync.SyncConfig(
        basePaths = basePaths,
        excludePatterns = exclusions,
        mirrorRoot = mirrorRoot,
        checkpointDir = checkpointDir,
        maxBatchSize = intOr(mec, "presignedUrlRequestBatchSizeActiveTimeline", 20),
        strategy = strategy,
        metastore = metastore),
      cadence = cadence,
      jobRunMode = mec.path("jobRunMode").asText("CONTINUOUS"),
      metricsPort = metricsPort,
      shutdownLingerSeconds = intOr(sink, "shutdownLingerSeconds", 120))
  }

  private def text(n: JsonNode, field: String): String = {
    val v = n.path(field).asText("")
    if (v.isEmpty) throw new IllegalArgumentException(s"Missing config params: $field")
    v
  }

  private def intOr(n: JsonNode, field: String, dflt: Int): Int =
    if (n.path(field).isMissingNode) dflt else n.path(field).asInt()
}
