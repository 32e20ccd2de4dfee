package graft

import java.nio.file.{Files, Paths}

import graft.jobs.{ConfigLoader, LakeViewSync, SyncCli}
import graft.model.UploadStrategy
import org.scalatest.funsuite.AnyFunSuite

/** ConfigV1 YAML loading (S12/§3.1) + CLI parse rules, shaped after the
  * reference's `ConfigLoaderTest` fixtures and `CliParser` contract.
  */
class ConfigCliSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark
  private val root = "target/tmp/config-fixture"

  private def write(path: String, content: String = ""): Unit = {
    val p = Paths.get(path)
    Files.createDirectories(p.getParent)
    Files.writeString(p, content)
  }

  private def rmTree(dir: String): Unit = {
    val r = Paths.get(dir)
    if (Files.exists(r)) {
      import scala.jdk.CollectionConverters._
      Files.walk(r).iterator().asScala.toSeq.reverse.foreach(Files.delete)
    }
  }

  private def fixtureYaml(mirror: String, cp: String, dbUri: String): String =
    s"""version: V1
       |
       |sinkConfig:
       |  mirrorRoot: $mirror
       |  checkpointDir: $cp
       |
       |metadataExtractorConfig:
       |  jobRunMode: ONCE
       |  uploadStrategy: BLOCK_ON_INCOMPLETE_COMMIT
       |  tableDiscoveryIntervalMinutes: 30
       |  tableMetadataUploadIntervalMinutes: 5
       |  processTableMetadataSyncDurationSeconds: 30
       |  pathExclusionPatterns:
       |    - .*/excluded
       |  parserConfig:
       |    - lake: lake1
       |      databases:
       |        - name: database1
       |          basePaths:
       |            - $dbUri
       |""".stripMargin

  test("reference-shaped ConfigV1 YAML parses into a working runOnce") {
    Seq(root, s"$root-mirror", s"$root-cp").foreach(rmTree)
    write(s"$root/db/t1/.hoodie/hoodie.properties",
      "hoodie.table.name=t1\nhoodie.table.type=COPY_ON_WRITE\n")
    Seq("900.commit.requested", "900.commit.inflight", "900.commit")
      .foreach(f => write(s"$root/db/t1/.hoodie/$f"))
    // excluded subtree must be pruned by pathExclusionPatterns
    write(s"$root/db/excluded/.hoodie/hoodie.properties", "hoodie.table.name=no\n")
    val dbUri = s"file:///${Paths.get(root).toAbsolutePath.toString.stripPrefix("/")}/db"
    val loaded = ConfigLoader.loadString(
      fixtureYaml(s"$root-mirror", s"$root-cp", dbUri))
    assert(loaded.jobRunMode == "ONCE")
    assert(loaded.sync.strategy == UploadStrategy.BlockOnIncompleteCommit)
    assert(loaded.cadence == LakeViewSync.ContinuousConfig(30, 30, 5))
    assert(loaded.sync.basePaths ==
      Seq(graft.operators.TableDiscovery.BasePath("lake1", "database1", dbUri)))

    val r = LakeViewSync.runOnce(spark, loaded.sync)
    assert(r.tablesDiscovered == 1 && r.allSucceeded && r.filesMirrored == 4)
  }

  test("sinkConfig.file splices a second document (credential-splice analogue)") {
    rmTree(root)
    write(s"$root/sink.yaml", "mirrorRoot: /m\ncheckpointDir: /c\n")
    val yaml =
      s"""version: V1
         |sinkConfig:
         |  file: $root/sink.yaml
         |metadataExtractorConfig:
         |  parserConfig:
         |    - lake: l
         |      databases:
         |        - name: d
         |          basePaths: [ "file:///tmp/x" ]
         |""".stripMargin
    val loaded = ConfigLoader.loadString(yaml)
    assert(loaded.sync.mirrorRoot == "/m" && loaded.sync.checkpointDir == "/c")
    assert(loaded.jobRunMode == "CONTINUOUS") // reference default
  }

  test("validation: unsupported version, missing sink fields, non-positive intervals") {
    val ok = fixtureYaml("/m", "/c", "file:///tmp/x")
    intercept[UnsupportedOperationException] {
      ConfigLoader.loadString(ok.replace("version: V1", "version: V9"))
    }
    val e1 = intercept[IllegalArgumentException] {
      ConfigLoader.loadString(ok.replace("  mirrorRoot: /m\n", ""))
    }
    assert(e1.getMessage.contains("mirrorRoot"))
    val e2 = intercept[IllegalArgumentException] {
      ConfigLoader.loadString(
        ok.replace("tableDiscoveryIntervalMinutes: 30", "tableDiscoveryIntervalMinutes: 0"))
    }
    assert(e2.getMessage.contains("tableDiscoveryIntervalMinutes"))
    intercept[IllegalArgumentException] {
      ConfigLoader.loadString(ok.replace("            - file:///tmp/x\n", ""))
    }
  }

  test("CLI: -p/-c exclusive, -h, unknown options (CliParser contract)") {
    assert(SyncCli.parseArgs(Array("-p", "/x.yaml")) ==
      Right(SyncCli.CliArgs(configFilePath = Some("/x.yaml"))))
    assert(SyncCli.parseArgs(Array("--config", "version: V1")) ==
      Right(SyncCli.CliArgs(configYaml = Some("version: V1"))))
    assert(SyncCli.parseArgs(Array("-h")).exists(_.helpRequested))
    assert(SyncCli.parseArgs(Array("-p", "/x", "-c", "y")).isLeft)
    assert(SyncCli.parseArgs(Array("-z")).isLeft)
    assert(SyncCli.parseArgs(Array("-p")).isLeft)
  }
}
