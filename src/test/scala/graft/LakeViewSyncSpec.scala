package graft

import java.nio.file.{Files, Paths}

import graft.jobs.LakeViewSync
import graft.operators.TableDiscovery
import org.scalatest.funsuite.AnyFunSuite

/** The library entry point end-to-end: discovery -> properties -> mirror for
  * a multi-table lake in one call, with per-table failure isolation.
  */
class LakeViewSyncSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark
  private val root = "target/tmp/sync-fixture"

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

  test("runOnce syncs every discovered table and reports the fold") {
    Seq(root, s"$root-mirror", s"$root-cp").foreach(rmTree)
    // two healthy tables
    for (t <- Seq("alpha", "beta")) {
      write(s"$root/db/$t/.hoodie/hoodie.properties",
        s"hoodie.table.name=$t\nhoodie.table.type=COPY_ON_WRITE\n")
      write(s"$root/db/$t/.hoodie/500.commit.requested")
      write(s"$root/db/$t/.hoodie/500.commit.inflight")
      write(s"$root/db/$t/.hoodie/500.commit")
    }
    val base = TableDiscovery.BasePath("lake", "db",
      s"file:///${Paths.get(root).toAbsolutePath.toString.stripPrefix("/")}/db")
    val cfg = LakeViewSync.SyncConfig(
      basePaths = Seq(base),
      mirrorRoot = s"$root-mirror",
      checkpointDir = s"$root-cp")

    val r1 = LakeViewSync.runOnce(spark, cfg)
    assert(r1.tablesDiscovered == 2 && r1.tablesSynced == 2 && r1.allSucceeded)
    // properties + 3-file group per table
    assert(r1.filesMirrored == 2 * 4)

    // second run: incremental no-op
    val r2 = LakeViewSync.runOnce(spark, cfg)
    assert(r2.filesMirrored == 0 && r2.allSucceeded)
  }
}
