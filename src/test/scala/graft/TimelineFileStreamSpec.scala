package graft

import java.nio.file.{Files, Paths}

import graft.streaming.TimelineStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Streaming ingestion from a real file source: instant events land as JSON
  * files (as a mirror job would emit them), `readStream` picks them up with
  * `Trigger.AvailableNow`, and the stateful commit-group operator emits
  * completions — the reference's CONTINUOUS mode (§2.8 T1) as Structured
  * Streaming over a file listing source.
  */
class TimelineFileStreamSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark
  private val dir = "target/tmp/stream-events"

  private def rmTree(d: String): Unit = {
    val r = Paths.get(d)
    if (Files.exists(r)) {
      import scala.jdk.CollectionConverters._
      Files.walk(r).iterator().asScala.toSeq.reverse.foreach(Files.delete)
    }
  }

  test("file-source ingestion drives the stateful group tracker") {
    import spark.implicits._
    rmTree(dir); rmTree(s"$dir-ckpt")
    Files.createDirectories(Paths.get(dir))

    def emit(name: String, rows: Seq[(String, String, String)]): Unit =
      Files.writeString(Paths.get(s"$dir/$name"), rows.map { case (t, f, ts) =>
        s"""{"tableId":"$t","filename":"$f","eventTime":"$ts"}"""
      }.mkString("\n"))

    // first batch of files: one complete group + one incomplete
    emit("b0.json", Seq(
      ("t1", "100.commit.requested", "2024-07-23 10:00:00"),
      ("t1", "100.commit.inflight", "2024-07-23 10:00:01"),
      ("t1", "100.commit", "2024-07-23 10:00:02"),
      ("t1", "200.deltacommit.requested", "2024-07-23 10:01:00")))

    val schema = "tableId STRING, filename STRING, eventTime TIMESTAMP"
    val outDir = s"$dir-out"
    rmTree(outDir)
    def runOnce(): Unit = {
      val events = spark.readStream.schema(schema).json(dir)
        .as[TimelineStream.InstantEvent]
      val q = TimelineStream.completedGroups(events)
        .writeStream.format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", s"$dir-ckpt")
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(60000)
    }
    def results(): Seq[String] =
      spark.read.parquet(outDir).select("ts").collect().map(_.getString(0)).sorted.toSeq

    runOnce()
    assert(results() == Seq("100"))

    // late files complete the 200 group; state survived via the checkpoint
    emit("b1.json", Seq(
      ("t1", "200.deltacommit.inflight", "2024-07-23 10:02:00"),
      ("t1", "200.deltacommit", "2024-07-23 10:03:00")))
    runOnce()
    assert(results() == Seq("100", "200"))
  }
}
