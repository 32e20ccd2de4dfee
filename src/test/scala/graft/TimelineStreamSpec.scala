package graft

import java.sql.Timestamp

import graft.streaming.TimelineStream
import graft.streaming.TimelineStream.InstantEvent
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Streaming semantics: commit groups complete across micro-batches exactly
  * per G1-G3 (3-file commit, 2-file savepoint/rollback, lone completed
  * rollback); incomplete groups hold state; windowed counts aggregate by
  * event time.
  */
class TimelineStreamSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark

  private def ev(table: String, name: String, t: String = "2024-07-23 10:00:00") =
    InstantEvent(table, name, Timestamp.valueOf(t))

  test("commit groups complete across micro-batches; state held while incomplete") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[InstantEvent]
    val q = TimelineStream.completedGroups(ms.toDS())
      .writeStream.format("memory").queryName("cg").outputMode("append").start()
    try {
      ms.addData(ev("t1", "100.commit.requested"), ev("t1", "100.commit.inflight"))
      q.processAllAvailable()
      assert(spark.sql("SELECT * FROM cg").count() == 0)

      // completing file arrives in a later micro-batch
      ms.addData(ev("t1", "100.commit", "2024-07-23 11:00:00"))
      q.processAllAvailable()
      val done = spark.sql("SELECT * FROM cg").collect()
      assert(done.length == 1)
      assert(done.head.getAs[String]("ts") == "100")
      assert(done.head.getAs[String]("action") == "commit")
      assert(done.head.getAs[Int]("groupSize") == 3)
      assert(done.head.getAs[Timestamp]("completedAt") ==
        Timestamp.valueOf("2024-07-23 11:00:00"))

      // lone completed rollback completes immediately (G3)
      ms.addData(ev("t1", "200.rollback"))
      // savepoint 2-file group (G2)
      ms.addData(ev("t2", "300.savepoint.inflight"), ev("t2", "300.savepoint"))
      q.processAllAvailable()
      val all = spark.sql("SELECT action, groupSize FROM cg ORDER BY action").collect()
      assert(all.map(r => (r.getString(0), r.getInt(1))).toSeq ==
        Seq(("commit", 3), ("rollback", 1), ("savepoint", 2)))
    } finally q.stop()
  }

  test("same-table different-ts groups are independent state keys") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[InstantEvent]
    val q = TimelineStream.completedGroups(ms.toDS())
      .writeStream.format("memory").queryName("cg2").outputMode("append").start()
    try {
      ms.addData(
        ev("t1", "400.deltacommit.requested"), ev("t1", "400.deltacommit.inflight"),
        ev("t1", "400.deltacommit"),
        ev("t1", "500.deltacommit.requested")) // incomplete
      q.processAllAvailable()
      val rows = spark.sql("SELECT ts FROM cg2").collect().map(_.getString(0)).toSeq
      assert(rows == Seq("400"))
    } finally q.stop()
  }

  test("windowed action counts aggregate by event time") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[InstantEvent]
    val q = TimelineStream.windowedActionCounts(ms.toDS())
      .writeStream.format("memory").queryName("wc").outputMode("complete").start()
    try {
      ms.addData(
        ev("t1", "100.commit", "2024-07-23 10:05:00"),
        ev("t1", "110.commit", "2024-07-23 10:55:00"),
        ev("t1", "120.deltacommit", "2024-07-23 11:05:00"))
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT window.start, action, n FROM wc ORDER BY 1, 2").collect()
      assert(rows.map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2))).toSeq == Seq(
        ("2024-07-23 10:00:00.0", "commit", 2L),
        ("2024-07-23 11:00:00.0", "deltacommit", 1L)))
    } finally q.stop()
  }
}
