package graft

import java.sql.Timestamp

import graft.streaming.EventStream
import graft.streaming.EventStream.Event
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Streaming sessionization: 30-minute-gap semantics identical to the batch
  * `evt_sessionize` query — sessions close either by a gap inside a
  * micro-batch or by the watermark passing an idle session's horizon, and
  * every closed session is emitted exactly once.
  */
class EventStreamSpec extends AnyFunSuite {

  private def ev(u: Long, t: String, v: Double = 1.0) =
    Event(u, "click", v, Timestamp.valueOf(t))

  test("gap inside a batch closes the earlier session; idle session closes via watermark") {
    val spark = SparkSpec.spark
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[Event]
    val q = EventStream.sessionize(ms.toDS())
      .writeStream.format("memory").queryName("sess").outputMode("append").start()
    try {
      // user 1: two events 10 min apart (one session), then a 40-min gap
      // (new session) — the gap closes session A inside the batch
      ms.addData(
        ev(1, "2024-07-23 10:00:00", 2.0),
        ev(1, "2024-07-23 10:10:00", 3.0),
        ev(1, "2024-07-23 10:50:00", 5.0),
        ev(2, "2024-07-23 10:05:00", 7.0))
      q.processAllAvailable()
      val afterBatch = spark.sql(
        "SELECT userId, sessionStart, sessionEnd, nEvents, totalValue FROM sess")
        .collect().map(r => (r.getLong(0), r.getTimestamp(1).toString,
          r.getTimestamp(2).toString, r.getLong(3), r.getDouble(4))).toSeq
      assert(afterBatch == Seq(
        (1L, "2024-07-23 10:00:00.0", "2024-07-23 10:10:00.0", 2L, 5.0)))

      // advance the watermark far past every open session's gap horizon:
      // user 1's second session and user 2's only session close by timeout
      ms.addData(ev(99, "2024-07-23 14:00:00"))
      q.processAllAvailable()
      ms.addData(ev(99, "2024-07-23 15:00:00"))
      q.processAllAvailable()
      val all = spark.sql(
        "SELECT userId, sessionStart, sessionEnd, nEvents, totalValue FROM sess WHERE userId < 99 ORDER BY userId, sessionStart")
        .collect().map(r => (r.getLong(0), r.getTimestamp(1).toString,
          r.getTimestamp(2).toString, r.getLong(3), r.getDouble(4))).toSeq
      assert(all == Seq(
        (1L, "2024-07-23 10:00:00.0", "2024-07-23 10:10:00.0", 2L, 5.0),
        (1L, "2024-07-23 10:50:00.0", "2024-07-23 10:50:00.0", 1L, 5.0),
        (2L, "2024-07-23 10:05:00.0", "2024-07-23 10:05:00.0", 1L, 7.0)))
    } finally q.stop()
  }

  test("streaming session boundaries match the batch evt_sessionize grouping") {
    val spark = SparkSpec.spark
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // deterministic event set: 3 users x irregular gaps straddling 30 min
    val base = Timestamp.valueOf("2024-07-23 10:00:00").getTime
    val events = for {
      u <- 1L to 3L
      (mins, i) <- Seq(0, 10, 45, 50, 95).zipWithIndex
    } yield Event(u, "click", (u * 10 + i).toDouble, new Timestamp(base + mins * 60000L))

    // batch truth: the same gap rule in the window-sum form evt_sessionize uses
    val truth = {
      events.toDF().createOrReplaceTempView("ev_batch")
      spark.sql(
        """WITH g AS (SELECT userId, ts, value,
          |  CASE WHEN lag(ts) OVER (PARTITION BY userId ORDER BY ts) IS NULL
          |    OR unix_micros(ts) - unix_micros(lag(ts) OVER (PARTITION BY userId ORDER BY ts)) > 30*60*1000000
          |  THEN 1 ELSE 0 END AS brk FROM ev_batch),
          |s AS (SELECT *, SUM(brk) OVER (PARTITION BY userId ORDER BY ts
          |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id FROM g)
          |SELECT userId, MIN(ts) AS sessionStart, MAX(ts) AS sessionEnd,
          |  COUNT(*) AS nEvents, SUM(value) AS totalValue
          |FROM s GROUP BY userId, session_id""".stripMargin)
        .collect().map(r => (r.getLong(0), r.getTimestamp(1).toString,
          r.getTimestamp(2).toString, r.getLong(3), r.getDouble(4))).toSet
    }

    val ms = MemoryStream[Event]
    val q = EventStream.sessionize(ms.toDS())
      .writeStream.format("memory").queryName("sess2").outputMode("append").start()
    try {
      ms.addData(events: _*)
      q.processAllAvailable()
      ms.addData(ev(99, "2024-07-24 10:00:00")) // watermark push
      q.processAllAvailable()
      ms.addData(ev(99, "2024-07-25 10:00:00"))
      q.processAllAvailable()
      val streamed = spark.sql(
        "SELECT userId, sessionStart, sessionEnd, nEvents, totalValue FROM sess2 WHERE userId < 99")
        .collect().map(r => (r.getLong(0), r.getTimestamp(1).toString,
          r.getTimestamp(2).toString, r.getLong(3), r.getDouble(4))).toSet
      assert(streamed == truth)
    } finally q.stop()
  }
}
