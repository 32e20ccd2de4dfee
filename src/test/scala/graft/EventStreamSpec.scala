package graft

import java.sql.Timestamp

import graft.streaming.EventStream
import graft.streaming.EventStream.Event
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Streaming sessionization: 30-minute-gap semantics identical to the batch
  * `evt_sessionize` rule. Sessions emit exactly once, only after the
  * watermark passes their gap horizon (until then a late in-horizon event
  * could extend or merge them), and late out-of-order arrivals inside the
  * horizon land in the correct session.
  */
class EventStreamSpec extends AnyFunSuite {

  private def ev(u: Long, t: String, v: Double = 1.0) =
    Event(u, "click", v, Timestamp.valueOf(t))

  private def collectSessions(spark: org.apache.spark.sql.SparkSession, table: String) =
    spark.sql(s"SELECT userId, sessionStart, sessionEnd, nEvents, totalValue FROM $table" +
        " WHERE userId < 99 ORDER BY userId, sessionStart")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).toString,
        r.getTimestamp(2).toString, r.getLong(3), r.getDouble(4))).toSeq

  test("sessions emit only once the watermark passes their gap horizon") {
    val spark = SparkSpec.spark
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[Event]
    val q = EventStream.sessionize(ms.toDS())
      .writeStream.format("memory").queryName("sess").outputMode("append").start()
    try {
      // user 1: two events 10 min apart (one session), then a 40-min gap
      // (second session); user 2: one event
      ms.addData(
        ev(1, "2024-07-23 10:00:00", 2.0),
        ev(1, "2024-07-23 10:10:00", 3.0),
        ev(1, "2024-07-23 10:50:00", 5.0),
        ev(2, "2024-07-23 10:05:00", 7.0))
      q.processAllAvailable()
      // watermark still at 9:50 (max ts - 1h): nothing may emit yet
      assert(collectSessions(spark, "sess").isEmpty)

      // push the watermark past every session's horizon (13:00 after the
      // next batch): all three sessions emit exactly once
      ms.addData(ev(99, "2024-07-23 14:00:00"))
      q.processAllAvailable()
      ms.addData(ev(99, "2024-07-23 15:00:00"))
      q.processAllAvailable()
      assert(collectSessions(spark, "sess") == Seq(
        (1L, "2024-07-23 10:00:00.0", "2024-07-23 10:10:00.0", 2L, 5.0),
        (1L, "2024-07-23 10:50:00.0", "2024-07-23 10:50:00.0", 1L, 5.0),
        (2L, "2024-07-23 10:05:00.0", "2024-07-23 10:05:00.0", 1L, 7.0)))
    } finally q.stop()
  }

  test("late out-of-order arrivals match the batch evt_sessionize grouping") {
    val spark = SparkSpec.spark
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // 3 users x irregular gaps straddling 30 min
    val base = Timestamp.valueOf("2024-07-23 10:00:00").getTime
    val events = for {
      u <- 1L to 3L
      (mins, i) <- Seq(0, 10, 45, 50, 95).zipWithIndex
    } yield Event(u, "click", (u * 10 + i).toDouble, new Timestamp(base + mins * 60000L))

    // batch truth: the window-sum gap rule evt_sessionize uses
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
      // deliver OUT OF ORDER across micro-batches: minutes 45/50 first
      // (watermark after batch 1: 9:50), then the minute-0/10 events arrive
      // LATE but inside the horizon, together with minute-95
      val mid = events.filter(e => { val m = (e.ts.getTime - base) / 60000L; m == 45 || m == 50 })
      val rest = events.filterNot(mid.contains)
      ms.addData(mid: _*)
      q.processAllAvailable()
      ms.addData(rest: _*)
      q.processAllAvailable()
      // push the watermark far past every horizon to flush
      ms.addData(ev(99, "2024-07-24 10:00:00"))
      q.processAllAvailable()
      ms.addData(ev(99, "2024-07-25 10:00:00"))
      q.processAllAvailable()
      assert(collectSessions(spark, "sess2").toSet == truth)
    } finally q.stop()
  }

  test("stream-stream attribution joins conversions to in-window triggers only") {
    val spark = SparkSpec.spark
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val views = MemoryStream[Event]
    val buys = MemoryStream[Event]
    val q = EventStream.attribution(views.toDS(), buys.toDS(), windowMinutes = 30)
      .toDF("userId", "convTs", "trigTs", "value")
      .writeStream.format("memory").queryName("attr").outputMode("append").start()
    try {
      views.addData(
        ev(1, "2024-07-23 10:00:00"), // in window of the 10:20 buy
        ev(1, "2024-07-23 09:00:00"), // 80 min before: outside
        ev(2, "2024-07-23 10:05:00")) // other user's view
      buys.addData(
        Event(1, "buy", 50.0, Timestamp.valueOf("2024-07-23 10:20:00")),
        Event(3, "buy", 70.0, Timestamp.valueOf("2024-07-23 10:21:00"))) // no trigger
      q.processAllAvailable()
      // advance both watermarks so results flush
      views.addData(ev(98, "2024-07-24 12:00:00"))
      buys.addData(Event(98, "buy", 0.0, Timestamp.valueOf("2024-07-24 12:00:00")))
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT userId, trigTs, value FROM attr WHERE userId < 90 ORDER BY userId")
        .collect().map(r => (r.getLong(0), r.getTimestamp(1).toString, r.getDouble(2)))
      // exactly one attribution: user 1's buy -> the 10:00 view; the 09:00
      // view is out of window, user 2 never converts, user 3 has no trigger
      assert(rows.toSeq == Seq((1L, "2024-07-23 10:00:00.0", 50.0)))
    } finally q.stop()
  }

  test("windowed heavy hitters: MG candidates cover every key above 1/64 per window") {
    val spark = SparkSpec.spark
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[Event]
    val q = EventStream.heavyHitters(ms.toDS(), windowMinutes = 60)
      .writeStream.format("memory").queryName("hh").outputMode("append").start()
    try {
      val base = Timestamp.valueOf("2024-07-23 10:00:00").getTime
      // window 1 (10:00): user 7 dominates (200 of 328 events, far above
      // 1/64); 128 background singletons churn the counters
      val w1 = (1 to 200).map(i => Event(7L, "click", 1.0, new Timestamp(base + i * 100L))) ++
        (1 to 128).map(i => Event(1000L + i, "click", 1.0, new Timestamp(base + i * 200L)))
      // window 2 (11:00): user 9 dominates
      val b2 = base + 3600000L
      val w2 = (1 to 150).map(i => Event(9L, "click", 1.0, new Timestamp(b2 + i * 100L))) ++
        (1 to 64).map(i => Event(2000L + i, "click", 1.0, new Timestamp(b2 + i * 200L)))
      ms.addData(scala.util.Random.shuffle(w1 ++ w2): _*)
      q.processAllAvailable()
      // flush both windows past the watermark
      ms.addData(ev(99, "2024-07-24 14:00:00"))
      q.processAllAvailable()
      ms.addData(ev(99, "2024-07-24 15:00:00"))
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT window_start, candidates, n_events FROM hh ORDER BY window_start")
        .collect().map(r => (r.getTimestamp(0).toString,
          r.getSeq[String](1), r.getLong(2)))
      val byWindow = rows.map(r => r._1 -> r).toMap
      val (_, c1, n1) = byWindow("2024-07-23 10:00:00.0")
      val (_, c2, n2) = byWindow("2024-07-23 11:00:00.0")
      assert(n1 == 328 && n2 == 214)
      assert(c1.contains("7"), s"dominant user missing from window-1 candidates $c1")
      assert(c2.contains("9"), s"dominant user missing from window-2 candidates $c2")
      assert(c1.size <= 63 && c2.size <= 63, "candidate state exceeded MG capacity")
    } finally q.stop()
  }
}
