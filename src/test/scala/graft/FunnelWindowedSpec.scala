package graft

import org.scalatest.funsuite.AnyFunSuite

/** evt_funnel_windowed semantics: strict step ordering, per-step windows
  * (click within 3 days of first view, purchase within 7 days of that
  * click), exact conversion micro-ratios and mean step latencies.
  */
class FunnelWindowedSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("windows and ordering decide conversion; ratios and latencies exact") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("funnelw").toString
    val rows = Seq(
      // u1: full funnel, click +1h, purchase +2h after click
      (1L, "view", ts("2024-01-01 00:00:00")),
      (1L, "click", ts("2024-01-01 01:00:00")),
      (1L, "purchase", ts("2024-01-01 03:00:00")),
      // u2: click OUTSIDE the 3-day window -> stops at view
      (2L, "view", ts("2024-01-01 00:00:00")),
      (2L, "click", ts("2024-01-05 00:00:00")),
      (2L, "purchase", ts("2024-01-05 01:00:00")),
      // u3: click BEFORE the first view -> ordering rejects it
      (3L, "click", ts("2024-01-01 00:00:00")),
      (3L, "view", ts("2024-01-02 00:00:00")),
      // u4: view + in-window click, purchase outside 7 days of the click
      (4L, "view", ts("2024-01-01 00:00:00")),
      (4L, "click", ts("2024-01-02 00:00:00")),
      (4L, "purchase", ts("2024-01-10 00:00:01")))
    rows.toDF("user_id", "event_type", "ts")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")

    val got = SparkEntry.queries("evt_funnel_windowed")(spark, tmp)
      .collect()
      .map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3)))
    graft.CacheTracker.releaseAll()

    // views: u1 u2 u3 u4; clicks in window: u1 (+1h), u4 (+1d); purchases
    // in window: u1 only (+2h after click)
    assert(got(0) == (("1_view", 4L, -1L, -1L)), s"got ${got.toSeq}")
    // conv 2/4 = 500000; mean click latency = (3600 + 86400) / 2 = 45000 s
    assert(got(1) == (("2_click", 2L, 500000L, 45000L)), s"got ${got.toSeq}")
    // conv 1/2 = 500000; purchase latency 7200 s
    assert(got(2) == (("3_purchase", 1L, 500000L, 7200L)), s"got ${got.toSeq}")
  }
}
