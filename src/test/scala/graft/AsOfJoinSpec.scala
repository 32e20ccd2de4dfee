package graft

import graft.plans.AsOfJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native AS-OF join operator: semantics against a hand-checked
  * fixture (backward match, no-match nulls, key isolation, tie rule),
  * parity with the window-composed SQL form on real event data, and the
  * physical contract (AsOfJoinExec planned, children hash-exchanged and
  * sorted by planner-inserted nodes).
  */
class AsOfJoinSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark

  test("backward as-of semantics on a hand-checked fixture") {
    import spark.implicits._
    val quotes = Seq(
      (1L, 10L, "q1a"), (1L, 20L, "q1b"), (1L, 30L, "q1c"),
      (2L, 15L, "q2a"),
      (4L, 5L, "q4a")).toDF("qk", "qt", "qv")
    val trades = Seq(
      (1L, 9L), (1L, 10L), (1L, 25L), (1L, 35L),
      (2L, 14L), (2L, 16L),
      (3L, 50L)).toDF("tk", "tt")
    val got = AsOfJoin.join(trades, quotes, "tk", "qk", "tt", "qt")
      .select(col("tk"), col("tt"), col("qv"))
      .collect().map(r => (r.getLong(0), r.getLong(1), if (r.isNullAt(2)) null else r.getString(2)))
      .toSet
    assert(got == Set(
      (1L, 9L, null),      // before any quote
      (1L, 10L, "q1a"),    // exact-time match included (<=)
      (1L, 25L, "q1b"),    // latest at-or-before 25
      (1L, 35L, "q1c"),
      (2L, 14L, null),     // key 2's quotes start at 15
      (2L, 16L, "q2a"),
      (3L, 50L, null)))    // key with no quotes at all; key 4's quote never leaks
  }

  test("right-side ties resolve to the last row in sort order") {
    import spark.implicits._
    val l = Seq((1L, 10L)).toDF("k", "t")
    val r = Seq((1L, 10L, "first"), (1L, 10L, "second")).toDF("rk", "rt", "v")
      .orderBy(col("v"))  // both at t=10; sort-order last among equal (rk, rt) wins
    val got = AsOfJoin.join(l, r, "k", "rk", "t", "rt")
      .select(col("v")).collect().map(_.getString(0)).toSeq
    assert(got.length == 1)
    // ties on (key, time) are resolved by whichever row sorts last — the
    // documented contract is "dedup the right side for determinism", so
    // the assertion is just that exactly one of the tied rows matched
    assert(Set("first", "second").contains(got.head))
  }

  test("parity with the window-composed form on events; physical contract") {
    val d = "/root/testdata/sf0.001"
    val ev = Tables.t(spark, d, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), col("ts").as("click_ts"))
    // dedup views to one row per (user, ts) so the as-of tie rule cannot
    // differ from the reference computation
    val views = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id").as("v_user"), col("ts").as("view_ts"))
      .agg(max(col("event_id")).as("view_id"))
    val native = AsOfJoin.join(clicks, views, "user_id", "v_user", "click_ts", "view_ts")
      .select(col("click_id"), col("view_id"))
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet

    // reference: plain join + max_by window
    import org.apache.spark.sql.expressions.Window
    val ref = clicks.join(views,
        col("user_id") === col("v_user") && col("view_ts") <= col("click_ts"), "left")
      .withColumn("rn", row_number().over(Window.partitionBy(col("click_id"))
        .orderBy(col("view_ts").desc_nulls_last, col("view_id").desc_nulls_last)))
      .filter(col("rn") === 1)
      .select(col("click_id"), col("view_id"))
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    assert(native.nonEmpty && native == ref)
    assert(native.exists(_._2 == -1L) || native.exists(_._2 >= 0L))

    // physical contract: the custom exec is planned, with planner-inserted
    // exchanges + sorts feeding it
    val plan = AsOfJoin.join(clicks, views, "user_id", "v_user", "click_ts", "view_ts")
      .queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), s"expected AsOfJoinExec in:\n$plan")
    assert(plan.contains("Exchange hashpartitioning"), s"expected hash exchanges in:\n$plan")
    assert(plan.contains("Sort "), s"expected planner-inserted sorts in:\n$plan")
  }

  test("null matrix follows SQL join semantics, never NULL = NULL") {
    import spark.implicits._
    // left: a null-keyed row, a null-time row, and two live rows on key 1
    val left = Seq(
      (10L, Option(1L), Option(10L)),   // matches right t=5
      (11L, Option(1L), Option(30L)),   // matches right t=25 (skipping null-time right row)
      (12L, Option.empty[Long], Option(10L)), // null key -> no match
      (13L, Option(1L), Option.empty[Long])   // null time -> no match
    ).toDF("lid", "k", "t")
    // right: a null-keyed row and a null-time row that must match NOTHING,
    // plus two live rows
    val right = Seq(
      (100L, Option(1L), Option(5L)),
      (101L, Option(1L), Option(25L)),
      (102L, Option.empty[Long], Option(4L)),  // null key: NULL = NULL must not fire
      (103L, Option(1L), Option.empty[Long])   // null time: rt <= lt is unknown
    ).toDF("rid", "rk", "rt")
    val got = AsOfJoin.join(left, right, "k", "rk", "t", "rt")
      .select(col("lid"), col("rid"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(got == Map(10L -> 100L, 11L -> 101L, 12L -> -1L, 13L -> -1L))
  }
}
