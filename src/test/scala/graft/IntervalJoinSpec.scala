package graft

import graft.plans.IntervalJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native interval-join operator: hand-checked window semantics
  * (inclusive ends, empty/inverted windows, multi-row matches), SQL null
  * rules, result parity with the SMJ-composed declarative form on the
  * events fixture, and the physical contract (custom exec fed by
  * planner-inserted exchanges + sorts).
  */
class IntervalJoinSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark

  test("window semantics on a hand-checked fixture") {
    import spark.implicits._
    val l = Seq(
      (1L, 1L, 10L, 20L),  // matches r at 10, 15, 20 (inclusive both ends)
      (2L, 1L, 16L, 18L),  // no right row in window
      (3L, 1L, 30L, 25L),  // inverted window: empty
      (4L, 2L, 0L, 100L),  // whole group
      (5L, 3L, 0L, 100L)   // key with no right rows
    ).toDF("lid", "k", "lo", "hi")
    val r = Seq(
      (100L, 1L, 10L), (101L, 1L, 15L), (102L, 1L, 20L), (103L, 1L, 21L),
      (200L, 2L, 50L)
    ).toDF("rid", "rk", "t")
    val got = IntervalJoin.join(l, r, "k", "rk", "lo", "hi", "t")
      .select(col("lid"), col("rid"))
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(got == Set((1L, 100L), (1L, 101L), (1L, 102L), (4L, 200L)))
  }

  test("null keys, bounds and times match nothing") {
    import spark.implicits._
    val l = Seq(
      (1L, Option(1L), Option(0L), Option(100L)),
      (2L, Option.empty[Long], Option(0L), Option(100L)),  // null key
      (3L, Option(1L), Option.empty[Long], Option(100L)),  // null lo
      (4L, Option(1L), Option(0L), Option.empty[Long])     // null hi
    ).toDF("lid", "k", "lo", "hi")
    val r = Seq(
      (100L, Option(1L), Option(50L)),
      (101L, Option.empty[Long], Option(50L)),  // null key: never matches
      (102L, Option(1L), Option.empty[Long])    // null time: never matches
    ).toDF("rid", "rk", "t")
    val got = IntervalJoin.join(l, r, "k", "rk", "lo", "hi", "t")
      .select(col("lid"), col("rid"))
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(got == Set((1L, 100L)))
  }

  test("parity with the SMJ-composed range join on events; physical contract") {
    val e = Tables.t(spark, "/root/testdata/sf0.001", "events")
    val sess = e.filter(col("event_type") === "signup")
      .select(col("event_id").as("signup_id"), col("user_id"),
        col("ts").as("lo"), (col("ts") + expr("INTERVAL 7 DAYS")).as("hi"))
    val ev2 = e.select(col("event_id"), col("user_id").as("e_user"),
      col("ts").as("e_ts"))
    val native = IntervalJoin.join(sess, ev2, "user_id", "e_user", "lo", "hi", "e_ts")
      .select(col("signup_id"), col("event_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ref = sess.join(ev2,
        col("user_id") === col("e_user") &&
          col("e_ts") >= col("lo") && col("e_ts") <= col("hi"))
      .select(col("signup_id"), col("event_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(native.nonEmpty && native == ref)
    // left rows with several matches must fan out (the flatMap shape)
    assert(native.groupBy(_._1).exists(_._2.size > 1))

    val plan = IntervalJoin.join(sess, ev2, "user_id", "e_user", "lo", "hi", "e_ts")
      .queryExecution.executedPlan.toString
    assert(plan.contains("IntervalJoin"), s"expected IntervalJoinExec in:\n$plan")
    assert(plan.contains("Exchange hashpartitioning"), s"expected hash exchanges in:\n$plan")
    assert(plan.contains("Sort "), s"expected planner-inserted sorts in:\n$plan")
  }

  test("right key group over the configured cap fails with a clear message") {
    import spark.implicits._
    val l = Seq((1L, 1L, 0L, 100L)).toDF("lid", "k", "lo", "hi")
    val r = (0 until 50).map(i => (100L + i, 1L, i.toLong)).toDF("rid", "rk", "t")
    val key = graft.plans.IntervalJoinExec.MaxGroupRowsKey
    spark.conf.set(key, "10")
    try {
      val e = intercept[org.apache.spark.SparkException] {
        IntervalJoin.join(l, r, "k", "rk", "lo", "hi", "t").collect()
      }
      assert(e.getMessage.contains(key) || Option(e.getCause).exists(
        c => Option(c.getMessage).exists(_.contains(key))), e.getMessage)
    } finally spark.conf.unset(key)
    // and the default cap leaves the same shape working
    assert(IntervalJoin.join(l, r, "k", "rk", "lo", "hi", "t").count() == 50)
  }
}
