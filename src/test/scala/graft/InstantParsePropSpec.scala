package graft

import graft.functions.InstantFunctions
import graft.operators.ActiveTimelineBatcher
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** The engine parses instant filenames twice — typed
  * (`ActiveTimelineBatcher.parseInstant`, driving the batching fold) and as
  * SQL columns (`InstantFunctions.instantTs/CompletionTs/Action/State`,
  * driving the analytics queries). A filename where the two disagree would
  * batch under one identity and report under another, so parity over
  * GENERATED filenames is itself the invariant: every (ts, optional V9
  * completion ts, action, state) combination the reference's layouts can
  * produce must parse identically on both paths.
  */
class InstantParsePropSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark

  private val filenameGen: Gen[String] = for {
    ts <- Gen.choose(10000000000000L, 99999999999999L)
    completion <- Gen.option(Gen.choose(10000000000000L, 99999999999999L))
    action <- Gen.oneOf("commit", "deltacommit", "replacecommit", "compaction",
      "rollback", "savepoint", "clean", "restore", "clustering", "logcompaction")
    state <- Gen.oneOf("", ".requested", ".inflight")
    bareInflight <- Gen.oneOf(true, false)
  } yield {
    val lead = completion.fold(ts.toString)(c => s"${ts}_$c")
    // bare "<ts>.inflight" (pre-0.8 inflight commit) has no action token
    if (bareInflight && state.isEmpty) s"$lead.inflight"
    else s"$lead.$action$state"
  }

  test("typed parseInstant and the SQL parse columns agree on generated filenames") {
    import spark.implicits._
    val names = (1 to 400).map(i =>
      filenameGen.pureApply(Gen.Parameters.default, Seed(i.toLong))).distinct
    val sql = names.toDF("filename")
      .select(
        $"filename",
        InstantFunctions.instantTs($"filename").as("ts"),
        InstantFunctions.instantCompletionTs($"filename").as("cts"),
        InstantFunctions.instantAction($"filename").as("action"),
        InstantFunctions.instantState($"filename").as("state"))
      .collect()
    sql.foreach { row =>
      val name = row.getString(0)
      val typed = ActiveTimelineBatcher.parseInstant(name)
      assert(typed.ts == row.getString(1), s"ts mismatch for $name")
      assert(typed.completionTs == Option(row.getString(2)), s"completionTs mismatch for $name")
      assert(typed.action == row.getString(3), s"action mismatch for $name")
      assert(typed.state == row.getString(4), s"state mismatch for $name")
    }
  }
}
