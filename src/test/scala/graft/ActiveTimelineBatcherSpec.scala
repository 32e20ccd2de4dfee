package graft

import java.sql.Timestamp
import java.time.LocalDate

import graft.model.{Checkpoint, FileEntry, UploadStrategy}
import graft.operators.ActiveTimelineBatcher
import org.scalatest.funsuite.AnyFunSuite

/** Ports every semantic case of the reference's
  * ActiveTimelineInstantBatcherTest.java (728 LoC, ~20 cases) against our
  * batching core. Expected batch contents are the reference's expectations.
  */
class ActiveTimelineBatcherSpec extends AnyFunSuite {

  private def ts(date: String): Timestamp =
    Timestamp.valueOf(LocalDate.parse(date).atStartOfDay())

  private def f(name: String, date: String = "2024-07-23"): FileEntry =
    FileEntry(name, ts(date), isDirectory = false)

  private val checkpoint = Checkpoint(0, ts("2024-07-22"), "12", null,
    archivedCommitsProcessed = true)

  private def blockingBatches(files: Seq[FileEntry], max: Int = 4): Seq[Seq[String]] =
    ActiveTimelineBatcher.createBatches(files, max, checkpoint,
      UploadStrategy.BlockOnIncompleteCommit).batches.map(_.map(_.filename))

  test("no commits: just hoodie.properties") {
    assert(blockingBatches(Seq(f("hoodie.properties"))) ==
      Seq(Seq("hoodie.properties")))
  }

  test("empty timeline") {
    assert(blockingBatches(Nil) == Nil)
  }

  test("single incomplete instant") {
    assert(blockingBatches(Seq(f("222.clean"))) == Nil)
  }

  test("incomplete initial commit") {
    val files = Seq(f("111.deltacommit.requested"), f("111.deltacommit.inflight"),
      f("hoodie.properties"))
    assert(blockingBatches(files) == Seq(Seq("hoodie.properties")))
  }

  test("exclusion of unknown actions and incomplete trailing rollback") {
    val files = Seq(
      "111.deltacommit.requested", "111.deltacommit.inflight", "333.clean",
      "111.deltacommit", "444.rollback.requested", "333.clean.requested",
      "222.unknown.inflight", "333.clean.inflight", "222.unknown.requested",
      "444.rollback.inflight", "222.unknown", "hoodie.properties").map(f(_))
    assert(blockingBatches(files) == Seq(
      Seq("hoodie.properties", "111.deltacommit", "111.deltacommit.inflight",
        "111.deltacommit.requested"),
      Seq("333.clean", "333.clean.inflight", "333.clean.requested")))
  }

  test("compaction commits (completed file has .commit action)") {
    val files = Seq(
      "111.deltacommit.requested", "111.deltacommit.inflight", "222.commit",
      "111.deltacommit", "333.rollback.requested", "222.compaction.requested",
      "222.compaction.inflight", "333.rollback.inflight", "hoodie.properties").map(f(_))
    assert(blockingBatches(files) == Seq(
      Seq("hoodie.properties", "111.deltacommit", "111.deltacommit.inflight",
        "111.deltacommit.requested"),
      Seq("222.commit", "222.compaction.inflight", "222.compaction.requested")))
  }

  test("savepoint 2-file groups") {
    val files = Seq(
      "111.deltacommit.requested", "111.deltacommit.inflight", "222.savepoint",
      "111.deltacommit", "333.rollback.requested", "222.savepoint.inflight",
      "333.rollback.inflight", "hoodie.properties").map(f(_))
    assert(blockingBatches(files) == Seq(
      Seq("hoodie.properties", "111.deltacommit", "111.deltacommit.inflight",
        "111.deltacommit.requested"),
      Seq("222.savepoint", "222.savepoint.inflight")))
  }

  test("multiple partial batches; 444 unknown and 333 incomplete excluded") {
    val files = Seq(
      "111.deltacommit.requested", "333.rollback.requested",
      "111.deltacommit.inflight", "222.clean", "111.deltacommit",
      "444.action4.inflight", "444.action4.requested", "222.clean.requested",
      "222.clean.inflight", "333.rollback.inflight", "hoodie.properties").map(f(_))
    assert(blockingBatches(files) == Seq(
      Seq("hoodie.properties", "111.deltacommit", "111.deltacommit.inflight",
        "111.deltacommit.requested"),
      Seq("222.clean", "222.clean.inflight", "222.clean.requested")))
  }

  test("bare .inflight file parses as commit/inflight") {
    val files = Seq(
      "111.commit.requested", "333.rollback.requested", "111.inflight",
      "222.clean", "111.commit", "444.action4.inflight",
      "444.action4.requested", "222.clean.requested", "222.clean.inflight",
      "333.rollback.inflight", "hoodie.properties").map(f(_))
    assert(blockingBatches(files) == Seq(
      Seq("hoodie.properties", "111.commit", "111.commit.requested", "111.inflight"),
      Seq("222.clean", "222.clean.inflight", "222.clean.requested")))
  }

  test("commit + savepoint mid-timeline + trailing rollback complete") {
    val files = Seq(
      "111.commit.requested", "555.rollback.requested", "111.inflight",
      "111.commit", "555.rollback", "444.savepoint.inflight", "444.savepoint",
      "555.rollback.inflight", "hoodie.properties").map(f(_))
    assert(blockingBatches(files) == Seq(
      Seq("hoodie.properties", "111.commit", "111.commit.requested", "111.inflight"),
      Seq("444.savepoint", "444.savepoint.inflight"),
      Seq("555.rollback", "555.rollback.inflight", "555.rollback.requested")))
  }

  test("trailing savepoint batch end") {
    val files = Seq(
      "111.commit.requested", "333.rollback.requested", "111.inflight",
      "111.commit", "333.rollback", "444.savepoint.inflight", "444.savepoint",
      "333.rollback.inflight", "hoodie.properties").map(f(_))
    assert(blockingBatches(files) == Seq(
      Seq("hoodie.properties", "111.commit", "111.commit.requested", "111.inflight"),
      Seq("333.rollback", "333.rollback.inflight", "333.rollback.requested"),
      Seq("444.savepoint", "444.savepoint.inflight")))
  }

  test("incomplete last action stops iteration (no hoodie.properties)") {
    val files = Seq(
      "555.commit.requested", "333.rollback.requested", "555.inflight",
      "555.commit", "666.replacecommit.inflight", "444.savepoint",
      "333.rollback", "333.rollback.inflight", "444.savepoint.inflight",
      "666.replacecommit.requested").map(f(_))
    assert(blockingBatches(files) == Seq(
      Seq("333.rollback", "333.rollback.inflight", "333.rollback.requested"),
      Seq("444.savepoint", "444.savepoint.inflight"),
      Seq("555.commit", "555.commit.requested", "555.inflight")))
  }

  test("completed rollback alone mid-timeline is a group of 1") {
    val files = Seq(
      "111.commit.requested", "222.rollback", "111.inflight", "333.clean",
      "111.commit", "444.action4.inflight", "444.action4.requested",
      "333.clean.requested", "333.clean.inflight", "hoodie.properties").map(f(_))
    assert(blockingBatches(files) == Seq(
      Seq("hoodie.properties", "111.commit", "111.commit.requested", "111.inflight"),
      Seq("222.rollback", "333.clean", "333.clean.inflight", "333.clean.requested")))
  }

  test("completed rollback alone at end is deferred") {
    val files = Seq(
      "111.commit.requested", "555.rollback", "111.inflight", "333.clean",
      "111.commit", "333.clean.requested", "333.clean.inflight",
      "hoodie.properties").map(f(_))
    assert(blockingBatches(files) == Seq(
      Seq("hoodie.properties", "111.commit", "111.commit.requested", "111.inflight"),
      Seq("333.clean", "333.clean.inflight", "333.clean.requested")))
  }

  test("incomplete rollback (requested+inflight) at end is excluded") {
    val files = Seq(
      "111.commit.requested", "111.inflight", "111.commit",
      "555.rollback.inflight", "555.rollback.requested", "hoodie.properties").map(f(_))
    assert(blockingBatches(files) == Seq(
      Seq("hoodie.properties", "111.commit", "111.commit.requested", "111.inflight")))
  }

  test("incomplete rollback (requested only) at end is excluded") {
    val files = Seq(
      "111.commit.requested", "111.inflight", "111.commit",
      "555.rollback.requested", "hoodie.properties").map(f(_))
    assert(blockingBatches(files) == Seq(
      Seq("hoodie.properties", "111.commit", "111.commit.requested", "111.inflight")))
  }

  test("rollback with just inflight pairs (fixture timeline)") {
    // Reference fixture timeline/active_timeline_with_rollback.txt:
    // 20 rollback (completed+inflight) pairs, then commit/clean triples.
    val rollbacks = (1111 to 1130).flatMap(i =>
      Seq(f(s"$i.rollback"), f(s"$i.rollback.inflight")))
    val commits = (1131 to 1182).flatMap { i =>
      if (i % 2 == 1) Seq(f(s"$i.commit"), f(s"$i.commit.requested"), f(s"$i.inflight"))
      else Seq(f(s"$i.clean"), f(s"$i.clean.inflight"), f(s"$i.clean.requested"))
    }
    val result = blockingBatches(rollbacks ++ commits, max = 20)
    // every file batched, none dropped
    assert(result.flatten.size == rollbacks.size + commits.size)
    // batches respect the max size and never split a group
    assert(result.forall(_.size <= 20))
    // rollback pairs stay adjacent: completed then inflight
    val first = result.head
    assert(first.take(2) == Seq("1111.rollback", "1111.rollback.inflight"))
  }

  test("V9 completed instants carry requestTs_completionTs") {
    val files = Seq(
      "20260204053206256.deltacommit.requested",
      "20260204053206256.deltacommit.inflight",
      "20260204053206256_20260204053210895.deltacommit",
      "20260204053205307.compaction.requested",
      "20260204053205307.compaction.inflight",
      "20260204053205307_20260204053222939.commit",
      "hoodie.properties").map(f(_))
    assert(blockingBatches(files) == Seq(
      Seq("hoodie.properties", "20260204053205307.compaction.inflight",
        "20260204053205307.compaction.requested",
        "20260204053205307_20260204053222939.commit"),
      Seq("20260204053206256.deltacommit.inflight",
        "20260204053206256.deltacommit.requested",
        "20260204053206256_20260204053210895.deltacommit")))
  }

  test("batch size below 3 is rejected") {
    assertThrows[IllegalArgumentException] {
      ActiveTimelineBatcher.createBatches(Nil, 2, checkpoint,
        UploadStrategy.BlockOnIncompleteCommit)
    }
  }

  // ---- non-blocking (CONTINUE_ON_INCOMPLETE_COMMIT) mode matrix ----

  private def nonBlocking(files: Seq[FileEntry], cp: Checkpoint) =
    ActiveTimelineBatcher.createBatches(files, 4, cp,
      UploadStrategy.ContinueOnIncompleteCommit)

  test("non-blocking: only properties when the single commit is incomplete") {
    val r = nonBlocking(Seq(f("111.deltacommit.requested"),
      f("111.deltacommit.inflight"), f("hoodie.properties")), checkpoint)
    assert(r.batches.map(_.map(_.filename)) == Seq(Seq("hoodie.properties")))
    assert(r.firstIncompleteCommitFile.isEmpty)
  }

  test("non-blocking: skips incomplete commit, records min(incomplete)-1") {
    val files = Seq(
      "111.deltacommit.requested", "111.deltacommit.inflight", "333.clean",
      "444.rollback.requested", "333.clean.requested", "222.unknown.inflight",
      "333.clean.inflight", "222.unknown.requested", "444.rollback.inflight",
      "222.unknown", "hoodie.properties").map(f(_))
    val r = nonBlocking(files, checkpoint)
    assert(r.batches.map(_.map(_.filename)) == Seq(
      Seq("hoodie.properties", "333.clean", "333.clean.inflight",
        "333.clean.requested")))
    assert(r.firstIncompleteCommitFile.contains("110"))
  }

  test("non-blocking: modified-time group pre-filter + existing watermark") {
    val files = Seq(
      f("111.deltacommit.requested"), f("111.deltacommit.inflight"),
      f("111.deltacommit"), f("333.clean"), f("444.rollback.requested"),
      f("333.clean.requested"), f("222.clean.inflight", "2024-07-21"),
      f("333.clean.inflight"), f("222.clean.requested", "2024-07-21"),
      f("444.rollback.inflight"), f("666.rollback.requested"),
      f("777.rollback.requested"), f("777.rollback.inflight"), f("777.rollback"))
    val cp = checkpoint.copy(firstIncompleteCommitFile = "500")
    val r = nonBlocking(files, cp)
    assert(r.batches.map(_.map(_.filename)) == Seq(
      Seq("111.deltacommit", "111.deltacommit.inflight", "111.deltacommit.requested"),
      Seq("333.clean", "333.clean.inflight", "333.clean.requested"),
      Seq("777.rollback", "777.rollback.inflight", "777.rollback.requested")))
    assert(r.firstIncompleteCommitFile.contains("443"))
  }

  // ---- parse unit checks (P1) ----

  test("instant parse corner cases") {
    import ActiveTimelineBatcher.{parseInstant, ParsedInstant}
    assert(parseInstant("111.commit.requested") ==
      ParsedInstant("111", None, "commit", "requested"))
    assert(parseInstant("111.inflight") ==
      ParsedInstant("111", None, "commit", "inflight"))
    assert(parseInstant("111.commit") ==
      ParsedInstant("111", None, "commit", "completed"))
    assert(parseInstant("20260204053206256_20260204053210895.deltacommit") ==
      ParsedInstant("20260204053206256", Some("20260204053210895"),
        "deltacommit", "completed"))
    assert(parseInstant("111.savepoint.inflight") ==
      ParsedInstant("111", None, "savepoint", "inflight"))
  }
}
