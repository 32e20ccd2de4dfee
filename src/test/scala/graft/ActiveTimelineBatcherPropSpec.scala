package graft

import java.sql.Timestamp

import graft.model.{Checkpoint, FileEntry, UploadStrategy}
import graft.operators.ActiveTimelineBatcher
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based invariants of the greedy batcher over GENERATED timelines
  * (SURVEY §5 test plan item 2) — the example-based suite ports the
  * reference's ~25 corner cases; this one asserts the structural laws that
  * must hold on EVERY timeline:
  *
  *   - batch size never exceeds the max;
  *   - commit groups are atomic (no group spans two batches);
  *   - emitted files are a prefix of the whitelisted sorted input, in order,
  *     with nothing duplicated and non-whitelisted files never emitted;
  *   - the fill is greedy: a batch is only cut when the next group would
  *     overflow it;
  *   - blocking mode emits nothing at or after the first incomplete group;
  *   - non-blocking mode emits every complete group (except a deferred
  *     trailing remnant) and reports `min(incomplete ts) - 1` as the resume
  *     watermark.
  *
  * Uses raw ScalaCheck generators sampled over fixed seeds (the
  * scalatest-scalacheck bridge is not in the offline artifact cache), so
  * every run exercises the same 300 deterministic timelines.
  */
class ActiveTimelineBatcherPropSpec extends AnyFunSuite {

  private val Now = Timestamp.valueOf("2024-07-23 00:00:00")
  private def f(name: String) = FileEntry(name, Now, isDirectory = false)

  /** One generated commit group: its files plus whether it is complete. */
  private final case class TlGroup(ts: Long, files: Seq[String], complete: Boolean)

  /** Group shapes by type code — pure so group structure derives from a
    * plain Gen.listOfN of codes (G1/G2/G3 + incomplete variants).
    */
  private def mkGroup(ts: Long, code: Int): TlGroup = {
    val t = ts.toString
    code match {
      case 0 => TlGroup(ts, Seq(s"$t.commit.requested", s"$t.commit.inflight", s"$t.commit"), complete = true)
      case 1 => TlGroup(ts, Seq(s"$t.deltacommit.requested", s"$t.deltacommit.inflight", s"$t.deltacommit"), complete = true)
      case 2 => TlGroup(ts, Seq(s"$t.replacecommit.requested", s"$t.replacecommit.inflight", s"$t.replacecommit"), complete = true)
      case 3 => TlGroup(ts, Seq(s"$t.savepoint.inflight", s"$t.savepoint"), complete = true)
      case 4 => TlGroup(ts, Seq(s"$t.rollback.requested", s"$t.rollback.inflight", s"$t.rollback"), complete = true)
      case 5 => TlGroup(ts, Seq(s"$t.rollback.inflight", s"$t.rollback"), complete = true)
      case 6 => TlGroup(ts, Seq(s"$t.rollback"), complete = true)
      case 7 => TlGroup(ts, Seq(s"$t.commit.requested", s"$t.commit.inflight"), complete = false)
      case _ => TlGroup(ts, Seq(s"$t.deltacommit.requested", s"$t.deltacommit.inflight"), complete = false)
    }
  }

  /** A timeline: distinct-ts groups + optional hoodie.properties + noise
    * files from non-whitelisted actions that the filter must drop.
    */
  private val timelineGen: Gen[(Seq[TlGroup], Seq[FileEntry], Int)] = for {
    nGroups <- Gen.choose(0, 24)
    codes <- Gen.listOfN(nGroups, Gen.choose(0, 8))
    withProps <- Gen.oneOf(true, false)
    nNoise <- Gen.choose(0, 3)
    maxBatch <- Gen.choose(3, 7)
    shuffleSeed <- Gen.choose(0L, Long.MaxValue)
  } yield {
    val groups = codes.zipWithIndex.map { case (c, i) =>
      mkGroup(20240101000000L + i * 7L, c)
    }
    val noise = (0 until nNoise).map(i => f(s"2024010199999$i.auxaction"))
    val props = if (withProps) Seq(f("hoodie.properties")) else Nil
    val files = new scala.util.Random(shuffleSeed).shuffle(
      groups.flatMap(_.files).map(f) ++ props ++ noise)
    (groups, files, maxBatch)
  }

  private def cases: Iterator[(Seq[TlGroup], Seq[FileEntry], Int)] =
    (1 to 300).iterator.map(i =>
      timelineGen.pureApply(Gen.Parameters.default, Seed(i.toLong)))

  /** commitKey of an emitted filename (groups are keyed by leading ts). */
  private def key(name: String): String = name.split("\\.", 2)(0)

  private def run(files: Seq[FileEntry], maxBatch: Int, strategy: UploadStrategy) =
    ActiveTimelineBatcher.createBatches(files, maxBatch, Checkpoint.initial, strategy)

  test("batches respect the size cap and never split a commit group") {
    cases.foreach { case (_, files, maxBatch) =>
      for (strategy <- Seq(UploadStrategy.BlockOnIncompleteCommit,
        UploadStrategy.ContinueOnIncompleteCommit)) {
        val r = run(files, maxBatch, strategy)
        r.batches.foreach(b => assert(b.size <= maxBatch))
        val keyToBatch = scala.collection.mutable.Map.empty[String, Int]
        r.batches.zipWithIndex.foreach { case (b, bi) =>
          b.filterNot(_.filename == "hoodie.properties").foreach { file =>
            val k = key(file.filename)
            assert(keyToBatch.getOrElseUpdate(k, bi) == bi,
              s"group $k spans batches ${keyToBatch(k)} and $bi")
          }
        }
      }
    }
  }

  test("emitted files are an in-order, duplicate-free prefix of the whitelisted sorted input") {
    cases.foreach { case (_, files, maxBatch) =>
      val sortedNames = files.map(_.filename)
        .filter(n => n == "hoodie.properties" || !n.endsWith(".auxaction"))
        .sortBy(n => if (n == "hoodie.properties") "" else n)
      val emitted = run(files, maxBatch, UploadStrategy.BlockOnIncompleteCommit)
        .batches.flatten.map(_.filename)
      assert(emitted.distinct == emitted, "a file was emitted twice")
      assert(emitted == sortedNames.take(emitted.size),
        s"emission is not an in-order prefix:\n$emitted\nvs\n$sortedNames")
      assert(!emitted.exists(_.endsWith(".auxaction")),
        "a non-whitelisted file leaked through the filter")
    }
  }

  test("the fill is greedy: a batch is cut only when the next group would overflow it") {
    cases.foreach { case (_, files, maxBatch) =>
      val r = run(files, maxBatch, UploadStrategy.ContinueOnIncompleteCommit)
      r.batches.sliding(2).foreach {
        case Seq(b, next) =>
          val firstGroup = next.takeWhile(x => key(x.filename) == key(next.head.filename))
          assert(b.size + firstGroup.size > maxBatch,
            s"batch of ${b.size} was cut although the next group of ${firstGroup.size} fits")
        case _ => ()
      }
    }
  }

  test("blocking mode emits nothing at or after the first incomplete group") {
    cases.foreach { case (groups, files, maxBatch) =>
      val r = run(files, maxBatch, UploadStrategy.BlockOnIncompleteCommit)
      val emitted = r.batches.flatten.map(_.filename).toSet
      val firstIncomplete = groups.filterNot(_.complete).map(_.ts).sorted.headOption
      firstIncomplete.foreach { cut =>
        groups.filter(_.ts >= cut).foreach(g =>
          g.files.foreach(n => assert(!emitted.contains(n),
            s"$n is at/after the incomplete cut $cut but was emitted")))
      }
    }
  }

  test("non-blocking mode emits every complete group and watermarks min(incomplete ts) - 1") {
    cases.foreach { case (groups, files, maxBatch) =>
      val r = run(files, maxBatch, UploadStrategy.ContinueOnIncompleteCommit)
      val emitted = r.batches.flatten.map(_.filename).toSet
      groups.filterNot(_.complete).foreach(g =>
        g.files.foreach(n => assert(!emitted.contains(n), s"incomplete $n emitted")))
      // a TRAILING incomplete group is deferred by the trailing-edge rule
      // (it may still be mid-write), not watermarked — only incomplete
      // groups before the last group ever set the watermark
      val lastGroupTs = groups.map(_.ts).maxOption
      val expectedWatermark = groups.filterNot(_.complete).map(_.ts)
        .filterNot(lastGroupTs.contains).sorted.headOption
        .map(t => (t - 1).toString)
      assert(r.firstIncompleteCommitFile == expectedWatermark)
      // deferral only ever affects the trailing <3-file lookahead window
      // (which can span several 1-file groups): every file of a deferred
      // complete group must sit in the last two positions of the sorted
      // whitelisted input
      val sortedNames = files.map(_.filename)
        .filter(n => n == "hoodie.properties" || !n.endsWith(".auxaction"))
        .sortBy(n => if (n == "hoodie.properties") "" else n)
      val tail2 = sortedNames.takeRight(2).toSet
      val missingComplete = groups.filter(_.complete)
        .filter(g => !g.files.forall(emitted.contains))
      assert(missingComplete.forall(g => g.files.forall(tail2.contains)),
        s"a non-trailing complete group was not emitted: $missingComplete")
    }
  }
}
