package graft.operators

import java.sql.Timestamp

import graft.model.{BatchResult, Checkpoint, FileEntry, UploadStrategy}
import org.apache.spark.sql.{Dataset, SparkSession}

/** Greedy, commit-atomic batching of active-timeline instants (SURVEY §2.6
  * G1-G6). Semantics match the reference
  * (`metadata_extractor/ActiveTimelineInstantBatcher.java:44-308`) exactly:
  *
  *   - instants are whitelisted (F4), sorted with `hoodie.properties` first
  *     then lexically (O1);
  *   - a *commit group* is 3 files (requested/inflight/completed, same ts),
  *     or 2 files for savepoint/pre-0.8 rollback (inflight/completed, same
  *     ts, same action), or a lone completed rollback (G1-G3);
  *   - groups are greedily packed into batches of at most `maxBatchSize`
  *     (min 3), never splitting a group (G4);
  *   - BLOCK_ON_INCOMPLETE_COMMIT stops at the first incomplete group;
  *     CONTINUE_ON_INCOMPLETE_COMMIT skips it and tracks
  *     `firstIncompleteCommitFile = min(incomplete ts) - 1` (G5), after
  *     pre-filtering to groups touched since the checkpoint timestamp.
  *
  * The greedy fill is order-dependent state, not expressible as a window
  * function, so the per-table core is a plain fold; distribution comes from
  * [[batchByTable]], which runs the fold once per table via
  * `groupByKey(...).flatMapGroups` — at 100 TB / 100k tables each group is a
  * single table's timeline listing (bounded, metadata-scale), so tasks stay
  * small and the work spreads across executors with no shuffle besides the
  * group-by-table exchange.
  */
object ActiveTimelineBatcher {

  private val HoodieProps = "hoodie.properties"
  private val Whitelist = graft.functions.InstantFunctions.WhitelistedActions.toSet

  final case class ParsedInstant(
      ts: String, completionTs: Option[String], action: String, state: String)

  /** Filename parse — reference ActiveTimelineInstantBatcher.java:267-297. */
  def parseInstant(filename: String): ParsedInstant = {
    val parts = filename.split("\\.", 3)
    val lead = parts(0)
    val (ts, completionTs) =
      if (lead.contains("_")) {
        val t = lead.split("_", 2)
        (t(0), Some(t(1)))
      } else (lead, None)
    val (action, state) =
      if (parts.length == 2 && parts(1) == "inflight") ("commit", "inflight")
      else (parts(1), if (parts.length == 3) parts(2) else "completed")
    ParsedInstant(ts, completionTs, action, state)
  }

  /** G1: complete 3-file commit group (same ts, all three states). */
  def areRelated(i1: ParsedInstant, i2: ParsedInstant, i3: ParsedInstant): Boolean =
    i1.ts == i2.ts && i2.ts == i3.ts &&
      Set(i1.state, i2.state, i3.state)
        .intersect(Set("inflight", "requested", "completed")).size == 3

  /** G2: 2-file savepoint / pre-0.8 rollback group. */
  def areRelatedSavepointOrRollback(i1: ParsedInstant, i2: ParsedInstant): Boolean =
    i1.ts == i2.ts &&
      Set(i1.state, i2.state).intersect(Set("inflight", "completed")).size == 2 &&
      i1.action == i2.action && Set("savepoint", "rollback").contains(i1.action)

  private def whitelisted(f: FileEntry): Boolean =
    f.filename == HoodieProps || Whitelist.contains(parseInstant(f.filename).action)

  /** O1 ordering: hoodie.properties first, then lexical filename. */
  private val fileOrdering: Ordering[FileEntry] = Ordering.by { f: FileEntry =>
    if (f.filename == HoodieProps) "" else f.filename
  }

  /** G6: commit-group key — leading ts token, completion suffix stripped. */
  private def commitKey(f: FileEntry): String = {
    val raw = f.filename.split("\\.", 3)(0)
    if (raw.contains("_")) raw.split("_")(0) else raw
  }

  private def sortAndFilter(instants: Seq[FileEntry]): Vector[FileEntry] =
    instants.filter(whitelisted).sorted(fileOrdering).toVector

  /** Non-blocking variant: additionally keep only commit groups where any
    * member was modified after the checkpoint timestamp (G5 pre-filter,
    * reference :199-218).
    */
  private def sortAndFilter(
      instants: Seq[FileEntry], lastModifiedFilter: Timestamp): Vector[FileEntry] =
    instants.filter(whitelisted)
      .groupBy(commitKey)
      .valuesIterator
      .filter(_.exists(f =>
        f.filename == HoodieProps || lastModifiedFilter.before(f.lastModifiedAt)))
      .flatten
      .toVector
      .sorted(fileOrdering)

  /** P9: BigInteger(ts) - 1 as string. */
  private def tsMinusOne(ts: String): String =
    new java.math.BigInteger(ts).subtract(java.math.BigInteger.ONE).toString

  /** The batching core — reference createBatches (:44-184), same traversal. */
  def createBatches(
      instants: Seq[FileEntry],
      maxBatchSize: Int,
      checkpoint: Checkpoint,
      strategy: UploadStrategy): BatchResult = {
    require(maxBatchSize >= 3, "max batch size cannot be less than 3")

    val nonBlocking = strategy == UploadStrategy.ContinueOnIncompleteCommit
    val sorted =
      if (nonBlocking) sortAndFilter(instants, checkpoint.checkpointTimestamp)
      else sortAndFilter(instants)

    val batches = Vector.newBuilder[Seq[FileEntry]]
    var currentBatch = Vector.empty[FileEntry]
    var firstIncomplete = Option(checkpoint.firstIncompleteCommitFile)
      .filter(_.nonEmpty)

    var index = 0
    if (sorted.nonEmpty && sorted(0).filename == HoodieProps) {
      currentBatch :+= sorted(0)
      index = 1
    }

    var stop = false
    while (!stop && index <= sorted.size - 2) {
      val i1 = parseInstant(sorted(index).filename)
      var groupSize = 3
      var related = false
      var stopIteration = false

      if (i1.action == "rollback") {
        if (index + 2 >= sorted.size) {
          // lone trailing rollback (complete or not): defer to the next run
          related = false
          stopIteration = true
        } else {
          val i2 = parseInstant(sorted(index + 1).filename)
          val i3 = parseInstant(sorted(index + 2).filename)
          related = areRelated(i1, i2, i3)
          if (!related) {
            related = areRelatedSavepointOrRollback(i1, i2)
            groupSize = 2
            if (!related && i1.state == "completed") {
              // completed rollback alone is valid — metrics don't depend on it
              groupSize = 1
              related = true
            }
          }
        }
      } else if (i1.action == "savepoint") {
        if (index + 1 >= sorted.size) {
          related = false
          stopIteration = true
        } else {
          related = areRelatedSavepointOrRollback(i1, parseInstant(sorted(index + 1).filename))
          groupSize = 2
        }
      } else {
        if (index + 2 >= sorted.size) {
          related = false
          stopIteration = true
        } else {
          related = areRelated(i1,
            parseInstant(sorted(index + 1).filename),
            parseInstant(sorted(index + 2).filename))
        }
      }

      if (related) {
        if (currentBatch.size + groupSize <= maxBatchSize) {
          currentBatch ++= sorted.slice(index, index + groupSize)
        } else {
          batches += currentBatch
          currentBatch = sorted.slice(index, index + groupSize)
        }
      } else if (!stopIteration) {
        if (nonBlocking) {
          // skip the incomplete group; remember min(incomplete ts) - 1
          val candidate = tsMinusOne(i1.ts)
          if (firstIncomplete.forall(candidate.compareTo(_) < 0))
            firstIncomplete = Some(candidate)
          groupSize = 1
        } else {
          stopIteration = true
        }
      }

      if (stopIteration) {
        if (currentBatch.nonEmpty) {
          batches += currentBatch
          currentBatch = Vector.empty
        }
        stop = true
      } else {
        index += groupSize
      }
    }

    if (currentBatch.nonEmpty) batches += currentBatch
    BatchResult(batches.result(), firstIncomplete)
  }

  /** A (tableId, batchId, position) assignment row — the distributed form. */
  final case class TableBatchAssignment(
      tableId: String,
      batchId: Int,
      posInBatch: Int,
      filename: String,
      lastModifiedAt: Timestamp)

  /** Distributed batching: one greedy fold per table, fanned out with
    * `flatMapGroups`. Input is (tableId, file) rows from the listing source;
    * output is deterministic batch assignments. Checkpoints are passed as a
    * small map (broadcast by the closure) keyed by tableId.
    */
  def batchByTable(
      files: Dataset[(String, FileEntry)],
      maxBatchSize: Int,
      checkpoints: Map[String, Checkpoint],
      strategy: UploadStrategy): Dataset[TableBatchAssignment] = {
    val spark: SparkSession = files.sparkSession
    import spark.implicits._
    files.groupByKey(_._1).flatMapGroups { (tableId, rows) =>
      val entries = rows.map(_._2).toVector
      val cp = checkpoints.getOrElse(tableId, Checkpoint.initial)
      val result = createBatches(entries, maxBatchSize, cp, strategy)
      for {
        (batch, bi) <- result.batches.zipWithIndex.iterator
        (f, pi) <- batch.zipWithIndex.iterator
      } yield TableBatchAssignment(tableId, bi, pi, f.filename, f.lastModifiedAt)
    }
  }
}
