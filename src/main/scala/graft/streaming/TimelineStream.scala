package graft.streaming

import java.sql.Timestamp

import graft.operators.ActiveTimelineBatcher
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming form of the timeline dataflow (SURVEY §2.8). The reference's
  * "continuous" mode is a fixed-rate scheduler re-listing object storage
  * (`TableDiscoveryAndUploadJob.java:63-79`); its Spark-native shape is
  * Structured Streaming: instant-file events flow through a watermarked
  * event-time window for trend analytics (T1), and a stateful
  * `flatMapGroupsWithState` tracks commit-group completion — the streaming
  * equivalent of the batcher's G1-G3 completeness rules, where an incomplete
  * group is exactly "late data not yet arrived" (T4).
  *
  * State is keyed (tableId, instant ts) — high cardinality, a few dozen
  * bytes per key, and dropped on emission — so state stores stay bounded at
  * 100k-table scale; the shuffle is the groupBy key exchange only.
  */
object TimelineStream {

  /** One observed instant file (the streaming row). */
  final case class InstantEvent(tableId: String, filename: String, eventTime: Timestamp)

  /** Per-(table, ts) accumulated state. */
  final case class GroupBuf(states: Seq[String], action: String, lastSeen: Timestamp)

  /** Emitted when a commit group reaches completeness (G1-G3). */
  final case class CompletedGroup(
      tableId: String, ts: String, action: String, groupSize: Int, completedAt: Timestamp)

  /** Event-time windowed action counts with a watermark — the Table Stats
    * trend query (§2.9) in streaming form.
    */
  def windowedActionCounts(
      events: Dataset[InstantEvent],
      windowLen: String = "1 hour",
      watermarkDelay: String = "2 hours"): DataFrame =
    events
      .withWatermark("eventTime", watermarkDelay)
      .groupBy(window(col("eventTime"), windowLen),
        graft.functions.InstantFunctions.instantAction(col("filename")).as("action"))
      .agg(count(lit(1)).as("n"))

  /** G1-G3 as streaming state: a group completes when its state set reaches
    *   - {requested, inflight, completed} (3-file commit group), or
    *   - {inflight, completed} for savepoint / pre-0.8 rollback, or
    *   - a lone completed rollback.
    * Emits once per group, then clears its state (bounded stores).
    */
  def completedGroups(events: Dataset[InstantEvent]): Dataset[CompletedGroup] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(e => (e.tableId, ActiveTimelineBatcher.parseInstant(e.filename).ts))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (key: (String, String), it: Iterator[InstantEvent], state: GroupState[GroupBuf]) => {
          val (tableId, ts) = key
          var buf = state.getOption.getOrElse(GroupBuf(Nil, null, new Timestamp(0L)))
          it.foreach { e =>
            val p = ActiveTimelineBatcher.parseInstant(e.filename)
            val action = if (buf.action == null || p.state == "completed") p.action else buf.action
            val t = if (e.eventTime.after(buf.lastSeen)) e.eventTime else buf.lastSeen
            buf = GroupBuf((buf.states :+ p.state).distinct, action, t)
          }
          val s = buf.states.toSet
          val complete =
            s == Set("requested", "inflight", "completed") ||
              (Set("savepoint", "rollback").contains(buf.action) &&
                s == Set("inflight", "completed")) ||
              (buf.action == "rollback" && s == Set("completed"))
          if (complete) {
            state.remove()
            Iterator.single(CompletedGroup(tableId, ts, buf.action, s.size, buf.lastSeen))
          } else {
            state.update(buf)
            Iterator.empty
          }
        })
  }
}
