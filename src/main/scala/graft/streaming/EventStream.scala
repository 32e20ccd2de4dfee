package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming form of the event analytics: sessionization over an unbounded
  * event stream with the same 30-minute inactivity-gap semantics as the
  * batch `evt_sessionize` query.
  *
  * State design for 100 TB streams: sessions are keyed by `user_id` (high
  * cardinality — state shards across the cluster on the group key), each
  * key holds exactly ONE open session (constant bytes per user), and
  * `EventTimeTimeout` closes idle sessions as the watermark passes their
  * gap horizon, so the store is bounded by *concurrently active users*, not
  * stream age. Emission is append-mode: a session row is output exactly
  * once, when the gap (in-batch or via timeout) closes it.
  */
object EventStream {

  /** One event on the stream (mirrors the `events` table's core columns). */
  final case class Event(userId: Long, eventType: String, value: Double, ts: Timestamp)

  /** Open-session state: epoch-millis bounds + running aggregates. Public
    * primitive fields — the state encoder's generated deserializer cannot
    * call a private constructor.
    */
  final case class SessionState(start: Long, last: Long, n: Long, sum: Double)

  /** A closed session: emitted once, when the inactivity gap ends it. */
  final case class ClosedSession(
      userId: Long, sessionStart: Timestamp, sessionEnd: Timestamp,
      nEvents: Long, totalValue: Double)

  /** Sessionize by inactivity gap. Within a micro-batch a user's events are
    * processed in event-time order (the iterator has no cross-batch order
    * guarantee otherwise); sessions that close inside the batch emit
    * immediately, the still-open tail is parked in state with a timeout at
    * `last + gap` so the watermark's advance closes it with no further
    * traffic on the key.
    */
  def sessionize(
      events: Dataset[Event],
      gapMinutes: Int = 30,
      watermarkDelay: String = "1 hour"): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60000L
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.userId)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (userId: Long, it: Iterator[Event], state: GroupState[SessionState]) => {
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(ClosedSession(userId,
              new Timestamp(s.start), new Timestamp(s.last), s.n, s.sum))
          } else {
            val closed = Seq.newBuilder[ClosedSession]
            var cur = state.getOption
            it.toSeq.sortBy(_.ts.getTime).foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.last <= gapMs =>
                  cur = Some(SessionState(s.start, math.max(s.last, t), s.n + 1, s.sum + e.value))
                case Some(s) =>
                  closed += ClosedSession(userId,
                    new Timestamp(s.start), new Timestamp(s.last), s.n, s.sum)
                  cur = Some(SessionState(t, t, 1L, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1L, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last + gapMs)
            }
            closed.result().iterator
          }
        })
  }
}
