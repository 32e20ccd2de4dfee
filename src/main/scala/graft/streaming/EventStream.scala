package graft.streaming

import java.sql.Timestamp
import java.time.Instant

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming form of the event analytics: sessionization over an unbounded
  * event stream with the same inactivity-gap semantics as the batch
  * `evt_sessionize` query — including under late and out-of-order arrival.
  *
  * Correctness model: a session is only emitted once the watermark passes
  * `session_end + gap`, because until then an in-horizon event could still
  * extend it or merge it with a later session. Events inside the watermark
  * horizon buffer in per-user state (sorted on event time in MICROSECONDS,
  * matching the batch rule's `unix_micros` comparisons); events at or below
  * the watermark are dropped — the standard streaming contract, so batch
  * parity holds exactly for all data within the horizon.
  *
  * State design for 100 TB streams: keyed by `user_id` (high cardinality —
  * state shards across the cluster), each key buffers only the events of
  * its not-yet-emitted sessions, and the watermark bounds that window, so
  * the store scales with *recently active users x horizon*, not stream
  * age. `EventTimeTimeout` fires when the watermark passes the last
  * buffered event's gap horizon, flushing idle users' sessions and
  * removing their state entirely.
  */
object EventStream {

  /** One event on the stream (mirrors the `events` table's core columns). */
  final case class Event(userId: Long, eventType: String, value: Double, ts: Timestamp)

  /** Buffered not-yet-emitted events: parallel epoch-micros / value seqs
    * (primitive Seqs serialize tighter than nested Products). Public — the
    * state encoder's deserializer cannot call a private constructor.
    */
  final case class Pending(tsUs: Seq[Long], values: Seq[Double])

  /** A closed session: emitted exactly once, when the watermark passes its
    * gap horizon.
    */
  final case class ClosedSession(
      userId: Long, sessionStart: Timestamp, sessionEnd: Timestamp,
      nEvents: Long, totalValue: Double)

  private def toUs(t: Timestamp): Long = {
    val i = t.toInstant
    i.getEpochSecond * 1000000L + i.getNano / 1000L
  }

  private def fromUs(us: Long): Timestamp =
    Timestamp.from(Instant.ofEpochSecond(
      Math.floorDiv(us, 1000000L), Math.floorMod(us, 1000000L) * 1000L))

  /** Sessionize by inactivity gap (default 30 minutes, the batch rule). */
  def sessionize(
      events: Dataset[Event],
      gapMinutes: Int = 30,
      watermarkDelay: String = "1 hour"): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    val gapUs = gapMinutes * 60L * 1000000L
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.userId)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (userId: Long, it: Iterator[Event], state: GroupState[Pending]) => {
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val prev = state.getOption
            .map(p => p.tsUs.zip(p.values)).getOrElse(Seq.empty)
          // too-late rows (at/below the watermark) are dropped, like every
          // watermarked operator; buffered rows predate the cutoff by
          // construction and are kept until their session emits
          val fresh = it.map(e => (toUs(e.ts), e.value)).filter(_._1 > wmUs)
          val all = (prev ++ fresh).sortBy(identity)
          if (all.isEmpty) {
            if (state.exists) state.remove()
            Iterator.empty
          } else {
            // walk the sorted buffer applying the batch gap rule
            val sessions = Seq.newBuilder[(Long, Long, Long, Double)]
            var (start, last, n, sum) = (all.head._1, all.head._1, 1L, all.head._2)
            all.tail.foreach { case (t, v) =>
              if (t - last <= gapUs) { last = t; n += 1; sum += v }
              else { sessions += ((start, last, n, sum)); start = t; last = t; n = 1; sum = v }
            }
            sessions += ((start, last, n, sum))
            // a session is final once no in-horizon event can touch it
            val (closed, open) = sessions.result().partition(_._2 + gapUs <= wmUs)
            if (open.isEmpty) state.remove()
            else {
              val cutoff = open.head._1 // first unemitted session's start
              val keep = all.filter(_._1 >= cutoff)
              state.update(Pending(keep.map(_._1), keep.map(_._2)))
              // fire once the watermark passes the last event's gap horizon
              state.setTimeoutTimestamp((all.last._1 + gapUs) / 1000L + 1L)
            }
            closed.iterator.map { case (s, e, cnt, v) =>
              ClosedSession(userId, fromUs(s), fromUs(e), cnt, v)
            }
          }
        })
  }
}
