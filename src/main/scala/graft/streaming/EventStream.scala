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
  * extend it or merge it with a later session. Events at or below the
  * watermark are dropped — the standard streaming contract, so batch parity
  * holds exactly for all data within the horizon. All arithmetic is in
  * event-time MICROSECONDS, matching the batch rule's `unix_micros`.
  *
  * State design for 100 TB streams: adding an event can only EXTEND a
  * session or MERGE adjacent sessions — never split one (gaps only shrink) —
  * so per-user state needs just one `(start, last, n, sum)` summary atom per
  * not-yet-emitted session, never raw events. A key emitting events
  * continuously holds ONE atom regardless of rate or stream age; the atom
  * count is bounded by horizon/gap. Keys shard on `user_id` (high
  * cardinality), and `EventTimeTimeout` fires at the EARLIEST pending
  * session's gap horizon, so each session emits as soon as the watermark
  * proves it final, after which idle keys drop their state entirely.
  */
object EventStream {

  /** One event on the stream (mirrors the `events` table's core columns). */
  final case class Event(userId: Long, eventType: String, value: Double, ts: Timestamp)

  /** Pending session summaries, parallel by index and start-ordered:
    * `(starts(i), lasts(i), ns(i), sums(i))` is one not-yet-final session.
    * Primitive parallel Seqs serialize tighter than nested Products; public
    * — the state encoder's deserializer cannot call a private constructor.
    */
  final case class Pending(
      starts: Seq[Long], lasts: Seq[Long], ns: Seq[Long], sums: Seq[Double])

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
          val prev = state.getOption.map(p =>
            p.starts.indices.map(i => (p.starts(i), p.lasts(i), p.ns(i), p.sums(i))))
            .getOrElse(Seq.empty)
          // too-late rows (at/below the watermark) are dropped, like every
          // watermarked operator; each kept event becomes a 1-event atom
          val fresh = it.collect {
            case e if toUs(e.ts) > wmUs => val t = toUs(e.ts); (t, t, 1L, e.value)
          }.toSeq
          // fold start-sorted atoms, merging when the inter-atom gap closes.
          // Atom internal gaps are <= gapUs by construction, and a new event
          // inside an atom's span only shrinks internal gaps, so this
          // reproduces the batch rule exactly.
          val merged = Seq.newBuilder[(Long, Long, Long, Double)]
          (prev ++ fresh).sortBy(a => (a._1, a._2)) match {
            case Seq() =>
            case sorted =>
              var (s, l, n, v) = sorted.head
              sorted.tail.foreach { case (s2, l2, n2, v2) =>
                if (s2 - l <= gapUs) { l = math.max(l, l2); n += n2; v += v2 }
                else { merged += ((s, l, n, v)); s = s2; l = l2; n = n2; v = v2 }
              }
              merged += ((s, l, n, v))
          }
          // a session is final once no in-horizon event can touch it
          val (closed, open) = merged.result().partition(_._2 + gapUs <= wmUs)
          if (open.isEmpty) {
            if (state.exists) state.remove()
          } else {
            state.update(Pending(
              open.map(_._1), open.map(_._2), open.map(_._3), open.map(_._4)))
            // fire at the EARLIEST pending horizon so each session emits as
            // soon as the watermark proves it final
            state.setTimeoutTimestamp((open.head._2 + gapUs) / 1000L + 1L)
          }
          closed.iterator.map { case (cs, ce, cnt, cv) =>
            ClosedSession(userId, fromUs(cs), fromUs(ce), cnt, cv)
          }
        })
  }

  /** Stream-stream interval join: attribute each conversion to the same
    * user's preceding trigger within the attribution window — the streaming
    * twin of the batch as-of join (`evt_asof_last_click`), as a real
    * watermarked stream-stream join rather than stateful custom code.
    *
    * State bounds come from the two watermarks plus the interval condition:
    * Spark keeps a trigger row only while a joinable conversion could still
    * arrive (trigger_ts + window past the conversion watermark), so state
    * is rate × (delay + window) per side regardless of stream age, sharded
    * by the `userId` equi-key. Inner join: unattributed conversions drop;
    * a conversion matching several triggers in-window emits one row per
    * trigger (downstream picks max trigger ts for strict last-touch).
    */
  /** Per-window heavy-hitter candidates over an unbounded stream: the
    * mergeable Misra-Gries sketch ([[graft.functions.SketchAggregators
    * .MisraGries]]) runs as the windowed aggregate, so each window's state
    * is <= 63 counters NO MATTER the event rate — the abuse/drift monitor
    * ("is one user/key suddenly most of the traffic") that a raw
    * `groupBy(key)` cannot be at stream scale, because its state would be
    * keyed by the unbounded key space. The MG invariant carries over
    * partial merges: every key above 1/64 of the window's events is
    * GUARANTEED in its window's candidate list (spec-pinned against batch
    * exact counts). Append-mode: a window emits once, when the watermark
    * passes its end.
    */
  def heavyHitters(
      events: Dataset[Event],
      windowMinutes: Int = 60,
      watermarkDelay: String = "1 hour"): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    graft.functions.SketchAggregators.register(events.sparkSession)
    events.toDF()
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), s"$windowMinutes minutes"))
      .agg(expr("mg63(cast(userId as string))").as("candidates"),
        count(lit(1)).as("n_events"))
      .select(col("window.start").as("window_start"),
        col("candidates"), col("n_events"))
  }

  def attribution(
      triggers: Dataset[Event],
      conversions: Dataset[Event],
      windowMinutes: Int = 30,
      watermarkDelay: String = "1 hour"): Dataset[(Long, Timestamp, Timestamp, Double)] = {
    import triggers.sparkSession.implicits._
    import org.apache.spark.sql.functions._
    val t = triggers.toDF()
      .select(col("userId").as("t_user"), col("ts").as("t_ts"))
      .withWatermark("t_ts", watermarkDelay)
    val c = conversions.toDF()
      .select(col("userId").as("c_user"), col("ts").as("c_ts"), col("value"))
      .withWatermark("c_ts", watermarkDelay)
    c.join(t,
        col("c_user") === col("t_user") &&
          col("t_ts") <= col("c_ts") &&
          col("t_ts") >= col("c_ts") - expr(s"INTERVAL $windowMinutes MINUTES"))
      .select(col("c_user"), col("c_ts"), col("t_ts"), col("value"))
      .as[(Long, Timestamp, Timestamp, Double)]
  }
}
