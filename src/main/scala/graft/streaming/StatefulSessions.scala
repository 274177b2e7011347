package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom keyed streaming state via `flatMapGroupsWithState` —
  * SURVEY §2.10's arbitrary-state surface, complementing the
  * engine-managed forms (session_window in IngestQueries, the
  * bucketed CoW store in BucketStateStore): here the per-key state
  * transition is USER CODE, the shape for logic the built-in
  * windows can't express (conditional session splits, per-key
  * machine states, capped sessions).
  *
  * The demonstration logic is gap sessionization — deliberately the
  * same semantics as the session_window path (q39) and the batch
  * oracle, so the custom-state implementation is hash-verifiable
  * against both.
  *
  * Mechanics: state per user is the one OPEN session (start, last,
  * n). A batch's events (sorted in event-time within the batch)
  * extend or close it; closed sessions emit immediately, and the
  * open tail registers an event-time timeout at `last + gap`, so
  * the watermark — not stream end — flushes it. Late events older
  * than the open session would merge wrongly; the caller feeds
  * time-ordered batches (file chunks cut on time ranges in the
  * verification harness), which is also the contract
  * session_window's watermark imposes.
  *
  * Scale shape: one shuffle on the key; state is O(1) per live key
  * and evicted on timeout — 100 TB viability is bounded by live-key
  * cardinality exactly like the built-in session window.
  */
object StatefulSessions {

  case class SessionState(start: Long, last: Long, n: Long)
  case class ClosedSession(user_id: Long, start_micros: Long, n_events: Long)

  private def micros(t: java.sql.Timestamp): Long =
    (t.getTime / 1000L) * 1000000L + t.getNanos / 1000L

  /** `events` must be a (possibly streaming) Dataset of
    * (user_id, ts) with the watermark already applied upstream;
    * emits one row per CLOSED session (gap exceeded in-batch, or
    * event-time timeout past the watermark).
    *
    * The key is `Option[Long]` on purpose: watermark-advancing
    * sentinel rows (NULL key) must REACH this operator — a
    * `filter(isNotNull)` upstream gets pushed below the
    * EventTimeWatermark node by Catalyst, the sentinel never touches
    * the watermark, and the final timeout flush silently never fires
    * (observed: the last ~30 minutes of sessions missing). The None
    * group is drained here instead, holding no state and emitting
    * nothing — same trap and same resolution as the q39
    * session_window sentinel, which filters AFTER aggregation.
    */
  def sessionize(events: Dataset[(Option[Long], java.sql.Timestamp)],
      gapMicros: Long): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    events.groupByKey(_._1)
      .flatMapGroupsWithState[SessionState, ClosedSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Option[Long], rows: Iterator[(Option[Long], java.sql.Timestamp)],
            state: GroupState[SessionState]) =>
          user match {
            case None =>
              rows.foreach(_ => ()) // consume; sentinels carry no sessions
              Iterator.empty
            case Some(u) if state.hasTimedOut =>
              val s = state.get
              state.remove()
              Iterator.single(ClosedSession(u, s.start, s.n))
            case Some(u) =>
              val ts = rows.map(r => micros(r._2)).toArray.sorted
              var closed = List.empty[ClosedSession]
              var cur = state.getOption
              ts.foreach { t =>
                cur match {
                  case Some(s) if t - s.last <= gapMicros =>
                    cur = Some(SessionState(s.start, t, s.n + 1))
                  case Some(s) =>
                    closed ::= ClosedSession(u, s.start, s.n)
                    cur = Some(SessionState(t, t, 1))
                  case None =>
                    cur = Some(SessionState(t, t, 1))
                }
              }
              cur.foreach { s =>
                state.update(s)
                // flush when the watermark passes the session's gap edge
                state.setTimeoutTimestamp(s.last / 1000L + gapMicros / 1000L + 1L)
              }
              closed.reverseIterator
          }
      }
  }
}
