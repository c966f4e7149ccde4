package graft.streaming

import java.sql.Timestamp

/** Typed event row for the streaming operators (events table schema,
  * TESTDATA.md / FIXTURES.md). */
case class Event(
    event_id: Long,
    ts: Timestamp,
    user_id: Long,
    event_type: String,
    value: Double,
    props: String)

object Event {
  /** Exact microseconds since epoch. Timestamp.getTime truncates to
    * milliseconds; the sub-ms component lives in getNanos. */
  def micros(t: Timestamp): Long =
    t.getTime * 1000 + (t.getNanos / 1000) % 1000
}
