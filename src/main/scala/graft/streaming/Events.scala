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
