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

  /** Field table for the CEP MEASURES DSL (CepDsl.compileMeasures):
    * column name → (Spark type, projection) — the DSL analog of the
    * schema MATCH_RECOGNIZE resolves `A.field` references against. */
  val fieldTable: Map[String, (org.apache.spark.sql.types.DataType, Event => Any)] = {
    import org.apache.spark.sql.types._
    Map(
      "event_id"   -> (LongType,      (e: Event) => e.event_id),
      "ts"         -> (TimestampType, (e: Event) => e.ts),
      "user_id"    -> (LongType,      (e: Event) => e.user_id),
      "event_type" -> (StringType,    (e: Event) => e.event_type),
      "value"      -> (DoubleType,    (e: Event) => e.value),
      "props"      -> (StringType,    (e: Event) => e.props))
  }
}
