package graft.streaming

import org.apache.spark.sql.Column
import org.apache.spark.sql.{functions => F}

/** The fluent Table-API group-window builders (reference
  * flink-table-api-java/.../api/Tumble.java:36 `Tumble.over("10.minutes")
  * .on("rowtime").as("w")`, Slide.java:38, Session.java:36), mapped
  * onto Spark's native window machinery: Tumble/Slide →
  * `functions.window` (tumbling/sliding), Session →
  * `functions.session_window`. The `.as` alias becomes the window
  * struct column's name, so the reference's window properties
  * `w.start` / `w.end` resolve as plain struct fields through the
  * expression DSL.
  *
  * Durations take the Flink interval-literal spelling ("10.minutes",
  * "1.hours") or a plain Spark duration string ("10 minutes").
  */
object GroupWindows {

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"Table API: $msg")

  private val units = Map(
    "milli" -> "milliseconds", "millis" -> "milliseconds",
    "second" -> "seconds", "seconds" -> "seconds",
    "minute" -> "minutes", "minutes" -> "minutes",
    "hour" -> "hours", "hours" -> "hours",
    "day" -> "days", "days" -> "days")

  /** "10.minutes" | "10 minutes" → Spark duration string. */
  private[streaming] def duration(s: String): String = {
    val t = s.trim
    t.split("""[.\s]+""") match {
      case Array(n, u) if n.forall(_.isDigit) && units.contains(u.toLowerCase) =>
        s"$n ${units(u.toLowerCase)}"
      case _ => fail(s"cannot parse duration '$s' (expected e.g. 10.minutes)")
    }
  }

  sealed trait GroupWindow {
    def alias: String
    def timeField: String
    /** The grouping Column, aliased so w.start/w.end resolve. */
    def groupColumn: Column
  }

  final case class TumbleWindow(size: String, timeField: String,
                                alias: String) extends GroupWindow {
    def groupColumn: Column =
      F.window(F.col(timeField), duration(size)).as(alias)
  }

  final case class SlideWindow(size: String, step: String, timeField: String,
                               alias: String) extends GroupWindow {
    def groupColumn: Column =
      F.window(F.col(timeField), duration(size), duration(step)).as(alias)
  }

  final case class SessionWindow(gap: String, timeField: String,
                                 alias: String) extends GroupWindow {
    def groupColumn: Column =
      F.session_window(F.col(timeField), duration(gap)).as(alias)
  }

  /** Reference Tumble.java:36. */
  object Tumble {
    def over(size: String): TumbleOver = new TumbleOver(size)
  }
  final class TumbleOver(size: String) {
    def on(field: String): TumbleOn = new TumbleOn(size, field)
  }
  final class TumbleOn(size: String, field: String) {
    def as(alias: String): TumbleWindow = TumbleWindow(size, field, alias)
  }

  /** Reference Slide.java:38 — over = window size, every = slide. */
  object Slide {
    def over(size: String): SlideOver = new SlideOver(size)
  }
  final class SlideOver(size: String) {
    def every(step: String): SlideEvery = new SlideEvery(size, step)
  }
  final class SlideEvery(size: String, step: String) {
    def on(field: String): SlideOn = new SlideOn(size, step, field)
  }
  final class SlideOn(size: String, step: String, field: String) {
    def as(alias: String): SlideWindow = SlideWindow(size, step, field, alias)
  }

  /** Reference Session.java:36. */
  object Session {
    def withGap(gap: String): SessionGap = new SessionGap(gap)
  }
  final class SessionGap(gap: String) {
    def on(field: String): SessionOn = new SessionOn(gap, field)
  }
  final class SessionOn(gap: String, field: String) {
    def as(alias: String): SessionWindow = SessionWindow(gap, field, alias)
  }
}
