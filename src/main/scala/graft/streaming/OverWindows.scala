package graft.streaming

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.{functions => F}

/** The fluent Table-API OVER-window builders (reference
  * flink-table-api-java/.../api/Over.java `Over.partitionBy("k")
  * .orderBy("rowtime").preceding("10.rows").as("w")`, OverWindow.java),
  * mapped onto Spark's `Window.partitionBy().orderBy()
  * .rowsBetween()/rangeBetween()` — the same machinery the batch OVER
  * family (q30–q34) rides, so a fluent spelling and a hand-written
  * WindowSpec produce the identical physical plan.
  *
  * Bound spellings follow the reference's string DSL: `"N.rows"` (a
  * row-count frame), `"N.minutes"`/`"N.hours"`/... (a time-range
  * frame), `"unbounded_row"`, `"unbounded_range"`, `"current_row"`,
  * `"current_range"`. Defaults mirror OverWindowPartitionedOrdered:
  * preceding = UNBOUNDED_RANGE, following = the preceding kind's
  * CURRENT bound. Time-range frames order by `unix_micros`, so the
  * frame boundary keeps the full microsecond precision of the data —
  * a millisecond-granularity key would silently include rows up to
  * 1 ms outside the interval.
  *
  * UNBOUNDED following is refused loudly: the reference's OverWindow
  * validation rejects it over streams, and the fluent surface keeps
  * one contract for both modes.
  */
object OverWindows {

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"Table API: $msg")

  sealed trait Bound { def isRows: Boolean }
  final case class Rows(n: Long) extends Bound { def isRows = true }
  final case class Millis(ms: Long) extends Bound { def isRows = false }
  case object UnboundedRow extends Bound { def isRows = true }
  case object UnboundedRange extends Bound { def isRows = false }
  case object CurrentRow extends Bound { def isRows = true }
  case object CurrentRange extends Bound { def isRows = false }

  private val msUnits = Map(
    "millis" -> 1L, "milli" -> 1L,
    "seconds" -> 1000L, "second" -> 1000L,
    "minutes" -> 60000L, "minute" -> 60000L,
    "hours" -> 3600000L, "hour" -> 3600000L,
    "days" -> 86400000L, "day" -> 86400000L)

  /** "3.rows" | "10.minutes" | "unbounded_row" | "current_range" ... */
  private[streaming] def bound(s: String): Bound = s.trim.toLowerCase match {
    case "unbounded_row"   => UnboundedRow
    case "unbounded_range" => UnboundedRange
    case "current_row"     => CurrentRow
    case "current_range"   => CurrentRange
    case other => other.split("""[.\s]+""") match {
      case Array(n, "rows") if n.forall(_.isDigit) => Rows(n.toLong)
      case Array(n, u) if n.forall(_.isDigit) && msUnits.contains(u) =>
        Millis(n.toLong * msUnits(u))
      case _ => fail(s"cannot parse over-window bound '$s' (expected " +
        "N.rows, N.minutes/..., unbounded_row/range, current_row/range)")
    }
  }

  /** Reference OverWindow.java — one fully-specified OVER window. */
  final case class OverWindow(partitionFields: Seq[String], orderField: String,
                              preceding: Bound, followingOpt: Option[Bound],
                              alias: String) {

    val following: Bound = followingOpt.getOrElse(
      if (preceding.isRows) CurrentRow else CurrentRange)

    /** The Spark WindowSpec this window denotes. */
    def spec: WindowSpec = {
      following match {
        case UnboundedRow | UnboundedRange =>
          fail("UNBOUNDED following is not supported on over windows " +
            "(reference OverWindow validation rejects it over streams)")
        case _ => ()
      }
      if (preceding.isRows != following.isRows)
        fail(s"over window '$alias' mixes ROWS and RANGE bounds " +
          s"(preceding ${preceding}, following ${following}); " +
          "the reference requires one frame kind")
      val needsMicros = !preceding.isRows &&
        (preceding.isInstanceOf[Millis] || following.isInstanceOf[Millis])
      val orderCol: Column =
        if (needsMicros) F.unix_micros(F.col(orderField).cast("timestamp"))
        else F.col(orderField)
      val parted =
        if (partitionFields.isEmpty) Window.orderBy(orderCol)
        else Window.partitionBy(partitionFields.map(F.col): _*).orderBy(orderCol)
      def lo(b: Bound): Long = b match {
        case Rows(n)                     => -n
        case Millis(ms)                  => -ms * 1000L // micros key
        case UnboundedRow | UnboundedRange => Window.unboundedPreceding
        case CurrentRow | CurrentRange   => Window.currentRow
      }
      def hi(b: Bound): Long = b match {
        case Rows(n)                   => n
        case Millis(ms)                => ms * 1000L
        case CurrentRow | CurrentRange => Window.currentRow
        case _ => fail("unreachable: unbounded following checked above")
      }
      if (preceding.isRows) parted.rowsBetween(lo(preceding), hi(following))
      else parted.rangeBetween(lo(preceding), hi(following))
    }
  }

  /** Reference Over.java builder entry points. */
  object Over {
    def partitionBy(fields: String): OverPartitioned =
      new OverPartitioned(splitNames(fields))
    def orderBy(field: String): OverOrdered =
      new OverOrdered(Nil, oneName(field))
  }

  private def splitNames(s: String): Seq[String] = {
    val names = s.split(",").map(_.trim).toSeq
    if (names.isEmpty || names.exists(n => n.isEmpty || !n.matches("""[A-Za-z_][A-Za-z0-9_]*""")))
      fail(s"partitionBy takes a comma-separated plain name list, got '$s'")
    names
  }
  private def oneName(s: String): String = {
    val t = s.trim
    if (!t.matches("""[A-Za-z_][A-Za-z0-9_]*"""))
      fail(s"orderBy takes one plain attribute name, got '$s'")
    t
  }

  final class OverPartitioned(parts: Seq[String]) {
    def orderBy(field: String): OverOrdered = new OverOrdered(parts, oneName(field))
  }

  final class OverOrdered(parts: Seq[String], order: String) {
    /** Default frame: UNBOUNDED_RANGE preceding → CURRENT_RANGE. */
    def as(alias: String): OverWindow =
      OverWindow(parts, order, UnboundedRange, None, alias)
    def preceding(b: String): OverPreceding =
      new OverPreceding(parts, order, bound(b))
  }

  final class OverPreceding(parts: Seq[String], order: String, pre: Bound) {
    def as(alias: String): OverWindow = OverWindow(parts, order, pre, None, alias)
    def following(b: String): OverFollowing =
      new OverFollowing(parts, order, pre, bound(b))
  }

  final class OverFollowing(parts: Seq[String], order: String, pre: Bound,
                            fol: Bound) {
    def as(alias: String): OverWindow =
      OverWindow(parts, order, pre, Some(fol), alias)
  }
}
