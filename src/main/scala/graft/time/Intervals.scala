package graft.time

import java.time.{Instant, LocalDate, ZoneId, ZoneOffset}

/** Interval grammar and tumbling-grid boundary math.
  *
  * Grammar: `<int><unit>` with unit one of `l` (milliseconds), `s`, `m`, `h`,
  * `d` — e.g. `"100l"`, `"10s"`, `"5m"`, `"1h"`, `"3d"`. Semantics follow the
  * reference engine (klovanone/timeseriesfuser `classes.py:708-801`): the grid
  * is an arithmetic progression of epoch-millisecond boundaries; day intervals
  * align to midnight in a configurable timezone; all other units align to
  * `floor(ts / intervalMs)` multiples of the interval since the epoch.
  *
  * Pure JVM code (no Spark deps) so it can run driver-side during planning and
  * inside codegen'd expressions alike. All math is integer — the reference's
  * float-tolerance workaround (classes.py:760-763) exists only because it
  * divides through doubles; Long arithmetic needs no tolerance.
  */
object Intervals {

  final val MillisPerSecond = 1000L
  final val MillisPerMinute = 60L * 1000
  final val MillisPerHour   = 60L * 60 * 1000
  final val MillisPerDay    = 24L * 60 * 60 * 1000

  /** Parse an interval string to milliseconds. Mirrors
    * `interval_string_to_milliseconds` (reference classes.py:708-730).
    */
  def toMillis(interval: String): Long = {
    require(interval != null && interval.length >= 2, s"Invalid interval string: $interval")
    val unit  = interval.last
    val value =
      try interval.dropRight(1).trim.toLong
      catch {
        case _: NumberFormatException =>
          throw new IllegalArgumentException(s"Invalid interval string: $interval")
      }
    require(value > 0, s"Interval must be positive: $interval")
    unit match {
      case 'l' => value
      case 's' => value * MillisPerSecond
      case 'm' => value * MillisPerMinute
      case 'h' => value * MillisPerHour
      case 'd' => value * MillisPerDay
      case _   => throw new IllegalArgumentException(s"Invalid interval string: $interval")
    }
  }

  /** True when the interval uses the day unit (timezone-sensitive alignment). */
  def isDayInterval(interval: String): Boolean = interval.last == 'd'

  /** Floor a (non-negative) epoch-ms timestamp to a multiple of `stepMs`. */
  @inline def floorTo(ts: Long, stepMs: Long): Long = {
    val f = Math.floorDiv(ts, stepMs) * stepMs
    f
  }

  /** Next grid boundary strictly after `ts`.
    *
    * `initialize = true`: align to the grid (`floor(ts/step)*step + step`; for
    * day units, midnight of ts's date in `tz` plus the interval). Matches
    * `get_next_interval(..., initialize=True)` (reference classes.py:733-801)
    * including the on-boundary rule: a timestamp exactly on a boundary yields
    * the *next* boundary.
    *
    * `initialize = false`: simply `ts + intervalMs`.
    */
  def nextBoundary(
      ts: Long,
      interval: String,
      initialize: Boolean = false,
      tz: ZoneId = ZoneOffset.UTC): Long = {
    val step = toMillis(interval)
    if (!initialize) ts + step
    else if (isDayInterval(interval)) {
      // First boundary of the grid {midnight_tz(date(ts)) + k*step} strictly
      // after ts. The reference computes `midnight + step` with only an
      // equality guard (classes.py:793,798-800), which is the k=1 case of
      // this formula everywhere it is well-defined; on 25-hour DST fall-back
      // days `midnight + step` can land AT OR BEFORE ts (undefined behavior
      // in the reference) — the general formula keeps the documented
      // "strictly after" contract there.
      val date: LocalDate = Instant.ofEpochMilli(ts).atZone(tz).toLocalDate
      val midnight        = date.atStartOfDay(tz).toInstant.toEpochMilli
      midnight + (Math.floorDiv(ts - midnight, step) + 1) * step
    } else {
      val next = floorTo(ts, step) + step
      if (next == ts) ts + step else next // unreachable for step>0; kept for parity
    }
  }

  /** The last grid boundary at or before `ts` given grid origin `b0` and step.
    * Works for the arithmetic-progression grid used by the resampler.
    */
  @inline def lastBoundaryAtOrBefore(ts: Long, b0: Long, stepMs: Long): Long =
    b0 + Math.floorDiv(ts - b0, stepMs) * stepMs

  /** Index of the boundary that an event at `ts` "reports to": the first grid
    * boundary strictly greater than `ts`, as an index k such that the boundary
    * is `b0 + k*stepMs`. An event exactly on a boundary reports to the next
    * one (reference classes.py:602: emission triggers on `ts >= next_batch_ts`
    * with the *previous* event, so an on-boundary event belongs to the future).
    */
  @inline def boundaryIndexFor(ts: Long, b0: Long, stepMs: Long): Long =
    Math.floorDiv(ts - b0, stepMs) + 1L
}
