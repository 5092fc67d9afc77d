package graft.time

import java.time.{Instant, LocalDateTime, OffsetDateTime, ZoneOffset, ZonedDateTime}

/** Scalar time coercions for user-facing start/end bounds.
  *
  * Mirrors the reference's `convert_time_obj_to_epoch_format`
  * (helpers/helpers.py:52-95): integers/floats are interpreted by digit count
  * (10 digits = epoch seconds, scaled x1000; 13 digits = epoch milliseconds),
  * ISO-8601 strings are parsed (naive strings assumed UTC), and JVM time types
  * are converted directly. Canonical engine time is epoch milliseconds (Long).
  */
object EpochTime {

  /** Digit count of the integral part; mirrors `count_digits`
    * (reference helpers/helpers.py:35-49).
    */
  def countDigits(n: Long): Int =
    if (n == 0L) 1 else Math.abs(n).toString.length

  /** Interpret a raw numeric timestamp: exactly 10 digits → epoch seconds
    * (scaled x1000, covering 2001–2286); anything else is taken as epoch
    * milliseconds, mirroring the reference's digit-count rule
    * (helpers/helpers.py:52-95).
    */
  def fromNumber(n: Long): Long = {
    val d = countDigits(n)
    if (d == 10) n * 1000L else n
  }

  /** Float epochs follow the reference (helpers.py:69-70): a 10-digit
    * integer part means seconds, and the WHOLE float scales ×1000 — the
    * fractional part carries sub-second precision, so flooring first would
    * drop it.
    */
  def fromNumber(n: Double): Long = {
    val intPart = Math.floor(Math.abs(n)).toLong
    if (countDigits(intPart) == 10) (n * 1000L).toLong else n.toLong
  }

  /** Parse an ISO-8601 string; naive datetimes are assumed UTC (the reference
    * warns + converts, helpers/helpers.py:74-84). Also accepts bare dates.
    */
  def fromIso(s: String): Long = {
    val t = s.trim
    def tryParse[A](f: => A): Option[A] =
      try Some(f)
      catch { case _: Exception => None }

    tryParse(OffsetDateTime.parse(t).toInstant.toEpochMilli)
      .orElse(tryParse(ZonedDateTime.parse(t).toInstant.toEpochMilli))
      .orElse(tryParse(Instant.parse(t).toEpochMilli))
      .orElse(tryParse(LocalDateTime.parse(t).toInstant(ZoneOffset.UTC).toEpochMilli))
      .orElse(tryParse(java.time.LocalDate.parse(t).atStartOfDay(ZoneOffset.UTC).toInstant.toEpochMilli))
      .getOrElse(throw new IllegalArgumentException(s"Cannot parse timestamp string: $s"))
  }

  /** Coerce any supported scalar to epoch milliseconds. */
  def toEpochMillis(value: Any): Long = value match {
    case l: Long                => fromNumber(l)
    case i: Int                 => fromNumber(i.toLong)
    case d: Double              => fromNumber(d)
    case f: Float               => fromNumber(f.toDouble)
    case s: String              => fromIso(s)
    case i: Instant             => i.toEpochMilli
    case z: ZonedDateTime       => z.toInstant.toEpochMilli
    case o: OffsetDateTime      => o.toInstant.toEpochMilli
    case l: LocalDateTime       => l.toInstant(ZoneOffset.UTC).toEpochMilli
    case t: java.sql.Timestamp  => t.getTime
    case d: java.util.Date      => d.getTime
    case other =>
      throw new IllegalArgumentException(s"Unsupported timestamp type: ${other.getClass}")
  }

  /** Epoch ms → ISO-8601 UTC string (reference `toutcisotime`,
    * helpers/helpers.py:115-128).
    */
  def toUtcIso(epochMs: Long): String =
    Instant.ofEpochMilli(epochMs).toString

  /** Parse byte-size strings like "1.5MB" → bytes (reference
    * helpers/helpers.py:131-151).
    */
  def toBytes(s: String): Long = {
    val t = s.trim.toUpperCase
    val units = Seq("KB" -> 1024L, "MB" -> 1024L * 1024, "GB" -> 1024L * 1024 * 1024,
      "TB" -> 1024L * 1024 * 1024 * 1024, "B" -> 1L)
    units.collectFirst {
      case (u, m) if t.endsWith(u) =>
        Math.round(t.dropRight(u.length).trim.toDouble * m)
    }.getOrElse(t.toDouble.toLong)
  }
}
