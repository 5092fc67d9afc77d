package graft.time

import org.scalatest.funsuite.AnyFunSuite

/** Parity with reference helpers/helpers.py:35-151 scalar conversions. */
class EpochTimeSpec extends AnyFunSuite {

  test("digit counting") {
    assert(EpochTime.countDigits(0L) == 1)
    assert(EpochTime.countDigits(1577836800L) == 10)
    assert(EpochTime.countDigits(1577836800000L) == 13)
    assert(EpochTime.countDigits(-1577836800L) == 10)
  }

  test("numeric coercion: 10-digit seconds scaled, 13-digit millis kept") {
    assert(EpochTime.fromNumber(1577836800L) == 1577836800000L)
    assert(EpochTime.fromNumber(1577836800000L) == 1577836800000L)
    assert(EpochTime.toEpochMillis(1577836800L) == 1577836800000L)
    // float seconds scale as a whole — the fractional part is sub-second
    // precision (reference: int(dateobj * 1000), helpers.py:69-70)
    assert(EpochTime.toEpochMillis(1577836800.5) == 1577836800500L)
  }

  test("ISO string parsing, naive assumed UTC") {
    assert(EpochTime.toEpochMillis("2020-01-01T00:00:00Z") == 1577836800000L)
    assert(EpochTime.toEpochMillis("2020-01-01T00:00:00") == 1577836800000L)
    assert(EpochTime.toEpochMillis("2020-01-01") == 1577836800000L)
    assert(EpochTime.toEpochMillis("2020-01-01T01:00:00+01:00") == 1577836800000L)
    assert(EpochTime.toEpochMillis("2023-11-04T15:22:00.091Z") == 1699111320091L)
  }

  test("round trip to ISO UTC") {
    assert(EpochTime.toUtcIso(1577836800000L) == "2020-01-01T00:00:00Z")
  }

  test("byte-size strings") {
    assert(EpochTime.toBytes("1.5MB") == 1572864L)
    assert(EpochTime.toBytes("512KB") == 524288L)
    assert(EpochTime.toBytes("2GB") == 2147483648L)
    assert(EpochTime.toBytes("100B") == 100L)
  }
}
