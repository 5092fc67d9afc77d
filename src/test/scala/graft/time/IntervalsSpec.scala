package graft.time

import org.scalatest.funsuite.AnyFunSuite

/** Behavioral parity with the reference's interval unit tests
  * (tests/unit/test_string_to_unix_interval_conversion.py,
  * tests/unit/test_next_intervals.py — fixed ts 1627776123213 =
  * 2021-08-01T00:02:03.213Z).
  */
class IntervalsSpec extends AnyFunSuite {

  private val Root = 1627776123213L // 2021-08-01T00:02:03.213Z

  test("interval grammar to millis") {
    assert(Intervals.toMillis("1d") == 86400000L)
    assert(Intervals.toMillis("3d") == 259200000L)
    assert(Intervals.toMillis("1h") == 3600000L)
    assert(Intervals.toMillis("3h") == 10800000L)
    assert(Intervals.toMillis("1m") == 60000L)
    assert(Intervals.toMillis("3m") == 180000L)
    assert(Intervals.toMillis("1s") == 1000L)
    assert(Intervals.toMillis("3s") == 3000L)
    assert(Intervals.toMillis("1l") == 1L)
    assert(Intervals.toMillis("3l") == 3L)
    assert(Intervals.toMillis("100l") == 100L)
    intercept[IllegalArgumentException](Intervals.toMillis("5x"))
    intercept[IllegalArgumentException](Intervals.toMillis("d"))
  }

  test("next boundary, non-initialized = ts + interval") {
    assert(EpochTime.toUtcIso(Intervals.nextBoundary(Root, "1d")) == "2021-08-02T00:02:03.213Z")
    assert(EpochTime.toUtcIso(Intervals.nextBoundary(Root, "1h")) == "2021-08-01T01:02:03.213Z")
    assert(EpochTime.toUtcIso(Intervals.nextBoundary(Root, "1s")) == "2021-08-01T00:02:04.213Z")
    assert(EpochTime.toUtcIso(Intervals.nextBoundary(Root, "1l")) == "2021-08-01T00:02:03.214Z")
  }

  test("next boundary, initialized = aligned to grid") {
    assert(EpochTime.toUtcIso(Intervals.nextBoundary(Root, "1d", initialize = true)) == "2021-08-02T00:00:00Z")
    assert(EpochTime.toUtcIso(Intervals.nextBoundary(Root, "1h", initialize = true)) == "2021-08-01T01:00:00Z")
    assert(EpochTime.toUtcIso(Intervals.nextBoundary(Root, "1m", initialize = true)) == "2021-08-01T00:03:00Z")
    assert(EpochTime.toUtcIso(Intervals.nextBoundary(Root, "1s", initialize = true)) == "2021-08-01T00:02:04Z")
    assert(EpochTime.toUtcIso(Intervals.nextBoundary(Root, "1l", initialize = true)) == "2021-08-01T00:02:03.214Z")
  }

  test("on-boundary timestamp initializes to the NEXT boundary") {
    val onBoundary = 1627776120000L // exactly on a 1m boundary
    assert(Intervals.nextBoundary(onBoundary, "1m", initialize = true) == onBoundary + 60000L)
    assert(Intervals.nextBoundary(0L, "1h", initialize = true) == 3600000L)
  }

  test("property: initialized boundary is strictly after ts and grid-aligned") {
    val rnd       = new scala.util.Random(42)
    val intervals = Seq("1l", "7l", "100l", "1s", "10s", "1m", "5m", "1h", "6h")
    for (_ <- 1 to 2000) {
      val ts   = math.abs(rnd.nextLong()) % 4102444800000L
      val iv   = intervals(rnd.nextInt(intervals.length))
      val step = Intervals.toMillis(iv)
      val b    = Intervals.nextBoundary(ts, iv, initialize = true)
      assert(b > ts, s"ts=$ts iv=$iv")
      assert(b - ts <= step, s"ts=$ts iv=$iv")
      assert(b % step == 0L, s"ts=$ts iv=$iv")
    }
  }

  test("property: boundaryIndexFor is the first boundary strictly after ts") {
    val rnd = new scala.util.Random(43)
    for (_ <- 1 to 2000) {
      val b0   = rnd.nextInt(1000000).toLong
      val step = 1L + rnd.nextInt(5000)
      val ts   = b0 + rnd.nextInt(200001) - 100000L
      val k    = Intervals.boundaryIndexFor(ts, b0, step)
      val b    = b0 + k * step
      assert(b > ts)
      assert(b - step <= ts)
    }
  }
}
