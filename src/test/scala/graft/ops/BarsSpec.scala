package graft.ops

import graft.SparkTestBase

class BarsSpec extends SparkTestBase {

  import spark.implicits._

  test("ohlc: hand-computed candles, intra-bucket order and ties") {
    // key "a", 10ms bars: bucket 0 holds (1,5.0)(3,2.0)(9,7.0); bucket 10
    // holds a single point; an equal-ts pair at t=3 must resolve by tie —
    // the tie=1 row (2.0) is the earlier, so it can be neither overwritten
    // open nor close
    val df = Seq(
      ("a", 9L, 7.0, 1L),
      ("a", 1L, 5.0, 1L),
      ("a", 3L, 2.0, 1L),
      ("a", 3L, 4.0, 2L),
      ("a", 13L, 1.0, 1L),
      ("b", 2L, -1.0, 1L)
    ).toDF("k", "t", "value", "tie")

    val out = Bars.ohlc(df, "10l", Seq("k"), "t", "value", tieCols = Seq("tie"))
      .orderBy("k", "bar_start").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getLong(6)))

    assert(out.toSeq == Seq(
      // a/bucket0: order is (1,5.0)(3,2.0)(3,4.0)(9,7.0) -> o=5 h=7 l=2 c=7
      ("a", 0L, 5.0, 7.0, 2.0, 7.0, 4L),
      ("a", 10L, 1.0, 1.0, 1.0, 1.0, 1L),
      ("b", 0L, -1.0, -1.0, -1.0, -1.0, 1L)))
  }

  test("twap: duration weighting beats burst bias; last event carries no weight") {
    // key "a" in one bucket: v=10 live for 90ms, then a 10-sample burst of
    // v=0 each live 1ms -> plain mean of observations is ~0.9, TWAP must be
    // 10*90/(90+10) = 9.0. The final event (t=200) has no successor.
    val burst = (0 until 10).map(i => ("a", 100L + i, 0.0))
    val df = (Seq(("a", 10L, 10.0)) ++ burst ++ Seq(("a", 200L, 99.0)))
      .toDF("k", "t", "value")

    val out = Bars.twap(df, "1000l", Seq("k"), "t", "value")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getLong(3), r.getLong(4)))
    // weights: 10->100 is 90ms at v=10; burst 9×1ms at v=0; 109->200 is
    // 91ms at v=0  =>  900 / 190
    assert(out.toSeq == Seq(("a", 0L, math.rint(900.0 / 190.0 * 1e6) / 1e6, 11L, 190L)))
  }

  test("twap: segments attribute to the bucket of their start") {
    // segment starting at t=8 (v=2, 10ms long) straddles the bucket edge at
    // 10 but belongs wholly to bucket 0 (as-traded convention)
    val df = Seq(("a", 0L, 4.0), ("a", 8L, 2.0), ("a", 18L, 6.0), ("a", 20L, 8.0))
      .toDF("k", "t", "value")
    val out = Bars.twap(df, "10l", Seq("k"), "t", "value")
      .orderBy("bucket").collect()
      .map(r => (r.getLong(1), r.getDouble(2), r.getLong(4)))
    // bucket 0: 4.0×8 + 2.0×10 = 52/18; bucket 10: 6.0×2 = 12/2
    assert(out.toSeq == Seq(
      (0L, math.rint(52.0 / 18.0 * 1e6) / 1e6, 18L),
      (10L, 6.0, 2L)))
  }

  test("ewma: hand-computed recency weighting, frame truncation, per key") {
    // key "a" values 1,2,4 with frame 2, decay 0.5:
    //   row1: (1) / 1                       = 1.0
    //   row2: (1*0.5 + 2) / 1.5             = 2.5/1.5
    //   row3: (2*0.5 + 4) / 1.5             = 5/1.5  (the 1 fell out of frame)
    val df = Seq(("a", 10L, 1.0), ("a", 20L, 2.0), ("a", 30L, 4.0),
      ("b", 5L, 7.0)).toDF("k", "t", "value")
    val out = Bars.ewma(df, Seq("k"), "t", "value", frameRows = 2)
      .orderBy("k", "t").collect().map(r => r.getDouble(r.fieldIndex("ewma")))
    assert(out.toSeq == Seq(1.0, 2.5 / 1.5, 5.0 / 1.5, 7.0))
  }

  test("ewma rejects bad frame and decay") {
    val df = Seq(("a", 1L, 1.0)).toDF("k", "t", "value")
    intercept[IllegalArgumentException] { Bars.ewma(df, Seq("k"), "t", "value", frameRows = 0) }
    intercept[IllegalArgumentException] { Bars.ewma(df, Seq("k"), "t", "value", decay = 1.0) }
  }

  test("gaps: only above-threshold silences, exact bounds, per key") {
    val df = Seq(
      ("a", 0L), ("a", 5L), ("a", 100L), ("a", 103L), ("a", 250L),
      ("b", 0L), ("b", 1000L)
    ).toDF("k", "t")
    val out = Bars.gaps(df, Seq("k"), thresholdMs = 50, tsCol = "t")
      .orderBy("k", "gap_start").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      ("a", 5L, 100L, 95L), ("a", 103L, 250L, 147L), ("b", 0L, 1000L, 1000L)))
  }

  test("gaps rejects non-positive thresholds") {
    val df = Seq(("a", 0L)).toDF("k", "t")
    intercept[IllegalArgumentException] {
      Bars.gaps(df, Seq("k"), thresholdMs = 0, tsCol = "t")
    }
  }

  test("twap: all-zero-weight bucket yields NULL, not NaN") {
    // every event of "z" at one timestamp (tie-distinguished): both segments
    // have zero duration, so sum(w)=0 — the guard must emit NULL (Spark and
    // the SQL oracle agree on NULL; unguarded IEEE division gives NaN)
    val df = Seq(("z", 5L, 1.0, 1L), ("z", 5L, 2.0, 2L), ("z", 5L, 3.0, 3L),
        ("a", 0L, 4.0, 1L), ("a", 10L, 6.0, 1L))
      .toDF("k", "t", "value", "tie")
    val out = Bars.twap(df, "1000l", Seq("k"), "t", "value", tieCols = Seq("tie"))
      .orderBy("k").collect()
    // a: one 10ms segment at v=4 -> twap 4.0
    assert(out(0).getString(0) == "a" && out(0).getDouble(2) == 4.0)
    assert(out(1).getString(0) == "z", out.mkString(","))
    assert(out(1).isNullAt(2), s"zero-weight twap must be NULL: ${out(1)}")
    assert(out(1).getLong(3) == 2L && out(1).getLong(4) == 0L)
  }
}
