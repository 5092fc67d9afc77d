package graft.ops

import graft.SparkTestBase

class RollingStatsSpec extends SparkTestBase {

  import spark.implicits._

  test("rollingCorr: hand-computed frames, null pairs, degenerate guards") {
    val df = Seq(
      // a: y = 2x -> corr 1.0 once two pairs are in frame
      ("a", 1L, 1.0, Some(2.0)),
      ("a", 2L, 2.0, Some(4.0)),
      ("a", 3L, 3.0, Some(6.0)),
      // b: y falls as x rises -> corr -1.0
      ("b", 1L, 1.0, Some(5.0)),
      ("b", 2L, 2.0, Some(3.0)),
      ("b", 3L, 3.0, Some(1.0)),
      // c: constant x -> zero variance -> NULL at every row
      ("c", 1L, 7.0, Some(1.0)),
      ("c", 2L, 7.0, Some(2.0)),
      // d: a null y drops the pair from the frame entirely
      ("d", 1L, 1.0, None),
      ("d", 2L, 2.0, Some(2.0)),
      ("d", 3L, 4.0, Some(3.0))
    ).toDF("k", "t", "x", "y")

    val out = RollingStats.rollingCorr(df, Seq("k"), "t", "x", "y",
        frameRows = 3)
      .orderBy("k", "t").collect()
      .map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(4)) None else Some(r.getDouble(4)), r.getLong(5)))

    assert(out.toSeq == Seq(
      ("a", 1L, None, 1L),          // single pair: corr undefined
      ("a", 2L, Some(1.0), 2L),
      ("a", 3L, Some(1.0), 3L),
      ("b", 1L, None, 1L),
      ("b", 2L, Some(-1.0), 2L),
      ("b", 3L, Some(-1.0), 3L),
      ("c", 1L, None, 1L),
      ("c", 2L, None, 2L),          // zero variance: guard, not NaN
      ("d", 1L, None, 0L),          // null pair contributes nothing
      ("d", 2L, None, 1L),
      // frame holds pairs (2,2),(4,3): two distinct points, rising -> 1.0
      ("d", 3L, Some(1.0), 2L)), out.toSeq.mkString("\n"))
  }

  test("rollingCorr: frame bound truncates history") {
    // x alternates so the sign of the 2-row frame corr flips each step:
    // only the last 2 rows may influence the value
    val df = Seq(("a", 1L, 1.0, 1.0), ("a", 2L, 2.0, 2.0),
      ("a", 3L, 3.0, 1.0), ("a", 4L, 4.0, 2.0))
      .toDF("k", "t", "x", "y")
    val out = RollingStats.rollingCorr(df, Seq("k"), "t", "x", "y",
        frameRows = 2)
      .orderBy("t").collect()
      .map(r => if (r.isNullAt(4)) None else Some(r.getDouble(4)))
    assert(out.toSeq == Seq(None, Some(1.0), Some(-1.0), Some(1.0)))
  }

  test("rollingCorr rejects degenerate frames") {
    val df = Seq(("a", 1L, 1.0, 1.0)).toDF("k", "t", "x", "y")
    intercept[IllegalArgumentException] {
      RollingStats.rollingCorr(df, Seq("k"), "t", "x", "y", frameRows = 1)
    }
  }

  test("rollingSlope: hand-computed line fits, null pairs, degenerate guards") {
    val df = Seq(
      // a: y = 2x + 1 exactly -> slope 2, intercept 1 once 2 pairs in frame
      ("a", 1L, 1.0, Some(3.0)),
      ("a", 2L, 2.0, Some(5.0)),
      ("a", 3L, 3.0, Some(7.0)),
      // c: constant x -> zero x-variance -> NULL
      ("c", 1L, 7.0, Some(1.0)),
      ("c", 2L, 7.0, Some(2.0)),
      // d: null y drops the pair; frame (1,1),(3,2) -> slope 0.5
      ("d", 1L, 1.0, Some(1.0)),
      ("d", 2L, 2.0, None),
      ("d", 3L, 3.0, Some(2.0))
    ).toDF("k", "t", "x", "y")

    val out = RollingStats.rollingSlope(df, Seq("k"), "t", "x", "y",
        frameRows = 3)
      .orderBy("k", "t").collect()
      .map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(4)) None else Some(r.getDouble(4)),
        if (r.isNullAt(5)) None else Some(r.getDouble(5)), r.getLong(6)))

    assert(out.toSeq == Seq(
      ("a", 1L, None, None, 1L),
      ("a", 2L, Some(2.0), Some(1.0), 2L),
      ("a", 3L, Some(2.0), Some(1.0), 3L),
      ("c", 1L, None, None, 1L),
      ("c", 2L, None, None, 2L),
      ("d", 1L, None, None, 1L),
      ("d", 2L, None, None, 1L),
      ("d", 3L, Some(0.5), Some(0.5), 2L)), out.toSeq.mkString("\n"))
  }

  test("rollingSlope: frame bound truncates history; shift-invariance of slope") {
    // 2-row frames: slope from the last two points only
    val df = Seq(("a", 1L, 10.0, 1.0), ("a", 2L, 11.0, 3.0),
      ("a", 3L, 12.0, 2.0)).toDF("k", "t", "x", "y")
    val out = RollingStats.rollingSlope(df, Seq("k"), "t", "x", "y",
        frameRows = 2)
      .orderBy("t").collect()
      .map(r => if (r.isNullAt(4)) None else Some(r.getDouble(4)))
    assert(out.toSeq == Seq(None, Some(2.0), Some(-1.0)))
  }
}
