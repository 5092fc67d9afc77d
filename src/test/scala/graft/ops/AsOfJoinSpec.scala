package graft.ops

import graft.SparkTestBase

class AsOfJoinSpec extends SparkTestBase {

  import spark.implicits._

  private def quotes = Seq(
    ("A", 1000L, 10.0), ("A", 3000L, 11.0), ("B", 2000L, 20.0)
  ).toDF("sym", "__timestamp", "px")

  private def trades = Seq(
    ("A", 500L, 1.0),   // before any quote
    ("A", 1000L, 2.0),  // exactly at quote ts → inclusive match
    ("A", 2500L, 3.0),  // between quotes → 1000 quote
    ("A", 4000L, 4.0),  // after last quote → 3000 quote
    ("B", 1999L, 5.0),  // before B's quote
    ("B", 2001L, 6.0)
  ).toDF("sym", "__timestamp", "qty")

  test("asof attaches most recent right row at-or-before, per key") {
    val out = AsOfJoin.asof(trades, quotes, Seq("sym"), "__timestamp",
      rightCols = Seq("px"), rightPrefix = "q_")
      .orderBy("sym", "__timestamp").collect()
    val got = out.map(r => (r.getString(0), r.getLong(1),
      Option(r.get(r.fieldIndex("q_px"))).orNull,
      Option(r.get(r.fieldIndex("q___timestamp"))).orNull))
    assert(got.toSeq == Seq(
      ("A", 500L, null, null),
      ("A", 1000L, 10.0, 1000L),
      ("A", 2500L, 10.0, 1000L),
      ("A", 4000L, 11.0, 3000L),
      ("B", 1999L, null, null),
      ("B", 2001L, 20.0, 2000L)))
  }

  test("tolerance nulls out stale matches") {
    val out = AsOfJoin.asof(trades, quotes, Seq("sym"), "__timestamp",
      rightCols = Seq("px"), rightPrefix = "q_", toleranceMs = Some(1000L))
      .orderBy("sym", "__timestamp").collect()
    val at2500 = out.find(r => r.getString(0) == "A" && r.getLong(1) == 2500L).get
    assert(at2500.isNullAt(at2500.fieldIndex("q_px"))) // 1500ms stale > 1000ms tol
    val at4000 = out.find(r => r.getString(0) == "A" && r.getLong(1) == 4000L).get
    assert(at4000.getDouble(at4000.fieldIndex("q_px")) == 11.0) // 1000ms = tol, kept
  }

  test("forward direction attaches the earliest right row at-or-after") {
    val out = AsOfJoin.asof(trades, quotes, Seq("sym"), "__timestamp",
      rightCols = Seq("px"), rightPrefix = "q_", forward = true)
      .orderBy("sym", "__timestamp").collect()
    val got = out.map(r => (r.getString(0), r.getLong(1),
      Option(r.get(r.fieldIndex("q_px"))).orNull,
      Option(r.get(r.fieldIndex("q___timestamp"))).orNull))
    assert(got.toSeq == Seq(
      ("A", 500L, 10.0, 1000L),
      ("A", 1000L, 10.0, 1000L), // on-boundary inclusive in forward too
      ("A", 2500L, 11.0, 3000L),
      ("A", 4000L, null, null),  // nothing ahead
      ("B", 1999L, 20.0, 2000L),
      ("B", 2001L, null, null)))
  }

  test("forward tolerance nulls out matches too far ahead") {
    val out = AsOfJoin.asof(trades, quotes, Seq("sym"), "__timestamp",
      rightCols = Seq("px"), rightPrefix = "q_", forward = true,
      toleranceMs = Some(400L))
      .orderBy("sym", "__timestamp").collect()
    val at500 = out.find(r => r.getString(0) == "A" && r.getLong(1) == 500L).get
    assert(at500.isNullAt(at500.fieldIndex("q_px"))) // 500ms ahead > 400ms tol
    val at1000 = out.find(r => r.getString(0) == "A" && r.getLong(1) == 1000L).get
    assert(at1000.getDouble(at1000.fieldIndex("q_px")) == 10.0) // 0ms ahead, kept
    val atB = out.find(r => r.getString(0) == "B" && r.getLong(1) == 1999L).get
    assert(atB.getDouble(atB.fieldIndex("q_px")) == 20.0) // 1ms ahead, kept
  }

  test("null field in matched right row is attached as null, not skipped") {
    val q2 = Seq(("A", 1000L, Some(10.0)), ("A", 2000L, None))
      .toDF("sym", "__timestamp", "px")
    val t2  = Seq(("A", 2500L, 1.0)).toDF("sym", "__timestamp", "qty")
    val out = AsOfJoin.asof(t2, q2, Seq("sym"), "__timestamp", Seq("px"), "q_")
      .collect().head
    // matched row is the 2000L quote whose px IS null — must not fall back to 10.0
    assert(out.isNullAt(out.fieldIndex("q_px")))
    assert(out.getLong(out.fieldIndex("q___timestamp")) == 2000L)
  }
}
