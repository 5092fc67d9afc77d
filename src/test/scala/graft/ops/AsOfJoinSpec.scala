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

  test("nearest attaches the closer side; equidistant prefers backward") {
    val out = AsOfJoin.nearest(trades, quotes, Seq("sym"), "__timestamp",
      rightCols = Seq("px"), rightPrefix = "q_")
      .orderBy("sym", "__timestamp").collect()
    val got = out.map(r => (r.getString(0), r.getLong(1),
      Option(r.get(r.fieldIndex("q_px"))).orNull,
      Option(r.get(r.fieldIndex("q___timestamp"))).orNull))
    assert(got.toSeq == Seq(
      ("A", 500L, 10.0, 1000L),   // only forward exists
      ("A", 1000L, 10.0, 1000L),  // coincident: distance 0 backward
      ("A", 2500L, 11.0, 3000L),  // 1500 back vs 500 ahead -> forward
      ("A", 4000L, 11.0, 3000L),  // only backward exists
      ("B", 1999L, 20.0, 2000L),  // 1 ahead
      ("B", 2001L, 20.0, 2000L))) // 1 back
  }

  test("nearest: equidistant tie goes backward; tolerance bounds |distance|") {
    val q = Seq(("A", 1000L, 1.0), ("A", 3000L, 2.0)).toDF("sym", "__timestamp", "px")
    val t = Seq(("A", 2000L, 9.0), ("A", 5001L, 9.0)).toDF("sym", "__timestamp", "qty")
    val got = AsOfJoin.nearest(t, q, Seq("sym"), "__timestamp", Seq("px"), "q_",
        toleranceMs = Some(2000L))
      .orderBy("__timestamp").collect()
      .map(r => (r.getLong(1), Option(r.get(r.fieldIndex("q_px"))).orNull))
    // 2000 is exactly 1000 from both quotes -> backward (px=1.0);
    // 5001 is 2001 from its only (backward) match -> beyond tolerance
    assert(got.toSeq == Seq((2000L, 1.0), (5001L, null)))
  }

  test("nearest equals pick-closer over the two directional joins (randomized)") {
    val rnd = new scala.util.Random(7)
    val q = (1 to 300).map(_ => ("k" + rnd.nextInt(5), rnd.nextInt(10000).toLong,
      rnd.nextInt(100).toDouble)).distinct
      .groupBy(r => (r._1, r._2)).map(_._2.maxBy(_._3)).toSeq // unique (key, ts)
      .toDF("sym", "__timestamp", "px")
    val t = (1 to 300).map(i => ("k" + rnd.nextInt(6), rnd.nextInt(11000).toLong,
      i.toDouble)).toDF("sym", "__timestamp", "qty")

    val near = AsOfJoin.nearest(t, q, Seq("sym"), "__timestamp", Seq("px"), "q_")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        Option(r.get(r.fieldIndex("q___timestamp")))
          .map(_.asInstanceOf[Long]).getOrElse(-1L))).sortBy(r => (r._1, r._2, r._3))

    val bwd = AsOfJoin.asof(t, q, Seq("sym"), "__timestamp", Seq("px"), "b_")
    val fwd = AsOfJoin.asof(bwd, q, Seq("sym"), "__timestamp", Seq("px"), "f_",
      forward = true)
    val ref = fwd.collect().map { r =>
      val ts = r.getLong(r.fieldIndex("__timestamp"))
      val b = Option(r.get(r.fieldIndex("b___timestamp"))).map(_.asInstanceOf[Long])
      val f = Option(r.get(r.fieldIndex("f___timestamp"))).map(_.asInstanceOf[Long])
      val pick = (b, f) match {
        case (Some(bt), Some(ft)) => if (ft - ts < ts - bt) f else b
        case (Some(_), None) => b
        case (None, other) => other
      }
      (r.getString(r.fieldIndex("sym")), ts, r.getDouble(r.fieldIndex("qty")),
        pick.getOrElse(-1L))
    }.sortBy(r => (r._1, r._2, r._3))
    assert(near.toSeq == ref.toSeq)
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
