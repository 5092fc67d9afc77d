package graft.ops

import graft.SparkTestBase

class RangeJoinSpec extends SparkTestBase {

  import spark.implicits._

  private def trades = Seq(
    ("A", 10000L, 1.0), ("A", 20000L, 2.0), ("B", 10000L, 3.0)
  ).toDF("sym", "__timestamp", "qty")

  private def quotes = Seq(
    ("A", 4999L, 1.0),  // 5001ms before A@10000 → outside 5000 lookback
    ("A", 5000L, 2.0),  // exactly at the lookback edge → included
    ("A", 10000L, 3.0), // coincident → included
    ("A", 11000L, 4.0), // after → excluded for lookahead 0
    ("A", 16000L, 5.0), // 4000ms before A@20000 → included there
    ("B", 9000L, 6.0),
    ("C", 9500L, 7.0)   // no matching trade key
  ).toDF("sym", "__timestamp", "px")

  test("pairs within [t - lookback, t]: edges inclusive, keys respected") {
    val out = RangeJoin.timeRange(trades, quotes, Seq("sym"), "__timestamp",
      lookbackMs = 5000L, lookaheadMs = 0L, rightCols = Seq("px"), rightPrefix = "q_")
      .select($"sym", $"__timestamp", $"q___timestamp", $"q_px")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2, t._3)).toSeq
    assert(out == Seq(
      ("A", 10000L, 5000L, 2.0),
      ("A", 10000L, 10000L, 3.0),
      ("A", 20000L, 16000L, 5.0),
      ("B", 10000L, 9000L, 6.0)))
  }

  test("lookahead window and no duplicate pairs across bucket edges") {
    // Window [t, t+10000]: bucket width 10000, so right rows at every offset
    // relative to bucket boundaries; each (trade, quote) pair must appear
    // exactly once.
    val out = RangeJoin.timeRange(trades, quotes, Seq("sym"), "__timestamp",
      lookbackMs = 0L, lookaheadMs = 10000L, rightCols = Seq("px"), rightPrefix = "q_")
      .select($"sym", $"__timestamp", $"q___timestamp")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out.distinct.length == out.length)
    assert(out.sorted == Seq(
      ("A", 10000L, 10000L), ("A", 10000L, 11000L), ("A", 10000L, 16000L)))
  }

  test("matches the quadratic definition on random data") {
    val rnd = new scala.util.Random(7)
    val l = (0 until 200).map(i => (s"k${rnd.nextInt(5)}", rnd.nextInt(100000).toLong, i))
      .toDF("k", "__timestamp", "lid")
    val r = (0 until 200).map(i => (s"k${rnd.nextInt(5)}", rnd.nextInt(100000).toLong, i))
      .toDF("k", "__timestamp", "rid")
    val fast = RangeJoin.timeRange(l, r, Seq("k"), "__timestamp",
      lookbackMs = 7000L, lookaheadMs = 3000L, rightCols = Seq("rid"))
      .select($"lid", $"right_rid")
      .collect().map(x => (x.getInt(0), x.getInt(1))).toSet
    val slow = l.as("l").join(r.as("r"),
      $"l.k" === $"r.k" &&
        $"r.__timestamp" >= $"l.__timestamp" - 7000L &&
        $"r.__timestamp" <= $"l.__timestamp" + 3000L)
      .select($"l.lid", $"r.rid")
      .collect().map(x => (x.getInt(0), x.getInt(1))).toSet
    assert(fast == slow, s"missing=${slow -- fast} extra=${fast -- slow}")
  }

  test("intervalOverlap: touching endpoints overlap, disjoint don't, keys respected") {
    val sessions = Seq(
      ("u1", 1, 0L, 10000L),
      ("u1", 2, 50000L, 60000L),
      ("u2", 3, 0L, 10000L)
    ).toDF("k", "sid", "s", "e")
    val outages = Seq(
      ("u1", 10000L, 50000L), // touches session 1's end AND session 2's start
      ("u1", 70000L, 80000L), // disjoint from both
      ("u2", 5000L, 6000L)    // strictly inside session 3
    ).toDF("k", "os", "oe")
    val out = RangeJoin.intervalOverlap(sessions, outages, Seq("k"),
        "s", "e", "os", "oe", bucketMs = 7000L, rightCols = Seq.empty)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(4), r.getLong(5)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(out == Seq(
      ("u1", 1, 10000L, 50000L),
      ("u1", 2, 10000L, 50000L),
      ("u2", 3, 5000L, 6000L)))
  }

  test("intervalOverlap equals the quadratic overlap definition; each pair exactly once") {
    val rnd = new scala.util.Random(7)
    val li = (0 until 250).map(i => {
      val s = rnd.nextInt(100000).toLong
      (s"k${rnd.nextInt(3)}", i, s, s + rnd.nextInt(20000))
    })
    val ri = (0 until 250).map(i => {
      val s = rnd.nextInt(100000).toLong
      (s"k${rnd.nextInt(3)}", i, s, s + rnd.nextInt(20000))
    })
    val l = li.toDF("k", "lid", "s", "e")
    val r = ri.toDF("k", "rid", "rs", "re")
    val fast = RangeJoin.intervalOverlap(l, r, Seq("k"),
        "s", "e", "rs", "re", bucketMs = 9999L, rightCols = Seq("rid"))
      .select($"lid", $"right_rid")
      .collect().map(x => (x.getInt(0), x.getInt(1))).toSeq
    assert(fast.size == fast.toSet.size, "a pair was emitted more than once")
    val slow = (for {
      (lk, lid, ls, le) <- li
      (rk, rid, rs, re) <- ri
      if lk == rk && ls <= re && rs <= le
    } yield (lid, rid)).toSet
    assert(fast.toSet == slow,
      s"missing=${slow -- fast.toSet} extra=${fast.toSet -- slow}")
  }
}
