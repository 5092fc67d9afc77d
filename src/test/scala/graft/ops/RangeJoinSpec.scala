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
}
