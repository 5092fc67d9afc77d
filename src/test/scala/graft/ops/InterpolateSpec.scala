package graft.ops

import graft.SparkTestBase

class InterpolateSpec extends SparkTestBase {

  import spark.implicits._

  test("hand-computed lerp on a 10ms grid: mid-segment, on-grid, tail, ties") {
    // key "a": (5,1.0) (25,3.0) (40,6.0); the 25 point arrives twice and the
    // higher tiebreak (v=3.0) must win
    // key "b": single point ON the grid -> itself, exactly
    // key "c": single point off the grid -> nothing
    val df = Seq(
      ("a", 5L, 1.0, 1L),
      ("a", 25L, 99.0, 1L),
      ("a", 25L, 3.0, 2L),
      ("a", 40L, 6.0, 1L),
      ("b", 20L, 9.0, 1L),
      ("c", 7L, 4.0, 1L)
    ).toDF("k", "t", "value", "tie")

    val out = Interpolate.linearAtGrid(df, "10l", Seq("k"), "t", "value",
        tieCols = Seq("tie"))
      .orderBy("k", "t").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))

    assert(out.toSeq == Seq(
      // a: 5->25 spans B=10 (1 + 2*(5/20)) and B=20 (1 + 2*(15/20));
      //    25->40 spans B=30 (3 + 3*(5/15)); 40 is on-grid -> exact
      ("a", 10L, 1.5), ("a", 20L, 2.5), ("a", 30L, 4.0), ("a", 40L, 6.0),
      ("b", 20L, 9.0)))
  }

  test("long quiet gap interpolates every boundary without a giant array") {
    // one segment spanning 200k grid points (> chunk size 65536): the
    // chunked explode must emit all of them, values strictly linear
    val df = Seq((1L, 0L, 0.0), (1L, 2000000L, 2000000.0)).toDF("k", "t", "value")
    val out = Interpolate.linearAtGrid(df, "10l", Seq("k"), "t", "value")
    assert(out.count() == 200001L)
    val probe = out.filter($"t" === 1234560L).collect()
    assert(probe.length == 1 && probe(0).getDouble(2) == 1234560.0)
  }
}
