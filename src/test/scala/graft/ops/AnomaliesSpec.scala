package graft.ops

import graft.SparkTestBase

class AnomaliesSpec extends SparkTestBase {

  import spark.implicits._

  test("zscore outliers: hand-computed cut, per key, constant keys silent") {
    // key "a": values 0,0,0,0,10 -> mean 2, sd_samp = sqrt(80/4) ≈ 4.472;
    // z(10) ≈ 1.789, z(0) ≈ -0.447 -> only the 10 passes threshold 1.5
    // key "c": constant -> sd = 0 -> nothing (not a divide-by-zero storm)
    // key "d": single row -> sd undefined (null) -> nothing
    val df = Seq(
      ("a", 1L, 0.0), ("a", 2L, 0.0), ("a", 3L, 0.0), ("a", 4L, 0.0),
      ("a", 5L, 10.0),
      ("c", 6L, 7.0), ("c", 7L, 7.0),
      ("d", 8L, 99.0)
    ).toDF("k", "id", "value")

    val out = Anomalies.zscoreOutliers(df, Seq("k"), "value", threshold = 1.5)
      .select("k", "id", "z").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val zExpect = math.rint(8.0 / math.sqrt(80.0 / 4.0) * 1e6) / 1e6
    assert(out.toSeq == Seq(("a", 5L, zExpect)))
  }

  test("zscore outliers rejects non-positive thresholds") {
    val df = Seq(("a", 1.0)).toDF("k", "value")
    intercept[IllegalArgumentException] {
      Anomalies.zscoreOutliers(df, Seq("k"), "value", threshold = 0.0)
    }
  }

  test("winsorize: rank-selected bounds, clamping, tiny-key degeneracy") {
    // key "a": 1..10 at p10/p90 -> lo_k = ceil(0.1*10) = 1 -> lo = 1;
    // hi_k = ceil(0.9*10) = 9 -> hi = 9; only the 10 is clamped (to 9).
    // key "b": 2 rows -> lo_k = 1, hi_k = 2 -> bounds are min/max, no-op.
    val a = (1 to 10).map(i => ("a", i.toDouble))
    val b = Seq(("b", 5.0), ("b", 7.0))
    val df = (a ++ b).toDF("k", "value")
    val out = Anomalies.winsorize(df, Seq("k"), "value", pLo = 0.1, pHi = 0.9)
    val rows = out.select("k", "value", "lo", "hi", "value_w").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).toSeq.sortBy(r => (r._1, r._2))
    val aRows = rows.filter(_._1 == "a")
    assert(aRows.forall(r => r._3 == 1.0 && r._4 == 9.0))
    assert(aRows.map(_._5) == ((1 to 9).map(_.toDouble) :+ 9.0))
    val bRows = rows.filter(_._1 == "b")
    assert(bRows.map(r => (r._3, r._4)).distinct == Seq((5.0, 7.0)))
    assert(bRows.map(_._5) == Seq(5.0, 7.0))
  }

  test("winsorize: every output value is an input value (never interpolated)") {
    val vals = Seq(3.7, -1.2, 9.9, 0.4, 5.5, 2.2, 8.8, -3.3, 6.1, 4.0)
    val df = vals.map(("k", _)).toDF("k", "value")
    val out = Anomalies.winsorize(df, Seq("k"), "value", pLo = 0.25, pHi = 0.75)
      .select("lo", "hi", "value_w").collect()
    val inSet = vals.toSet
    assert(out.forall(r => inSet(r.getDouble(0)) && inSet(r.getDouble(1)) &&
      inSet(r.getDouble(2))))
  }
}
