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
}
