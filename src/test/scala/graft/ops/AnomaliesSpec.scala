package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class AnomaliesSpec extends SparkTestBase {

  import spark.implicits._

  test("cusumOnline: prefix-sum identity equals the reflecting-barrier recursion") {
    val rnd = new scala.util.Random(13L)
    val rows = (1L to 300L).map(t => ("k", t, rnd.nextInt(200).toLong)) ++
      (1L to 50L).map(t => ("j", t, rnd.nextInt(200).toLong))
    val df = rows.toDF("key", "t", "cents")
    val out = Anomalies.cusumOnline(df, Seq("key"), "t", "cents",
        mu0 = 100L, slack = 10L, threshold = 500L)
      .select("key", "t", "s_pos", "s_neg").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    // direct recursion per key
    rows.groupBy(_._1).foreach { case (k, evs) =>
      var sp = 0L; var sn = 0L
      evs.sortBy(_._2).foreach { case (_, t, x) =>
        sp = math.max(0L, sp + (x - 100L - 10L))
        sn = math.max(0L, sn + (100L - x - 10L))
        assert(out((k, t)) === ((sp, sn)), s"at ($k, $t)")
      }
    }
  }

  test("cusumOnline: planted upward shift alarms; null rows carry state") {
    val df = Seq(
      ("k", 1L, Some(100L)), ("k", 2L, Some(250L)), // S+ = 140
      ("k", 3L, None),                              // carries 140
      ("k", 4L, Some(260L))                         // S+ = 290 > 200
    ).toDF("key", "t", "cents")
    val out = Anomalies.cusumOnline(df, Seq("key"), "t", "cents",
        mu0 = 100L, slack = 10L, threshold = 200L)
      .orderBy("t").collect()
    assert(out.map(_.getAs[Long]("s_pos")).toSeq === Seq(0L, 140L, 140L, 290L))
    assert(out.map(_.getAs[Boolean]("alarm")).toSeq ===
      Seq(false, false, false, true))
  }

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

  test("winsorize/winsorizedStats: two-phase path ≡ windowed fallback on randomized + tie-heavy keys") {
    // the r11 sort-free path and the legacy window path must agree on
    // EVERY statistic — bounds are order statistics (deterministic data
    // values), counts are integers, and the clamped sum only differs in
    // float association (compared at round-6, far tighter than the
    // query's round-2). Includes a 90%-tie key and sub-rank-width keys.
    val rnd = new scala.util.Random(23)
    val data =
      (1 to 4000).map(_ => ("u", math.floor(rnd.nextDouble() * 500) / 10.0)) ++
      (1 to 3600).map(_ => ("t", 5.0)) ++
      (1 to 400).map(_ => ("t", math.floor(rnd.nextDouble() * 100) / 10.0)) ++
      Seq(("one", 3.14)) ++
      (1 to 3).map(i => ("three", i * 1.5))
    val df = data.toDF("k", "value")
    def statsOf(maxKeys: Int) =
      Anomalies.winsorizedStats(df, Seq("k"), "value",
          pLo = 0.05, pHi = 0.95, maxTwoPhaseKeys = maxKeys)
        .select(col("k"), col("n"), col("lo"), col("hi"),
          round(col("sum_w"), 6).as("sw"))
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
          r.getDouble(3), r.getDouble(4))).sortBy(_._1).toSeq
    assert(statsOf(4096) == statsOf(0)) // two-phase vs forced window
    def clampOf(maxKeys: Int) =
      Anomalies.winsorize(df, Seq("k"), "value",
          pLo = 0.05, pHi = 0.95, maxTwoPhaseKeys = maxKeys)
        .groupBy(col("k"))
        .agg(count(lit(1)).as("n"), min(col("lo")).as("lo"),
          min(col("hi")).as("hi"), round(sum(col("value_w")), 6).as("sw"))
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
          r.getDouble(3), r.getDouble(4))).sortBy(_._1).toSeq
    assert(clampOf(4096) == clampOf(0))
    // and the two operators agree with each other (the decomposition
    // identity the oracle checks, asserted engine-side too)
    assert(statsOf(4096) == clampOf(4096))
  }
}
