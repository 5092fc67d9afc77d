package graft.ops

import graft.SparkTestBase
import graft.pipeline.TextAnalysis

/** Hand-computed cases for the round-7b series analytics: running
  * drawdown, CUSUM changepoint, VWAP bars, lead-lag correlation, and the
  * BPE pair-count step.
  */
class SeriesAnalyticsSpec extends SparkTestBase {

  import spark.implicits._

  test("runningDrawdown: expanding peak and decline-from-high") {
    val df = Seq(("k", 1L, 5.0), ("k", 2L, 3.0), ("k", 3L, 7.0), ("k", 4L, 6.0))
      .toDF("key", "t", "value")
    val out = RollingStats.runningDrawdown(df, Seq("key"), "t", "value")
      .orderBy("t").collect()
    assert(out.map(_.getDouble(3)).toSeq === Seq(5.0, 5.0, 7.0, 7.0))
    assert(out.map(_.getDouble(4)).toSeq === Seq(0.0, 2.0, 0.0, 1.0))
  }

  test("funnelStages conversion window: anchored at entry, greedy per stage") {
    val ev = Seq(
      // u1 completes inside the window
      ("u1", 10L, "view"), ("u1", 20L, "click"), ("u1", 90L, "purchase"),
      // u2's purchase lands past entry+100: stage 3 must stay NULL even
      // though it is within 100 of the CLICK (anchor is entry, not prev)
      ("u2", 10L, "view"), ("u2", 50L, "click"), ("u2", 130L, "purchase"),
      // u3's click itself is out of window: chain stops at stage 1
      ("u3", 10L, "view"), ("u3", 200L, "click")
    ).toDF("user", "t", "typ")
    val out = Funnel.funnelStages(ev, "user", "t", "typ",
        Seq("view", "click", "purchase"), windowMs = Some(100L))
      .orderBy("user").collect()
    assert(out.map(_.getAs[Int]("stages_reached")).toSeq === Seq(3, 2, 1))
    assert(out(1).isNullAt(out(1).fieldIndex("purchase_ms")))
    assert(out(2).isNullAt(out(2).fieldIndex("click_ms")))
    // no window: u2 and u3 complete further
    val free = Funnel.funnelStages(ev, "user", "t", "typ",
        Seq("view", "click", "purchase"))
      .orderBy("user").collect()
    assert(free.map(_.getAs[Int]("stages_reached")).toSeq === Seq(3, 3, 2))
  }

  test("transitionMatrix: pair counts, conditional probs, nulls excluded") {
    val df = Seq(
      ("u1", 1L, 1L, Some("a")), ("u1", 2L, 2L, Some("b")),
      ("u1", 3L, 3L, Some("a")), ("u1", 4L, 4L, None), // null type: no pair
      ("u1", 5L, 5L, Some("b")),
      ("u2", 1L, 6L, Some("a")), ("u2", 2L, 7L, Some("b"))
    ).toDF("user", "t", "eid", "typ")
    val out = Funnel.transitionMatrix(df, "user", "t", "typ", Seq("eid"))
      .orderBy("from_type", "to_type").collect()
    // pairs: u1 a->b, b->a (a->null and null->b dropped); u2 a->b
    val rows = out.map(r => (r.getString(0), r.getString(1), r.getLong(2),
      r.getDouble(3))).toSeq
    assert(rows === Seq(("a", "b", 2L, 1.0), ("b", "a", 1L, 1.0)))
  }

  test("transitionMatrix: probabilities normalize per from-type") {
    // from 'a': b,c,b -> P(b|a)=2/3, P(c|a)=1/3; from 'b': a -> 1; 'c': a -> 1
    val df = Seq(
      ("u", 1L, "a"), ("u", 2L, "b"), ("u", 3L, "a"), ("u", 4L, "c"),
      ("u", 5L, "a"), ("u", 6L, "b")
    ).toDF("user", "t", "typ")
    val probs = Funnel.transitionMatrix(df, "user", "t", "typ")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3)).toMap
    assert(math.abs(probs(("a", "b")) - 0.666667) < 1e-9)
    assert(math.abs(probs(("a", "c")) - 0.333333) < 1e-9)
    assert(probs(("b", "a")) === 1.0)
    assert(probs(("c", "a")) === 1.0)
  }

  test("rollingBand: hand frame — mean, population std, band flag") {
    // key k, frame 3: values 10, 20, 60 (cents-free doubles)
    val df = Seq(("k", 1L, 10.0), ("k", 2L, 20.0), ("k", 3L, 60.0))
      .toDF("key", "t", "value")
    val out = RollingStats.rollingBand(df, Seq("key"), "t", "value",
      frameRows = 3, nSigma = 1.0).orderBy("t").collect()
    // row1: n=1 -> NULL; row2: mean 15, var (2*500-900)/4=... n²var=2*500-30²=100+...
    val r2 = out(1)
    assert(math.abs(r2.getAs[Double]("roll_mean") - 15.0) < 1e-9)
    assert(math.abs(r2.getAs[Double]("roll_std") - 5.0) < 1e-9)
    assert(!r2.getAs[Boolean]("outside_band")) // |20-15| = 5 = 1σ, not >
    val r3 = out(2)
    assert(math.abs(r3.getAs[Double]("roll_mean") - 30.0) < 1e-9)
    // var_pop = ((10-30)²+(20-30)²+(60-30)²)/3 = 1400/3; std ≈ 21.602469
    assert(math.abs(r3.getAs[Double]("roll_std") - 21.602469) < 1e-6)
    assert(r3.getAs[Boolean]("outside_band")) // |60-30| = 30 > 21.6
    assert(out(0).isNullAt(out(0).fieldIndex("roll_mean")))
  }

  test("cusumChangepoint finds a planted mean shift with exact integers") {
    // 0,0,0,10,10,10: dev_t = 6*cum - t*30 peaks in magnitude (|-90|) at
    // rank 3 -- the last row of the "before" segment
    val df = (1L to 6L).map(t => ("a", t, if (t <= 3) 0L else 10L))
      .toDF("key", "t", "cents")
    val out = Anomalies.cusumChangepoint(df, Seq("key"), "t", "cents").collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Long]("n") === 6L)
    assert(r.getAs[Long]("cp_rank") === 3L)
    assert(r.getAs[Long]("cp_ts") === 3L)
    assert(r.getAs[Long]("max_abs_dev") === 90L)
    assert(r.getAs[Double]("mean_before") === 0.0)
    assert(r.getAs[Double]("mean_after") === 10.0)
  }

  test("cusum tie on |dev| resolves to the earliest row") {
    // symmetric up-down: |dev| ties at both ends of the plateau
    val df = Seq(("a", 1L, 0L), ("a", 2L, 6L), ("a", 3L, 0L))
      .toDF("key", "t", "cents")
    // cum: 0,6,6; S=6, n=3; dev: 3*0-1*6=-6, 18-12=6, 18-18=0 -> tie |6|
    val r = Anomalies.cusumChangepoint(df, Seq("key"), "t", "cents").head()
    assert(r.getAs[Long]("cp_rank") === 1L)
    assert(r.getAs[Long]("max_abs_dev") === 6L)
  }

  test("vwap: qty-weighted mean, null/non-positive qty and null value excluded") {
    val df = Seq(
      ("k", 100L, Some(10.0), Some(2L)),
      ("k", 200L, Some(20.0), Some(1L)),
      ("k", 300L, Some(30.0), None),
      ("k", 400L, Some(40.0), Some(0L)),
      // null VALUE with positive qty: must drop whole — not deflate the
      // mean by padding the denominator/totals (ADVICE r7)
      ("k", 500L, None, Some(100L)),
      ("k", 3600500L, Some(99.0), None) // second bucket: no usable qty at all
    ).toDF("key", "t", "value", "qty")
    val out = Bars.vwap(df, "1h", Seq("key"), "t", "value", "qty")
      .orderBy("bucket").collect()
    assert(out.length === 2)
    assert(out(0).getAs[Double]("vwap") === 13.333333)
    assert(out(0).getAs[Long]("qty_total") === 3L)
    assert(out(0).getAs[Long]("n_trades") === 2L)
    assert(out(1).isNullAt(out(1).fieldIndex("vwap")))
    assert(out(1).getAs[Long]("qty_total") === 0L)
    assert(out(1).getAs[Long]("n_trades") === 0L)
  }

  test("crossCorrAtLags recovers a planted lag-1 dependence") {
    val a = Seq(1L, 5L, 2L, 7L, 3L).zipWithIndex.map { case (v, i) =>
      ("a", i.toLong * 10, v) }
    val b = a.map { case (_, t, v) => ("b", t + 10, v * 2) } // b follows a by 1
    val df = (a ++ b).toDF("key", "bucket", "sc")
    val out = RollingStats.crossCorrAtLags(df, "key", "bucket", "sc",
        bucketStep = 10, lags = Seq(0, 1))
      .collect().map(r => r.getAs[Int]("lag") ->
        (r.getAs[Long]("n_buckets"), Option(r.getAs[Any]("xcorr")))).toMap
    assert(out(1)._1 === 5L)
    assert(out(1)._2 === Some(1.0))
    assert(out(0)._1 === 4L) // overlap of a's t1..t4 with b's t1..t4
    assert(out(0)._2.exists(_.asInstanceOf[Double] < 1.0))
  }

  test("spearmanCorr: monotone-but-nonlinear is 1, reversed is -1, nulls excluded") {
    val up = Seq(1.0 -> 1L, 2.0 -> 10L, 3.0 -> 100L, 4.0 -> 1000L) // exponential in y
      .zipWithIndex.map { case ((x, y), i) => ("up", i.toLong, x, Some(y)) }
    val dn = Seq(1.0 -> 9L, 2.0 -> 7L, 3.0 -> 5L, 4.0 -> 1L)
      .zipWithIndex.map { case ((x, y), i) => ("dn", i.toLong, x, Some(y)) }
    val withNull = ("up", 99L, 9.9, None: Option[Long]) // excluded, n stays 4
    val df = (up ++ dn :+ withNull).toDF("key", "id", "x", "y")
    val out = RollingStats.spearmanCorr(df, Seq("key"), "x", "y",
        tieCols = Seq("id"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out("up") === (4L, 1.0))
    assert(out("dn") === (4L, -1.0))
  }

  test("funnelStages: strict ordering, chain breaks, same-ms does not chain") {
    val ev = Seq(
      ("u1", 10L, "view"), ("u1", 20L, "click"), ("u1", 30L, "purchase"),
      ("u2", 10L, "view"), ("u2", 5L, "click"),   // click BEFORE view: breaks
      ("u3", 10L, "view"), ("u3", 10L, "click"),  // same ms: no chain
      ("u4", 40L, "click")                        // never entered (no view)
    ).toDF("user", "t", "typ")
    val out = Funnel.funnelStages(ev, "user", "t", "typ",
        Seq("view", "click", "purchase"))
      .collect().map(r => r.getString(0) ->
        (Option(r.getAs[Any]("click_ms")), r.getAs[Int]("stages_reached"))).toMap
    assert(out.keySet === Set("u1", "u2", "u3"))
    assert(out("u1") === (Some(20L), 3))
    assert(out("u2") === (None, 1))
    assert(out("u3") === (None, 1))
  }

  test("activeUsers: DAU exact, WAU = trailing-window distinct via bounded explode") {
    val d = 86400000L
    val ev = Seq(
      ("a", 0L), ("a", 50L),    // a: day 0 (twice)
      ("b", 0L), ("b", d),      // b: days 0, 1
      ("c", 2 * d),             // c: day 2
      ("a", 9 * d)              // a again on day 9: outside day 2's window
    ).toDF("user", "t")
    val out = Funnel.activeUsers(ev, "user", "t", windowDays = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // day 0: dau {a,b}; wau(window -2..0) = {a,b}
    // day 1: dau {b};   wau(days -1..1)  = {a,b}
    // day 2: dau {c};   wau(days 0..2)   = {a,b,c}
    // day 9: dau {a};   wau(days 7..9)   = {a}
    assert(out === Map(
      0L -> (2L, 2L), 1L -> (1L, 2L), 2L -> (1L, 3L), 9L -> (1L, 1L)))
  }

  test("retentionCohorts: day-offset triangle with dedup within day") {
    val d = 86400000L
    val ev = Seq(
      ("a", 0L), ("a", 100L),        // day 0 twice -> counted once
      ("a", d + 5L),                 // day 1
      ("b", 0L), ("b", 2 * d),       // day 0, day 2
      ("c", d)                       // cohort day 1
    ).toDF("user", "t")
    val out = Funnel.retentionCohorts(ev, "user", "t")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out === Map(
      (0L, 0L) -> 2L, (0L, 1L) -> 1L, (0L, 2L) -> 1L, (1L, 0L) -> 1L))
  }

  test("madOutliers survives contamination that drags the z-score") {
    // 20 values at ~10 plus two 1000s: stddev absorbs the bursts (z < 3.5
    // for them under zscore with threshold high), MAD does not
    val base = (1 to 20).map(i => ("k", i.toLong, 10.0 + (i % 3) * 0.01))
    val burst = Seq(("k", 98L, 1000.0), ("k", 99L, 1001.0))
    val df = (base ++ burst).toDF("key", "id", "value")
    val mad = Anomalies.madOutliers(df, Seq("key"), "value", threshold = 3.5)
      .collect().map(_.getLong(1)).toSet
    assert(mad === Set(98L, 99L), s"MAD flagged $mad")
    val z = Anomalies.zscoreOutliers(df, Seq("key"), "value", threshold = 3.5)
      .collect().map(_.getLong(1)).toSet
    assert(z.isEmpty, s"two mutually-masking bursts should defeat the z-score, got $z")
  }

  test("columnProfile: exact row/null/distinct per column from one pass") {
    val df = Seq(
      (Some(1L), Some("a")), (Some(1L), Some("b")), (Some(2L), None),
      (None, Some("b"))
    ).toDF("id", "s")
    val out = graft.pipeline.Profiler.columnProfile(df, Seq("id", "s"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out("id") === (4L, 1L, 2L))
    assert(out("s") === (4L, 1L, 2L))
  }

  test("coOccurrence: per-basket distinct pairs under the session gap") {
    val ev = Seq(
      // u1 session 0: {x, y, x} -> pair (x,y) once despite repeat
      ("u1", 0L, 1L, "x"), ("u1", 10L, 2L, "y"), ("u1", 20L, 3L, "x"),
      // u1 session 1 (after gap): {x, z}
      ("u1", 10000L, 4L, "x"), ("u1", 10010L, 5L, "z"),
      // u2 one session: {x, y, z} -> three pairs
      ("u2", 0L, 6L, "x"), ("u2", 1L, 7L, "y"), ("u2", 2L, 8L, "z")
    ).toDF("user", "t", "id", "typ")
    val out = Funnel.coOccurrence(ev, "user", "t", "typ", gapMs = 1000L,
        tieCols = Seq("id"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out === Map(
      ("x", "y") -> 2L, ("x", "z") -> 2L, ("y", "z") -> 1L))
  }

  test("jsDrift: zero for corpus-identical groups, hand value for disjoint vocab") {
    // g1 emits only 'a', g2 only 'b', equal mass: each group is a point
    // mass vs the (1/2, 1/2) corpus -> JS = (ln(4/3) + KL((.5,.5)||(.75,.25)))/2
    val docs = Seq(("g1", "a a a"), ("g2", "b b b")).toDF("src", "text")
    val out = graft.pipeline.Profiler.jsDrift(docs, "text", "src", roundTo = 6)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    val expected = {
      val klPm = math.log(4.0 / 3.0)
      val klQm = 0.5 * math.log(0.5 / 0.75) + 0.5 * math.log(0.5 / 0.25)
      BigDecimal((klPm + klQm) / 2).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(out("g1") === expected)
    assert(out("g2") === expected)

    // identical distributions -> exactly zero (every p == q, ln(1) == 0)
    val same = Seq(("g1", "x y"), ("g2", "x y")).toDF("src", "text")
    val z = graft.pipeline.Profiler.jsDrift(same, "text", "src")
      .collect().map(_.getDouble(2))
    assert(z.forall(_ == 0.0))
  }

  test("bpePairStats: corpus-weighted within-word char pairs") {
    val docs = Seq("ab ab abc", "ab a").toDF("text")
    val out = TextAnalysis.bpePairStats(docs, "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // 'ab' x3 + inside 'abc' -> 4; 'bc' only in abc; 1-char 'a' contributes 0
    assert(out === Map("ab" -> 4L, "bc" -> 1L))
  }
}
