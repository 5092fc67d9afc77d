package graft.ops

import graft.functions.Num
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Bounded-frame rolling statistics beyond a plain mean — the pairs-trading
  * / sensor-drift surface (kdb `mcor`, TimescaleDB `stats_agg` rolling are
  * the public analogs): per-key windowed Pearson correlation between two
  * columns over the last `frameRows` rows.
  *
  * Scale shape: one hash shuffle on the key, then ONE sorted window pass
  * computing the six co-moment sums (n, Σx, Σy, Σxy, Σx², Σy²) over the
  * same frame — Spark's WindowExec streams all six aggregates in a single
  * frame buffer, exactly like the rolling mean; no self-join, no explode,
  * O(frame) memory per partition.
  */
object RollingStats {

  /** Rolling Pearson correlation of (`xCol`, `yCol`) over the last
    * `frameRows` rows per key, ordered by (`tsCol`, `tieCols`).
    *
    * Computed from explicit co-moment sums —
    * `(nΣxy − ΣxΣy) / (√(nΣx²−(Σx)²) · √(nΣy²−(Σy)²))`
    * — NOT the engine's streaming `corr` aggregate: both engines then
    * evaluate the identical arithmetic expression on frame sums (the
    * fixed-association window-fold pattern that hash-matches cross-engine),
    * instead of each engine's own Welford-style update whose intermediate
    * rounding differs. The result is rounded to `roundTo`; the ratio is
    * sqrt-messy, so it cannot land on a decimal rounding boundary the way
    * clean-decimal means can.
    *
    * Rows where either input is NULL contribute nothing to the frame
    * (SQL `corr` pair semantics); `roll_corr` is NULL when fewer than two
    * pairs are in frame or either variance term is zero (constant series
    * — correlation undefined, and both engines must agree on NULL rather
    * than split between NULL/NaN/±Inf).
    *
    * Output: input key/order columns + `roll_corr` + `n_pairs`.
    */
  def rollingCorr(
      df: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      xCol: String,
      yCol: String,
      frameRows: Int = 20,
      tieCols: Seq[String] = Nil,
      roundTo: Int = 6): DataFrame = {
    require(frameRows >= 2, s"frame must be >= 2 rows: $frameRows")
    val keys  = keyCols.map(col)
    val order = (col(tsCol) +: tieCols.map(col)).map(_.asc)
    val w = Window.partitionBy(keys: _*).orderBy(order: _*)
      .rowsBetween(-(frameRows - 1), 0)
    val both = col(xCol).isNotNull && col(yCol).isNotNull
    val px = when(both, col(xCol))
    val py = when(both, col(yCol))
    def s(c: Column): Column = sum(c).over(w)
    val n   = count(px).over(w).cast("double")
    val sx  = s(px); val sy = s(py)
    val sxy = s(px * py); val sxx = s(px * px); val syy = s(py * py)
    val varX = n * sxx - sx * sx
    val varY = n * syy - sy * sy
    val corr = when(n >= 2 && varX > 0 && varY > 0,
      Num.round0((n * sxy - sx * sy) / (sqrt(varX) * sqrt(varY)), roundTo))
    df.withColumn("roll_corr", corr)
      .withColumn("n_pairs", count(px).over(w).cast("long"))
  }

  /** Rolling least-squares line of `yCol` on `xCol` over the last
    * `frameRows` rows per key: `roll_slope = (nΣxy − ΣxΣy)/(nΣx² − (Σx)²)`
    * and `roll_icept = (Σy − slope·Σx)/n` — the windowed drift/trend
    * signal (`regr_slope` is the global analog, [[rollingCorr]] the
    * normalized one). Same single-window co-moment shape and NULL rules
    * (fewer than two pairs, or zero x-variance → NULL).
    *
    * Conditioning caveat for callers: `nΣx² − (Σx)²` subtracts numbers
    * ~n²·x̄² apart to get one ~n²·var(x) — with raw epoch-millisecond x
    * (~1.7e12) that cancellation leaves too few significant digits for a
    * rounded cross-engine hash-compare to survive. Re-anchor the x axis
    * to a small range first (e.g. days since a fixed epoch), as
    * `Queries.rollingSlope` does; the slope is invariant under the shift
    * and only rescaled by the unit change.
    */
  def rollingSlope(
      df: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      xCol: String,
      yCol: String,
      frameRows: Int = 20,
      tieCols: Seq[String] = Nil,
      roundTo: Int = 6): DataFrame = {
    require(frameRows >= 2, s"frame must be >= 2 rows: $frameRows")
    val keys  = keyCols.map(col)
    val order = (col(tsCol) +: tieCols.map(col)).map(_.asc)
    val w = Window.partitionBy(keys: _*).orderBy(order: _*)
      .rowsBetween(-(frameRows - 1), 0)
    val both = col(xCol).isNotNull && col(yCol).isNotNull
    val px = when(both, col(xCol))
    val py = when(both, col(yCol))
    def s(c: Column): Column = sum(c).over(w)
    val n   = count(px).over(w).cast("double")
    val sx  = s(px); val sy = s(py)
    val sxy = s(px * py); val sxx = s(px * px)
    val varX  = n * sxx - sx * sx
    val slope = (n * sxy - sx * sy) / varX
    val ok    = n >= 2 && varX > 0
    df.withColumn("roll_slope", when(ok, Num.round0(slope, roundTo)))
      .withColumn("roll_icept", when(ok, Num.round0((sy - slope * sx) / n, roundTo)))
      .withColumn("n_pairs", count(px).over(w).cast("long"))
  }

  /** Rolling mean/std band per key over the last `frameRows` rows —
    * Bollinger-style volatility envelope: `roll_mean ± nSigma·roll_std`
    * plus an `outside_band` flag for the current value against the band
    * of the PRECEDING frame-aligned stats (computed including the row
    * itself, the standard population formulation). Population std from
    * the same co-moment sums as [[rollingCorr]]:
    * `σ = √(nΣx² − (Σx)²) / n`, NULL below 2 rows.
    *
    * Same scale shape and conditioning caveats as the rest of the family
    * (one key shuffle, one window pass; integer-rescale the input for
    * cross-engine hash stability — see `Queries.rollingBand` for the
    * exact-cents cumsum-difference form that is also O(1)/row).
    */
  def rollingBand(
      df: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      valueCol: String,
      frameRows: Int = 20,
      nSigma: Double = 2.0,
      tieCols: Seq[String] = Nil,
      roundTo: Int = 6): DataFrame = {
    require(frameRows >= 2, s"frame must be >= 2 rows: $frameRows")
    val order = (col(tsCol) +: tieCols.map(col)).map(_.asc)
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(order: _*)
      .rowsBetween(-(frameRows - 1), 0)
    val x   = col(valueCol)
    val n   = count(x).over(w).cast("double")
    val sx  = sum(x).over(w)
    val sxx = sum(x * x).over(w)
    val varN = n * sxx - sx * sx // n²·var_pop
    val mean = sx / n
    val std  = sqrt(varN) / n
    val ok   = n >= 2 && varN >= 0
    df.withColumn("roll_mean", when(ok, Num.round0(mean, roundTo)))
      .withColumn("roll_std", when(ok, Num.round0(std, roundTo)))
      .withColumn("outside_band",
        when(ok, abs(x - mean) > lit(nSigma) * std))
  }

  /** Running peak and drawdown per key: `peak = max(value so far)` in
    * (`tsCol`, `tieCols`) order and `drawdown = peak − value` — the
    * standard decline-from-high risk measure (and, inverted, the
    * run-up-from-low). NULL values keep the prior peak and get a NULL
    * drawdown.
    *
    * Exact to the bit across engines with no rounding: the expanding max
    * copies an input value, and the subtraction is then the same two
    * doubles on both sides — there is no float-summation order anywhere.
    *
    * Scale shape: one key shuffle, one sorted window pass with O(1) state
    * (an expanding max needs only the current extremum, unlike a sliding
    * one); same WindowExec streaming as a cumulative sum.
    */
  def runningDrawdown(
      df: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      valueCol: String,
      tieCols: Seq[String] = Nil): DataFrame = {
    val order = (col(tsCol) +: tieCols.map(col)).map(_.asc)
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    df.withColumn("peak", max(col(valueCol)).over(w))
      .withColumn("drawdown", col("peak") - col(valueCol))
  }

  /** Lead-lag Pearson correlation between every (unordered) pair of keys'
    * bucketed series at each requested lag — the cross-sensor /
    * pairs-trading lead-lag scan: a high correlation at lag ℓ ≠ 0 means
    * key B's series follows key A's by ℓ buckets.
    *
    * `df` must already be the BUCKETED series: one row per (key, bucket)
    * with an integral value column (e.g. the per-bucket sum in cents —
    * integer so every co-moment below is exact; see the cross-engine
    * float-association analysis on [[rollingCorr]]). For each pair
    * (a < b by key order) and each lag ℓ, rows are matched on
    * `b.bucket = a.bucket + ℓ·bucketStep` (inner: buckets missing on
    * either side at that offset contribute nothing) and the correlation
    * is the fixed-association co-moment formula over exact integers, so
    * both engines divide identical numbers. NULL when fewer than two
    * matched buckets or either side is constant.
    *
    * Scale shape: the input is already aggregated (buckets, not events —
    * at 100 TB that reduction happened upstream in one groupBy), the lag
    * list is a broadcast literal explode, and the self-join shuffles on
    * the bucket join key only. Output is |pairs|·|lags| rows.
    *
    * Overflow bound (same class as [[spearmanCorr]]): the co-moments are
    * LONG sums of products, so `Σx²` must fit a long — with per-bucket
    * values |x| ≤ B over n matched buckets, that needs `n·B² < 2⁶³`
    * (e.g. hourly cent sums of ~1e10 per bucket overflow past ~90
    * buckets). Callers with larger magnitudes should rescale the bucket
    * value upstream (correlation is scale-invariant) or cast the inputs
    * to decimal(38,0) before calling, at the decimal-aggregate cost
    * documented on `Queries.rollingSlope`.
    */
  def crossCorrAtLags(
      df: DataFrame,
      keyCol: String,
      bucketCol: String,
      valueCol: String,
      bucketStep: Long,
      lags: Seq[Int],
      roundTo: Int = 6): DataFrame = {
    require(lags.nonEmpty, "need at least one lag")
    require(bucketStep > 0, s"bucketStep must be positive: $bucketStep")
    val a = df.select(col(keyCol).as("key_a"), col(bucketCol).as("bucket_a"),
      col(valueCol).cast("long").as("xa"))
    val b = df.select(col(keyCol).as("key_b"), col(bucketCol).as("bucket_b"),
      col(valueCol).cast("long").as("xb"))
    val joined = a
      .withColumn("lag", explode(lit(lags.toArray)))
      .join(b,
        col("key_a") < col("key_b") &&
          col("bucket_b") === col("bucket_a") + col("lag") * bucketStep)
    val n   = count(lit(1))
    val sx  = sum(col("xa")); val sy = sum(col("xb"))
    val sxy = sum(col("xa") * col("xb"))
    val sxx = sum(col("xa") * col("xa")); val syy = sum(col("xb") * col("xb"))
    val varX = n * sxx - sx * sx
    val varY = n * syy - sy * sy
    joined.groupBy(col("key_a"), col("key_b"), col("lag"))
      .agg(
        n.as("n_buckets"),
        when(n >= 2 && varX > 0 && varY > 0,
          Num.round0((n * sxy - sx * sy).cast("double") /
            (sqrt(varX.cast("double")) * sqrt(varY.cast("double"))), roundTo))
          .as("xcorr"))
  }

  /** Per-key Spearman rank correlation of (`xCol`, `yCol`) — the monotone
    * (not just linear) dependence measure: Pearson on the two rank
    * sequences. Ranks here are `row_number` with the caller's `tieCols`
    * breaking value ties DETERMINISTICALLY (the "tie-broken ranks"
    * variant, not fractional average ranks): every rank is an exact
    * integer, so all six co-moments are exact and the cross-engine hash
    * holds without any per-sum rounding — average ranks would be .5
    * floats re-opening the summation-order hazard this family avoids.
    *
    * Rows with a NULL in either column are excluded first (pairwise
    * complete), keeping both rank sequences over the same row set.
    *
    * Scale shape: one hash shuffle on the key; BOTH rank windows and the
    * final groupBy reuse that single exchange (they only re-sort within
    * partitions). Overflow: Σr² ~ n³/3 per key caps the per-key row
    * count at ~2×10⁶ for exact longs in `n·Σxy`; beyond that switch the
    * co-moments to decimal(38,0) (same tradeoff as rollingSlope).
    *
    * Output per key: `n`, `spearman` (NULL below 2 rows or zero rank
    * variance — only possible at n ≤ 1 with unique ranks).
    */
  def spearmanCorr(
      df: DataFrame,
      keyCols: Seq[String],
      xCol: String,
      yCol: String,
      tieCols: Seq[String] = Nil,
      roundTo: Int = 6): DataFrame = {
    val keys = keyCols.map(col)
    def rankW(c: String) = Window.partitionBy(keys: _*)
      .orderBy((col(c) +: tieCols.map(col)).map(_.asc): _*)
    val ranked = df
      .filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .withColumn("__rx", row_number().over(rankW(xCol)).cast("long"))
      .withColumn("__ry", row_number().over(rankW(yCol)).cast("long"))
    val n   = count(lit(1))
    val sx  = sum(col("__rx")); val sy = sum(col("__ry"))
    val sxy = sum(col("__rx") * col("__ry"))
    val sxx = sum(col("__rx") * col("__rx")); val syy = sum(col("__ry") * col("__ry"))
    val varX = n * sxx - sx * sx
    val varY = n * syy - sy * sy
    ranked.groupBy(keys: _*)
      .agg(
        n.as("n"),
        when(n >= 2 && varX > 0 && varY > 0,
          Num.round0((n * sxy - sx * sy).cast("double") /
            (sqrt(varX.cast("double")) * sqrt(varY.cast("double"))), roundTo))
          .as("spearman"))
  }
}
