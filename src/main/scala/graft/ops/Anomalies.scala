package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Statistical outlier detection over keyed series — the audit companion to
  * [[Bars.gaps]]: gaps say where a stream went silent, this says where it
  * went WILD (stuck sensor, fat-finger trade, bot burst) before any of it
  * is resampled into training features.
  */
object Anomalies {

  /** Rows whose `valueCol` sits more than `threshold` sample standard
    * deviations from their key's mean. Emits the input columns plus a
    * rounded `z` score.
    *
    * Scale shape: one map-side-combined aggregation to (key, mean, sd) —
    * output rows = #keys — broadcast-joined back onto the stream, then a
    * narrow filter. No window, no second shuffle of the data; the stream
    * is read once. Keys with fewer than 2 rows (sd undefined) or constant
    * value (sd = 0) emit nothing.
    */
  def zscoreOutliers(
      df: DataFrame,
      keyCols: Seq[String],
      valueCol: String,
      threshold: Double = 3.0,
      roundZ: Int = 6,
      broadcastStats: Boolean = true): DataFrame = {
    require(threshold > 0, s"threshold must be positive: $threshold")
    val keys = keyCols.map(col)
    val stats = df.groupBy(keys: _*)
      .agg(avg(col(valueCol)).as("__m"), stddev_samp(col(valueCol)).as("__sd"))
    val z = (col(valueCol) - col("__m")) / col("__sd")
    // set broadcastStats = false only for pathological key cardinality
    // (stats rows = #keys); the planner then picks the join by stats
    df.join(if (broadcastStats) broadcast(stats) else stats, keyCols)
      .filter(col("__sd") > 0 && abs(z) > threshold)
      .withColumn("z", round(z, roundZ))
      .drop("__m", "__sd")
  }

  /** Rows whose `valueCol` sits more than `threshold` ROBUST deviations
    * from their key's median — the double-MAD companion to
    * [[zscoreOutliers]]: mean/stddev are themselves dragged by the
    * outliers they hunt, while median/MAD have a 50% breakdown point, so
    * a key whose tail is one huge burst still flags the burst instead of
    * absorbing it into the stddev.
    *
    * `robust_z = (x − median) / (1.4826 · MAD)` (the normal-consistency
    * constant). Both medians are `percentile(0.5)` — Spark's interpolation
    * rule matches DuckDB's `quantile_cont`, and every derived value is the
    * same arithmetic on the same copied doubles, so only the final z is
    * rounded. Keys with MAD = 0 (over half the values identical) emit
    * nothing, mirroring the sd = 0 guard.
    *
    * Scale shape: two small aggregations (median, then MAD of the
    * residuals) each broadcast back — the stream is read twice but only
    * the second read carries the residual column; no window, no sort of
    * the full frame. percentile() is an exact-median aggregate: its
    * per-key state is the value multiset, so per-key cardinality bounds
    * memory — at corpus scale switch the inputs to approx_percentile and
    * accept banded output (documented tradeoff, not done here because the
    * oracle needs the exact rule).
    */
  def madOutliers(
      df: DataFrame,
      keyCols: Seq[String],
      valueCol: String,
      threshold: Double = 3.5,
      roundZ: Int = 6,
      broadcastStats: Boolean = true): DataFrame = {
    require(threshold > 0, s"threshold must be positive: $threshold")
    val keys = keyCols.map(col)
    def bcast(s: DataFrame): DataFrame = if (broadcastStats) broadcast(s) else s
    val med = df.groupBy(keys: _*)
      .agg(percentile(col(valueCol), lit(0.5)).as("__med"))
    val withMed = df.join(bcast(med), keyCols)
    val mad = withMed.groupBy(keys: _*)
      .agg(percentile(abs(col(valueCol) - col("__med")), lit(0.5)).as("__mad"))
    val z = (col(valueCol) - col("__med")) / (col("__mad") * 1.4826)
    withMed.join(bcast(mad), keyCols)
      .filter(col("__mad") > 0 && abs(z) > threshold)
      .withColumn("robust_z", round(z, roundZ))
      .drop("__med", "__mad")
  }

  /** Winsorize `valueCol` per key at rank-based percentiles and return the
    * rows with a `<valueCol>_w` column clamped to [lo, hi], plus the bounds.
    *
    * The bounds are ORDER STATISTICS — the ceil(p·n)-th smallest value —
    * not interpolated quantiles: an interpolated bound is float arithmetic
    * whose lerp differs in ulps across engines, while a rank-selected bound
    * is an exact copy of an input value, so clamped outputs stay bit-exact
    * (and an oracle reproduces them with the same rank rule).
    *
    * Scale shape: ONE shuffle on the keys — a sorted window computes
    * row_number and partition count, then two unordered windows over the
    * SAME partitioning (Catalyst reuses the exchange) broadcast each key's
    * lo/hi to its rows. No join, no second descent of the source. A
    * mega-key serializes its own sort into one task — the usual per-key
    * window caveat (see Sessionize) — acceptable because winsorization is
    * per-series hygiene where keys are sensor/instrument-sized.
    */
  def winsorize(
      df: DataFrame,
      keyCols: Seq[String],
      valueCol: String,
      pLo: Double = 0.01,
      pHi: Double = 0.99): DataFrame = {
    require(pLo >= 0 && pHi <= 1 && pLo < pHi, s"bad percentiles: $pLo, $pHi")
    import org.apache.spark.sql.expressions.Window
    val keys = keyCols.map(col)
    val sorted   = Window.partitionBy(keys: _*).orderBy(col(valueCol))
    val whole    = Window.partitionBy(keys: _*)
    val v  = col(valueCol)
    val n  = count(lit(1)).over(whole)
    val rn = row_number().over(sorted)
    // ceil(p*n) in EXACT integer arithmetic — (n*num + den - 1) div den with
    // p = num/den — so the bound index never depends on float ceil edge
    // cases (`ceil(0.05 * 2000.0)` is 101 in IEEE doubles). `div` is
    // Spark's integral division; `/` on long columns is double division.
    def kOf(p: Double): Column = {
      val den = 1000000L
      val num = math.round(p * den)
      greatest(lit(1L), expr(s"(__n * $num + ${den - 1}) div $den"))
    }
    val withRank = df
      .withColumn("__n", n)
      .withColumn("__rn", rn.cast("long"))
      .withColumn("__lo_k", kOf(pLo))
      .withColumn("__hi_k", kOf(pHi))
    withRank
      .withColumn("lo", max(when(col("__rn") === col("__lo_k"), v)).over(whole))
      .withColumn("hi", max(when(col("__rn") === col("__hi_k"), v)).over(whole))
      .withColumn(s"${valueCol}_w", least(greatest(v, col("lo")), col("hi")))
      .drop("__n", "__rn", "__lo_k", "__hi_k")
  }

  /** Aggregate companion to [[winsorize]]: per key, `(n, lo, hi, sum_w)`
    * where `sum_w` is the sum of the winsorized values — WITHOUT
    * materializing the clamped rows. The rank decomposition
    * `sum_w = (lo_k−1)·lo + (n−hi_k)·hi + Σ value[rn ∈ [lo_k, hi_k]]`
    * holds exactly (rows below the lo rank clamp to lo, above the hi rank
    * to hi, the middle keeps its value), so the whole statistic is ONE
    * sorted window pass (rank + count) plus one aggregation reusing the
    * same key partitioning — no bound-broadcast windows, no second pass.
    */
  def winsorizedStats(
      df: DataFrame,
      keyCols: Seq[String],
      valueCol: String,
      pLo: Double = 0.01,
      pHi: Double = 0.99): DataFrame = {
    require(pLo >= 0 && pHi <= 1 && pLo < pHi, s"bad percentiles: $pLo, $pHi")
    import org.apache.spark.sql.expressions.Window
    val keys = keyCols.map(col)
    val sorted = Window.partitionBy(keys: _*).orderBy(col(valueCol))
    val whole  = Window.partitionBy(keys: _*)
    val v = col(valueCol)
    def kOf(p: Double): Column = {
      val den = 1000000L
      val num = math.round(p * den)
      greatest(lit(1L), expr(s"(__n * $num + ${den - 1}) div $den"))
    }
    df.withColumn("__n", count(lit(1)).over(whole))
      .withColumn("__rn", row_number().over(sorted).cast("long"))
      .withColumn("__lo_k", kOf(pLo))
      .withColumn("__hi_k", kOf(pHi))
      .groupBy(keys: _*)
      .agg(
        max(col("__n")).as("n"),
        max(when(col("__rn") === col("__lo_k"), v)).as("lo"),
        max(when(col("__rn") === col("__hi_k"), v)).as("hi"),
        sum(when(col("__rn").between(col("__lo_k"), col("__hi_k")), v)).as("__mid"),
        max(col("__lo_k")).as("__lo_k"), max(col("__hi_k")).as("__hi_k"))
      .withColumn("sum_w",
        (col("__lo_k") - 1L) * col("lo") + (col("n") - col("__hi_k")) * col("hi") +
          col("__mid"))
      .drop("__mid", "__lo_k", "__hi_k")
  }

  /** Single mean-shift changepoint per key via the cumulative-deviation
    * (CUSUM-family, at-most-one-change) estimator: the changepoint is the
    * position maximizing |Σ_{i≤t}(x_i − x̄)| in (`tsCol`, `tieCols`) order
    * — where the running total strays farthest from the constant-mean
    * line before reverting.
    *
    * `valueCol` must be INTEGRAL (callers pass cents, not dollars): the
    * deviation is tracked as the exactly-equivalent integer
    * `dev_t = n·Σ_{i≤t}x_i − t·S` (`S` = key total, both sides scaled by
    * n) so the cumulative sum never touches floats and both engines rank
    * identical values — a float cumsum's association varies per engine
    * and an argmax amplifies any last-ulp difference into a different
    * ROW. Ties on |dev| resolve to the earliest position.
    *
    * Output per key: `n`, the changepoint row's position (`cp_rank`,
    * 1-based, the last row of the "before" segment), its `tsCol`/tie
    * values, `max_abs_dev` (the raw integer statistic, magnitude
    * n·t·|shift| — callers compare against their own threshold to decide
    * significance), and the exact segment means `mean_before`/
    * `mean_after` (single divisions of exact integers, cross-engine
    * bit-identical; `mean_after` NULL when the changepoint is the last
    * row).
    *
    * Scale shape: one key shuffle, one sorted window pass (cumsum +
    * row_number share the frame), then a groupBy reusing the same
    * partitioning. Overflow bound: |dev| ≤ n·S, so n·Σ|x| must fit a
    * long — 2^63 leaves room for ~3·10^9 rows of 10^9-cent values per key.
    */
  /** Online (tabular) two-sided CUSUM with a fixed reference mean — the
    * Page/SPC form a LIVE monitor runs, complementing the retrospective
    * [[cusumChangepoint]]: per row,
    * `S⁺_t = max(0, S⁺_{t−1} + (x_t − μ₀ − k))` and
    * `S⁻_t = max(0, S⁻_{t−1} + (μ₀ − x_t − k))`, alarm when either side
    * exceeds `h`. All inputs/state are exact integers (cents), so the
    * streaming twin ([[graft.streaming.StreamingCusum]]) is bit-exact.
    *
    * The recursion is NOT a window aggregate — but it has a closed
    * prefix-sum form: with `P_t = Σ_{j≤t} d_j`,
    * `S_t = P_t − min(0, min_{j≤t} P_j)` (subtracting the lowest point
    * the walk ever reached, floored at zero, is exactly the reflecting
    * barrier). So the plan is one key shuffle and ONE sorted window pass
    * computing two cumsums and two running mins over the same frame —
    * the same WindowExec streaming shape as a rolling mean, no recursion,
    * no UDF.
    *
    * Null values carry state: their `d` drops out of the prefix sums, so
    * `S` holds its previous value through the row (mirrored by the
    * streaming twin).
    */
  def cusumOnline(
      df: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      centsCol: String,
      mu0: Long,
      slack: Long,
      threshold: Long,
      tieCols: Seq[String] = Nil): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(slack >= 0 && threshold > 0, s"bad slack/threshold: $slack/$threshold")
    val keys  = keyCols.map(col)
    val order = (col(tsCol) +: tieCols.map(col)).map(_.asc)
    val wc = Window.partitionBy(keys: _*).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    val x    = col(centsCol).cast("long")
    val dPos = x - mu0 - slack
    val dNeg = lit(mu0) - x - slack
    // two projection steps (a window cannot nest inside a window), both
    // served by the SAME sorted WindowExec pass over one key exchange
    df.withColumn("__pp", sum(dPos).over(wc))
      .withColumn("__pn", sum(dNeg).over(wc))
      .withColumn("s_pos",
        coalesce(col("__pp") - least(lit(0L), min(col("__pp")).over(wc)), lit(0L)))
      .withColumn("s_neg",
        coalesce(col("__pn") - least(lit(0L), min(col("__pn")).over(wc)), lit(0L)))
      .withColumn("alarm", col("s_pos") > threshold || col("s_neg") > threshold)
      .drop("__pp", "__pn")
  }

  def cusumChangepoint(
      df: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      valueCol: String,
      tieCols: Seq[String] = Nil): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val keys  = keyCols.map(col)
    val order = (col(tsCol) +: tieCols.map(col)).map(_.asc)
    val w     = Window.partitionBy(keys: _*).orderBy(order: _*)
    val x     = col(valueCol).cast("long")
    // Per-key totals as a PRE-aggregate joined back (map-side combined;
    // AQE broadcasts the tiny side), not unbounded windows: two
    // whole-partition window passes cost two extra buffer sweeps per key
    // and collapse badly when |keys| << cores. The join's hash exchange
    // partitions by the same keys the window needs, so it is reused.
    val stats = df.groupBy(keys: _*)
      .agg(count(lit(1)).as("__n"), sum(x).as("__s"))
    // The argmax is a groupBy max over a lexicographic struct — partial
    // aggregation picks per-task candidates map-side, so no second sort
    // and no WindowGroupLimit pass ever sees the full frame. Requires
    // NUMERIC ts/tie columns (negation encodes "earliest wins" inside
    // the max); epoch millis + id columns satisfy that by construction.
    val pickStruct = struct(
      (abs(col("__dev")).as("d") +:
        (negate(col(tsCol)).as("nt") +:
          tieCols.zipWithIndex.map { case (t, i) => negate(col(t)).as(s"n$i") })) ++
        (col("__rn").as("rn") +: col("__cum").as("cum") +:
          col(tsCol).as("ts") +: tieCols.map(col)): _*)
    df.join(stats, keyCols)
      .withColumn("__rn", row_number().over(w).cast("long"))
      .withColumn("__cum", sum(x).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("__dev", col("__n") * col("__cum") - col("__rn") * col("__s"))
      .groupBy(keys: _*)
      .agg(max(col("__n")).as("n"), max(col("__s")).as("__s"),
        max(pickStruct).as("__best"))
      .select(keys ++ Seq(
        col("n"),
        col("__best.rn").as("cp_rank"),
        col("__best.ts").as("cp_ts")) ++
        tieCols.map(t => col(s"__best.$t").as(s"cp_$t")) ++ Seq(
        col("__best.d").as("max_abs_dev"),
        (col("__best.cum").cast("double") / col("__best.rn").cast("double"))
          .as("mean_before"),
        when(col("__best.rn") < col("n"),
          (col("__s") - col("__best.cum")).cast("double") /
            (col("n") - col("__best.rn")).cast("double"))
          .as("mean_after")): _*)
  }
}
