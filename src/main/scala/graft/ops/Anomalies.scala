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
    * Scale shape (r11 — the sort is GONE for the common case): the bounds
    * come from [[winsorBounds]] — the two-phase exact rank selection
    * ([[graft.pipeline.RankSelect]]'s band/cell argument with this
    * operator's integer rank rule), two map-side-combined aggregation
    * passes with NO window and NO per-key sort — and the clamp is then a
    * broadcast-join map over one more descent of the source. The previous
    * shape funneled every key's whole corpus slice through one task's
    * sort (measured at 10M events × 5 keys: 16.4 s; the
    * low-cardinality-window serialization this repo's NOTES document).
    * Falls back to the windowed shape when the key count exceeds
    * `maxTwoPhaseKeys` (per-key slices are small there, so the sort is
    * harmless) or when null values are present (the legacy null rank
    * semantics are ill-defined; see [[winsorBounds]]).
    */
  def winsorize(
      df: DataFrame,
      keyCols: Seq[String],
      valueCol: String,
      pLo: Double = 0.01,
      pHi: Double = 0.99,
      maxTwoPhaseKeys: Int = 4096): DataFrame = {
    require(pLo >= 0 && pHi <= 1 && pLo < pHi, s"bad percentiles: $pLo, $pHi")
    winsorBounds(df, keyCols, valueCol, pLo, pHi, maxTwoPhaseKeys) match {
      case None => winsorizeByWindow(df, keyCols, valueCol, pLo, pHi)
      case Some(bounds) =>
        val spark = df.sparkSession
        val schema = org.apache.spark.sql.types.StructType(
          df.select(keyCols.map(col): _*).schema.fields ++ Seq(
            org.apache.spark.sql.types.StructField("lo",
              org.apache.spark.sql.types.DoubleType),
            org.apache.spark.sql.types.StructField("hi",
              org.apache.spark.sql.types.DoubleType)))
        val rows = bounds.map { b =>
          org.apache.spark.sql.Row.fromSeq(b.key ++ Seq(b.lo, b.hi))
        }
        val bdf = spark.createDataFrame(
          spark.sparkContext.parallelize(rows.toSeq, 1), schema)
        val v = col(valueCol)
        // left join + explicit select keep the legacy column ORDER (input
        // columns, then lo, hi, value_w) and the legacy keep-everything
        // row contract; under the no-nulls dispatch guard every key has
        // bounds, so the left join never actually produces null bounds
        df.join(broadcast(bdf), keyCols, "left")
          .withColumn(s"${valueCol}_w", least(greatest(v, col("lo")), col("hi")))
          .select(df.columns.map(col) ++
            Seq(col("lo"), col("hi"), col(s"${valueCol}_w")): _*)
    }
  }

  private def winsorizeByWindow(
      df: DataFrame,
      keyCols: Seq[String],
      valueCol: String,
      pLo: Double,
      pHi: Double): DataFrame = {
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
    * materializing the clamped rows.
    *
    * Scale shape (r11): [[winsorBounds]] answers the WHOLE statistic from
    * its two aggregation passes — the cell table carries per-segment
    * counts AND sums, so the driver walk reads `sum_w` off the cells
    * (below-lo cells contribute `cnt·lo`, above-hi cells `cnt·hi`,
    * between-bands cells their exact sum, in-band single-value cells
    * `cnt·clamp(v)`) — and the result is a |keys|-row local frame with no
    * window, no sort, and no third descent of the source. Measured at 10M
    * events × 5 keys: 12.2 s (one whole-slice sort per key) → ~2 s.
    * Key-count / null fallbacks as in [[winsorize]]; the windowed shape
    * remains for those regimes (its rank decomposition
    * `sum_w = (lo_k−1)·lo + (n−hi_k)·hi + Σ value[rn ∈ [lo_k, hi_k]]`
    * stays exact at any key cardinality).
    */
  def winsorizedStats(
      df: DataFrame,
      keyCols: Seq[String],
      valueCol: String,
      pLo: Double = 0.01,
      pHi: Double = 0.99,
      maxTwoPhaseKeys: Int = 4096): DataFrame = {
    require(pLo >= 0 && pHi <= 1 && pLo < pHi, s"bad percentiles: $pLo, $pHi")
    winsorBounds(df, keyCols, valueCol, pLo, pHi, maxTwoPhaseKeys) match {
      case None => winsorizedStatsByWindow(df, keyCols, valueCol, pLo, pHi)
      case Some(bounds) =>
        val spark = df.sparkSession
        val schema = org.apache.spark.sql.types.StructType(
          df.select(keyCols.map(col): _*).schema.fields ++ Seq(
            org.apache.spark.sql.types.StructField("n",
              org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("lo",
              org.apache.spark.sql.types.DoubleType),
            org.apache.spark.sql.types.StructField("hi",
              org.apache.spark.sql.types.DoubleType),
            org.apache.spark.sql.types.StructField("sum_w",
              org.apache.spark.sql.types.DoubleType)))
        // Seq[Any], NOT Seq(...): a mixed Long/Double Seq literal would
        // infer Seq[Double] and silently WIDEN n — the encoder then
        // rejects the Double where the schema says BIGINT
        val rows = bounds.map { b =>
          org.apache.spark.sql.Row.fromSeq(
            b.key ++ Seq[Any](b.n, b.lo, b.hi, b.sumW))
        }
        spark.createDataFrame(
          spark.sparkContext.parallelize(rows.toSeq, 1), schema)
    }
  }

  private def winsorizedStatsByWindow(
      df: DataFrame,
      keyCols: Seq[String],
      valueCol: String,
      pLo: Double,
      pHi: Double): DataFrame = {
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

  /** One key's winsorization answer from the two-phase pass. */
  private[ops] final case class WinsorBound(
      key: Seq[Any], n: Long, lo: Double, hi: Double, sumW: Double)

  /** ceil(p·n) in EXACT integer arithmetic — (n·num + den − 1) div den
    * with p = num/den — the same rank rule the windowed shape and the
    * oracle use (`ceil(0.05 * 2000.0)` is 101 in IEEE doubles; this is
    * 100).
    */
  private def kOfL(p: Double, n: Long): Long = {
    val den = 1000000L
    val num = math.round(p * den)
    math.max(1L, (n * num + den - 1) / den)
  }

  /** Two-phase exact winsorization bounds — the
    * [[graft.pipeline.RankSelect]] band/cell argument specialized to two
    * target ranks plus the clamped SUM:
    *
    *  1. band pass: per key, `count(*)`, `count(v)` and an
    *     `approx_percentile` sketch at the `p ∓ 3/accuracy` fraction
    *     ladder — the sketch's rank guarantee brackets each target rank
    *     `kOf(p)` with a value band;
    *  2. cell pass: rows group by (key, segment, in-band value) with
    *     COUNT and SUM — outside segments collapse to one (count, sum)
    *     cell, in-band segments keep one cell per distinct value; the
    *     segment id is `#{band lo ≤ v} + #{band hi < v}` over the merged
    *     disjoint intervals (odd = inside), attached by a broadcast join
    *     of the tiny per-key plan table.
    *
    * The driver walk then reads the exact rank-`kOf(pLo)`/`kOf(pHi)`
    * values off the cumulative cell counts AND the clamped sum off the
    * cell sums. Returns None — caller falls back to the windowed shape —
    * when the key count exceeds `maxKeys`, when null values are present
    * (the windowed rank semantics rank nulls; this path would not), when
    * the bounded cell table would not be driver-safe even at the maximum
    * sketch accuracy, or when a sketch band misses its target rank (never
    * observed; the guarantee is implementation-trusted, so the fallback
    * keeps correctness unconditional).
    */
  private[ops] def winsorBounds(
      df: DataFrame,
      keyCols: Seq[String],
      valueCol: String,
      pLo: Double,
      pHi: Double,
      maxKeys: Int): Option[Seq[WinsorBound]] = {
    val v = col(valueCol).cast("double")
    val keys = keyCols.map(col)
    val nk = keyCols.length

    def statsAt(accuracy: Int): (Array[org.apache.spark.sql.Row], Seq[Double]) = {
      val margin = 3.0 / accuracy
      val frs = Seq(
        math.max(pLo - margin, 1e-9), pLo, math.min(pLo + margin, 1.0),
        math.max(pHi - margin, 1e-9), pHi, math.min(pHi + margin, 1.0))
        .distinct.sorted
      val rows = df.groupBy(keys: _*)
        .agg(count(lit(1)).as("__n_all"), count(v).as("__n"),
          percentile_approx(v, array(frs.map(lit): _*), lit(accuracy))
            .as("__apx"))
        .limit(maxKeys + 1).collect()
      (rows, frs)
    }

    var accuracy = 2000
    var (stats, frs) = statsAt(accuracy)
    if (stats.length > maxKeys) return None
    if (stats.exists(r => r.getLong(nk) != r.getLong(nk + 1))) return None
    if (stats.isEmpty) return Some(Seq.empty)
    // driver-safety: in-band cells ≈ 16·n_total/accuracy. Re-sketch at a
    // higher accuracy when the estimate is too big; past the 100k sketch
    // ceiling (≈12G rows), hand the job back to the windowed shape.
    val nTotal = stats.map(_.getLong(nk)).sum
    val cellCap = 2000000L
    if (16L * nTotal / accuracy > cellCap) {
      val need = math.ceil(16.0 * nTotal / cellCap).toInt
      if (need > 100000) return None
      accuracy = need
      val re = statsAt(accuracy)
      stats = re._1; frs = re._2
      if (stats.length > maxKeys) return None
      if (stats.exists(r => r.getLong(nk) != r.getLong(nk + 1))) return None
    }
    val margin = 3.0 / accuracy
    val frIdx = frs.zipWithIndex.toMap

    final case class Plan(key: Seq[Any], n: Long, loK: Long, hiK: Long,
      los: Array[Double], his: Array[Double])
    val plans: Seq[Plan] = stats.toSeq.map { r =>
      val key = (0 until nk).map(r.get)
      val n   = r.getLong(nk)
      val apx = r.getSeq[Double](nk + 2).toArray
      val bands = Seq(pLo, pHi).map { p =>
        (apx(frIdx(math.max(p - margin, 1e-9))),
         apx(frIdx(math.min(p + margin, 1.0))))
      }.sortBy(_._1)
      val merged = bands.foldLeft(List.empty[(Double, Double)]) {
        case ((lo0, hi0) :: tail, (lo, hi)) if lo <= hi0 =>
          (lo0, math.max(hi0, hi)) :: tail
        case (acc, b) => b :: acc
      }.reverse.toArray
      Plan(key, n, kOfL(pLo, n), kOfL(pHi, n),
        merged.map(_._1), merged.map(_._2))
    }

    val spark = df.sparkSession
    val planSchema = org.apache.spark.sql.types.StructType(
      df.select(keys: _*).schema.fields ++ Seq(
        org.apache.spark.sql.types.StructField("__los",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.DoubleType)),
        org.apache.spark.sql.types.StructField("__his",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.DoubleType))))
    val planDf = spark.createDataFrame(
      spark.sparkContext.parallelize(plans.map(p =>
        org.apache.spark.sql.Row.fromSeq(p.key ++ Seq(p.los.toSeq, p.his.toSeq))), 1),
      planSchema)

    val seg = (size(filter(col("__los"), l => l <= col("__v"))) +
               size(filter(col("__his"), h => h < col("__v"))))
    val cells = df.filter(v.isNotNull)
      .select(keys :+ v.as("__v"): _*)
      .join(broadcast(planDf), keyCols)
      .withColumn("__seg", seg)
      .groupBy(keys ++ Seq(col("__seg"),
        when(col("__seg") % 2 === 1, col("__v")).as("__bv")): _*)
      .agg(count(lit(1)).as("__c"), sum(col("__v")).as("__sv"))
      .limit(cellCap.toInt + 1)
      .collect()
    if (cells.length > cellCap) return None

    val byKey: Map[Seq[Any], Array[org.apache.spark.sql.Row]] =
      cells.groupBy(r => (0 until nk).map(r.get): Seq[Any])
    val out = plans.map { p =>
      val ordered = byKey
        .getOrElse(p.key, Array.empty[org.apache.spark.sql.Row])
        .map(r => (r.getInt(nk), Option(r.get(nk + 1)).map(_.asInstanceOf[Double]),
          r.getLong(nk + 2), r.getDouble(nk + 3)))
        .sortBy { case (s, bv, _, _) => (s, bv.getOrElse(0.0)) }
      // walk 1: exact lo / hi off the cumulative counts
      var cum = 0L
      var lo = Double.NaN; var hi = Double.NaN
      var loSeg = -1; var hiSeg = -1
      ordered.foreach { case (s, bv, c, _) =>
        val first = cum + 1; cum += c
        if (p.loK >= first && p.loK <= cum) { lo = bv.getOrElse(Double.NaN); loSeg = s }
        if (p.hiK >= first && p.hiK <= cum) { hi = bv.getOrElse(Double.NaN); hiSeg = s }
      }
      if (loSeg % 2 != 1 || hiSeg % 2 != 1 || lo.isNaN || hi.isNaN) return None
      // walk 2: clamped sum off the cell counts/sums
      var sumW = 0.0
      ordered.foreach { case (s, bv, c, sv) =>
        sumW += (bv match {
          case Some(value) => c * math.min(math.max(value, lo), hi)
          case None =>
            if (s < loSeg) c * lo
            else if (s > hiSeg) c * hi
            else sv // between the bands: lo < v < hi, unclamped
        })
      }
      WinsorBound(p.key, p.n, lo, hi, sumW)
    }
    Some(out)
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
