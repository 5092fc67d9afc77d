package graft.ops

import graft.time.Intervals
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval bars over an irregular series — OHLC candles, time-weighted
  * averages, and gap reports: the aggregation family every market-data /
  * sensor consumer of a time-series fuser asks for next (the reference
  * engine stops at last-value sampling, classes.py:589-637; kdb `xbar`,
  * InfluxDB `aggregateWindow` and TimescaleDB `time_bucket` + `candlestick`
  * are the public analogs of these three).
  *
  * All three share one scale shape: a single hash shuffle on
  * (key, bucket) or (key), then sorted per-partition windows / map-side
  * combined aggregation — no global window, no explode, no driver scalars,
  * so the plan is identical at sf0.01 and at 100 TB. Buckets are
  * epoch-aligned (`floor(t / step) * step`) for EVERY interval unit,
  * matching [[Resampler]]'s sub-day grid model; note that for 'd'
  * intervals this means UTC midnight — Resampler's optional
  * timezone-aligned day grids (`ResampleOptions.tz`) do not apply
  * here. For local-midnight day bars, shift `tsCol` by the zone offset
  * before bucketing.
  */
object Bars {

  /** OHLC bars: per (key, epoch-aligned `interval` bucket) emit
    * open / high / low / close / n of `valueCol` — all exact copies or
    * integer counts, never an order-dependent float aggregate (a rounded
    * mean here proved boundary-prone cross-engine: 2-decimal inputs put
    * bar means EXACTLY on decimal rounding boundaries, where the engines'
    * ulp-different sums round apart; duration-correct averaging is
    * [[twap]]'s job anyway).
    *
    * Open and close are the first/last value in `(tsCol, tieCols)` order —
    * pass `tieCols` whenever (key, ts) can collide, otherwise the pick at
    * an equal-ts edge is nondeterministic. Implemented as first_value /
    * last_value over a (key, bucket)-partitioned window followed by a
    * groupBy on the SAME keys: the aggregation reuses the window's
    * exchange+sort, so the whole bar stream costs one shuffle.
    *
    * `tsCol` must be epoch-ms Long (the engine's canonical time axis).
    */
  def ohlc(
      df: DataFrame,
      interval: String,
      keyCols: Seq[String],
      tsCol: String = graft.core.Fuser.TimestampCol,
      valueCol: String = "value",
      tieCols: Seq[String] = Nil): DataFrame = {
    val step = Intervals.toMillis(interval)
    val keys = keyCols.map(col)
    val bucket = (floor(col(tsCol) / step) * step).cast("long").as("bar_start")
    val order  = (col(tsCol) +: tieCols.map(col)).map(_.asc)
    val w = Window.partitionBy((keys :+ col("bar_start")): _*).orderBy(order: _*)
    val wFull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    df.select((keys :+ bucket :+ col(tsCol) :+ col(valueCol)) ++ tieCols.map(col): _*)
      .withColumn("__open",  first(col(valueCol)).over(w))
      .withColumn("__close", last(col(valueCol)).over(wFull))
      .groupBy((keys :+ col("bar_start")): _*)
      .agg(
        // every row in the group carries the same __open/__close; min() is
        // just a deterministic pick of that constant
        min(col("__open")).as("open"),
        max(col(valueCol)).as("high"),
        min(col(valueCol)).as("low"),
        min(col("__close")).as("close"),
        count(lit(1)).as("n"))
  }

  /** Time-weighted average (TWAP): per (key, `interval` bucket of segment
    * start), the average of `valueCol` weighted by how long each value was
    * live — `sum(v * (t_next - t)) / sum(t_next - t)` over consecutive
    * events of the key. The plain-mean of irregular data over-weights
    * bursts; TWAP is the standard correction (and the form exchanges /
    * TSDBs publish).
    *
    * Each segment `[t, t_next)` is attributed wholly to the bucket
    * containing its START (as-traded convention — one window pass, no
    * segment splitting at bucket edges; the alternative exact-split
    * semantics is [[Interpolate.linearAtGrid]] + a plain mean). A key's
    * last event has no successor and carries no weight.
    *
    * A bucket whose segments ALL have zero duration (every event of the
    * key at one timestamp, distinguished only by tie columns) has
    * `sum(w) = 0`; its `twap` is NULL under an explicit guard — without
    * it Spark's Divide yields NULL but IEEE float division (DuckDB)
    * yields NaN, a latent cross-engine divergence. Day ('d') intervals
    * bucket by plain epoch floor = UTC midnight, like
    * [[graft.streaming.StreamingResampler]]; [[Resampler]]'s
    * timezone-aligned day grids do NOT apply here — use a tz-shifted
    * `tsCol` if local-midnight day bars are required.
    */
  def twap(
      df: DataFrame,
      interval: String,
      keyCols: Seq[String],
      tsCol: String = graft.core.Fuser.TimestampCol,
      valueCol: String = "value",
      tieCols: Seq[String] = Nil,
      roundTo: Int = 6): DataFrame = {
    val step = Intervals.toMillis(interval)
    val keys = keyCols.map(col)
    val order = (col(tsCol) +: tieCols.map(col)).map(_.asc)
    val w = Window.partitionBy(keys: _*).orderBy(order: _*)
    df.select((keys :+ col(tsCol) :+ col(valueCol)) ++ tieCols.map(col): _*)
      .withColumn("__w", (lead(col(tsCol), 1).over(w) - col(tsCol)).cast("double"))
      .filter(col("__w").isNotNull)
      .groupBy(keys :+ (floor(col(tsCol) / step) * step).cast("long").as("bucket"): _*)
      .agg(
        when(sum(col("__w")) > 0,
          round(sum(col(valueCol) * col("__w")) / sum(col("__w")), roundTo))
          .as("twap"),
        count(lit(1)).as("n_segments"),
        sum(col("__w")).cast("long").as("weight_ms"))
  }

  /** Exponentially-weighted moving average over a bounded row frame: the
    * last `frameRows` values of the key, the j-th-newest weighted
    * `decay^j` — the standard smoothing primitive ([[twap]] weights by
    * TIME; this weights by RECENCY).
    *
    * Deterministic to the BIT across engines, no rounding slop: the
    * weighted sum is one chronological fold `acc*decay + x` (a fixed
    * association any engine reproduces), and the weight total is the
    * closed form `(1 - decay^n)/(1 - decay)` — with the default
    * `decay = 0.5` every power is an exact binary double. That exactness
    * argument needs a power-of-two decay; other decays are still
    * deterministic per engine but may differ cross-engine in the last ulp.
    *
    * Scale shape: one key shuffle, one sorted window, O(frame) state per
    * row (the frame list) — same streaming WindowExec as a rolling mean.
    */
  def ewma(
      df: DataFrame,
      keyCols: Seq[String],
      tsCol: String = graft.core.Fuser.TimestampCol,
      valueCol: String = "value",
      frameRows: Int = 10,
      decay: Double = 0.5,
      tieCols: Seq[String] = Nil): DataFrame = {
    require(frameRows >= 1, s"frame must be >= 1: $frameRows")
    require(decay > 0 && decay < 1, s"decay must be in (0,1): $decay")
    val order = (col(tsCol) +: tieCols.map(col)).map(_.asc)
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(order: _*)
      .rowsBetween(-(frameRows - 1), 0)
    val frame = collect_list(col(valueCol)).over(w)
    val ws = aggregate(frame, lit(0.0), (acc, x) => acc * decay + x)
    val n  = size(frame)
    val weight = (lit(1.0) - pow(lit(decay), n.cast("double"))) / (1.0 - decay)
    df.withColumn("ewma", ws / weight)
  }

  /** Volume-weighted average price per `interval` bucket per key — the
    * quantity-weighted companion to [[twap]] (which weights by elapsed
    * TIME): `vwap = Σ value·qty / Σ qty` over the bucket's events, plus
    * the exact totals (`qty_total`, `n_trades`) the weighted mean was
    * built from. Rows with a NULL or non-positive quantity — or a NULL
    * value — contribute nothing to EITHER sum: a null-value row with
    * positive qty would otherwise inflate the denominator and totals
    * while adding nothing to the numerator, silently deflating the
    * weighted mean (a dropped observation must drop whole).
    *
    * A bucket whose quantities sum to zero (all excluded) yields NULL
    * under an explicit guard, for the same Spark-NULL/DuckDB-NaN division
    * divergence documented on [[twap]]. The weighted sum is rounded
    * (float products, engine-order summation); `qty_total` is an exact
    * integer.
    *
    * Scale shape: a straight one-level aggregation — map-side partial
    * sums per (key, bucket), one exchange on the group key. No window, no
    * sort; this is the cheapest bar in the file.
    */
  def vwap(
      df: DataFrame,
      interval: String,
      keyCols: Seq[String],
      tsCol: String = graft.core.Fuser.TimestampCol,
      valueCol: String = "value",
      qtyCol: String = "qty",
      roundTo: Int = 6): DataFrame = {
    val step = Intervals.toMillis(interval)
    val keys = keyCols.map(col)
    val q = when(col(qtyCol).isNotNull && col(qtyCol) > 0 &&
      col(valueCol).isNotNull, col(qtyCol))
    df.groupBy(keys :+ (floor(col(tsCol) / step) * step).cast("long").as("bucket"): _*)
      .agg(
        when(sum(q) > 0,
          round(sum(col(valueCol) * q.cast("double")) / sum(q).cast("double"), roundTo))
          .as("vwap"),
        coalesce(sum(q), lit(0L)).cast("long").as("qty_total"),
        count(q).as("n_trades"))
  }

  /** Gap report: every place a key's stream went silent for more than
    * `thresholdMs` — the data-quality audit run before trusting any
    * resample/ffill output (a filled gap LOOKS like data; this says where
    * that happened). Emits (key..., gap_start = last ts before the gap,
    * gap_end = first ts after, gap_ms).
    *
    * One shuffle on the key, one lag window, then a narrow filter — at
    * 100 TB the output is proportional to the number of OUTAGES, not rows.
    */
  def gaps(
      df: DataFrame,
      keyCols: Seq[String],
      thresholdMs: Long,
      tsCol: String = graft.core.Fuser.TimestampCol,
      tieCols: Seq[String] = Nil): DataFrame = {
    require(thresholdMs > 0, s"threshold must be positive: $thresholdMs")
    val keys = keyCols.map(col)
    val order = (col(tsCol) +: tieCols.map(col)).map(_.asc)
    val w = Window.partitionBy(keys: _*).orderBy(order: _*)
    df.select((keys :+ col(tsCol)) ++ tieCols.map(col): _*)
      .withColumn("__prev", lag(col(tsCol), 1).over(w))
      .filter(col(tsCol) - col("__prev") > thresholdMs)
      .select(keys ++ Seq(col("__prev").as("gap_start"), col(tsCol).as("gap_end"),
        (col(tsCol) - col("__prev")).as("gap_ms")): _*)
  }
}
