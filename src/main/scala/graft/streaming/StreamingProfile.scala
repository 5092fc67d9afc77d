package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming profiling: per-event-time-window sketch artifacts, the live
  * counterpart of the batch [[graft.pipeline.Sketches]] passes.
  *
  * The output row per (window, key) carries the exact row count, the HLL++
  * distinct estimate, AND the binary DataSketches HLL sketch itself — the
  * same persistable, mergeable artifact [[graft.pipeline.Sketches.hllPartSketches]]
  * emits in batch. A streaming profiling job therefore writes window-grain
  * sketches as they close, and any later batch union of any subset of
  * windows ([[graft.pipeline.Sketches.hllUnionEstimate]]) answers
  * distinct-count questions over arbitrary spans without replaying the
  * stream.
  *
  * Scale shape: one watermarked windowed aggregation — partial aggregates
  * merge map-side, state is bounded to open windows (watermark-evicted),
  * and each closed window emits a fixed-size (2^lgK bucket) sketch
  * regardless of event volume.
  */
object StreamingProfile {

  /** Per-window (and optional key) distinct profile over `valueCol`.
    *
    * Output: `window_start, window_end, <keyCols...>, n_rows,
    * n_distinct_est, hll_sketch` in append mode — rows emit once, when the
    * watermark passes the window end.
    */
  def windowedDistinct(
      df: DataFrame,
      tsCol: String,
      valueCol: String,
      windowDuration: String,
      watermarkDelay: String,
      keyCols: Seq[String] = Nil,
      lgK: Int = 14): DataFrame = {
    val groups: Seq[Column] =
      window(col(tsCol), windowDuration) +: keyCols.map(col)
    df.withWatermark(tsCol, watermarkDelay)
      .groupBy(groups: _*)
      .agg(
        count(lit(1)).as("n_rows"),
        approx_count_distinct(col(valueCol)).as("n_distinct_est"),
        hll_sketch_agg(col(valueCol), lit(lgK)).as("hll_sketch"))
      .select(
        col("window.start").as("window_start") +:
          col("window.end").as("window_end") +:
          keyCols.map(col) :+
          col("n_rows") :+ col("n_distinct_est") :+ col("hll_sketch"): _*)
  }

  /** Per-window count-min sketch over `itemCol` — the streaming half of
    * [[graft.pipeline.Sketches.heavyHitters]]. Each closed window emits one
    * fixed-size sketch (eps/confidence-bounded), built by the SAME
    * aggregate as the batch path with weight 1 per row, so CM linearity
    * makes the emitted bytes BIT-IDENTICAL to a batch sketch of the same
    * rows (same eps/confidence/seed): window sketches written by a live job
    * can later be merged cell-wise with batch sketches, and any consumer
    * probes `estimateCount` for its own candidate items — frequency
    * monitoring over arbitrary spans without replaying the stream.
    *
    * Scale shape: one watermarked windowed aggregation; partial sketches
    * merge map-side (TypedImperativeAggregate merge = cell-wise add), state
    * per open window is one sketch of fixed `O(1/eps · ln(1/(1-conf)))`
    * size regardless of event volume, and the watermark evicts it at close.
    */
  def windowedHeavyHitters(
      df: DataFrame,
      tsCol: String,
      itemCol: String,
      windowDuration: String,
      watermarkDelay: String,
      eps: Double = 1e-4,
      confidence: Double = 0.99,
      seed: Int = 42): DataFrame =
    df.filter(col(itemCol).isNotNull)
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowDuration))
      .agg(
        count(lit(1)).as("n_rows"),
        graft.functions.CountMinSketchWeighted
          .cmSketchWeighted(col(itemCol), lit(1L), eps, confidence, seed)
          .as("cms_sketch"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"), col("n_rows"), col("cms_sketch"))
}
