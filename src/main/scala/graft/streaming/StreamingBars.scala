package graft.streaming

import graft.time.Intervals
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming OHLC candles — the live counterpart of [[graft.ops.Bars.ohlc]]
  * with the same bar schema and tie rules, so a consumer can replay history
  * through the batch operator and tail the stream through this one without
  * a seam.
  */
object StreamingBars {

  /** One candle per (key, epoch-aligned `interval` bucket), emitted once
    * when the watermark closes the bucket (append mode — late rows beyond
    * `watermarkDelay` are dropped by the engine, the standard trade the
    * batch operator doesn't have to make).
    *
    * Open/close are `min_by`/`max_by` over the `(tsCol, tieCols)` struct —
    * declarative aggregates, so the state per live bucket is one partial
    * candle (a few scalars), not the events: a million-trade bucket holds
    * O(1) state, and partial aggregation combines map-side before the
    * shuffle exactly as in batch.
    */
  def ohlc(
      df: DataFrame,
      interval: String,
      keyCols: Seq[String],
      tsCol: String = graft.core.Fuser.TimestampCol,
      valueCol: String = "value",
      tieCols: Seq[String] = Nil,
      watermarkDelay: String = "10 seconds"): DataFrame = {
    val step = Intervals.toMillis(interval)
    val ord  = struct((col(tsCol) +: tieCols.map(col)): _*)
    df.withColumn("__evt", timestamp_millis(col(tsCol)))
      .withWatermark("__evt", watermarkDelay)
      .groupBy(window(col("__evt"), s"$step milliseconds") +: keyCols.map(col): _*)
      .agg(
        min_by(col(valueCol), ord).as("open"),
        max(col(valueCol)).as("high"),
        min(col(valueCol)).as("low"),
        max_by(col(valueCol), ord).as("close"),
        count(lit(1)).as("n"))
      .select(keyCols.map(col) ++ Seq(
        unix_millis(col("window.start")).as("bar_start"),
        col("open"), col("high"), col("low"), col("close"), col("n")): _*)
  }
}
