package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sessionization: split each key's event stream into sessions wherever the
  * gap to the previous event exceeds `gapMs`. The standard prelude to
  * session-level training-data features (dialogue turns, browse sessions,
  * trading bursts).
  *
  * Shape: one shuffle on the key, then two stacked per-key windows (lag for
  * the gap flag, running sum for the session index) — both partitioned by
  * the key, parallel across executors, nothing single-task. Session ids are
  * per-key ordinals (0-based first session), deterministic given a total
  * (ts, tieCols) order.
  *
  * Hot-key caveat: a per-key running ordinal is inherently sequential, so
  * ONE key's whole history sorts and numbers inside one window task (every
  * engine pays this; AQE skew-split cannot split a window partition). For a
  * mega-key (a bot user with 10⁸ events) prefer the streaming
  * `session_window` variant ([[graft.streaming.StreamingResampler.sessionize]]),
  * which never materializes a key's full history, or pre-split the key.
  */
object Sessionize {

  /** Adds `session_id` (per-key ordinal) and `is_session_start`. */
  def assign(
      df: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      gapMs: Long,
      tieCols: Seq[String] = Nil): DataFrame = {
    require(gapMs > 0, s"gap must be positive: $gapMs")
    val order = (col(tsCol) +: tieCols.map(col)).map(_.asc)
    val w     = Window.partitionBy(keyCols.map(col): _*).orderBy(order: _*)
    val isStart = coalesce(col(tsCol) - lag(col(tsCol), 1).over(w) > gapMs, lit(true))
    df.withColumn("is_session_start", isStart)
      .withColumn("session_id",
        sum(col("is_session_start").cast("long"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)) - 1L)
  }

  /** Debounce: keep only the FIRST event of every burst — the row that
    * opens each session under `gapMs` — dropping the trailing chatter
    * (duplicate sensor ticks, double-clicks, retry storms). The stream-
    * hygiene counterpart of [[assign]]: same single key shuffle + lag
    * window, then a narrow filter; output is one row per burst.
    */
  def debounce(
      df: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      gapMs: Long,
      tieCols: Seq[String] = Nil): DataFrame =
    assign(df, keyCols, tsCol, gapMs, tieCols)
      .filter(col("is_session_start"))
      .drop("is_session_start", "session_id")

  /** Per-session summary: bounds, event count and span. */
  def sessions(
      df: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      gapMs: Long,
      tieCols: Seq[String] = Nil): DataFrame =
    assign(df, keyCols, tsCol, gapMs, tieCols)
      .groupBy((keyCols.map(col) :+ col("session_id")): _*)
      .agg(min(col(tsCol)).as("session_start"),
           max(col(tsCol)).as("session_end"),
           count(lit(1)).as("n_events"))
      .withColumn("span_ms", col("session_end") - col("session_start"))
}
