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

  /** Per-(key, bucket) accumulator for [[twap]]: the previous event
    * (`prevTs`, `prevV` — the open segment's start) plus the open bucket's
    * partial sums. One fixed-size state row per key regardless of event
    * volume.
    */
  private[streaming] case class TwapState(
      prevTs: Long, prevV: Double,
      bucket: Long, sumVW: Double, sumW: Double, nSegs: Long)

  /** Streaming TWAP — the live counterpart of [[graft.ops.Bars.twap]] with
    * the same bar schema `(key, bucket, twap, n_segments, weight_ms)`,
    * segment semantics (each value weighted by its lifetime
    * `[t, t_next)`, attributed to the bucket containing its START) and
    * zero-weight guard, so replay-through-batch + tail-through-stream has
    * no seam.
    *
    * No watermark is needed to close bars: segments are keyed by their
    * START, and rows are processed in ts order per key (stale arrivals at
    * or before the key's last seen ts are dropped, the shared ordering
    * contract of the streaming family) — so the moment a segment starts in
    * a LATER bucket, every earlier bucket of that key is final and its bar
    * is emitted. State per key is one open segment + one partial bar:
    * O(live keys), same as the batch operator's per-group aggregation
    * state and independent of events per bucket.
    *
    * The bucket holding a key's newest segments stays open until a later
    * bucket's segment (or `idleTimeout`) closes it — the batch operator
    * reports that bucket from the same events, so exact parity is "batch
    * bars restricted to stream-closed buckets". On idle timeout the open
    * bar is FLUSHED (the engine's tail-flush convention — bar data is too
    * expensive to drop); a key that resumes afterwards starts fresh, so a
    * resumed stream can re-emit a later bar for the same bucket —
    * downstream dedup on (key, bucket) is the consumer's call, exactly as
    * with re-keyed artifact unions elsewhere.
    */
  def twap[K](
      ds: org.apache.spark.sql.Dataset[(K, Long, Double)],
      interval: String,
      roundTo: Int = 6,
      idleTimeout: Option[String] = None)(
      implicit ke: org.apache.spark.sql.Encoder[K],
      outEnc: org.apache.spark.sql.Encoder[(K, Long, Double, Long, Long)])
      : org.apache.spark.sql.Dataset[(K, Long, Double, Long, Long)] = {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    val step = Intervals.toMillis(interval)
    implicit val stateEnc: org.apache.spark.sql.Encoder[TwapState] =
      org.apache.spark.sql.Encoders.product[TwapState]
    val timeoutConf =
      if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    def bar(key: K, s: TwapState): (K, Long, Double, Long, Long) = {
      val twapVal =
        if (s.sumW > 0) BigDecimal(s.sumVW / s.sumW)
          .setScale(roundTo, BigDecimal.RoundingMode.HALF_UP).toDouble
        else Double.NaN // batch guard emits NULL; tuple encoder can't — NaN marks it
      (key, s.bucket, twapVal, s.nSegs, s.sumW.toLong)
    }
    ds.groupByKey(_._1)
      .flatMapGroupsWithState[TwapState, (K, Long, Double, Long, Long)](
        OutputMode.Append(), timeoutConf) {
        (key: K, rows: Iterator[(K, Long, Double)],
         state: org.apache.spark.sql.streaming.GroupState[TwapState]) =>
          if (state.hasTimedOut) {
            // flush the open bar (if it has any finished segments), forget the key
            val out = state.getOption.filter(_.nSegs > 0).map(bar(key, _))
            state.remove()
            out.iterator
          } else {
            val out = scala.collection.mutable.ArrayBuffer.empty[(K, Long, Double, Long, Long)]
            var st = state.getOption
            rows.toSeq.sortBy(_._2).foreach { case (_, t, v) =>
              st match {
                case Some(s) if t <= s.prevTs => // stale arrival: drop
                case Some(s) =>
                  val w = (t - s.prevTs).toDouble
                  val b = Math.floorDiv(s.prevTs, step) * step
                  st = Some(
                    if (s.nSegs == 0L || b == s.bucket)
                      s.copy(prevTs = t, prevV = v, bucket = b,
                        sumVW = s.sumVW + s.prevV * w, sumW = s.sumW + w,
                        nSegs = s.nSegs + 1)
                    else {
                      out += bar(key, s)
                      TwapState(t, v, b, s.prevV * w, w, 1L)
                    })
                case None =>
                  st = Some(TwapState(t, v, bucket = 0L, 0.0, 0.0, 0L))
              }
            }
            st.foreach(state.update)
            idleTimeout.foreach(state.setTimeoutDuration)
            out.iterator
          }
      }
  }

  /** Per-key accumulator for [[ewma]]: the last `frameRows` values in
    * chronological order plus the newest timestamp (for the stale-drop
    * ordering contract). Bounded: O(frame) doubles per key.
    */
  private[streaming] case class EwmaState(prevTs: Long, frame: List[Double])

  /** Streaming EWMA — the live counterpart of [[graft.ops.Bars.ewma]],
    * emitting one smoothed row per event: the last `frameRows` values of
    * the key, the j-th-newest weighted `decay^j`, normalized by the
    * closed-form weight total.
    *
    * BIT-exact batch parity, not just semantic parity: the state is the
    * frame itself (≤ `frameRows` doubles), and every event recomputes the
    * same oldest-first fold `acc*decay + x` the batch operator's
    * `aggregate()` runs, with the same closed-form
    * `(1 − decay^n)/(1 − decay)` normalizer — identical association,
    * identical doubles. An incremental-update shortcut
    * (`ws' = ws*decay + x − x_old*decay^f`) would drift from the batch
    * result in the last ulp and break replay-vs-tail equality, the
    * property this family exists for.
    *
    * Ordering contract as the rest of the family: rows process in ts
    * order per key within a micro-batch; only arrivals strictly before the
    * key's last seen ts are dropped — an equal-millisecond arrival is
    * still a frame row, matching the batch ROWS window (the r8 `>=` stale
    * rule). `idleTimeout` evicts silent keys (output
    * is per-event, so eviction loses only smoothing history: a resumed
    * key restarts its frame cold, exactly like a fresh key).
    */
  def ewma[K](
      ds: org.apache.spark.sql.Dataset[(K, Long, Double)],
      frameRows: Int = 10,
      decay: Double = 0.5,
      idleTimeout: Option[String] = None)(
      implicit ke: org.apache.spark.sql.Encoder[K],
      outEnc: org.apache.spark.sql.Encoder[(K, Long, Double, Double)])
      : org.apache.spark.sql.Dataset[(K, Long, Double, Double)] = {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    require(frameRows >= 1, s"frame must be >= 1: $frameRows")
    require(decay > 0 && decay < 1, s"decay must be in (0,1): $decay")
    implicit val stateEnc: org.apache.spark.sql.Encoder[EwmaState] =
      org.apache.spark.sql.Encoders.product[EwmaState]
    val timeoutConf =
      if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    ds.groupByKey(_._1)
      .flatMapGroupsWithState[EwmaState, (K, Long, Double, Double)](
        OutputMode.Append(), timeoutConf) {
        (key: K, rows: Iterator[(K, Long, Double)],
         state: org.apache.spark.sql.streaming.GroupState[EwmaState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val out = scala.collection.mutable.ArrayBuffer.empty[(K, Long, Double, Double)]
            var st = state.getOption.getOrElse(EwmaState(Long.MinValue, Nil))
            rows.toSeq.sortBy(_._2).foreach { case (_, t, v) =>
              // >= : ROWS-frame operator — an equal-ms arrival is still a
              // frame row like the batch window (the r8 family stale rule)
              if (t >= st.prevTs) {
                val frame = (st.frame :+ v).takeRight(frameRows)
                // same oldest-first fold + closed-form weight as batch
                var ws = 0.0
                frame.foreach(x => ws = ws * decay + x)
                val weight = (1.0 - math.pow(decay, frame.length.toDouble)) /
                  (1.0 - decay)
                out += ((key, t, v, ws / weight))
                st = EwmaState(t, frame)
              } // else: stale arrival, drop
            }
            state.update(st)
            idleTimeout.foreach(state.setTimeoutDuration)
            out.iterator
          }
      }
  }

  /** Streaming debounce — the live counterpart of
    * [[graft.ops.Sessionize.debounce]]: passes through exactly the first
    * event of each burst (first seen for the key, or arriving more than
    * `gapMs` after the previous event); the trailing chatter is dropped.
    * Same one-timestamp-per-key state and ordering contract as [[gaps]].
    */
  def debounce[K](
      ds: org.apache.spark.sql.Dataset[(K, Long)],
      gapMs: Long,
      idleTimeout: Option[String] = None)(
      implicit ke: org.apache.spark.sql.Encoder[K],
      tupleEnc: org.apache.spark.sql.Encoder[(K, Long)])
      : org.apache.spark.sql.Dataset[(K, Long)] = {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    require(gapMs > 0, s"gap must be positive: $gapMs")
    implicit val stateEnc: org.apache.spark.sql.Encoder[Long] =
      org.apache.spark.sql.Encoders.scalaLong
    val timeoutConf =
      if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    ds.groupByKey(_._1)
      .flatMapGroupsWithState[Long, (K, Long)](OutputMode.Append(), timeoutConf) {
        (key: K, rows: Iterator[(K, Long)],
         state: org.apache.spark.sql.streaming.GroupState[Long]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val out = scala.collection.mutable.ArrayBuffer.empty[(K, Long)]
            var prev = state.getOption
            rows.toSeq.sortBy(_._2).foreach { case (_, t) =>
              prev match {
                case Some(tp) if t <= tp => // stale arrival: drop
                case Some(tp) =>
                  if (t - tp > gapMs) out += ((key, t))
                  prev = Some(t)
                case None =>
                  out += ((key, t))
                  prev = Some(t)
              }
            }
            prev.foreach(state.update)
            idleTimeout.foreach(state.setTimeoutDuration)
            out.iterator
          }
      }
  }

  /** Streaming gap report — the live counterpart of [[graft.ops.Bars.gaps]]:
    * emits (key, gap_start, gap_end, gap_ms) the moment a key's stream
    * resumes after more than `thresholdMs` of silence. State per key is ONE
    * timestamp, so the store is O(live keys).
    *
    * Ordering contract (same as the streaming interpolator): rows are
    * processed in ts order within each micro-batch; a row at or before the
    * key's last seen ts is dropped — a gap is a forward observation and
    * cannot be revised. `idleTimeout` evicts keys that stopped arriving
    * entirely (a stream that never resumes never reports its last gap —
    * detecting silence with no successor row needs a clock, which is the
    * timeout's job: eviction simply forgets the key).
    */
  def gaps[K](
      ds: org.apache.spark.sql.Dataset[(K, Long)],
      thresholdMs: Long,
      idleTimeout: Option[String] = None)(
      implicit ke: org.apache.spark.sql.Encoder[K],
      tupleEnc: org.apache.spark.sql.Encoder[(K, Long)],
      outEnc: org.apache.spark.sql.Encoder[(K, Long, Long, Long)])
      : org.apache.spark.sql.Dataset[(K, Long, Long, Long)] = {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    require(thresholdMs > 0, s"threshold must be positive: $thresholdMs")
    implicit val stateEnc: org.apache.spark.sql.Encoder[Long] =
      org.apache.spark.sql.Encoders.scalaLong
    val timeoutConf =
      if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    ds.groupByKey(_._1)
      .flatMapGroupsWithState[Long, (K, Long, Long, Long)](
        OutputMode.Append(), timeoutConf) {
        (key: K, rows: Iterator[(K, Long)],
         state: org.apache.spark.sql.streaming.GroupState[Long]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val out = scala.collection.mutable.ArrayBuffer.empty[(K, Long, Long, Long)]
            var prev = state.getOption
            rows.toSeq.sortBy(_._2).foreach { case (_, t) =>
              prev match {
                case Some(tp) if t <= tp => // stale arrival: drop
                case Some(tp) =>
                  if (t - tp > thresholdMs) out += ((key, tp, t, t - tp))
                  prev = Some(t)
                case None =>
                  prev = Some(t)
              }
            }
            prev.foreach(state.update)
            idleTimeout.foreach(state.setTimeoutDuration)
            out.iterator
          }
      }
  }
}
