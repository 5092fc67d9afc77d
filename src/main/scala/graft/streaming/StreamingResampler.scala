package graft.streaming

import graft.time.Intervals
import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming analog of the batch [[graft.ops.Resampler]] (SURVEY §2.7).
  *
  * The reference is a batch *replay* of recorded streams; its semantics map
  * onto Structured Streaming as:
  *
  *  - event time     = the epoch-ms `__timestamp` column
  *  - tumbling grid  = `window($"ts", interval)` — but Spark's window strings
  *    don't speak the reference's `Nl` (millis) unit, so we bucket with
  *    integer math on the epoch-ms column instead (same trick as the batch
  *    resampler; also keeps everything in whole-stage codegen)
  *  - last-per-interval = windowed `max_by` aggregation with a watermark
  *    (append mode emits each boundary once its window closes)
  *  - gap fill + ffill  = custom state per stream key via
  *    `flatMapGroupsWithState` (the reference's `prev_msg`/`next_batch_ts`/
  *    `blank_msg` state triple, classes.py:583-587, held in GroupState)
  *  - late data: the reference assumes in-file sorted input and has no
  *    late-row story (SURVEY §2.7); here the watermark bounds lateness
  *    explicitly.
  */
object StreamingResampler {

  /** Stage 1 — last event per tumbling bucket, streaming-native.
    *
    * Input must have an epoch-ms Long `tsCol`. Produces one row per
    * non-empty bucket with `tsCol` = the bucket's emit boundary (bucket end,
    * exclusive-start semantics identical to the batch resampler: an event
    * exactly on a boundary reports to the next one).
    *
    * `watermarkDelay` (e.g. "10 seconds") bounds out-of-order tolerance;
    * results are append-mode: each boundary emits exactly once.
    */
  def lastPerBucket(
      df: DataFrame,
      interval: String,
      tsCol: String = graft.core.Fuser.TimestampCol,
      watermarkDelay: String = "10 seconds"): DataFrame = {
    // Day grids here are epoch-aligned = UTC midnight only; the batch
    // resampler's tz-midnight day alignment has no streaming analog in this
    // API. Sub-day units are identical to batch.
    val step     = Intervals.toMillis(interval)
    val dataCols = df.columns.filterNot(_ == tsCol).toSeq
    // Boundary an event reports to: first grid point strictly after ts
    // (epoch-aligned grid, matching the batch resampler for sub-day units).
    val boundary = (floor(col(tsCol) / lit(step)).cast("long") * lit(step) + lit(step))
    df.withColumn("__evt", timestamp_millis(col(tsCol)))
      .withWatermark("__evt", watermarkDelay)
      .withColumn("__boundary", boundary)
      .groupBy(window(col("__evt"), s"${step} milliseconds"), col("__boundary"))
      .agg(max_by(struct(dataCols.map(col): _*), col(tsCol)).as("__row"))
      .select(col("__boundary").as(tsCol) +: dataCols.map(c => col(s"__row.$c").as(c)): _*)
  }

  /** Streaming sessionization: Spark's native `session_window` (gap-based
    * merging session windows with watermark-driven close) — the streaming
    * analog of [[graft.ops.Sessionize]]. Emits one row per closed session
    * with the same summary columns as the batch `sessions`, minus the
    * per-key ordinal (streams have no total order to number sessions by;
    * `session_start` is the natural key).
    */
  def sessionize(
      df: DataFrame,
      keyCols: Seq[String],
      gapMs: Long,
      tsCol: String = graft.core.Fuser.TimestampCol,
      watermarkDelay: String = "10 seconds"): DataFrame = {
    df.withColumn("__evt", timestamp_millis(col(tsCol)))
      .withWatermark("__evt", watermarkDelay)
      .groupBy(session_window(col("__evt"), s"$gapMs milliseconds") +: keyCols.map(col): _*)
      .agg(count(lit(1)).as("n_events"),
           min(col(tsCol)).as("session_start"),
           max(col(tsCol)).as("session_end"))
      .select(keyCols.map(col) ++ Seq(col("session_start"), col("session_end"),
        col("n_events"), (col("session_end") - col("session_start")).as("span_ms")): _*)
  }

  // (per-key gap-fill state is the (nextBoundary, prevValue) tuple held in
  // GroupState — see gapFill's state encoder)

  /** Streaming linear interpolation onto the `interval` grid — the live
    * counterpart of [[graft.ops.Interpolate.linearAtGrid]], same grid and
    * lerp semantics: when a key's next point arrives, every grid boundary
    * `B` with `t_prev <= B < t_new` is emitted as
    * `v_prev + (v_new - v_prev)·(B − t_prev)/(t_new − t_prev)` (a boundary
    * ON a point takes its value exactly — zero-ratio identity). State per
    * key is ONE (ts, value) pair, so the store is O(live keys) regardless
    * of rate.
    *
    * Ordering contract: rows are lerped in (ts, value) order within each
    * micro-batch; a row older than the key's state (late beyond the
    * batch's own sorting) is DROPPED — interpolation is a forward
    * recurrence and cannot revise emitted segments. Use a watermark-sized
    * trigger upstream if cross-batch disorder matters. The batch operator
    * is the replayable ground truth.
    *
    * Emits (key, gridTs, value) tuples, in append mode.
    */
  def interpolate[K](
      ds: Dataset[(K, Long, Double)],
      interval: String,
      /** Evict a key's state after this much processing-time inactivity. */
      idleTimeout: Option[String] = None)(
      implicit ke: Encoder[K], tupleEnc: Encoder[(K, Long, Double)]): Dataset[(K, Long, Double)] = {
    val step = Intervals.toMillis(interval)
    implicit val stateEnc: Encoder[(Long, Double)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble)
    val timeoutConf =
      if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    ds.groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Double), (K, Long, Double)](
        OutputMode.Append(), timeoutConf) {
        (key: K, rows: Iterator[(K, Long, Double)], state: GroupState[(Long, Double)]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val out = scala.collection.mutable.ArrayBuffer.empty[(K, Long, Double)]
            var prev = state.getOption
            rows.toSeq.sortBy(r => (r._2, r._3)).foreach { case (_, t, v) =>
              prev match {
                case Some((tp, vp)) if t <= tp => // stale arrival: drop
                case Some((tp, vp)) =>
                  // grid indices k with tp <= k*step < t
                  var k = (tp + step - 1) / step
                  val kEnd = (t - 1) / step
                  while (k <= kEnd) {
                    val b = k * step
                    out += ((key, b, vp + (v - vp) * ((b - tp).toDouble / (t - tp))))
                    k += 1
                  }
                  prev = Some((t, v))
                case None =>
                  prev = Some((t, v))
              }
            }
            prev.foreach(state.update)
            idleTimeout.foreach(state.setTimeoutDuration)
            out.iterator
          }
      }
  }

  /** Stage 2 — dense-grid gap fill for a keyed stream of stage-1 rows.
    *
    * Typed API: `ds` carries (key, boundaryTs, payload). For each key the
    * state tracks the next expected boundary; when a row arrives `k` steps
    * ahead, the missing boundaries are emitted with `fill(payload)` — the
    * analog of the reference's blank row carrying only ffill keys
    * (classes.py:608-623). Assumes per-key event-time order, which stage 1's
    * append-mode output guarantees.
    */
  def gapFill[K, V](
      ds: Dataset[(K, Long, V)],
      stepMs: Long,
      fill: V => V,
      /** Evict a key's state after this much processing-time inactivity
        * (e.g. "1 hour") — without it, a churning key space (session ids,
        * delisted instruments) grows the state store without bound.
        */
      idleTimeout: Option[String] = None)(implicit ke: Encoder[K], ve: Encoder[V],
      tupleEnc: Encoder[(K, Long, V)]): Dataset[(K, Long, V)] = {
    implicit val stateEnc: Encoder[(Long, V)] = Encoders.tuple(Encoders.scalaLong, ve)
    val timeoutConf =
      if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    ds.groupByKey(_._1)
      .flatMapGroupsWithState[(Long, V), (K, Long, V)](
        OutputMode.Append(), timeoutConf) {
        (key: K, rows: Iterator[(K, Long, V)], state: GroupState[(Long, V)]) =>
          if (state.hasTimedOut) {
            // idle key: release its state; trailing gaps stay unfilled (the
            // reference's tail-flush analog is the batch finalize, not here)
            state.remove()
            Iterator.empty
          } else {
            // materializes ONE key's micro-batch (bounded by trigger size,
            // not by history) — the per-key sort GroupState cannot give us
            val sorted = rows.toSeq.sortBy(_._2)
            val out    = scala.collection.mutable.ArrayBuffer.empty[(K, Long, V)]
            var (nextB, prev) = state.getOption match {
              case Some((b, p)) => (b, Some(p))
              case None         => (sorted.headOption.map(_._2).getOrElse(0L), None)
            }
            sorted.foreach { case (_, b, v) =>
              // emit fills for skipped boundaries
              while (nextB < b && prev.nonEmpty) {
                out += ((key, nextB, fill(prev.get)))
                nextB += stepMs
              }
              out += ((key, b, v))
              nextB = b + stepMs
              prev = Some(v)
            }
            prev.foreach(p => state.update((nextB, p)))
            idleTimeout.foreach(state.setTimeoutDuration)
            out.iterator
          }
      }
  }
}
