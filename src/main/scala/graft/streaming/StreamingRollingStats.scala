package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Live counterparts of [[graft.ops.RollingStats]] — per-key rolling
  * Pearson correlation and least-squares slope over the last `frameRows`
  * rows, one output row per event, with BIT-exact batch parity.
  *
  * Parity mechanics (the [[StreamingBars.ewma]] frame-as-state pattern):
  * the state is the frame itself — the last `frameRows` `(x, y, ok)` rows,
  * `ok` marking rows where both inputs are present (a null-pair row holds
  * a frame SLOT, matching the batch `rowsBetween` frame, but contributes
  * to no sum — SQL `corr` pair semantics). Every event recomputes the six
  * co-moment sums by the same oldest-first fold Spark's sliding
  * WindowFrame runs (first contribution assigns, later ones add — the
  * `coalesce(sum + x, x)` association), then evaluates the identical
  * closed-form expression with the identical HALF_UP rounding, so stream
  * output ≡ batch output double-for-double. An incremental update
  * (`sx' = sx + x − x_evicted`) would drift in the last ulp — the frame
  * recompute is O(frame) per event and keeps replay-vs-tail equality
  * exact.
  *
  * Ordering contract shared with the whole streaming family: rows process
  * in ts order per key within a micro-batch; only arrivals STRICTLY before
  * the key's last seen ts are dropped — an equal-millisecond arrival is
  * still a frame row, because the batch ROWS window counts every row (the
  * r8 `>=` stale rule, shared with StreamingCusum / StreamingTransitions /
  * StreamingFunnel). `idleTimeout` evicts silent keys —
  * output is per-event, so eviction costs only frame history (a resumed
  * key restarts cold, like a fresh key).
  *
  * Scale shape: state is O(frame) doubles per key in the state store; the
  * computation is embarrassingly parallel over keys, exactly like the
  * batch operator's one hash shuffle.
  */
object StreamingRollingStats {

  private[streaming] case class CoMomentState(
      prevTs: Long, xs: List[Double], ys: List[Double], ok: List[Boolean])

  private def roundHalfUp(d: Double, scale: Int): Double =
    // Spark Round on DoubleType: shortest-repr BigDecimal, HALF_UP,
    // NaN/Infinity passthrough. The trailing + 0.0 mirrors the batch
    // operator's Num.round0 signed-zero normalization (-0.0 -> 0.0).
    if (d.isNaN || d.isInfinite) d
    else java.math.BigDecimal.valueOf(d)
      .setScale(scale, java.math.RoundingMode.HALF_UP).doubleValue() + 0.0

  /** (n, sx, sy, sxy, sxx, syy) over the frame, folded oldest-first with
    * assign-then-add association (what the batch window's six `sum`s do).
    */
  private def coMoments(st: CoMomentState): (Long, Double, Double, Double, Double, Double) = {
    var n = 0L
    var sx = 0.0; var sy = 0.0; var sxy = 0.0; var sxx = 0.0; var syy = 0.0
    var started = false
    val xi = st.xs.iterator; val yi = st.ys.iterator; val oi = st.ok.iterator
    while (xi.hasNext) {
      val x = xi.next(); val y = yi.next(); val o = oi.next()
      if (o) {
        if (!started) {
          sx = x; sy = y; sxy = x * y; sxx = x * x; syy = y * y
          started = true
        } else {
          sx += x; sy += y; sxy += x * y; sxx += x * x; syy += y * y
        }
        n += 1
      }
    }
    (n, sx, sy, sxy, sxx, syy)
  }

  private def advance(st: CoMomentState, t: Long,
      x: Option[Double], y: Option[Double], frameRows: Int): CoMomentState = {
    val ok = x.isDefined && y.isDefined
    CoMomentState(t,
      (st.xs :+ x.getOrElse(0.0)).takeRight(frameRows),
      (st.ys :+ y.getOrElse(0.0)).takeRight(frameRows),
      (st.ok :+ ok).takeRight(frameRows))
  }

  /** Streaming rolling Pearson correlation: one `(key, ts, roll_corr,
    * n_pairs)` row per event — `roll_corr` NULL under exactly the batch
    * rules (fewer than two pairs in frame, or a zero variance term).
    */
  def rollingCorr[K](
      ds: Dataset[(K, Long, Option[Double], Option[Double])],
      frameRows: Int = 20,
      roundTo: Int = 6,
      idleTimeout: Option[String] = None)(
      implicit ke: Encoder[K],
      outEnc: Encoder[(K, Long, Option[Double], Long)])
      : Dataset[(K, Long, Option[Double], Long)] = {
    require(frameRows >= 2, s"frame must be >= 2 rows: $frameRows")
    implicit val stateEnc: Encoder[CoMomentState] = Encoders.product[CoMomentState]
    val timeoutConf =
      if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    ds.groupByKey(_._1)
      .flatMapGroupsWithState[CoMomentState, (K, Long, Option[Double], Long)](
        OutputMode.Append(), timeoutConf) {
        (key: K, rows: Iterator[(K, Long, Option[Double], Option[Double])],
         state: GroupState[CoMomentState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val out = scala.collection.mutable.ArrayBuffer
              .empty[(K, Long, Option[Double], Long)]
            var st = state.getOption.getOrElse(CoMomentState(Long.MinValue, Nil, Nil, Nil))
            rows.toSeq.sortBy(_._2).foreach { case (_, t, x, y) =>
              if (t >= st.prevTs) {
                st = advance(st, t, x, y, frameRows)
                val (n, sx, sy, sxy, sxx, syy) = coMoments(st)
                val nD   = n.toDouble
                val varX = nD * sxx - sx * sx
                val varY = nD * syy - sy * sy
                val corr =
                  if (n >= 2 && varX > 0 && varY > 0)
                    Some(roundHalfUp((nD * sxy - sx * sy) /
                      (math.sqrt(varX) * math.sqrt(varY)), roundTo))
                  else None
                out += ((key, t, corr, n))
              } // else: stale arrival, drop
            }
            state.update(st)
            idleTimeout.foreach(state.setTimeoutDuration)
            out.iterator
          }
      }
  }

  private[streaming] case class BandState(prevTs: Long, xs: List[Double], ok: List[Boolean])

  /** Streaming rolling volatility band ([[graft.ops.RollingStats
    * .rollingBand]] as a stream): one `(key, ts, roll_mean, roll_std,
    * outside_band, n_in)` row per event — population σ over the last
    * `frameRows` ROWS (null values hold frame slots but contribute
    * nothing, the batch window's count/sum semantics), NULL stats below
    * two in-frame values, `outside_band` NULL when the row's own value is
    * null. Bit-exact batch parity: the frame folds oldest-first with the
    * same assign-then-add association as the batch window sums, and the
    * rounding (incl. the signed-zero normalization) matches `Num.round0`.
    */
  def rollingBand[K](
      ds: Dataset[(K, Long, Option[Double])],
      frameRows: Int = 20,
      nSigma: Double = 2.0,
      roundTo: Int = 6,
      idleTimeout: Option[String] = None)(
      implicit ke: Encoder[K],
      outEnc: Encoder[(K, Long, Option[Double], Option[Double], Option[Boolean], Long)])
      : Dataset[(K, Long, Option[Double], Option[Double], Option[Boolean], Long)] = {
    require(frameRows >= 2, s"frame must be >= 2 rows: $frameRows")
    implicit val stateEnc: Encoder[BandState] = Encoders.product[BandState]
    val timeoutConf =
      if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    ds.groupByKey(_._1)
      .flatMapGroupsWithState[BandState,
        (K, Long, Option[Double], Option[Double], Option[Boolean], Long)](
        OutputMode.Append(), timeoutConf) {
        (key: K, rows: Iterator[(K, Long, Option[Double])],
         state: GroupState[BandState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val out = scala.collection.mutable.ArrayBuffer
              .empty[(K, Long, Option[Double], Option[Double], Option[Boolean], Long)]
            var st = state.getOption.getOrElse(BandState(Long.MinValue, Nil, Nil))
            rows.toSeq.sortBy(_._2).foreach { case (_, t, x) =>
              // >= : an equal-millisecond arrival is still a frame row (the
              // batch window counts every row) — the r8 family stale rule
              // shared with StreamingCusum/StreamingTransitions; only a
              // strictly-earlier arrival is stale
              if (t >= st.prevTs) {
                st = BandState(t,
                  (st.xs :+ x.getOrElse(0.0)).takeRight(frameRows),
                  (st.ok :+ x.isDefined).takeRight(frameRows))
                // oldest-first assign-then-add fold, like the batch sums
                var n = 0L
                var sx = 0.0; var sxx = 0.0
                var started = false
                val xi = st.xs.iterator; val oi = st.ok.iterator
                while (xi.hasNext) {
                  val v = xi.next()
                  if (oi.next()) {
                    if (!started) { sx = v; sxx = v * v; started = true }
                    else { sx += v; sxx += v * v }
                    n += 1
                  }
                }
                val nD   = n.toDouble
                val varN = nD * sxx - sx * sx
                val ok   = n >= 2 && varN >= 0
                val mean = sx / nD
                val std  = math.sqrt(varN) / nD
                val (mOut, sOut) =
                  if (ok) (Some(roundHalfUp(mean, roundTo)),
                           Some(roundHalfUp(std, roundTo)))
                  else (None, None)
                val outside =
                  if (ok && x.isDefined) Some(math.abs(x.get - mean) > nSigma * std)
                  else None
                out += ((key, t, mOut, sOut, outside, n))
              } // else: stale arrival, drop
            }
            state.update(st)
            idleTimeout.foreach(state.setTimeoutDuration)
            out.iterator
          }
      }
  }

  private[streaming] case class PeakState(prevTs: Long, peak: Option[Double])

  /** Streaming running peak / drawdown ([[graft.ops.RollingStats
    * .runningDrawdown]] live): one `(key, ts, value, peak, drawdown)` row
    * per event. State is O(1) — just the expanding max — and parity with
    * the batch operator is exact to the BIT with no rounding anywhere:
    * the peak is a copied input value and the drawdown subtracts the same
    * two doubles both sides (nothing is ever summed). NULL values keep
    * the prior peak and emit NULL drawdown, matching the batch `max`
    * null-skip; a leading NULL (no peak yet) emits all-NULL stats.
    */
  def runningDrawdown[K](
      ds: Dataset[(K, Long, Option[Double])],
      idleTimeout: Option[String] = None)(
      implicit ke: Encoder[K],
      outEnc: Encoder[(K, Long, Option[Double], Option[Double], Option[Double])])
      : Dataset[(K, Long, Option[Double], Option[Double], Option[Double])] = {
    implicit val stateEnc: Encoder[PeakState] = Encoders.product[PeakState]
    val timeoutConf =
      if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    ds.groupByKey(_._1)
      .flatMapGroupsWithState[PeakState, (K, Long, Option[Double], Option[Double], Option[Double])](
        OutputMode.Append(), timeoutConf) {
        (key: K, rows: Iterator[(K, Long, Option[Double])],
         state: GroupState[PeakState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val out = scala.collection.mutable.ArrayBuffer
              .empty[(K, Long, Option[Double], Option[Double], Option[Double])]
            var st = state.getOption.getOrElse(PeakState(Long.MinValue, None))
            rows.toSeq.sortBy(_._2).foreach { case (_, t, v) =>
              if (t >= st.prevTs) {
                val peak = (st.peak, v) match {
                  case (Some(p), Some(x)) => Some(math.max(p, x))
                  case (p, x)             => p.orElse(x)
                }
                st = PeakState(t, peak)
                out += ((key, t, v,
                  peak, for (p <- peak; x <- v) yield p - x))
              } // else: stale arrival, drop
            }
            state.update(st)
            idleTimeout.foreach(state.setTimeoutDuration)
            out.iterator
          }
      }
  }

  /** Streaming rolling least-squares line of y on x: one `(key, ts,
    * roll_slope, roll_icept, n_pairs)` row per event. Same conditioning
    * caveat as the batch operator: re-anchor a timestamp x-axis to a small
    * range first — the cancellation in `nΣx² − (Σx)²` is identical here.
    */
  def rollingSlope[K](
      ds: Dataset[(K, Long, Option[Double], Option[Double])],
      frameRows: Int = 20,
      roundTo: Int = 6,
      idleTimeout: Option[String] = None)(
      implicit ke: Encoder[K],
      outEnc: Encoder[(K, Long, Option[Double], Option[Double], Long)])
      : Dataset[(K, Long, Option[Double], Option[Double], Long)] = {
    require(frameRows >= 2, s"frame must be >= 2 rows: $frameRows")
    implicit val stateEnc: Encoder[CoMomentState] = Encoders.product[CoMomentState]
    val timeoutConf =
      if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    ds.groupByKey(_._1)
      .flatMapGroupsWithState[CoMomentState, (K, Long, Option[Double], Option[Double], Long)](
        OutputMode.Append(), timeoutConf) {
        (key: K, rows: Iterator[(K, Long, Option[Double], Option[Double])],
         state: GroupState[CoMomentState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val out = scala.collection.mutable.ArrayBuffer
              .empty[(K, Long, Option[Double], Option[Double], Long)]
            var st = state.getOption.getOrElse(CoMomentState(Long.MinValue, Nil, Nil, Nil))
            rows.toSeq.sortBy(_._2).foreach { case (_, t, x, y) =>
              if (t >= st.prevTs) {
                st = advance(st, t, x, y, frameRows)
                val (n, sx, sy, sxy, sxx, _) = coMoments(st)
                val nD   = n.toDouble
                val varX = nD * sxx - sx * sx
                if (n >= 2 && varX > 0) {
                  val slope = (nD * sxy - sx * sy) / varX
                  out += ((key, t, Some(roundHalfUp(slope, roundTo)),
                    Some(roundHalfUp((sy - slope * sx) / nD, roundTo)), n))
                } else out += ((key, t, None, None, n))
              } // else: stale arrival, drop
            }
            state.update(st)
            idleTimeout.foreach(state.setTimeoutDuration)
            out.iterator
          }
      }
  }
}
