package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Live two-sided CUSUM monitor ([[graft.ops.Anomalies.cusumOnline]] as a
  * stream): per entity, maintain `S⁺/S⁻` with the reflecting-barrier
  * recursion and emit one `(key, ts, s_pos, s_neg, alarm)` row per event —
  * the real-time mean-shift alarm the retrospective changepoint report can
  * only backfill.
  *
  * Parity contract: fed the same events in timestamp order, the emitted
  * rows are BIT-exact equal to the batch operator's columns — everything
  * is integer arithmetic (cents, integer μ₀/k/h), and the batch
  * prefix-sum identity `S_t = P_t − min(0, min_{j≤t} P_j)` is exactly
  * this recursion unrolled. Null values carry state (the row is emitted
  * with the unchanged S, like the batch null contract); arrivals strictly
  * earlier than the last seen ts are stale and dropped (r8 family rule).
  * State is three longs per entity; `idleTimeout` evicts dormant keys
  * (a returning entity restarts from S = 0, which for a monitor is the
  * conservative cold start).
  */
object StreamingCusum {

  private[streaming] case class CusumState(prevTs: Long, sPos: Long, sNeg: Long)

  def cusum[K](
      ds: Dataset[(K, Long, Option[Long])],
      mu0: Long,
      slack: Long,
      threshold: Long,
      idleTimeout: Option[String] = None)(
      implicit ke: Encoder[K],
      outEnc: Encoder[(K, Long, Long, Long, Boolean)]): Dataset[(K, Long, Long, Long, Boolean)] = {
    require(slack >= 0 && threshold > 0, s"bad slack/threshold: $slack/$threshold")
    implicit val stateEnc: Encoder[CusumState] = Encoders.product[CusumState]
    val timeoutConf =
      if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    ds.groupByKey(_._1)
      .flatMapGroupsWithState[CusumState, (K, Long, Long, Long, Boolean)](
        OutputMode.Append(), timeoutConf) {
        (key: K, rows: Iterator[(K, Long, Option[Long])], state: GroupState[CusumState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val out = scala.collection.mutable.ArrayBuffer.empty[(K, Long, Long, Long, Boolean)]
            var st = state.getOption.getOrElse(CusumState(Long.MinValue, 0L, 0L))
            rows.toSeq.sortBy(_._2).foreach { case (_, t, xOpt) =>
              if (t >= st.prevTs) {
                xOpt match {
                  case Some(x) =>
                    val sp = math.max(0L, st.sPos + (x - mu0 - slack))
                    val sn = math.max(0L, st.sNeg + (mu0 - x - slack))
                    st = CusumState(t, sp, sn)
                  case None =>
                    st = st.copy(prevTs = t) // null carries state
                }
                out += ((key, t, st.sPos, st.sNeg,
                  st.sPos > threshold || st.sNeg > threshold))
              } // else: stale arrival, drop
            }
            state.update(st)
            idleTimeout.foreach(state.setTimeoutDuration)
            out.iterator
          }
      }
  }
}
