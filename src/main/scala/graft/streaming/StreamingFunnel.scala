package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Live ordered-stage funnel ([[graft.ops.Funnel.funnelStages]] as a
  * stream): per entity, emit a row the moment a stage first completes
  * strictly after the previous one — the real-time "user just converted"
  * signal the batch report can only backfill.
  *
  * Parity contract: fed the same events in timestamp order, the set of
  * emitted completions equals the non-null `<stage>_ms` cells of the
  * batch operator row for row (same strict-`>` chaining, same
  * same-millisecond no-chain rule). Events for stages already completed,
  * for stages whose predecessor is missing, or STRICTLY before the
  * entity's last seen ts (stale out-of-order arrivals) are dropped —
  * an arrival at exactly the last seen millisecond is still processed,
  * so ts collisions across event types (a noise event and a stage event
  * sharing one ms) cannot shadow a completion the batch operator finds.
  * State is O(|stages|) longs per entity.
  *
  * TTL caveat: with `idleTimeout` set, expiry removes ALL state for the
  * entity — a returning entity restarts at stage 0 and its completions
  * are re-emitted. The output contract is therefore "one row per first
  * completion PER ACTIVITY EPOCH" (epochs delimited by idle gaps longer
  * than the timeout); downstream consumers needing global-first semantics
  * must dedup on (entity, stage), or run without a timeout. This is the
  * deliberate state-bound/semantics trade: a tombstone of completed
  * stages would make state grow with the total entity count forever,
  * which is exactly what the timeout exists to prevent.
  *
  * Output: one `(entity, stage, stage_idx, ts)` row per first completion.
  */
object StreamingFunnel {

  private[streaming] case class FunnelState(prevTs: Long, stageTs: List[Long])

  def funnelStages[K](
      ds: Dataset[(K, Long, String)],
      stages: Seq[String],
      idleTimeout: Option[String] = None)(
      implicit ke: Encoder[K],
      outEnc: Encoder[(K, String, Int, Long)]): Dataset[(K, String, Int, Long)] = {
    require(stages.nonEmpty, "need at least one stage")
    require(stages.distinct.size == stages.size, s"duplicate stages: $stages")
    implicit val stateEnc: Encoder[FunnelState] = Encoders.product[FunnelState]
    val stageIdx = stages.zipWithIndex.toMap
    val timeoutConf =
      if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    ds.groupByKey(_._1)
      .flatMapGroupsWithState[FunnelState, (K, String, Int, Long)](
        OutputMode.Append(), timeoutConf) {
        (key: K, rows: Iterator[(K, Long, String)], state: GroupState[FunnelState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val out = scala.collection.mutable.ArrayBuffer.empty[(K, String, Int, Long)]
            var st = state.getOption.getOrElse(FunnelState(Long.MinValue, Nil))
            rows.toSeq.sortBy(_._2).foreach { case (_, t, typ) =>
              // >= : only STRICTLY earlier arrivals are stale. A same-ms
              // arrival must still be considered, or a noise event sharing
              // the millisecond would shadow a stage completion batch sees
              // (stage chaining itself stays strict via t > stageTs.last).
              if (t >= st.prevTs) {
                val next = st.stageTs.length
                // only the next incomplete stage can advance, and only
                // strictly after the previous stage's completion ts
                if (next < stages.length && stageIdx.get(typ).contains(next) &&
                    (next == 0 || t > st.stageTs.last)) {
                  st = FunnelState(t, st.stageTs :+ t)
                  out += ((key, typ, next, t))
                } else {
                  st = st.copy(prevTs = t)
                }
              } // else: stale arrival, drop
            }
            state.update(st)
            idleTimeout.foreach(state.setTimeoutDuration)
            out.iterator
          }
      }
  }
}
