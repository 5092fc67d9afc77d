package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Live event-type transition stream ([[graft.ops.Funnel.transitionMatrix]]
  * as a stream): per entity, emit one `(entity, from_type, to_type, ts)`
  * row for every consecutive event pair the moment the second event
  * arrives — the raw feed a live "what happens next" counter or next-event
  * anomaly monitor aggregates downstream (the batch operator's matrix is
  * exactly `groupBy(from, to).count` over this stream plus the per-from
  * normalization).
  *
  * Parity contract: fed the same events in timestamp order with ms-unique
  * timestamps per entity, the emitted pair stream equals the batch
  * operator's lag pairs row for row. Arrivals STRICTLY earlier than the
  * entity's last seen ts are stale and dropped (the r8 family rule: an
  * equal-ms arrival is still processed); within one micro-batch events
  * sort by ts with arrival order breaking ties, which is where a
  * ms-colliding feed can diverge from batch's `tieCols` order — the same
  * documented family caveat as [[StreamingFunnel]].
  *
  * State is O(1) per entity (last ts + last type); `idleTimeout` evicts
  * dormant entities, after which a returning entity's first event opens a
  * fresh chain (no pair is emitted across the eviction gap).
  */
object StreamingTransitions {

  private[streaming] case class TransState(prevTs: Long, prevType: String)

  def transitions[K](
      ds: Dataset[(K, Long, String)],
      idleTimeout: Option[String] = None)(
      implicit ke: Encoder[K],
      outEnc: Encoder[(K, String, String, Long)]): Dataset[(K, String, String, Long)] = {
    implicit val stateEnc: Encoder[TransState] = Encoders.product[TransState]
    val timeoutConf =
      if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    ds.groupByKey(_._1)
      .flatMapGroupsWithState[TransState, (K, String, String, Long)](
        OutputMode.Append(), timeoutConf) {
        (key: K, rows: Iterator[(K, Long, String)], state: GroupState[TransState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val out = scala.collection.mutable.ArrayBuffer.empty[(K, String, String, Long)]
            var st = state.getOption.orNull
            rows.toSeq.sortBy(_._2).foreach { case (_, t, typ) =>
              if (st == null || t >= st.prevTs) {
                // a null type BREAKS the chain rather than being skipped:
                // in the batch lag formulation a null-type row still
                // occupies the lag slot, so neither the pair INTO it nor
                // the pair OUT of it exists — the state records the null
                // so the next event starts a fresh chain
                if (typ != null && st != null && st.prevType != null)
                  out += ((key, st.prevType, typ, t))
                st = TransState(t, typ)
              } // else: stale arrival, drop
            }
            if (st != null) {
              state.update(st)
              idleTimeout.foreach(state.setTimeoutDuration)
            }
            out.iterator
          }
      }
  }
}
