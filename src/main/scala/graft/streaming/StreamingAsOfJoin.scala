package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming as-of join — the streaming analog of [[graft.ops.AsOfJoin]]'s
  * backward mode: each left event attaches the most recent right event with
  * `rightTs <= leftTs` on the same key and within `maxStalenessMs`
  * (reference N/A — it has no joins at all, SURVEY §2.9; this is the
  * "latest quote per trade" enrichment every live pipeline needs).
  *
  * Shape: the same union trick as the batch operator, expressed as custom
  * state — both streams are tagged and merged, grouped by key, and a
  * `flatMapGroupsWithState` keeps ONLY the right rows still inside the
  * staleness horizon BEHIND THE NEWEST LEFT event as state. Anchoring the
  * prune on left progress (not right progress) matters: sources advance
  * through micro-batches independently, and a rights-ahead batch must not
  * evict quotes that slower-arriving trades still need. State per key is
  * bounded by `maxStalenessMs / right-event-spacing` rows once left events
  * flow; for a key receiving rights while its lefts lag or never arrive,
  * `maxRightRows` is the HARD memory bound (oldest rights evicted first —
  * only lefts further behind than the cap window lose matches). Note
  * `idleTimeout` cannot cover that case: GroupState processing-time
  * timeouts reset on every batch in which the key receives ANY data, so a
  * rights-active key never times out — the timeout only reaps fully-silent
  * keys. Left rows emit in append mode, so each left event is enriched
  * exactly once.
  *
  * State schema: `(newest left ts, right buffer)` — changing this breaks
  * restarting an existing query's checkpoint (Spark state-store schema
  * check); wipe the checkpoint and replay on upgrade.
  *
  * Ordering caveats, inherent to append-mode streaming:
  *  - within a micro-batch, rows are processed in (ts, side) order with
  *    right-before-left on equal timestamps — boundary-inclusive like batch;
  *  - a right row that arrives in a LATER micro-batch than a left row with a
  *    larger timestamp cannot retroactively re-enrich it (the batch operator
  *    is the replay/backfill path; bound micro-batch skew with the trigger);
  *  - right rows duplicated on (key, ts) within one batch are resolved by
  *    arrival order (pre-dedup them, as the batch query does).
  */
object StreamingAsOfJoin {

  /** Typed API mirroring [[StreamingResampler.gapFill]]'s style.
    *
    * @param left           (key, epochMsTs, payload) probe stream
    * @param right          (key, epochMsTs, payload) reference stream
    * @param maxStalenessMs matches older than this are dropped (emitted as
    *                       None) AND pruned from state — the state bound
    * @param idleTimeout    optional processing-time eviction for churning
    *                       key spaces (e.g. "1 hour"), like gapFill's —
    *                       reaps only keys receiving NO data at all
    * @param maxRightRows   hard per-key cap on buffered right rows (oldest
    *                       evicted) for keys whose lefts lag behind their
    *                       rights indefinitely
    */
  def asof[K, L, R](
      left: Dataset[(K, Long, L)],
      right: Dataset[(K, Long, R)],
      maxStalenessMs: Long,
      idleTimeout: Option[String] = None,
      maxRightRows: Int = 10000)(implicit
      ke: Encoder[K],
      envEnc: Encoder[(K, Long, Int, Option[L], Option[R])],
      stateEnc: Encoder[(Long, List[(Long, R)])],
      outEnc: Encoder[(K, Long, L, Option[R])]): Dataset[(K, Long, L, Option[R])] = {
    require(maxStalenessMs >= 0, "maxStalenessMs must be >= 0")
    require(maxRightRows > 0, "maxRightRows must be positive")
    val l = left.map  { case (k, ts, v) => (k, ts, 1, Option(v), Option.empty[R]) }
    val r = right.map { case (k, ts, v) => (k, ts, 0, Option.empty[L], Option(v)) }
    val timeoutConf =
      if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()

    l.union(r).groupByKey(_._1)
      .flatMapGroupsWithState[(Long, List[(Long, R)]), (K, Long, L, Option[R])](
        OutputMode.Append(), timeoutConf) {
        (key: K, rows: Iterator[(K, Long, Int, Option[L], Option[R])],
         state: GroupState[(Long, List[(Long, R)])]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            // (ts, side) order: side 0 rights sort before coincident lefts,
            // so a left event AT a right timestamp sees it (inclusive <=)
            val sorted = rows.toSeq.sortBy(t => (t._2, t._3))
            // state = (newest left ts seen, rights ascending by rTs);
            // ArrayBuffer so the common append path (batch rows already
            // arrive ts-ordered) is amortized O(1) — a filterNot+sort per
            // right row would be O(b²logb) on a hot key
            var maxLeft = state.getOption.map(_._1).getOrElse(Long.MinValue)
            val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, R)]
            state.getOption.foreach(buf ++= _._2)
            val out = scala.collection.mutable.ArrayBuffer.empty[(K, Long, L, Option[R])]
            // the side TAG decides the branch (a null payload must not
            // demote a left row to silence or drop a right tombstone)
            // index of the first buffer entry with rTs > ts (binary search)
            def upperBound(ts: Long): Int = {
              var lo = 0; var hi = buf.length
              while (lo < hi) {
                val mid = (lo + hi) >>> 1
                if (buf(mid)._1 <= ts) lo = mid + 1 else hi = mid
              }
              lo
            }
            sorted.foreach { case (_, ts, side, lvOpt, rvOpt) =>
              if (side == 0) {
                // keep one row per rTs (last arrival wins), buffer sorted:
                // common case appends at the tail; a late-but-in-horizon
                // right (state carried from a previous batch holds larger
                // timestamps) inserts at its binary-searched position
                val rv = rvOpt.getOrElse(null.asInstanceOf[R])
                val at = upperBound(ts)
                if (at > 0 && buf(at - 1)._1 == ts) buf(at - 1) = (ts, rv)
                else buf.insert(at, (ts, rv))
              } else {
                val at = upperBound(ts)
                val m = (if (at > 0) Some(buf(at - 1)) else None)
                  .filter(_._1 >= ts - maxStalenessMs)
                out += ((key, ts, lvOpt.getOrElse(null.asInstanceOf[L]), m.map(_._2)))
                if (ts > maxLeft) maxLeft = ts
              }
            }
            // Prune to the staleness horizon behind the newest LEFT seen —
            // NOT the newest right: sources advance through micro-batches
            // independently, and a rights-ahead batch must not evict quotes
            // that slower-arriving trades (ts-ordered per the contract)
            // still need. No lefts yet -> keep everything (idleTimeout is
            // the escape for keys whose lefts never come).
            val pruned =
              if (maxLeft > Long.MinValue) buf.dropWhile(_._1 < maxLeft - maxStalenessMs)
              else buf
            // hard memory bound for left-lagging keys: keep the NEWEST rows
            state.update((maxLeft,
              (if (pruned.length > maxRightRows) pruned.takeRight(maxRightRows)
               else pruned).toList))
            idleTimeout.foreach(state.setTimeoutDuration)
            out.iterator
          }
      }
  }
}
