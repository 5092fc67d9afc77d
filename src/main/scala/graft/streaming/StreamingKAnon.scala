package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Live k-anonymity maintenance ([[graft.pipeline.Privacy.kAnonAgainstPrior]]
  * as a stream): rows arrive keyed by their quasi-identifier combination;
  * for every QI group TOUCHED by a micro-batch, emit
  * `(key, prior_n, batch_n, total_n, status)` with the same five-way risk
  * classification as the batch operator — `new_at_risk` is the live
  * release blocker a downstream alert consumes.
  *
  * Parity contract: after feeding batches B1..Bn, the emitted row for a
  * group touched in Bn equals the batch operator's row for that group with
  * `prior = qiCounts(B1 ∪ … ∪ Bn-1)`. The one intended difference from the
  * batch face: groups the batch does NOT touch are not re-emitted (their
  * standing cannot change — counts only grow), whereas the batch join
  * lists them; a consumer wanting the full standing folds the update
  * stream into its own table.
  *
  * State is one Long per QI group — bounded by the QI domain, not the
  * stream, so this never needs eviction for correctness; `idleTimeout` is
  * still offered for QI domains with a hot/cold split (an evicted group
  * that returns restarts as `new_*`, exactly like a rebuilt prior that
  * never saw it).
  */
object StreamingKAnon {

  def groupCounts[K](
      ds: Dataset[K],
      k: Int,
      idleTimeout: Option[String] = None)(
      implicit ke: Encoder[K],
      outEnc: Encoder[(K, Long, Long, Long, String)]): Dataset[(K, Long, Long, Long, String)] = {
    require(k >= 2, s"StreamingKAnon: k must be >= 2, got $k")
    implicit val stateEnc: Encoder[Long] = Encoders.scalaLong
    val timeoutConf =
      if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    ds.groupByKey(identity)
      .flatMapGroupsWithState[Long, (K, Long, Long, Long, String)](
        OutputMode.Update(), timeoutConf) {
        (key: K, rows: Iterator[K], state: GroupState[Long]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val batchN = rows.size.toLong
            val priorN = state.getOption.getOrElse(0L)
            val totalN = priorN + batchN
            val status =
              if (priorN == 0L && totalN < k) "new_at_risk"
              else if (priorN == 0L) "new_safe"
              else if (priorN < k && totalN >= k) "became_safe"
              else if (totalN < k) "still_at_risk"
              else "still_safe"
            state.update(totalN)
            idleTimeout.foreach(state.setTimeoutDuration)
            Iterator.single((key, priorN, batchN, totalN, status))
          }
      }
  }
}
