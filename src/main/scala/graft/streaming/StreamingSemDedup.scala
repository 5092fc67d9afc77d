package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.pipeline.Similarity

/** Streaming SemDeDup — semantic dedup at the ingest door (Abbas et al.
  * 2023, arXiv:2303.09540, the embedding-space dedup whose batch faces
  * live in [[graft.pipeline.SemDedup]]).
  *
  * Batch contract mirrored here: [[graft.pipeline.SemDedup.incrKeep]] —
  * an arriving vector is DROPPED iff some prior-corpus vector in the SAME
  * trained cell meets the rounded-cosine threshold; survivors stream on.
  * Arrivals are judged against the prior corpus only (the incremental
  * regime: the prior side is fixed and the new data defers to it), so
  * every row's verdict is independent — which is exactly what makes the
  * operator STATELESS in the stream:
  *
  *  - the cell assignment is one per-row codegen expression
  *    ([[graft.functions.NearestCell]]) against the TRAINED centroid
  *    artifact ([[Similarity.loadCentroids]] — the same train-once index
  *    ANN search uses), so assignment shuffles nothing;
  *  - the duplicate check is a stream-static LEFT ANTI equijoin on
  *    `cell_id` with the cosine gate in the join condition — Spark
  *    executes stream-static anti joins statelessly per micro-batch, no
  *    watermark, no state store;
  *  - no aggregation anywhere, so output is Append by construction.
  *
  * Cross-batch parity with the batch operator is therefore structural:
  * the union of survivors over any micro-batch split equals
  * `incrKeep(union of arrivals)` row-for-row (StreamingSpec pins it).
  *
  * Scale shape: per micro-batch the work is |batch| assignment rows plus
  * a cell-equijoin whose fan-out is the prior CELL size (the n/128
  * trained-cell lever bounds it), never the prior corpus. `priorAssigned`
  * must be the pre-assigned prior — `(vecCol, cell_id)`, e.g. the
  * persisted cell-assignment artifact the batch pipeline exports — and
  * should be cached/compact: the static side of a stream-static join is
  * re-evaluated every micro-batch, so hand it a parquet artifact or a
  * cached frame, not a derivation that re-runs k-means assignment per
  * batch.
  */
object StreamingSemDedup {

  /** Kept arrivals as (all input columns) + `cell_id` + `centroid_sim`.
    *
    * `priorAssigned` columns: `vecCol` (the prior vector) and `cell_id`
    * (its trained-cell assignment). `centroids` is the loaded artifact;
    * `threshold` the rounded-cosine duplicate gate (round-6 BEFORE the
    * compare, the cross-engine convention every batch face uses).
    */
  def keepAgainstPrior(
      df: DataFrame,
      priorAssigned: DataFrame,
      vecCol: String,
      centroids: Array[(Long, Array[Double])],
      threshold: Double): DataFrame = {
    val assigned = Similarity.ivfAssignWithSim(df, vecCol, centroids)
    val prior = priorAssigned.select(col("cell_id").as("__pcell"),
      col(vecCol).as("__pv"))
    assigned.join(prior,
      col("cell_id") === col("__pcell") &&
        round(Similarity.cosine(col(vecCol), col("__pv")), 6) >= lit(threshold),
      "left_anti")
  }

  /** Streaming rank-normalization: every arriving vector scored against
    * the TRAINED per-dimension quantile grid
    * ([[graft.pipeline.EmbedStats.loadRankGrid]] — the same persisted
    * artifact the batch transform uses). Pure per-row narrow work
    * (posexplode + one [[graft.functions.RankBucket]] kernel call), so
    * the operator is stateless, watermark-free, and Append by
    * construction — and batch parity is structural: the union of outputs
    * over any micro-batch split equals
    * [[graft.pipeline.EmbedStats.rankTransform]] on the unioned arrivals.
    */
  def rankNormalize(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      grid: Map[Int, Array[Double]],
      roundTo: Int = 6): DataFrame =
    graft.pipeline.EmbedStats.rankTransform(df, idCol, vecCol, grid, roundTo)
}
