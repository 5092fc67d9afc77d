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
  * must be cached/compact: the static side of a stream-static join is
  * re-evaluated every micro-batch. Since r11 this is ENFORCED, not
  * advisory: the DataFrame face rejects an uncached derivation plan, and
  * the artifact-path overload loads + caches the parquet prior once per
  * session.
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
    // ENFORCED static-side contract (was doc-only until r11): the static
    // side of a stream-static join is re-evaluated EVERY micro-batch, so
    // a caller handing us a raw derivation (a k-means assignment, an
    // aggregation) would silently re-train per batch. Accept the prior
    // only when it is cached, or when its plan is derivation-free (a
    // file-sourced artifact read / checkpoint / literal with projections
    // and filters only).
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join, Window => LWindow}
    val cached = priorAssigned.storageLevel !=
      org.apache.spark.storage.StorageLevel.NONE
    lazy val derivation = priorAssigned.queryExecution.analyzed.collectFirst {
      case a: Aggregate => a
      case j: Join      => j
      case w: LWindow   => w
    }
    require(cached || derivation.isEmpty,
      "priorAssigned must be a cached frame or a derivation-free artifact " +
      "read (file scan / checkpoint + projections): the static side of a " +
      "stream-static join re-evaluates every micro-batch, and this plan " +
      s"contains ${derivation.map(_.nodeName).getOrElse("a derivation")} — " +
      "persist the assignment artifact and use the path overload, or " +
      ".cache() the frame")
    val assigned = Similarity.ivfAssignWithSim(df, vecCol, centroids)
    val prior = priorAssigned.select(col("cell_id").as("__pcell"),
      col(vecCol).as("__pv"))
    assigned.join(prior,
      col("cell_id") === col("__pcell") &&
        round(Similarity.cosine(col(vecCol), col("__pv")), 6) >= lit(threshold),
      "left_anti")
  }

  // one cached plan per (session, artifact path) — repeated streams in the
  // same JVM share it instead of stacking duplicate cache entries.
  // private[streaming] so StreamingSpec can pin that the overload's prior
  // really sits behind a cache (a streaming plan can't be batch-inspected)
  private[streaming] val priorCache = scala.collection.concurrent.TrieMap
    .empty[(org.apache.spark.sql.SparkSession, String), DataFrame]

  /** Artifact-path overload: load the persisted prior cell-assignment
    * table (the `(vecCol, cell_id)` parquet the batch pipeline exports),
    * cache it ONCE per session, and judge arrivals against it. This is
    * the production face — the static side is a compact cached artifact
    * by construction, so no caller can accidentally re-derive the prior
    * per micro-batch.
    */
  def keepAgainstPrior(
      df: DataFrame,
      priorArtifactPath: String,
      vecCol: String,
      centroids: Array[(Long, Array[Double])],
      threshold: Double): DataFrame = {
    val spark = df.sparkSession
    val prior = priorCache.getOrElseUpdate((spark, priorArtifactPath), {
      val p = spark.read.parquet(priorArtifactPath)
        .select(col(vecCol), col("cell_id"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      p
    })
    keepAgainstPrior(df, prior, vecCol, centroids, threshold)
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
