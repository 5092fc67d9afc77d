package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming PageRank maintenance — rank upkeep at the ingest door:
  * each micro-batch of edges folds into TWO persisted artifacts (the
  * deduplicated edge set and the rank vector) and the ranks are refreshed
  * with a BOUNDED re-iteration budget seeded from the prior vector
  * ([[graft.ops.Graph.pageRankWarmStart]]) — after a small edge delta the
  * prior is near the new fixpoint, so a few warm Jacobi steps recover it
  * instead of a cold re-convergence. The first batch cold-starts through
  * full [[graft.ops.Graph.pageRank]].
  *
  * Per batch the work is `iterations` passes over the ACCUMULATED edge
  * table — iteration-bounded, not batch-bounded (ranks are a global
  * property of the whole graph; the budget is what the stream buys).
  *
  * Replay safety rides [[FoldArtifact]] with the RANKS commit last: a
  * redelivered batch at or below the ranks version is skipped outright;
  * a crash between the edge commit and the rank commit re-runs the batch
  * against an edge set that already contains it — harmless, the edge
  * fold is a distinct-union (idempotent) and the prior ranks are still
  * the pre-batch version, so the recomputed ranks are identical.
  */
object StreamingPageRank {

  /** `foreachBatch` body maintaining the edge-set and rank artifacts
    * (created on the first batch). Skips batches whose ranks already
    * committed.
    */
  def sink(
      edgesPath: String,
      ranksPath: String,
      srcCol: String,
      dstCol: String,
      iterations: Int = 3,
      damping: Double = 0.85)(batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    if (FoldArtifact.isCommitted(spark, ranksPath, batchId))
      return // replayed batch: edges + ranks both committed already
    val b = batch.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
    // an empty batch changes nothing — and on the FIRST batch it must
    // not cold-start pageRank over zero edges (its empty-graph require
    // would kill the streaming query with a half-initialized artifact)
    if (b.isEmpty) return
    graft.pipeline.Dedup.withMaterialized {
      // Crash-window replay (edges committed for this batchId, ranks not):
      // do NOT re-fold the edges — the lazy unionByName/distinct plan would
      // read the v=batchId directory that commit() then overwrites in
      // place. Overwrite-of-a-read-path happens to work on the local
      // committer but is not a Spark guarantee across committers or
      // filesystems, and it breaks the "read never targets the write path"
      // invariant the other fold sinks hold. The committed version already
      // contains this batch (the fold is a distinct-union), so just read it.
      if (!FoldArtifact.lastBatchId(spark, edgesPath).exists(_ >= batchId)) {
        val allEdges = FoldArtifact.read(spark, edgesPath) match {
          case Some(prev) => prev.unionByName(b).distinct()
          case None       => b.distinct()
        }
        FoldArtifact.commit(allEdges, edgesPath, batchId)
      }
      // re-read the committed version: the lazy union must not outlive
      // the prior edge version its plan references
      val edgesNow = FoldArtifact.read(spark, edgesPath).get
      val ranks = FoldArtifact.read(spark, ranksPath) match {
        case Some(prior) =>
          graft.ops.Graph.pageRankWarmStart(edgesNow, "src", "dst", prior,
            iterations, damping)
        case None =>
          graft.ops.Graph.pageRank(edgesNow, "src", "dst", damping = damping)
      }
      FoldArtifact.commit(ranks, ranksPath, batchId)
    }
  }

  /** Current rank vector (empty with the right schema before any batch
    * arrived).
    */
  def currentRanks(spark: SparkSession, ranksPath: String): DataFrame =
    FoldArtifact.read(spark, ranksPath).getOrElse(
      spark.range(0).selectExpr("id AS node", "CAST(id AS DOUBLE) AS r"))
}
