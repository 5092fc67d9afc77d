package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Streaming connected components — component maintenance at the ingest
  * door: each micro-batch of edges folds into a persisted `(node, comp)`
  * artifact through [[graft.ops.Graph.componentsIncrement]], so the
  * assignment is always current and the full edge history is NEVER
  * replayed (the against-prior contract
  * [[graft.pipeline.Dedup.nearDupsAgainstPrior]] established).
  *
  * Components are a FOLD — each batch's answer depends on every prior
  * batch — so unlike the stateless faces ([[StreamingSemDedup]],
  * [[StreamingBpe]]) this one runs as a `foreachBatch` sink that owns the
  * artifact through [[FoldArtifact]]: read prior → contract by the batch
  * → commit the updated assignment as version `batchId`. Per batch the
  * work is batch-bounded (the contraction union-find sees ≤ one label
  * pair per new edge) plus ONE broadcast-remap join over the prior.
  *
  * Replay safety is double-layered: a redelivered `batchId` at or below
  * the committed version is skipped outright ([[FoldArtifact]] tracks
  * the version in the path), and even a fold that did slip through would
  * be a no-op — re-adding edges never changes components. Crash
  * mid-batch leaves the prior version committed on disk; there is no
  * delete-before-replace window.
  *
  * Cross-batch parity is structural and spec-pinned: folding any batch
  * split equals batch [[graft.ops.Graph.connectedComponents]] over the
  * unioned edges.
  */
object StreamingComponents {

  /** `foreachBatch` body maintaining the `(node, comp)` parquet artifact
    * at `artifactPath` (created on the first batch). Skips batches the
    * artifact has already folded.
    */
  def sink(artifactPath: String, srcCol: String, dstCol: String)(
      batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    if (FoldArtifact.isCommitted(spark, artifactPath, batchId))
      return // replayed batch: already folded
    // the bracket releases the localCheckpoints componentsIncrement /
    // connectedComponents create internally — without it a long-running
    // stream accumulates every batch's checkpointed frames in executor
    // storage. The lazy increment READS the prior version, but commit
    // writes the NEW version directory first and prunes only after the
    // commit marker — the read completes during the write.
    graft.pipeline.Dedup.withMaterialized {
      val updated = FoldArtifact.read(spark, artifactPath) match {
        case Some(prior) =>
          graft.ops.Graph.componentsIncrement(batch, srcCol, dstCol, prior)
        case None =>
          graft.ops.Graph.connectedComponents(batch, srcCol, dstCol)
      }
      FoldArtifact.commit(updated, artifactPath, batchId)
    }
  }

  /** Current assignment (empty frame with the right schema before any
    * batch arrived).
    */
  def current(spark: SparkSession, artifactPath: String): DataFrame =
    FoldArtifact.read(spark, artifactPath).getOrElse(
      spark.range(0).selectExpr("id AS node", "id AS comp"))
}
