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
  * artifact: read prior → contract by the batch → write the updated
  * assignment. Per batch the work is batch-bounded (the contraction
  * union-find sees ≤ one label pair per new edge) plus ONE
  * broadcast-remap join over the prior; the artifact swap is
  * write-to-temp + rename, so a crash mid-batch leaves the prior intact
  * (foreachBatch re-delivers the batch — the fold is idempotent per
  * batch because the increment is deterministic from (prior, batch)).
  *
  * Cross-batch parity is structural and spec-pinned: folding any batch
  * split equals batch [[graft.ops.Graph.connectedComponents]] over the
  * unioned edges.
  */
object StreamingComponents {

  /** `foreachBatch` body maintaining the `(node, comp)` parquet artifact
    * at `artifactPath` (created on the first batch).
    */
  def sink(artifactPath: String, srcCol: String, dstCol: String)(
      batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val hadoop = spark.sparkContext.hadoopConfiguration
    val path = new org.apache.hadoop.fs.Path(artifactPath)
    val fs = path.getFileSystem(hadoop)
    val updated =
      if (fs.exists(path)) {
        val prior = spark.read.parquet(artifactPath)
        graft.ops.Graph.componentsIncrement(batch, srcCol, dstCol, prior)
      } else {
        graft.ops.Graph.connectedComponents(batch, srcCol, dstCol)
      }
    // write-to-temp + swap: the increment READS the artifact it replaces
    val tmp = new org.apache.hadoop.fs.Path(artifactPath + "__next")
    graft.pipeline.Dedup.withMaterialized {
      // materialize before the swap — the lazy plan still reads the prior
      graft.pipeline.Dedup.materializeOnce(updated)
        .write.mode("overwrite").parquet(tmp.toString)
    }
    fs.delete(path, true)
    require(fs.rename(tmp, path),
      s"StreamingComponents: artifact swap failed for $artifactPath")
  }

  /** Current assignment (empty frame with the right schema before any
    * batch arrived).
    */
  def current(spark: SparkSession, artifactPath: String): DataFrame = {
    val path = new org.apache.hadoop.fs.Path(artifactPath)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(path)) spark.read.parquet(artifactPath)
    else spark.range(0).selectExpr("id AS node", "id AS comp")
  }
}
