package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming line-level boilerplate removal — the
  * [[graft.pipeline.TextAnalysis.lineDedup]] curation pass at the ingest
  * door: each micro-batch of documents is rewritten against the line
  * frequencies of EVERYTHING seen so far (prior artifact + the batch
  * itself — the [[graft.pipeline.TextAnalysis.lineDedupAgainstPrior]]
  * contract, so a batch doc keeps exactly what a full rebuild over the
  * union would keep), then the batch's counts fold into the persisted
  * [[graft.pipeline.TextAnalysis.lineCounts]] artifact.
  *
  * Like [[StreamingComponents]], the frequencies are a FOLD, so this runs
  * as a `foreachBatch` sink that owns the artifact through
  * [[FoldArtifact]], which makes the whole batch replay-idempotent:
  * a `batchId` at or below the artifact's committed version was already
  * fully processed (output lands BEFORE the counts commit), so a
  * redelivered batch is skipped outright, and the rewritten docs land in
  * a per-batch partition (`outputPath/__batch=<id>/`, overwrite mode) so
  * a redelivery that raced the commit overwrites its own partial output
  * instead of appending duplicates. Crash mid-batch leaves the prior
  * version committed on disk — there is no delete-before-replace window.
  * Read the output root with `spark.read.parquet(outputPath)`; the
  * `__batch` partition column records arrival provenance.
  *
  * Per batch the work is batch-bounded plus one join against the
  * Zipf-shrunk count table.
  *
  * The documented at-ingest trade: a document rewritten in batch N is
  * never revisited when a LATER batch pushes one of its kept lines over
  * the threshold — boilerplate decisions are made with the knowledge
  * available at arrival time, exactly like every other ingest-door
  * filter ([[StreamingDedup]]'s blocklist, [[StreamingSemDedup]]).
  */
object StreamingLineDedup {

  /** `foreachBatch` body: rewrite the batch against prior+batch counts,
    * write the rewritten docs under `outputPath/__batch=<batchId>`, fold
    * the batch's counts into the artifact at `countsPath` (created on the
    * first batch). Skips batches the artifact has already folded.
    */
  def sink(
      countsPath: String,
      outputPath: String,
      textCol: String,
      idCol: String,
      maxCount: Long = 4)(batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    if (FoldArtifact.isCommitted(spark, countsPath, batchId))
      return // replayed batch: output + fold both landed already
    FoldArtifact.requireBatchPartitionRoot(spark, outputPath, "StreamingLineDedup")
    val prior = currentCounts(spark, countsPath)
    graft.pipeline.Dedup.withMaterialized {
      // materialize the batch once: it feeds the rewrite (explode twice)
      // AND the count fold, and a streaming source can't be re-read
      val b = graft.pipeline.Dedup.materializeOnce(batch)
      graft.pipeline.TextAnalysis
        .lineDedupAgainstPrior(b, textCol, idCol, prior, maxCount)
        .write.mode("overwrite")
        .parquet(s"$outputPath/__batch=$batchId")
      val merged = prior
        .unionAll(graft.pipeline.TextAnalysis.lineCounts(b, textCol)
          .select(col("line"), col("prior_c")))
        .groupBy(col("line")).agg(sum(col("prior_c")).as("prior_c"))
      // the lazy merge READS the prior version, but commit writes the NEW
      // version directory first and prunes only after its commit marker — the read
      // completes during the write, no extra materialization needed
      FoldArtifact.commit(merged, countsPath, batchId)
    }
  }

  /** Current line-frequency artifact (empty with the right schema before
    * any batch arrived).
    */
  def currentCounts(spark: SparkSession, countsPath: String): DataFrame =
    FoldArtifact.read(spark, countsPath).getOrElse(
      spark.range(0).selectExpr("CAST(NULL AS STRING) AS line",
        "id AS prior_c"))
}
