package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming positional-index maintenance —
  * [[graft.pipeline.Bm25.appendToPositionalIndex]] at the ingest door:
  * each micro-batch's positional postings land TERM-CLUSTERED under their
  * own `indexPath/__batch=<id>/` partition, so the search face reads the
  * whole root and every query term's filter still prunes row groups
  * within each batch's files. The fold is EXACT by the same argument as
  * the batch operator (per-occurrence rows, no cross-document state):
  * after any number of batches, phrase/proximity answers over
  * [[currentIndex]] are bit-identical to a full rebuild over everything
  * ingested (spec-pinned cross-batch parity).
  *
  * Replay safety rides the [[StreamingGeneralize]] convention: postings
  * are written (overwrite mode, per-batch partition) BEFORE the ledger
  * commit, so a batch at or below the committed version is skipped
  * outright and a redelivery that raced the commit overwrites its own
  * partial output instead of appending duplicate occurrences — the
  * failure mode `appendToPositionalIndex`'s plain parquet append cannot
  * defend against, which is why the streaming face uses partitions.
  *
  * Per batch the work is batch-bounded: one tokenize + posexplode over
  * the batch's documents, one term-hash exchange, one parquet write.
  * Nothing rereads or rewrites the already-indexed corpus — ingest cost
  * is O(batch) at any corpus size.
  */
object StreamingPositionalIndex {

  /** `foreachBatch` body: append `batch`'s positional postings under
    * `indexPath/__batch=<batchId>`, then commit the batch to the ledger
    * at `ledgerPath`. Batch ids must be disjoint from prior batches'
    * document ids (the [[graft.pipeline.Bm25.appendToPositionalIndex]]
    * contract); redeliveries of the SAME batch are idempotent.
    */
  def sink(
      ledgerPath: String,
      indexPath: String,
      textCol: String,
      idCol: String)(batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    if (FoldArtifact.isCommitted(spark, ledgerPath, batchId))
      return // replayed batch: postings + ledger both landed already
    if (batch.isEmpty) return // nothing to index, nothing to commit
    FoldArtifact.requireBatchPartitionRoot(spark, indexPath,
      "StreamingPositionalIndex")
    // the one term-clustered layout writer (Bm25.savePositionalIndex), so
    // a future layout change cannot silently fork the streaming partitions
    graft.pipeline.Bm25.savePositionalIndex(
      graft.pipeline.Bm25.buildPositionalIndex(batch, textCol, idCol),
      s"$indexPath/__batch=$batchId")
    // ledger commit LAST (a 1-row marker frame — the artifact content is
    // the postings partition, already durable above): a crash before this
    // line replays the whole batch over its own partial output
    import spark.implicits._
    FoldArtifact.commit(Seq(batchId).toDF("batch_id"), ledgerPath, batchId)
  }

  /** The accumulated index across every committed batch — the frame
    * [[graft.pipeline.Bm25.phraseOccurrences]] /
    * [[graft.pipeline.Bm25.proximityOccurrences]] consume (the `__batch`
    * provenance column is dropped; postings columns pass through). Empty
    * with the right schema before any batch arrived.
    */
  def currentIndex(
      spark: SparkSession,
      indexPath: String,
      idCol: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(indexPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p) && fs.listStatus(p).exists(_.getPath.getName.startsWith("__batch=")))
      spark.read.parquet(indexPath)
        .select(col(idCol), col("term"), col("pos"), col("dl"))
    else
      spark.range(0).selectExpr(s"id AS $idCol",
        "CAST(NULL AS STRING) AS term", "id AS pos", "id AS dl")
  }
}
