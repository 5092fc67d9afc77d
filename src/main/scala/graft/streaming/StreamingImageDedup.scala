package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Perceptual near-dup gating at the ingest door for ANY 64-bit
  * Hamming-space signature — the shared machinery under
  * [[StreamingImageDedup]] (dHash) and [[StreamingAudioDedup]]
  * (energy-gradient fingerprint), giving every perceptual modality the
  * same ingest story as text ([[StreamingLineDedup]]) and embeddings
  * ([[StreamingSemDedup]]). Each micro-batch hashes ITS OWN payloads (the
  * only decode work), drops arrivals whose signature sits within
  * `maxHamming` bits of the persisted artifact or of a kept lower-id
  * batch sibling (the cluster-representative rule, batch-local), writes
  * survivors under `outputPath/__batch=<id>`, and folds the SURVIVORS'
  * signatures into the artifact. Unhashable payloads pass through
  * unjudged (they cannot be perceptually deduped; report-don't-drop) and
  * contribute no signature.
  *
  * At-ingest trade, documented like [[StreamingLineDedup]]'s: a kept row
  * is the cluster representative GIVEN the corpus at its arrival — a
  * later batch's near-twin is dropped against it, but a row already
  * released is never revisited. Dropped rows' signatures are NOT folded
  * (their keeper represents the cluster), so a chain A~B~C arriving in
  * three batches can keep both A and C when C is within the gate of B but
  * not of A — the radius-vs-chaining trade every online near-dup gate
  * makes.
  *
  * Replay safety rides the [[StreamingGeneralize]] convention: survivors
  * land (overwrite mode, per-batch partition) BEFORE the signature
  * commit, so a redelivered batch at or below the committed version is
  * skipped and a crash-window redelivery overwrites its own partial
  * output.
  *
  * Per batch the work is |batch| decodes + the banded candidate join of
  * batch signatures against the 8-byte-per-row artifact — never a corpus
  * re-decode, never all-pairs.
  */
object StreamingHammingDedup {

  /** `foreachBatch` body. `hasher` maps the batch to (idCol, `sigCol`)
    * rows with NULL for unhashable payloads (the
    * [[graft.pipeline.Multimodal.imageHashes]] /
    * [[graft.pipeline.Multimodal.audioFingerprints]] contract).
    */
  def sink(
      sigsPath: String,
      outputPath: String,
      idCol: String,
      sigCol: String,
      hasher: DataFrame => DataFrame,
      sinkName: String,
      maxHamming: Int = 3)(batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    if (FoldArtifact.isCommitted(spark, sigsPath, batchId))
      return // replayed batch: output + fold both landed already
    if (batch.isEmpty) return
    FoldArtifact.requireBatchPartitionRoot(spark, outputPath, sinkName)
    graft.pipeline.Dedup.withMaterialized {
      // materialize the batch once: it feeds the hash pass AND the release
      // write, and a streaming source cannot be re-read
      val b = graft.pipeline.Dedup.materializeOnce(batch)
      val hashes = graft.pipeline.Dedup.materializeOnce(
        hasher(b).filter(col(sigCol).isNotNull))
      val prior = FoldArtifact.read(spark, sigsPath)
      // materialized: the banded join against the corpus-sized artifact is
      // the dominant per-batch cost, and THREE consumers read its result
      // (the fresh anti-join, the survivor write, the signature fold) —
      // without the checkpoint each would re-run the scan + band join
      val dupOfPrior = graft.pipeline.Dedup.materializeOnce(prior match {
        case Some(p) =>
          graft.pipeline.Dedup.hammingNearDupsAgainstPrior(
              hashes, p, idCol, sigCol, maxHamming)
            .select(col("id_new").as(idCol)).distinct()
        case None => spark.range(0).select(col("id").as(idCol))
      })
      val fresh = graft.pipeline.Dedup.materializeOnce(
        hashes.join(dupOfPrior, Seq(idCol), "left_anti"))
      // batch-local clusters among the prior-survivors: keep the lowest id
      val withinDrop = graft.pipeline.Dedup.clusters(
          graft.pipeline.Dedup.hammingNearDups(fresh, idCol, sigCol, maxHamming))
        .filter(col("id") =!= col("cluster_id"))
        .select(col("id").as(idCol))
      // also materialized: consumed by the survivor write AND the fold
      val dropIds = graft.pipeline.Dedup.materializeOnce(
        dupOfPrior.unionByName(withinDrop).distinct())
      b.join(dropIds, Seq(idCol), "left_anti")
        .write.mode("overwrite")
        .parquet(s"$outputPath/__batch=$batchId")
      val keptSigs = fresh.join(dropIds, Seq(idCol), "left_anti")
      val merged = prior match {
        case Some(p) => p.unionByName(keptSigs)
        case None    => keptSigs
      }
      // signature commit LAST: a crash before this line replays the whole
      // batch over its own partial output
      FoldArtifact.commit(merged, sigsPath, batchId)
    }
  }

  /** The accumulated kept-signature artifact (empty with the right schema
    * before any batch arrived).
    */
  def currentSigs(spark: SparkSession, sigsPath: String, idCol: String,
      sigCol: String): DataFrame =
    FoldArtifact.read(spark, sigsPath).getOrElse(
      spark.range(0).selectExpr(s"id AS $idCol", s"id AS $sigCol"))
}

/** Perceptual IMAGE dedup at the ingest door —
  * [[StreamingHammingDedup]] over
  * [[graft.pipeline.Multimodal.imageHashes]] (dHash; the only pixel work
  * per batch). See the shared object for the gating rule, the at-ingest
  * trade and the replay contract.
  */
object StreamingImageDedup {

  /** `foreachBatch` body. `batch` must carry (idCol, payload). */
  def sink(
      sigsPath: String,
      outputPath: String,
      idCol: String,
      maxHamming: Int = 3)(batch: DataFrame, batchId: Long): Unit =
    StreamingHammingDedup.sink(sigsPath, outputPath, idCol, "dhash",
      graft.pipeline.Multimodal.imageHashes(_, idCol),
      "StreamingImageDedup", maxHamming)(batch, batchId)

  /** The accumulated kept-signature artifact (empty with the right schema
    * before any batch arrived).
    */
  def currentSigs(spark: SparkSession, sigsPath: String, idCol: String): DataFrame =
    StreamingHammingDedup.currentSigs(spark, sigsPath, idCol, "dhash")
}

/** Perceptual AUDIO dedup at the ingest door — [[StreamingHammingDedup]]
  * over [[graft.pipeline.Multimodal.audioFingerprints]] (exact
  * energy-gradient signatures), so a gain-changed re-upload is dropped at
  * arrival without ever re-reading the indexed corpus. See the shared
  * object for the gating rule and the replay contract.
  */
object StreamingAudioDedup {

  /** `foreachBatch` body. `batch` must carry (idCol, payload). */
  def sink(
      sigsPath: String,
      outputPath: String,
      idCol: String,
      maxHamming: Int = 3)(batch: DataFrame, batchId: Long): Unit =
    StreamingHammingDedup.sink(sigsPath, outputPath, idCol, "afp",
      graft.pipeline.Multimodal.audioFingerprints(_, idCol),
      "StreamingAudioDedup", maxHamming)(batch, batchId)

  /** The accumulated kept-signature artifact (empty with the right schema
    * before any batch arrived).
    */
  def currentSigs(spark: SparkSession, sigsPath: String, idCol: String): DataFrame =
    StreamingHammingDedup.currentSigs(spark, sigsPath, idCol, "afp")
}
