package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The composed curation pipeline at the ingest door — the streaming twin
  * of the batch `q_image_curate` / `q_audio_curate` faces, built on the
  * [[StreamingHammingDedup]] machinery: each micro-batch runs its OWN
  * payloads through the single-pass curation scan (the only decode work),
  * judges every arrival into one of four dispositions, releases the
  * judged batch, and folds the dedup-surviving signatures into the
  * persisted artifact.
  *
  * Dispositions per arrival (the batch faces' vocabulary):
  *  - `invalid`: the scanner produced no signature (undecodable payload —
  *    report, don't fail; for audio this also covers formats outside the
  *    exact fingerprint path, which cannot be perceptually judged),
  *  - `dup`: signature within `maxHamming` bits of the persisted artifact
  *    or of a kept lower-id batch sibling (cluster-representative rule),
  *  - `low_quality`: survives dedup but its quality score is below the
  *    TRAINED `threshold` — a driver scalar trained once on a reference
  *    corpus (the `TextAnalysis.qualityThreshold` convention: a
  *    low-quality batch must never lower its own bar, which is also why
  *    this face does not recompute the batch faces' survivor quantile),
  *  - `kept`: everything else.
  *
  * Signatures of BOTH `kept` and `low_quality` rows fold into the
  * artifact: the corpus has seen that content, so a later near-twin is a
  * `dup` regardless of the first arrival's quality fate — exactly the
  * batch faces' cluster semantics, where members of a low-quality
  * representative's cluster are still dups. At-ingest trade and replay
  * safety are [[StreamingHammingDedup]]'s: released dispositions are
  * never revisited, survivors land under `outputPath/__batch=<id>`
  * BEFORE the signature commit, and a redelivered batch at or below the
  * committed version is skipped.
  *
  * Per batch the work is |batch| scans + the banded candidate join of
  * batch signatures against the 8-byte-per-row artifact — never a corpus
  * re-decode, never all-pairs.
  */
object StreamingMediaCurate {

  /** `foreachBatch` body. `scanner` maps the batch to
    * (idCol, `sigCol`, `scoreCol`) rows with a NULL signature for
    * payloads that cannot be judged (the
    * [[graft.pipeline.Multimodal.imageCurationScan]] contract).
    */
  def sink(
      sigsPath: String,
      outputPath: String,
      idCol: String,
      sigCol: String,
      scoreCol: String,
      threshold: Double,
      scanner: DataFrame => DataFrame,
      sinkName: String,
      maxHamming: Int = 3)(batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    if (FoldArtifact.isCommitted(spark, sigsPath, batchId))
      return // replayed batch: output + fold both landed already
    if (batch.isEmpty) return
    FoldArtifact.requireBatchPartitionRoot(spark, outputPath, sinkName)
    graft.pipeline.Dedup.withMaterialized {
      // materialize the batch once: it feeds the scan AND the release
      // write, and a streaming source cannot be re-read
      val b = graft.pipeline.Dedup.materializeOnce(batch)
      val scanned = graft.pipeline.Dedup.materializeOnce(
        scanner(b).select(col(idCol), col(sigCol), col(scoreCol)))
      val hashes = scanned.filter(col(sigCol).isNotNull)
      val prior = FoldArtifact.read(spark, sigsPath)
      val dupOfPrior = graft.pipeline.Dedup.materializeOnce(prior match {
        case Some(p) =>
          graft.pipeline.Dedup.hammingNearDupsAgainstPrior(
              hashes.select(col(idCol), col(sigCol)), p, idCol, sigCol,
              maxHamming)
            .select(col("id_new").as(idCol)).distinct()
        case None => spark.range(0).select(col("id").as(idCol))
      })
      val fresh = graft.pipeline.Dedup.materializeOnce(
        hashes.join(dupOfPrior, Seq(idCol), "left_anti"))
      val withinDrop = graft.pipeline.Dedup.clusters(
          graft.pipeline.Dedup.hammingNearDups(
            fresh.select(col(idCol), col(sigCol)), idCol, sigCol, maxHamming))
        .filter(col("id") =!= col("cluster_id"))
        .select(col("id").as(idCol))
      // consumed by the disposition join AND the signature fold
      val dupIds = graft.pipeline.Dedup.materializeOnce(
        dupOfPrior.unionByName(withinDrop).distinct()
          .withColumn("__dup", lit(true)))
      val statuses = scanned.join(dupIds, Seq(idCol), "left")
        .select(col(idCol),
          when(col(sigCol).isNull, lit("invalid"))
            .when(col("__dup"), lit("dup"))
            .when(col(scoreCol) < threshold, lit("low_quality"))
            .otherwise(lit("kept")).as("status"),
          col(scoreCol))
      // every arrival is released WITH its disposition, before the commit
      b.join(statuses, Seq(idCol))
        .write.mode("overwrite")
        .parquet(s"$outputPath/__batch=$batchId")
      val survivorSigs = fresh.select(col(idCol), col(sigCol))
        .join(dupIds.select(idCol), Seq(idCol), "left_anti")
      val merged = prior match {
        case Some(p) => p.unionByName(survivorSigs)
        case None    => survivorSigs
      }
      // signature commit LAST: a crash before this line replays the whole
      // batch over its own partial output
      FoldArtifact.commit(merged, sigsPath, batchId)
    }
  }
}

/** IMAGE curation at the ingest door — [[StreamingMediaCurate]] over
  * [[graft.pipeline.Multimodal.imageCurationScan]] (one codec pass per
  * payload: dHash signature + mean-luma quality score).
  */
object StreamingImageCurate {

  /** `foreachBatch` body. `batch` must carry (idCol, payload);
    * `threshold` is the trained mean-luma bar.
    */
  def sink(
      sigsPath: String,
      outputPath: String,
      idCol: String,
      threshold: Double,
      maxHamming: Int = 3)(batch: DataFrame, batchId: Long): Unit =
    StreamingMediaCurate.sink(
      sigsPath, outputPath, idCol, "dhash", "score", threshold,
      df => graft.pipeline.Multimodal.imageCurationScan(df, idCol)
        .select(col(idCol), col("dhash"),
          round(col("mean_luma"), 6).as("score")),
      "StreamingImageCurate", maxHamming)(batch, batchId)
}

/** AUDIO curation at the ingest door — [[StreamingMediaCurate]] over
  * [[graft.pipeline.Multimodal.audioCurationScan]] (energy-gradient
  * fingerprint + RMS quality score).
  */
object StreamingAudioCurate {

  /** `foreachBatch` body. `batch` must carry (idCol, payload);
    * `threshold` is the trained RMS bar ("too quiet" below it).
    */
  def sink(
      sigsPath: String,
      outputPath: String,
      idCol: String,
      threshold: Double,
      maxHamming: Int = 3)(batch: DataFrame, batchId: Long): Unit =
    StreamingMediaCurate.sink(
      sigsPath, outputPath, idCol, "afp", "score", threshold,
      df => graft.pipeline.Multimodal.audioCurationScan(df, idCol)
        .select(col(idCol), col("afp"), round(col("rms"), 6).as("score")),
      "StreamingAudioCurate", maxHamming)(batch, batchId)
}
