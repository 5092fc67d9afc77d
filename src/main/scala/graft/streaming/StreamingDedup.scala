package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dedup-on-ingest for streaming corpora: the live counterparts of the
  * batch [[graft.pipeline.Dedup]] passes, for pipelines that curate
  * training data as it lands rather than in periodic batch sweeps.
  *
  * Scale shape: both operators keep ONLY bounded state. Exact dedup keys
  * its state eviction to the event-time watermark, so the state store
  * holds (dedup horizon × ingest rate) digests — never the stream's
  * lifetime; the blocklist filter is a stream-static broadcast anti-join
  * with no state at all.
  */
object StreamingDedup {

  /** Exact-duplicate suppression within the watermark horizon: the first
    * arrival of each text digest is emitted, later arrivals inside the
    * horizon are dropped. A duplicate arriving AFTER its original's state
    * was evicted (older than `watermarkDelay` behind the max event time)
    * passes again — the documented trade of bounded state for a bounded
    * dedup window (batch [[graft.pipeline.Dedup.exact]] is the full-corpus
    * pass).
    *
    * `tsCol` must be the stream's event-time timestamp column.
    */
  def exactWithinWatermark(
      df: DataFrame,
      textCol: String,
      tsCol: String,
      watermarkDelay: String): DataFrame =
    df.withColumn("__digest", md5(col(textCol)))
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark("__digest")
      .drop("__digest")

  /** Decontamination on ingest: drop any arriving document whose text
    * digest appears in a static blocklist (e.g. the fingerprints of an
    * eval set — the streaming face of
    * [[graft.pipeline.Dedup.contaminationPairs]]). Stream-static anti-join:
    * the blocklist broadcasts, the stream never shuffles.
    *
    * `blocklist` must carry a `digest` column of md5 hex strings (build it
    * with [[digests]]).
    */
  def withoutBlocklist(df: DataFrame, textCol: String,
      blocklist: DataFrame): DataFrame =
    df.withColumn("__digest", md5(col(textCol)))
      .join(broadcast(blocklist.select(col("digest").as("__digest"))),
        Seq("__digest"), "left_anti")
      .drop("__digest")

  /** Digest table for [[withoutBlocklist]] from a batch frame of texts. */
  def digests(df: DataFrame, textCol: String): DataFrame =
    df.select(md5(col(textCol)).as("digest")).distinct()

  /** NEAR-dup flagging on ingest against a static minhash signature
    * artifact — the streaming face of
    * [[graft.pipeline.Dedup.nearDupsAgainstPrior]]: as documents land,
    * emit (id_new, id_prior, est_jaccard) for every prior document whose
    * LSH band matches and whose signature-agreement estimate clears
    * `estThreshold`.
    *
    * Verification is the MinHash estimate (fraction of agreeing hashes,
    * an unbiased estimator of Jaccard with sd ≈ √(j(1-j)/k)), NOT exact
    * shingle Jaccard: the estimate needs only the artifact, so the prior
    * corpus is never touched at all — the property that makes this safe
    * to run inside an ingest stream. Route flagged pairs to a batch
    * exact-verify ([[graft.pipeline.Dedup.nearDupsAgainstPrior]]) when
    * exactness matters more than latency.
    *
    * Scale shape: the signature is a per-row expression (no stateful
    * aggregation), the band join is stream-static on narrow (band,
    * bucket) keys, and the only state is the pair-dedup within the
    * watermark horizon. `priorSigs` must come from
    * [[graft.pipeline.Dedup.minhashSignatures]] with `bands*rowsPerBand`
    * hashes and the same shingle width `n`.
    */
  def nearDupsAgainstArtifact(
      df: DataFrame,
      priorSigs: DataFrame,
      textCol: String,
      idCol: String,
      tsCol: String,
      n: Int = 3,
      bands: Int = 16,
      rowsPerBand: Int = 2,
      estThreshold: Double = 0.8,
      watermarkDelay: String = "10 minutes"): DataFrame = {
    val k = bands * rowsPerBand
    // static side: full signature array + exploded band buckets, computed
    // once per (re)start and reused by every micro-batch
    val priorPrepped = priorSigs.select(
        col(idCol).as("id_prior"),
        array((0 until k).map(i => col(s"__mh$i")): _*).as("__sig_prior"))
      .select(col("id_prior"), col("__sig_prior"),
        explode(array((0 until bands).map { b =>
          struct(lit(b).as("band"),
            xxhash64((b * rowsPerBand until (b + 1) * rowsPerBand)
              .map(i => col("__sig_prior").getItem(i)): _*).as("bucket"))
        }: _*)).as("bb"))
      .select(col("id_prior"), col("__sig_prior"), col("bb.band"), col("bb.bucket"))

    // stream side: per-row signature — hash i's min over the distinct
    // shingles (identical hash family to the batch signatures: xxhash64 of
    // (int i, string shingle)). No groupBy: a document is one row.
    val sig = transform(sequence(lit(0), lit(k - 1)),
      i => array_min(transform(col("__sh"), s => xxhash64(i, s))))
    val withSig = df
      .withColumn("__sh",
        array_distinct(graft.pipeline.TextAnalysis.shingles(col(textCol), n)))
      .filter(size(col("__sh")) > 0)
      .withColumn("__sig_new", sig)
      .withWatermark(tsCol, watermarkDelay)

    val banded = withSig.select(
        col(idCol).as("id_new"), col(tsCol), col("__sig_new"),
        explode(array((0 until bands).map { b =>
          struct(lit(b).as("band"),
            xxhash64((b * rowsPerBand until (b + 1) * rowsPerBand)
              .map(i => col("__sig_new").getItem(i)): _*).as("bucket"))
        }: _*)).as("bb"))
      .select(col("id_new"), col(tsCol), col("__sig_new"),
        col("bb.band"), col("bb.bucket"))

    banded.join(priorPrepped, Seq("band", "bucket"))
      .withColumn("est_jaccard",
        size(filter(zip_with(col("__sig_new"), col("__sig_prior"),
          (a, b) => a === b), x => x)).cast("double") / lit(k).cast("double"))
      .filter(col("est_jaccard") >= estThreshold)
      // a pair matching in several bands arrives several times: keep one
      // per watermark horizon (bounded state, keyed on the pair)
      .dropDuplicatesWithinWatermark("id_new", "id_prior")
      .select(col("id_new"), col("id_prior"), col("est_jaccard"), col(tsCol))
  }
}
