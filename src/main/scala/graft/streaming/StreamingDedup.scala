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
}
