package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

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

    // stream side: per-row signature — the same one-pass byte-scan kernel
    // the batch signatures use (r10: [[graft.functions.MinHashSig]],
    // identical chained-seed hash family xxhash64(i, shingle); min over
    // duplicates = min over distinct, so values are unchanged). A doc is
    // one row; no groupBy, no shingle strings.
    val withSig = df
      .withColumn("__sig_new",
        graft.functions.MinHashSig.minHashSig(col(textCol), n, k))
      .filter(col("__sig_new").isNotNull)
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

  /** One banded LSH row per (band, bucket) for a document. `ts` stays a
    * raw timestamp (not pre-converted millis): the event-time watermark tag
    * lives in the COLUMN's metadata, and flatMapGroupsWithState refuses
    * `getCurrentWatermarkMs` unless a tagged column reaches its input — a
    * `unix_millis` projection would strip it.
    */
  private[streaming] case class BandedDoc(
      band: Int, bucket: Long, id: Long, ts: java.sql.Timestamp, sig: Seq[Long])
  /** A bucket's remembered occupant (newest-first in state). */
  private[streaming] case class BucketEntry(id: Long, tsMs: Long, sig: Seq[Long])
  private[streaming] case class BucketState(entries: List[BucketEntry])
  private[streaming] case class NearPair(
      id_new: Long, id_prior: Long, est_jaccard: Double, ts_ms: Long)

  /** Stream-INTERNAL incremental near-dup: each arriving document is
    * checked against the documents that arrived before it in the SAME
    * stream — no prior artifact at all. This is the missing third face of
    * near-dedup (batch full-corpus / batch-vs-artifact / stream-vs-itself):
    * a curation pipeline bootstrapping from an empty corpus can flag
    * near-dups from the first document onward.
    *
    * Semantics: emits (id_new, id_prior, est_jaccard, ts_ms) whenever a
    * document's MinHash signature agrees with an earlier in-horizon
    * document's on ≥ `estThreshold` of the hashes AND the pair shares at
    * least one full LSH band (the standard candidate criterion — a pair
    * above threshold that happens to agree in no complete band is missed,
    * the usual LSH false-negative trade). "Earlier" is (event time, id)
    * lexicographic, so ties are deterministic. A prior older than
    * `watermarkDelay` behind the stream's max event time is forgotten —
    * the same bounded-state trade [[exactWithinWatermark]] makes.
    *
    * Each candidate pair is emitted EXACTLY ONCE even when it matches in
    * several bands, without a second stateful operator: both docs carry
    * their full signatures, so every band-group can compute the pair's
    * MINIMUM matching band locally and only the group owning that band
    * emits (equal band slices hash to equal buckets, so the minimum
    * matching band's group is guaranteed to see the pair).
    *
    * Scale shape: state lives per (band, bucket) key — `bands` copies of
    * each in-horizon signature (k longs each), watermark-evicted on access
    * and event-time-timeout-evicted when a bucket goes quiet; a pathological hot
    * bucket (boilerplate shingle floods) is clamped to `maxPerBucket`
    * newest entries, bounding per-arrival compare cost at
    * O(maxPerBucket · k). The shuffle key is the narrow (band, bucket)
    * pair; signatures ride the shuffle, texts never do.
    *
    * `idCol` must be LongType (cast upstream if needed); `tsCol` must be
    * the event-time timestamp column.
    */
  def nearDupsWithinStream(
      df: DataFrame,
      textCol: String,
      idCol: String,
      tsCol: String,
      n: Int = 3,
      bands: Int = 16,
      rowsPerBand: Int = 2,
      estThreshold: Double = 0.8,
      watermarkDelay: String = "10 minutes",
      maxPerBucket: Int = 10000): DataFrame = {
    val k = bands * rowsPerBand
    val horizonMs = parseDelayMs(watermarkDelay)
    // identical hash family to the batch signatures and the artifact
    // variant above: the shared MinHashSig kernel (xxhash64(i, shingle))
    val banded = df
      .withColumn("__sig",
        graft.functions.MinHashSig.minHashSig(col(textCol), n, k))
      .filter(col("__sig").isNotNull)
      .withWatermark(tsCol, watermarkDelay)
      .select(
        explode(array((0 until bands).map { b =>
          struct(lit(b).as("band"),
            xxhash64((b * rowsPerBand until (b + 1) * rowsPerBand)
              .map(i => col("__sig").getItem(i)): _*).as("bucket"))
        }: _*)).as("bb"),
        col(idCol).cast("long").as("id"),
        col(tsCol).as("ts"),
        col("__sig").as("sig"))
      .select(col("bb.band"), col("bb.bucket"), col("id"), col("ts"), col("sig"))

    implicit val bandedEnc = Encoders.product[BandedDoc]
    implicit val stateEnc  = Encoders.product[BucketState]
    implicit val pairEnc   = Encoders.product[NearPair]
    implicit val keyEnc    = Encoders.tuple(Encoders.scalaInt, Encoders.scalaLong)

    /** First band whose complete slice agrees, or -1. */
    def minMatchingBand(a: Seq[Long], b: Seq[Long]): Int = {
      var band = 0
      while (band < bands) {
        var i = band * rowsPerBand
        val end = (band + 1) * rowsPerBand
        while (i < end && a(i) == b(i)) i += 1
        if (i == end) return band
        band += 1
      }
      -1
    }

    banded.as[BandedDoc]
      .groupByKey(d => (d.band, d.bucket))
      .flatMapGroupsWithState[BucketState, NearPair](
        // EventTimeTimeout, NOT ProcessingTimeTimeout: processing-time
        // timeouts make the engine schedule continuous empty batches just
        // to fire them, and every batch pays the full state-checkpoint
        // file churn. Event-time timeouts fire only when the watermark
        // advances — i.e. when data actually arrives — which is also the
        // correct horizon clock for this operator.
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (key: (Int, Long), rows: Iterator[BandedDoc], state: GroupState[BucketState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val wm = state.getCurrentWatermarkMs()
            var entries = state.getOption.map(_.entries).getOrElse(Nil)
              .filter(_.tsMs >= wm)
            val out = scala.collection.mutable.ArrayBuffer.empty[NearPair]
            rows.toSeq.sortBy(d => (d.ts.getTime, d.id)).foreach { d =>
              val tsMs = d.ts.getTime
              entries.foreach { e =>
                if (e.id != d.id) {
                  var agree = 0
                  var i = 0
                  while (i < k) { if (d.sig(i) == e.sig(i)) agree += 1; i += 1 }
                  val est = agree.toDouble / k
                  if (est >= estThreshold && minMatchingBand(d.sig, e.sig) == key._1)
                    out += NearPair(d.id, e.id, est, tsMs)
                }
              }
              entries = BucketEntry(d.id, tsMs, d.sig) :: entries
            }
            val kept = entries.take(maxPerBucket)
            if (kept.isEmpty) state.remove()
            else {
              state.update(BucketState(kept))
              // expire when the watermark passes the newest entry's horizon
              // (timeout timestamps must sit strictly beyond the watermark)
              val newest = kept.iterator.map(_.tsMs).max
              state.setTimeoutTimestamp(math.max(newest + horizonMs, wm + 1))
            }
            out.iterator
          }
      }
      .toDF()
  }

  /** "N seconds|minutes|hours|days" → millis (the subset of Spark's
    * watermark-delay grammar this module passes around).
    */
  private[streaming] def parseDelayMs(delay: String): Long = {
    val m = raw"(?i)\s*(\d+)\s+(second|minute|hour|day)s?\s*".r
    delay match {
      case m(n, unit) =>
        n.toLong * (unit.toLowerCase match {
          case "second" => 1000L
          case "minute" => 60000L
          case "hour"   => 3600000L
          case "day"    => 86400000L
        })
      case _ => throw new IllegalArgumentException(
        s"unsupported delay '$delay' (want e.g. '30 seconds', '10 minutes')")
    }
  }
}
