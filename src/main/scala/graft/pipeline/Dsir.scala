package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data Selection via Importance Resampling — DSIR (Xie et al. 2023,
  * arXiv:2302.03169): score every raw document by how much more likely its
  * hashed-n-gram features are under a target corpus' feature distribution
  * than under the raw corpus' own, then keep the highest-scoring documents.
  * The per-document importance log-weight is
  *
  *   logw(d) = Σ_b c_d[b] · ln( p̂_target[b] / q̂_raw[b] )
  *
  * over `buckets` feature-hash buckets, with add-one smoothing on both
  * estimated distributions ((count+1)/(total+buckets)) so unseen buckets
  * stay finite. Feature hashing uses the first 8 hex chars of md5(token) —
  * deterministic and engine-reproducible, the same convention as the
  * dedup digests and sampling scores elsewhere in the library.
  *
  * Scale shape: ONE descent of the corpus builds the (doc, bucket) count
  * table (explode + map-side-combined groupBy, ≤ `buckets` rows per doc);
  * it is materialized once ([[Dedup.materializeOnce]] — narrow ids +
  * counts, never text) and reused for (a) the bucket-level distribution
  * estimate — a `buckets`-row aggregate — and (b) the per-doc weight sum
  * against the broadcast log-ratio table. No corpus-sized shuffle carries
  * text; the only wide exchange is the (doc, bucket) combine.
  */
object Dsir {

  /** Feature-hash bucket of a token: first 32 bits of md5 mod `buckets`. */
  def bucketOf(tok: Column, buckets: Int): Column =
    pmod(conv(substring(md5(tok), 1, 8), 16, 10).cast("long"), lit(buckets))

  /** Per-document DSIR importance log-weight. `isTarget` marks the rows
    * whose feature distribution defines the target (they are still scored
    * — DSIR weights are defined for every document). Returns the input's
    * id column plus `logw` (rounded to 6 decimals: the bucket sum is the
    * only float aggregate, and rounding after the sum keeps the engines'
    * summation orders from showing).
    */
  def logWeights(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      isTarget: Column,
      buckets: Int = 64): DataFrame = {
    val counts = Dedup.materializeOnce(
      docs.select(col(idCol), isTarget.as("__t"),
          explode(TextAnalysis.words(col(textCol))).as("__tok"))
        .select(col(idCol), col("__t"), bucketOf(col("__tok"), buckets).as("__b"))
        .groupBy(col(idCol), col("__t"), col("__b"))
        .agg(count(lit(1)).as("__c")))
    val totals = counts.groupBy(col("__b")).agg(
      sum(when(col("__t"), col("__c")).otherwise(0L)).as("__ct"),
      sum(col("__c")).as("__cr"))
    val grand = totals.agg(sum(col("__ct")).as("__tt"), sum(col("__cr")).as("__tr"))
    val ratios = totals.crossJoin(broadcast(grand))
      .select(col("__b"),
        log((col("__ct").cast("double") + 1d) / (col("__tt").cast("double") + buckets.toDouble))
          .minus(log((col("__cr").cast("double") + 1d) / (col("__tr").cast("double") + buckets.toDouble)))
          .as("__lr"))
    counts.join(broadcast(ratios), Seq("__b"))
      .groupBy(col(idCol))
      .agg(round(sum(col("__c").cast("double") * col("__lr")), 6).as("logw"))
  }
}
