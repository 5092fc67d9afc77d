package graft.pipeline

import graft.functions.Num
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
  * Scale shape (rewritten r7c, artifact-split r11): the whole
  * per-document feature pipeline is ONE native byte-scan kernel
  * ([[graft.functions.DsirBucketCounts]]) emitting a `buckets`-slot count
  * vector — no token explode, and NO wide exchange anywhere. Training
  * ([[trainLogRatios]]) reduces a posexploded view of the counts
  * map-side to `buckets` rows and collects the BOUNDED log-ratio table
  * (`buckets` doubles — the k-means-centroid contract); persisted via
  * [[saveLogRatios]]/[[loadLogRatios]]. Scoring
  * ([[scoreAgainstRatios]]) folds the table back in as a literal, so
  * every per-document weight is one codegen'd
  * [[graft.functions.VectorDot]] in a plain map — stateless per-row
  * work, batch or stream. The previous explode formulation shuffled one
  * row per TOKEN (~75M rows at 500k docs) and measured 2.7× DuckDB;
  * this shape is pure scan + 64-key combine.
  */
object Dsir {

  /** Feature-hash bucket of a token: first 32 bits of md5 mod `buckets`.
    * The declarative reference form of the kernel's bucketing —
    * spec-pinned equivalent ([[graft.functions.DsirBucketCounts]]).
    */
  def bucketOf(tok: Column, buckets: Int): Column =
    pmod(conv(substring(md5(tok), 1, 8), 16, 10).cast("long"), lit(buckets))

  /** Per-document DSIR importance log-weight. `isTarget` marks the rows
    * whose feature distribution defines the target (they are still scored
    * — DSIR weights are defined for every document). Returns the input's
    * id column plus `logw` (rounded to 6 decimals: the bucket fold is the
    * only float aggregate, and rounding after the sum keeps the engines'
    * summation orders from showing). Documents with null or zero-token
    * text emit nothing (the kernel returns NULL for both, mirroring the
    * explode formulation's no-rows behavior).
    */
  def logWeights(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      isTarget: Column,
      buckets: Int = 64): DataFrame =
    scoreAgainstRatios(docs, idCol, textCol,
      trainLogRatios(docs, textCol, isTarget, buckets))

  /** Train the per-bucket smoothed log-ratio table — DSIR's persistable
    * artifact ([[Artifacts]] convention, like the k-means centroids): a
    * BOUNDED `buckets`-double array, the only state the scoring pass
    * needs. One kernel scan + one 64-key map-side combine + a
    * `buckets`-row collect.
    */
  def trainLogRatios(
      docs: DataFrame,
      textCol: String,
      isTarget: Column,
      buckets: Int = 64): Array[Double] = {
    import graft.functions.DsirBucketCounts
    // counts are exact small integers carried as doubles; the totals stay
    // exact (< 2^53) and cast back to long for the smoothing arithmetic
    // no is-null filter: posexplode's Generate (outer=false) already
    // skips NULL count vectors, and an explicit filter would push the
    // kernel into the scan and evaluate it twice per row
    val totals = docs
      .select(isTarget.as("__t"),
        DsirBucketCounts.dsirBucketCounts(col(textCol), buckets).as("__bc"))
      .select(col("__t"), posexplode(col("__bc")).as(Seq("__b", "__c")))
      .groupBy(col("__b"))
      .agg(sum(when(col("__t"), col("__c")).otherwise(0d)).cast("long").as("__ct"),
        sum(col("__c")).cast("long").as("__cr"))
      .collect()
    val tt = totals.map(_.getLong(1)).sum
    val tr = totals.map(_.getLong(2)).sum
    val lr = new Array[Double](buckets)
    totals.foreach { r =>
      // java.lang.Math.log — the same function Spark's Log expression
      // evaluates, so moving the ratio computation driver-side changes
      // nothing numerically
      lr(r.getInt(0)) = math.log((r.getLong(1) + 1d) / (tt.toDouble + buckets)) -
        math.log((r.getLong(2) + 1d) / (tr.toDouble + buckets))
    }
    lr
  }

  /** Persist a trained log-ratio table as a `(b, lr)` parquet artifact
    * (doubles round-trip parquet bit-exactly).
    */
  def saveLogRatios(spark: org.apache.spark.sql.SparkSession,
      lr: Array[Double], path: String): Unit = {
    import spark.implicits._
    Artifacts.save(lr.toSeq.zipWithIndex.map { case (v, b) => (b, v) }
      .toDF("b", "lr"), path)
  }

  /** Load a log-ratio artifact persisted by [[saveLogRatios]]. */
  def loadLogRatios(spark: org.apache.spark.sql.SparkSession,
      path: String): Array[Double] = {
    val rows = spark.read.parquet(path).select(col("b"), col("lr")).collect()
    val lr = new Array[Double](rows.length)
    rows.foreach(r => lr(r.getInt(0)) = r.getDouble(1))
    lr
  }

  /** Score documents against a trained log-ratio table: PURE per-row work
    * — one [[graft.functions.DsirBucketCounts]] kernel evaluation and one
    * codegen'd [[graft.functions.VectorDot]] against the literal — no
    * aggregation, no exchange, no state. Runs identically over a batch or
    * a stream (the [[TextAnalysis.gateAgainstThreshold]] shape).
    * Documents with null or zero-token text emit nothing.
    */
  def scoreAgainstRatios(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      lr: Array[Double]): DataFrame = {
    import graft.functions.{DsirBucketCounts, VectorDot}
    // degenerate-doc filter on a CHEAP byte predicate instead of
    // kernel-is-null: the kernel returns NULL exactly for null text or
    // zero tokens (its tokenizer splits on the six ASCII whitespace
    // bytes), and `trim(text, <those six bytes>)` empties exactly then —
    // filtering on the kernel output would push the md5-per-token kernel
    // into the scan's DataFilters and evaluate it TWICE per row (once in
    // the pushed filter, once in the project)
    docs
      .filter(col(textCol).isNotNull &&
        length(trim(col(textCol), " \t\n\u000B\f\r")) > 0)
      .select(col(idCol),
        Num.round0(VectorDot.vectorDot(
          DsirBucketCounts.dsirBucketCounts(col(textCol), lr.length),
          lit(lr)), 6).as("logw"))
  }
}
