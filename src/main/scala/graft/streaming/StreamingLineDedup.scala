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
  * as a `foreachBatch` sink that owns the artifact: read prior → rewrite
  * batch → append rewritten docs to `outputPath` → merge counts →
  * write-to-temp + rename swap (a crash mid-batch leaves the prior
  * intact). Per batch the work is batch-bounded plus one join against
  * the Zipf-shrunk count table.
  *
  * The documented at-ingest trade: a document rewritten in batch N is
  * never revisited when a LATER batch pushes one of its kept lines over
  * the threshold — boilerplate decisions are made with the knowledge
  * available at arrival time, exactly like every other ingest-door
  * filter ([[StreamingDedup]]'s blocklist, [[StreamingSemDedup]]).
  */
object StreamingLineDedup {

  /** `foreachBatch` body: rewrite the batch against prior+batch counts,
    * append the rewritten docs to `outputPath`, fold the batch's counts
    * into the artifact at `countsPath` (created on the first batch).
    */
  def sink(
      countsPath: String,
      outputPath: String,
      textCol: String,
      idCol: String,
      maxCount: Long = 4)(batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val hadoop = spark.sparkContext.hadoopConfiguration
    val path = new org.apache.hadoop.fs.Path(countsPath)
    val fs = path.getFileSystem(hadoop)
    val prior = currentCounts(spark, countsPath)
    graft.pipeline.Dedup.withMaterialized {
      // materialize the batch once: it feeds the rewrite (explode twice)
      // AND the count fold, and a streaming source can't be re-read
      val b = graft.pipeline.Dedup.materializeOnce(batch)
      graft.pipeline.TextAnalysis
        .lineDedupAgainstPrior(b, textCol, idCol, prior, maxCount)
        .write.mode("append").parquet(outputPath)
      val merged = prior
        .unionAll(graft.pipeline.TextAnalysis.lineCounts(b, textCol)
          .select(col("line"), col("prior_c")))
        .groupBy(col("line")).agg(sum(col("prior_c")).as("prior_c"))
      // write-to-temp + swap: the merge READS the artifact it replaces
      val tmp = new org.apache.hadoop.fs.Path(countsPath + "__next")
      graft.pipeline.Dedup.materializeOnce(merged)
        .write.mode("overwrite").parquet(tmp.toString)
      fs.delete(path, true)
      require(fs.rename(tmp, path),
        s"StreamingLineDedup: artifact swap failed for $countsPath")
    }
  }

  /** Current line-frequency artifact (empty with the right schema before
    * any batch arrived).
    */
  def currentCounts(spark: SparkSession, countsPath: String): DataFrame = {
    val path = new org.apache.hadoop.fs.Path(countsPath)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(path)) spark.read.parquet(countsPath)
    else spark.range(0).selectExpr("CAST(NULL AS STRING) AS line",
      "id AS prior_c")
  }
}
