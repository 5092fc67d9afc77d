package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.broadcast

/** Shared plumbing for the trained-artifact convention
  * ([[LanguageModel]], [[TextAnalysis.trainIdf]],
  * [[TextAnalysis.trainUnigramModel]], [[Dsir.trainLogRatios]],
  * [[PQ.saveCodebooks]]): a model trains ONCE per corpus snapshot,
  * persists as parquet, and every later scoring pass — batch or stream —
  * loads the artifact instead of re-deriving it.
  */
object Artifacts {

  /** Persist a model table. Kept distributed — no coalesce, no driver
    * collect: vocabulary-scale artifacts (~1e8 types on a web corpus)
    * must never funnel through one writer or the driver heap.
    */
  def save(model: DataFrame, path: String): Unit =
    model.write.mode("overwrite").parquet(path)

  /** Size-gated broadcast hint for a loaded artifact: the artifact
    * boundary makes the broadcast decision a MEASUREMENT instead of a
    * guess. An artifact whose on-disk size is under the session's
    * `autoBroadcastJoinThreshold` (the same leaf-file-size heuristic
    * Spark's own stats use) gets an explicit broadcast hint — skipping
    * AQE's detour of materializing both shuffle sides before converting
    * to broadcast-hash (measured ~0.2 s of planning latency per scoring
    * pass at sf0.1). An over-threshold artifact takes the unhinted path,
    * where AQE keeps the shuffled join — the hint can never OOM the
    * driver.
    */
  def sizedBroadcast(spark: SparkSession, path: String, model: DataFrame): DataFrame = {
    val threshold = spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
      .map(v => if (v.endsWith("b") || v.exists(_.isLetter))
        org.apache.spark.network.util.JavaUtils.byteStringAsBytes(v)
      else v.toLong)
      .getOrElse(10L * 1024 * 1024)
    val onDisk =
      try {
        val p = new org.apache.hadoop.fs.Path(path)
        val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        fs.getContentSummary(p).getLength
      } catch { case _: Throwable => Long.MaxValue }
    if (threshold > 0 && onDisk <= threshold) broadcast(model) else model
  }
}
