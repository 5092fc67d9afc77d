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

  /** Name of the snapshot sidecar inside a stamped artifact directory.
    * Underscore-prefixed so every parquet reader (Spark, DuckDB, pandas)
    * skips it as metadata.
    */
  private val SnapshotSidecar = "_graft_snapshot"

  /** [[save]] plus a snapshot stamp: records WHICH corpus state the model
    * was trained on (any caller-chosen identity — a batch id, a snapshot
    * date, a content digest). Against-prior operators
    * ([[TextAnalysis.lineDedupAgainstPrior]], [[Privacy.kAnonAgainstPrior]],
    * [[graft.ops.Graph.componentsIncrement]]) otherwise trust their
    * artifact blindly — a prior clobbered by a concurrent job or pointed
    * at the wrong path folds silently into a wrong answer. The sidecar is
    * written AFTER the parquet, so a crash in between leaves an artifact
    * that [[loadStamped]] refuses (missing stamp), never one it trusts.
    */
  def saveStamped(model: DataFrame, path: String, snapshot: String): Unit = {
    require(snapshot.nonEmpty, "saveStamped: snapshot id must be non-empty")
    save(model, path)
    val spark = model.sparkSession
    val p = new org.apache.hadoop.fs.Path(path, SnapshotSidecar)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(snapshot.getBytes("UTF-8")) finally out.close()
  }

  /** The snapshot a stamped artifact records, if any. */
  def snapshotOf(spark: SparkSession, path: String): Option[String] = {
    val p = new org.apache.hadoop.fs.Path(path, SnapshotSidecar)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(new String(
        org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8"))
      finally in.close()
    }
  }

  /** Load a stamped artifact, failing LOUDLY when its recorded snapshot
    * is not the one the caller folded against — the staleness guard for
    * every against-prior fold.
    */
  def loadStamped(spark: SparkSession, path: String, expected: String): DataFrame = {
    val found = snapshotOf(spark, path)
    require(found.contains(expected),
      s"Artifacts.loadStamped: artifact at $path records snapshot " +
        s"${found.getOrElse("<none — unstamped or half-written>")} but the " +
        s"caller expects $expected — the prior was retrained, clobbered, " +
        "or never finished; refusing to fold against it")
    spark.read.parquet(path)
  }

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
