package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Versioned artifact store for `foreachBatch` FOLD sinks
  * ([[StreamingComponents]], [[StreamingLineDedup]]): the artifact a
  * batch folds into lives at `<path>/v=<batchId>/` and a version counts
  * only once its `_graft_committed` marker exists (written by [[commit]] itself).
  *
  * This buys the two properties a fold sink needs and the old
  * delete-then-rename swap did not have:
  *
  *  - **replay idempotence**: Structured Streaming redelivers a batch
  *    after a failure; [[lastBatchId]] tells the sink whether this
  *    `batchId` was already folded, so it can skip the fold (and any
  *    output append) instead of double-counting;
  *  - **no crash window**: [[commit]] writes the NEW version before it
  *    prunes old ones, so a crash at any instruction leaves a committed
  *    prior on disk — there is no moment where the artifact directory is
  *    empty (the old swap deleted the live artifact before renaming the
  *    replacement into place).
  *
  * A crash between the new version's marker and the prune leaves an
  * extra old version behind; [[read]] always picks the max committed
  * version and the next [[commit]] re-prunes, so stale versions are
  * garbage, never truth.
  */
object FoldArtifact {

  /** Highest batchId with a committed version, if any. */
  def lastBatchId(spark: SparkSession, path: String): Option[Long] = {
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    committedVersions(fs, root).map(_._1).maxOption
  }

  /** Replay-skip decision for fold sinks: true when `batchId` (or a later
    * one) is already committed at `path`. A batchId STRICTLY below the
    * committed version is NOT a normal redelivery — Structured Streaming
    * replays only the last uncommitted batch, so the incoming id is always
    * the committed version or its successor. Seeing a far-lower id is the
    * signature of a RESET CHECKPOINT (batch numbering restarted at 0)
    * pointed at an old artifact: every fold would silently skip until the
    * old version is passed, dropping new data with no error. The sink
    * still skips (double-folding would be worse), but the condition is
    * logged LOUDLY so the lineage mismatch is an operator-visible event;
    * the fix is a fresh artifact path per checkpoint lineage, or deleting
    * the stale artifact before the restart.
    */
  def isCommitted(spark: SparkSession, path: String, batchId: Long): Boolean = {
    val last = lastBatchId(spark, path)
    if (last.exists(_ > batchId))
      System.err.println(
        s"[graft] FoldArtifact at $path holds committed version v=${last.get} " +
          s"but the incoming batchId is $batchId — if the streaming checkpoint " +
          "was reset (batch numbering restarted at 0), this sink will silently " +
          s"skip every batch until batchId passes ${last.get}, DROPPING data. " +
          "Use a fresh artifact path for a fresh checkpoint lineage, or delete " +
          "the stale artifact before restarting.")
    last.exists(_ >= batchId)
  }

  /** Layout guard for sinks that write per-batch partition directories
    * (`<root>/__batch=<id>/` — [[StreamingLineDedup]],
    * [[StreamingGeneralize]]): the root may hold ONLY `__batch=` partition
    * dirs plus `_`/`.`-prefixed metadata every parquet reader skips. A
    * root with flat part files — an append-mode sink's output, or another
    * job pointed at the same path — would break partition discovery for
    * the documented consumer (`spark.read.parquet(root)`) with a confusing
    * mid-read error, and the `__batch` column would silently change the
    * schema old readers see. Refuse LOUDLY before the first write.
    */
  private[streaming] def requireBatchPartitionRoot(
      spark: SparkSession, root: String, sink: String): Unit = {
    val p = new Path(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) {
      val foreign = fs.listStatus(p).filter { st =>
        val n = st.getPath.getName
        !n.startsWith("_") && !n.startsWith(".") && !n.startsWith("__batch=")
      }
      require(foreign.isEmpty,
        s"$sink: output root $root already holds non-`__batch=` entries " +
          s"(${foreign.take(3).map(_.getPath.getName).mkString(", ")}…) — " +
          "this sink writes per-batch partition directories and cannot " +
          "share a root with flat parquet output; point it at a fresh " +
          "directory or migrate the old files into a partition layout")
    }
  }

  /** Latest committed version's data, if any version was ever committed. */
  def read(spark: SparkSession, path: String): Option[DataFrame] = {
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    committedVersions(fs, root).maxByOption(_._1)
      .map { case (_, p) => spark.read.parquet(p.toString) }
  }

  /** Write `model` as version `batchId`, then prune older versions.
    * Overwrite mode makes a redelivered half-written version self-heal;
    * the prune runs only after the new version is fully committed. The
    * commit marker is OUR OWN `_graft_committed` file written after the
    * parquet job returns — not Hadoop's `_SUCCESS`, which clusters
    * commonly disable (`marksuccessfuljobs=false` with cloud
    * committers); depending on it would silently make every committed
    * version invisible and restart the fold from scratch each batch.
    */
  def commit(model: DataFrame, path: String, batchId: Long): Unit = {
    val spark = model.sparkSession
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val target = versionPath(root, batchId)
    model.write.mode("overwrite").parquet(target.toString)
    fs.create(new Path(target, Marker), true).close()
    committedVersions(fs, root)
      .filter { case (v, _) => v < batchId }
      .foreach { case (_, p) => fs.delete(p, true) }
  }

  private val Marker = "_graft_committed"

  private def versionPath(root: Path, batchId: Long): Path =
    new Path(root, s"v=$batchId")

  private def committedVersions(fs: FileSystem, root: Path): Seq[(Long, Path)] =
    if (!fs.exists(root)) Nil
    else fs.listStatus(root).toSeq
      .filter(_.isDirectory)
      .flatMap { st =>
        val n = st.getPath.getName
        if (n.startsWith("v="))
          scala.util.Try(n.stripPrefix("v=").toLong).toOption
            .map(_ -> st.getPath)
        else None
      }
      .filter { case (_, p) => fs.exists(new Path(p, Marker)) }
}
