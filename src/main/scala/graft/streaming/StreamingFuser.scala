package graft.streaming

import graft.core.Fuser
import graft.sources.FrameSource
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Streaming fusion: the reference's "replay N directories chronologically"
  * becomes "tail N directories live" — `readStream` file sources, the same
  * per-source normalization as the batch [[Fuser]], and a diagonal union.
  *
  * A global `orderBy` is meaningless on an unbounded stream; the ordering
  * guarantee moves to the consumer: windowed aggregations
  * ([[StreamingResampler.lastPerBucket]]) or event-time sorted sinks per
  * micro-batch via `foreachBatch`.
  */
object StreamingFuser {

  /** Open one directory as a streaming source (new files are picked up as
    * they land — the live version of the reference's file enumeration,
    * datasources.py:189-212).
    */
  def openStream(
      spark: SparkSession,
      path: String,
      format: String,
      schema: StructType,
      hasHeader: Boolean = true): DataFrame = format match {
    case "parquet" => spark.readStream.schema(schema).parquet(path)
    case "csv" => spark.readStream.schema(schema)
      .option("header", hasHeader.toString).csv(path)
    case other => throw new IllegalArgumentException(s"Unknown stream format: $other")
  }

  /** Fuse already-open streaming frames: normalize (ts → epoch-ms
    * `__timestamp`, provenance stamp, drops/renames) and union by name.
    * Collision renames follow the batch rules (§1.4).
    */
  def fuseStreams(sources: Seq[FrameSource], mergeColNames: Seq[String] = Nil,
      separator: String = Fuser.DefaultSeparator): DataFrame = {
    require(sources.nonEmpty)
    val normalized = sources.zipWithIndex.map { case (src, id) =>
      var df = src.df
      if (src.removeCols.nonEmpty) df = df.drop(src.removeCols: _*)
      // Per-source user renames BEFORE timestamp handling (batch parity:
      // Fuser.normalize applies renameCols first, so timestampCol may be a
      // post-rename name).
      src.renameCols.foreach { case (from, to) => df = df.withColumnRenamed(from, to) }
      df = src.tsConvert match {
        case Some(f) => df.withColumn(s"__${src.timestampCol}", col(src.timestampCol))
          .withColumn(src.timestampCol, f(col(src.timestampCol)).cast("long"))
        case None => df.schema(src.timestampCol).dataType match {
          case org.apache.spark.sql.types.TimestampType |
               org.apache.spark.sql.types.TimestampNTZType =>
            df.withColumn(src.timestampCol,
              unix_millis(col(src.timestampCol).cast("timestamp")))
          case _ => df.withColumn(src.timestampCol, col(src.timestampCol).cast("long"))
        }
      }
      df.withColumnRenamed(src.timestampCol, Fuser.TimestampCol)
        .withColumn(Fuser.SourceIdCol, lit(id))
    }
    // Collision rename across sources (same policy as batch, incl. the
    // `__`-prefixed engine-internal exemption — preserved originals like
    // `__<tsCol>` merge by name, Fuser.fuseFrames' exempt rule).
    val exempt = (c: String) =>
      c.startsWith("__") || c == Fuser.SourceIdCol || mergeColNames.contains(c)
    val colliding = normalized.flatMap(_.columns).filterNot(exempt)
      .groupBy(identity).collect { case (c, xs) if xs.length > 1 => c }.toSet
    val renamed = normalized.zip(sources).map { case (df, src) =>
      df.columns.filter(colliding).foldLeft(df) { (d, c) =>
        d.withColumnRenamed(c, s"$c$separator${src.descriptor}")
      }
    }
    renamed.reduce(_.unionByName(_, allowMissingColumns = true))
  }
}
