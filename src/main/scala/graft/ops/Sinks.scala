package graft.ops

import org.apache.spark.sql.DataFrame

/** File sinks (K1-K3, reference `BatchHandler` classes.py:380-534).
  *
  * The reference buffers rows and rotates `output-{n}.{ext}` files every
  * `save_every_n_batch` events; in Spark, file rotation is
  * `maxRecordsPerFile` on a distributed write, and the "FULLDATA" single-file
  * output (classes.py:509-514) is a `coalesce(1)` write. Compression options
  * mirror the reference (CSV gzip, parquet snappy/gzip).
  */
object Sinks {

  /** Batched sink: distributed write with file rotation (K1). */
  def writeBatched(
      df: DataFrame,
      path: String,
      format: String = "parquet",
      compression: Option[String] = None,
      maxRecordsPerFile: Long = 0L,
      header: Boolean = true): Unit = {
    var w = df.write.mode("overwrite")
    if (maxRecordsPerFile > 0) w = w.option("maxRecordsPerFile", maxRecordsPerFile)
    compression.foreach(c => w = w.option("compression", c))
    format match {
      case "csv"     => w.option("header", header.toString).csv(path)
      case "parquet" => w.parquet(path)
      case other     => throw new IllegalArgumentException(s"Unknown sink format: $other")
    }
  }

  /** Full-data sink: everything in one file (K2, the reference's
    * `FULLDATA.{ext}`). Only for result-sized data — a 100 TB result should
    * use [[writeBatched]].
    */
  def writeFull(
      df: DataFrame,
      path: String,
      format: String = "parquet",
      compression: Option[String] = None,
      header: Boolean = true): Unit =
    writeBatched(df.coalesce(1), path, format, compression, header = header)
}
