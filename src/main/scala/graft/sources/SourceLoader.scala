package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Loads a [[SourceSpec]] into a DataFrame.
  *
  * Spark-first reimagining of the reference's `CSVSrc`/`ParquetSrc`
  * (datasources.py:215-440): one `spark.read` over the whole directory
  * replaces the per-file loop; Hadoop codecs replace the gzip magic-byte
  * sniffing (datasources.py:320-337); schema inference fallback replaces the
  * `pl.ComputeError` retry (datasources.py:253-263). File enumeration order
  * (datasources.py:189-212) is irrelevant to correctness here because the
  * fused stream is globally sorted; `input_file_name()` is available for
  * provenance diagnostics.
  */
object SourceLoader {

  /** Map a friendly type-name (the reference's python-type table,
    * classes.py:95-100) to a Spark type.
    */
  def friendlyType(name: String): DataType = name.toLowerCase match {
    case "int" | "long" | "bigint"  => LongType
    case "float" | "double"         => DoubleType
    case "str" | "string"           => StringType
    case "bool" | "boolean"         => BooleanType
    case "datetime" | "timestamp"   => TimestampType
    case other                      => throw new IllegalArgumentException(s"Unknown type: $other")
  }

  /** Read just the header of a CSV directory (names only, all-string schema —
    * no data scan) to support positional type lists (classes.py:125-131).
    */
  def csvHeader(spark: SparkSession, path: String): Seq[String] =
    spark.read.option("header", "true").csv(path).columns.toSeq

  /** Zip a positional type list against the header names → StructType. */
  def zipPositional(header: Seq[String], types: Seq[DataType]): StructType = {
    require(header.length == types.length,
      s"positional types (${types.length}) do not match header width (${header.length})")
    StructType(header.zip(types).map { case (n, t) => StructField(n, t, nullable = true) })
  }

  /** Load one source directory as a DataFrame. */
  def load(spark: SparkSession, spec: SourceSpec): DataFrame = spec.format match {
    case "parquet" =>
      spec.schema match {
        case Some(s) if spec.forceSchema =>
          // Cast to the declared schema (reference datasources.py:394-395).
          // Files in one source directory may drift (e.g. an all-null column
          // written int64 in one file, double in another) — the directory
          // read would fail on the physical-type mismatch, so read per file
          // with each file's own footer schema, cast, and union by name.
          // Sources have few files; the per-file plan union is cheap and the
          // scans still run distributed.
          def castTo(df: DataFrame): DataFrame =
            df.select(s.fields.map(f => col(f.name).cast(f.dataType).as(f.name)).toSeq: _*)
          val fs = org.apache.hadoop.fs.FileSystem.get(
            new java.net.URI(spec.path), spark.sparkContext.hadoopConfiguration)
          val files = fs.listStatus(new org.apache.hadoop.fs.Path(spec.path))
            .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
            .map(_.getPath.toString)
          if (files.isEmpty) castTo(spark.read.parquet(spec.path))
          else files.map(f => castTo(spark.read.parquet(f)))
            .reduce(_.unionByName(_))
        case _ => spark.read.parquet(spec.path)
      }
    case "csv" =>
      val base = spark.read
        .option("header", spec.hasHeader.toString)
        .option("mode", "PERMISSIVE")
      val resolved: Option[StructType] = spec.schema.orElse {
        spec.positionalTypes.map { ts =>
          zipPositional(csvHeader(spark, spec.path), ts)
        }
      }
      resolved match {
        case Some(s) =>
          try {
            val df = base.schema(s).csv(spec.path)
            validateHeader(df, s); df
          } catch {
            // Inference retry path (reference datasources.py:253-263).
            case _: Exception => base.option("inferSchema", "true").csv(spec.path)
          }
        case None =>
          // No declared types: infer (reference warns, classes.py:137-143).
          base.option("inferSchema", "true").csv(spec.path)
      }
    case other => throw new IllegalArgumentException(s"Unknown source format: $other")
  }

  /** Header/shape validation (P7, reference core.py:949-980): loaded columns
    * must match the declared schema's names.
    */
  def validateHeader(df: DataFrame, expected: StructType): Unit = {
    val got  = df.columns.toSet
    val want = expected.fieldNames.toSet
    require(got == want,
      s"Source columns ${got.mkString(",")} do not match declared ${want.mkString(",")}")
  }

  /** Per-source global start/end event time (S8, reference
    * classes.py:182-196): one `agg(min,max)` — served from parquet footer
    * stats when available, instead of the reference's manual head/tail file
    * probes (core.py:738-872, datasources.py:266-318).
    */
  def timeBounds(df: DataFrame, tsCol: String): (Long, Long) = {
    val row = df.agg(min(col(tsCol)), max(col(tsCol))).head()
    if (row.isNullAt(0)) throw new IllegalStateException("source has no rows")
    (row.getLong(0), row.getLong(1))
  }
}
