package graft.sources

import graft.SparkTestBase
import org.apache.spark.sql.types._

import java.nio.file.{Files, Paths}

/** S1-S8 coverage: CSV/gzip scans, positional type zipping, inference
  * fallback, header validation, time-bounds discovery. Reference behavior:
  * datasources.py:215-440, classes.py:125-196.
  */
class SourceLoaderSpec extends SparkTestBase {

  private lazy val dir = {
    val d = Files.createTempDirectory("graft_csv").toString
    Files.writeString(Paths.get(d, "part-1.csv"),
      "Timestamp,Price,Note\n1000,1.5,a\n2000,2.5,b\n")
    Files.writeString(Paths.get(d, "part-2.csv"),
      "Timestamp,Price,Note\n3000,3.5,c\n4000,,d\n")
    d
  }

  test("positional type list zipped against header (classes.py:125-131)") {
    val spec = SourceSpec(path = dir, format = "csv", descriptor = "t",
      timestampCol = "Timestamp",
      positionalTypes = Some(Seq(LongType, DoubleType, StringType)))
    val df = SourceLoader.load(spark, spec)
    assert(df.schema.map(f => (f.name, f.dataType)) ==
      Seq(("Timestamp", LongType), ("Price", DoubleType), ("Note", StringType)))
    assert(df.count() == 4)
    // empty numeric field → null (reference's empty-CRC behavior)
    assert(df.filter(df("Price").isNull).count() == 1)
  }

  test("schema inference when no types declared (classes.py:137-143)") {
    val spec = SourceSpec(path = dir, format = "csv", descriptor = "t",
      timestampCol = "Timestamp")
    val df = SourceLoader.load(spark, spec)
    assert(df.schema("Timestamp").dataType == IntegerType ||
           df.schema("Timestamp").dataType == LongType)
    assert(df.count() == 4)
  }

  test("gzip csv read transparently (datasources.py:320-337)") {
    val gzDir = Files.createTempDirectory("graft_gz").toString
    val out = new java.util.zip.GZIPOutputStream(
      new java.io.FileOutputStream(s"$gzDir/data.csv.gz"))
    out.write("Timestamp,V\n5000,x\n6000,y\n".getBytes)
    out.close()
    val df = SourceLoader.load(spark, SourceSpec(path = gzDir, format = "csv",
      descriptor = "gz", timestampCol = "Timestamp",
      positionalTypes = Some(Seq(LongType, StringType))))
    assert(df.count() == 2)
  }

  test("time bounds via min/max aggregate (S8, classes.py:182-196)") {
    val spec = SourceSpec(path = dir, format = "csv", descriptor = "t",
      timestampCol = "Timestamp",
      positionalTypes = Some(Seq(LongType, DoubleType, StringType)))
    val (lo, hi) = SourceLoader.timeBounds(SourceLoader.load(spark, spec), "Timestamp")
    assert(lo == 1000L && hi == 4000L)
  }

  test("parquet forced schema cast (datasources.py:394-395)") {
    val pqDir = Files.createTempDirectory("graft_pq").toString + "/t"
    import spark.implicits._
    Seq((1000L, 1), (2000L, 2)).toDF("Timestamp", "V").write.parquet(pqDir)
    val schema = StructType(Seq(StructField("Timestamp", LongType),
      StructField("V", DoubleType)))
    val df = SourceLoader.load(spark, SourceSpec(path = pqDir, descriptor = "p",
      timestampCol = "Timestamp", schema = Some(schema), forceSchema = true))
    assert(df.schema("V").dataType == DoubleType)
  }

  test("positional type length mismatch fails fast (P7)") {
    intercept[IllegalArgumentException] {
      SourceLoader.zipPositional(Seq("a", "b"), Seq(LongType))
    }
  }

  test("friendly type mapping (classes.py:95-100)") {
    assert(SourceLoader.friendlyType("int") == LongType)
    assert(SourceLoader.friendlyType("float") == DoubleType)
    assert(SourceLoader.friendlyType("str") == StringType)
    assert(SourceLoader.friendlyType("bool") == BooleanType)
    assert(SourceLoader.friendlyType("datetime") == TimestampType)
    intercept[IllegalArgumentException](SourceLoader.friendlyType("complex"))
  }
}
