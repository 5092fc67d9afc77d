package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkTestBase {

  import spark.implicits._

  private val DayMs = 86400000L

  /** 10 days x 1000 events, shuffled write order. */
  private def events() = {
    val base = 1700000000000L - (1700000000000L % DayMs)
    spark.range(10000).select(
      (lit(base) + (pmod($"id" * 7919L, lit(10000L)) * lit(86400L))).as("ts"),
      $"id".as("v"))
  }

  test("writeTimePartitioned: bucket directories, in-file ordering, parity") {
    val dir = java.nio.file.Files.createTempDirectory("layout").toString
    try {
      Layout.writeTimePartitioned(events(), "ts", "1d", dir)

      val dirs = new java.io.File(dir).listFiles().filter(_.isDirectory)
        .map(_.getName).filter(_.startsWith(s"${Layout.BucketCol}=")).sorted
      assert(dirs.length == 10, s"expected 10 day buckets: ${dirs.toSeq}")
      // bucket value is the bucket-start epoch ms, divisible by the step
      assert(dirs.forall(_.split("=")(1).toLong % DayMs == 0L))

      val back = spark.read.parquet(dir)
      assert(back.count() == 10000L)
      assert(back.agg(sum("v")).head().getLong(0) ==
        events().agg(sum("v")).head().getLong(0))

      // every physical file is internally time-sorted (tight row-group stats)
      val files = back.inputFiles
      assert(files.nonEmpty)
      files.foreach { f =>
        val ts = spark.read.parquet(f).select("ts").collect().map(_.getLong(0))
        assert(ts.sameElements(ts.sorted), s"unsorted file $f")
      }
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  test("readWindow: prunes to boundary buckets and matches an unpruned filter") {
    val dir = java.nio.file.Files.createTempDirectory("layoutw").toString
    try {
      Layout.writeTimePartitioned(events(), "ts", "1d", dir)
      val base = 1700000000000L - (1700000000000L % DayMs)
      // window spanning 1.5 days starting mid-day 3
      val s = base + 3 * DayMs + DayMs / 2
      val e = s + 3 * DayMs / 2
      val win = Layout.readWindow(spark, dir, "ts", "1d", s, e)

      val expect = events().filter($"ts" >= s && $"ts" < e)
        .select("v").collect().map(_.getLong(0)).sorted
      val got = win.collect().map(_.getAs[Long]("v")).sorted
      assert(got.sameElements(expect))

      // partition pruning happened at the scan: of 10 bucket directories,
      // only the 2 the window overlaps were read (post-execution metric)
      val scan = win.queryExecution.executedPlan.collectLeaves().collectFirst {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }.getOrElse(fail("no file scan in plan"))
      assert(scan.metrics("numPartitions").value == 2L,
        s"expected 2 partitions read, got ${scan.metrics("numPartitions").value}")
      val plan = win.queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters") &&
        plan.contains(Layout.BucketCol), s"no partition filters in:\n$plan")
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  test("empty input writes nothing and does not throw") {
    val dir = java.nio.file.Files.createTempDirectory("layoute").toString
    try {
      Layout.writeTimePartitioned(events().filter(lit(false)), "ts", "1d", dir)
      assert(!new java.io.File(dir).exists() ||
        new java.io.File(dir).listFiles().forall(!_.getName.startsWith("bucket=")))
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }
}
