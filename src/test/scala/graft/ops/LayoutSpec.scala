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

  test("zorderKey interleaves exactly like the naive bit loop") {
    def naive(a: Long, b: Long): Long = {
      var z = 0L
      for (i <- 0 until 16)
        z |= (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))
      z
    }
    val pts = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 65535L),
      (12345L, 54321L), (40000L, 7L), (255L, 256L))
    val got = pts.toDF("a", "b")
      .select(Layout.zorderKey($"a", $"b").as("z"))
      .collect().map(_.getLong(0))
    assert(got.toSeq == pts.map { case (a, b) => naive(a, b) })
  }

  test("zorderKey3 interleaves exactly like the naive bit loop") {
    def naive(a: Long, b: Long, c: Long): Long = {
      var z = 0L
      for (i <- 0 until 21)
        z |= (((a >> i) & 1L) << (3 * i)) | (((b >> i) & 1L) << (3 * i + 1)) |
          (((c >> i) & 1L) << (3 * i + 2))
      z
    }
    val m = 2097151L
    val pts = Seq((0L, 0L, 0L), (1L, 0L, 0L), (0L, 1L, 0L), (0L, 0L, 1L),
      (m, m, m), (123456L, 654321L, 999999L), (m, 0L, 7L), (65536L, 255L, 256L))
    val got = pts.toDF("a", "b", "c")
      .select(Layout.zorderKey3($"a", $"b", $"c").as("z"))
      .collect().map(_.getLong(0))
    assert(got.toSeq == pts.map { case (a, b, c) => naive(a, b, c) })
    // the full-resolution corner fills the signed long exactly
    assert(naive(m, m, m) == Long.MaxValue)
  }

  test("zorderWrite3 clusters all three dimensions") {
    // a 16x16x16 grid, ids shuffled; 16 curve-contiguous files must keep
    // every dimension's per-file extent far below the full range (an
    // x-sorted layout leaves y and z at full extent in every file)
    val grid = spark.range(4096).select(
      pmod($"id" * 2654435761L, lit(4096L)).as("i"))
      .select(($"i" % 16).as("x"), (($"i" / 16) % 16).cast("long").as("y"),
        ($"i" / 256).cast("long").as("z"))
    val dir = java.nio.file.Files.createTempDirectory("layoutz3").toString
    try {
      Layout.zorderWrite3(grid, "x", "y", "z", s"$dir/z3", nFiles = 16)
      val back = spark.read.parquet(s"$dir/z3")
      assert(back.count() == 4096L)
      val boxes = back.inputFiles.map { f =>
        val r = spark.read.parquet(f)
          .agg(min("x"), max("x"), min("y"), max("y"), min("z"), max("z")).head()
        (r.getLong(1) - r.getLong(0), r.getLong(3) - r.getLong(2),
          r.getLong(5) - r.getLong(4))
      }
      // ~256-cell curve segments are ~8x8x8 octant pairs; allow straddle
      // slack but nothing near the full 15-cell extent in any dimension
      // on average (range boundaries are sampled)
      boxes.foreach { case (xw, yw, zw) =>
        assert(xw <= 15 && yw <= 15 && zw <= 15, s"box: $xw $yw $zw")
      }
      assert(boxes.map(_._1).sum / boxes.length <= 10, boxes.mkString(","))
      assert(boxes.map(_._2).sum / boxes.length <= 10, boxes.mkString(","))
      assert(boxes.map(_._3).sum / boxes.length <= 10, boxes.mkString(","))
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  test("zorderWrite clusters BOTH dimensions: per-file boxes beat a 1-D sort") {
    // a 64x64 grid of points, ids shuffled; z-order layout into 16 files
    // must give every file a tight bounding box in x AND y, where an
    // x-sorted layout leaves the y-extent at full range in every file
    val grid = spark.range(4096).select(
      pmod($"id" * 2654435761L, lit(4096L)).as("i"))
      .select(($"i" % 64).as("x"), ($"i" / 64).cast("long").as("y"))
    val dir = java.nio.file.Files.createTempDirectory("layoutz").toString
    try {
      Layout.zorderWrite(grid, "x", "y", s"$dir/z", nFiles = 16)
      val back = spark.read.parquet(s"$dir/z")
      assert(back.count() == 4096L)
      // 16 contiguous curve segments of ~256 cells are ~16x16 quadrants.
      // Range boundaries are SAMPLED, so a file may straddle a quadrant
      // edge (box up to ~2 quadrants at a major curve jump) — assert the
      // robust envelope: no file anywhere near the full 63-cell extent an
      // x-sorted layout would leave in y, and quadrant-tight on average.
      val boxes = back.inputFiles.map { f =>
        val r = spark.read.parquet(f)
          .agg(min("x"), max("x"), min("y"), max("y")).head()
        (r.getLong(1) - r.getLong(0), r.getLong(3) - r.getLong(2))
      }
      boxes.foreach { case (xw, yw) =>
        assert(xw <= 47 && yw <= 47, s"file box too wide: x $xw y $yw")
      }
      assert(boxes.map(_._1).sum / boxes.length <= 24, boxes.mkString(","))
      assert(boxes.map(_._2).sum / boxes.length <= 24, boxes.mkString(","))
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

  test("zorderWrite fails loudly on unquantized dimensions") {
    // a raw hour-index-sized value (or a negative) would silently wrap to
    // the low 16 bits and scatter the curve; the default validation must
    // surface the offending value instead of writing a broken layout
    val dir = java.nio.file.Files.createTempDirectory("layoutv").toString
    try {
      for (bad <- Seq(70000L, -1L)) {
        val df = Seq((1L, 2L), (bad, 3L)).toDF("a", "b")
        val e = intercept[Exception] {
          Layout.zorderWrite(df, "a", "b", s"$dir/bad", nFiles = 2)
        }
        def messages(t: Throwable): Seq[String] =
          if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
        assert(messages(e).exists(_.contains("outside [0, 65535]")),
          s"expected loud quantization failure, got: $e")
      }
      // validate = false keeps the documented silent-wrap escape hatch
      Layout.zorderWrite(Seq((70000L, 3L)).toDF("a", "b"), "a", "b",
        s"$dir/wrap", nFiles = 1, validate = false)
      assert(spark.read.parquet(s"$dir/wrap").count() == 1L)
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }
}
