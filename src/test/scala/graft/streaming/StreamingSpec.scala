package graft.streaming

import graft.SparkTestBase
import graft.core.Fuser.TimestampCol
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamingSpec extends SparkTestBase {

  import spark.implicits._

  test("streaming last-per-bucket matches batch resample boundaries") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val df = input.toDF().toDF(TimestampCol, "v")

    val out = StreamingResampler.lastPerBucket(df, "1s", watermarkDelay = "0 seconds")
    val q = out.writeStream.format("memory").queryName("resampled")
      .outputMode("append").start()

    // the letters-gaps fixture events
    input.addData(
      (1577836800191L, "A"), (1577836805654L, "B"), (1577836810155L, "C"))
    q.processAllAvailable()
    // advance watermark far enough to close all buckets
    input.addData((1577836830000L, "Z"))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("resampled").orderBy(TimestampCol)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    // Non-empty buckets only (gap fill is stage 2): A@.191→1s, B@5.654→6s,
    // C@10.155→11s; Z's own bucket is still open at watermark 30s, so these
    // are EXACTLY the emitted rows — a duplicate or spurious bucket fails
    assert(rows.toSeq ==
      Seq((1577836801000L, "A"), (1577836806000L, "B"), (1577836811000L, "C")))
  }

  test("stateful gap fill emits fills for skipped boundaries per key") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Long, String)]
    val filled = StreamingResampler.gapFill[String, String](
      input.toDS(), stepMs = 1000L, fill = v => s"fill($v)")

    val q = filled.writeStream.format("memory").queryName("gapfilled")
      .outputMode("append").start()
    input.addData(("k", 1000L, "A"), ("k", 5000L, "B"), ("k", 7000L, "C"))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("gapfilled").orderBy("_2")
      .collect().map(r => (r.getLong(1), r.getString(2)))
    assert(rows.toSeq == Seq(
      (1000L, "A"),
      (2000L, "fill(A)"), (3000L, "fill(A)"), (4000L, "fill(A)"),
      (5000L, "B"), (6000L, "fill(B)"), (7000L, "C")))
  }

  test("streaming exact dedup drops in-horizon duplicates across batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val df = input.toDF().toDF("ts_ms", "text")
      .withColumn("ts", timestamp_millis($"ts_ms"))

    val out = StreamingDedup.exactWithinWatermark(df, "text", "ts", "10 seconds")
    val q = out.writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()

    input.addData((1000L, "alpha"), (2000L, "beta"), (3000L, "alpha"))
    q.processAllAvailable()
    // second batch: in-horizon duplicates of both + one new doc
    input.addData((4000L, "beta"), (5000L, "gamma"), (6000L, "alpha"))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("dedup_stream").orderBy("ts_ms")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(rows.toSeq == Seq((1000L, "alpha"), (2000L, "beta"), (5000L, "gamma")))
  }

  test("streaming near-dup flags arrivals matching the static signature artifact") {
    implicit val sqlCtx = spark.sqlContext
    import scala.util.hashing.MurmurHash3
    def words(seed: Int) = (0 until 40)
      .map(j => s"w${math.floorMod(MurmurHash3.productHash((seed, j)), 1000)}")
      .mkString(" ")
    val prior = (0 until 20).map(i => (i.toLong, words(i))).toDF("doc_id", "text")
    val sigs = graft.pipeline.Dedup.minhashSignatures(
      prior, "text", "doc_id", n = 3, numHashes = 32)

    val input = MemoryStream[(Long, Long, String)]
    val df = input.toDF().toDF("ts_ms", "doc_id", "text")
      .withColumn("ts", timestamp_millis($"ts_ms"))
    val out = StreamingDedup.nearDupsAgainstArtifact(
      df, sigs, "text", "doc_id", "ts", n = 3, bands = 16, rowsPerBand = 2,
      estThreshold = 0.8, watermarkDelay = "10 seconds")
    val q = out.writeStream.format("memory").queryName("neardup_stream")
      .outputMode("append").start()

    // batch 1: one exact copy of prior doc 7 + one unrelated doc
    input.addData((1000L, 100L, words(7)), (2000L, 101L, words(999)))
    q.processAllAvailable()
    // batch 2: a copy of prior doc 3 arriving later
    input.addData((3000L, 102L, words(3)))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("neardup_stream")
      .select("id_new", "id_prior", "est_jaccard")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // identical text => identical signature => est exactly 1.0; the pair
    // matches in all 16 bands but must be emitted ONCE
    assert(rows == Set((100L, 7L, 1.0), (102L, 3L, 1.0)))
  }

  test("stream-internal near-dup pairs arrivals with earlier in-horizon docs, exactly once") {
    implicit val sqlCtx = spark.sqlContext
    import scala.util.hashing.MurmurHash3
    def words(seed: Int) = (0 until 40)
      .map(j => s"w${math.floorMod(MurmurHash3.productHash((seed, j)), 1000)}")
      .mkString(" ")

    val input = MemoryStream[(Long, Long, String)]
    val df = input.toDF().toDF("ts_ms", "doc_id", "text")
      .withColumn("ts", timestamp_millis($"ts_ms"))
    val out = StreamingDedup.nearDupsWithinStream(
      df, "text", "doc_id", "ts", n = 3, bands = 16, rowsPerBand = 2,
      estThreshold = 0.8, watermarkDelay = "10 seconds")
    val q = out.writeStream.format("memory").queryName("withinstream_neardup")
      .outputMode("append").start()

    // batch 1: two unrelated docs — nothing to pair
    input.addData((1000L, 1L, words(7)), (2000L, 2L, words(500)))
    q.processAllAvailable()
    // batch 2: a copy of doc 1 (cross-batch pair) and a NEW near-identical
    // pair wholly inside this batch (ids 4,5) — later id pairs to earlier
    input.addData((3000L, 3L, words(7)),
      (4000L, 4L, words(42)), (4500L, 5L, words(42)))
    q.processAllAvailable()
    val afterB2 = spark.table("withinstream_neardup")
      .select("id_new", "id_prior", "est_jaccard")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // identical text => est exactly 1.0; each pair matches in all 16 bands
    // but is emitted ONCE (min-matching-band ownership). Doc 3 also pairs
    // to nothing else; ids 4/5 never pair to 1/2/3.
    assert(afterB2 == Set((3L, 1L, 1.0), (5L, 4L, 1.0)))

    // batch 3: push max event time to 60s — watermark (60s-10s=50s) now
    // evicts every earlier doc's bucket entries
    input.addData((60000L, 6L, words(900)))
    q.processAllAvailable()
    // batch 4: another copy of doc 1 — its original is beyond the horizon,
    // so NO pair fires; a copy of doc 6 IS in horizon and pairs
    input.addData((61000L, 7L, words(7)), (62000L, 8L, words(900)))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("withinstream_neardup")
      .select("id_new", "id_prior", "est_jaccard")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(rows == afterB2 + ((8L, 6L, 1.0)))
  }

  test("streaming interpolation lerps each closed segment; stale arrivals dropped") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Long, Double)]
    val out = StreamingResampler.interpolate(input.toDS(), "10l")
      .toDF("k", "b", "v")
    val q = out.writeStream.format("memory").queryName("interp_stream")
      .outputMode("append").start()

    input.addData(("a", 5L, 1.0))          // first point: nothing to emit
    q.processAllAvailable()
    assert(spark.table("interp_stream").isEmpty)

    input.addData(("a", 25L, 3.0))          // closes segment 5->25
    q.processAllAvailable()
    val afterB2 = spark.table("interp_stream")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(afterB2 == Set(("a", 10L, 1.5), ("a", 20L, 2.5)))

    // cross-batch state: 25 -> 40 lerps B=30 (40 itself waits for ITS
    // successor — each segment is [prev, next) ); stale t=20 is dropped
    input.addData(("a", 40L, 6.0), ("a", 20L, 99.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("interp_stream")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(rows == afterB2 + (("a", 30L, 4.0)))
  }

  test("streaming blocklist filter drops exactly the blocklisted texts") {
    implicit val sqlCtx = spark.sqlContext
    val blocklist = StreamingDedup.digests(
      Seq("leaked eval prompt", "another benchmark item").toDF("text"), "text")

    val input = MemoryStream[(Long, String)]
    val df = input.toDF().toDF("id", "text")
    val out = StreamingDedup.withoutBlocklist(df, "text", blocklist)
    val q = out.writeStream.format("memory").queryName("decontam_stream")
      .outputMode("append").start()

    input.addData((1L, "clean document one"), (2L, "leaked eval prompt"),
      (3L, "another benchmark item"), (4L, "clean document two"))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("decontam_stream").orderBy("id")
      .collect().map(_.getLong(0))
    assert(rows.toSeq == Seq(1L, 4L))
  }

  test("file-stream source picks up landing files end-to-end") {
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graft_stream").toString
    val schema = StructType(Seq(StructField("Timestamp", LongType),
      StructField("Price", DoubleType)))
    val stream = StreamingFuser.openStream(spark, dir, "csv", schema)
    val fused = StreamingFuser.fuseStreams(Seq(
      graft.sources.FrameSource(stream, "live_trades", "Timestamp")))
    val q = fused.writeStream.format("memory").queryName("filestream")
      .outputMode("append").start()
    java.nio.file.Files.writeString(java.nio.file.Paths.get(dir, "f1.csv"),
      "Timestamp,Price\n1000,1.5\n2000,2.5\n")
    q.processAllAvailable()
    java.nio.file.Files.writeString(java.nio.file.Paths.get(dir, "f2.csv"),
      "Timestamp,Price\n3000,3.5\n")
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("filestream").orderBy(TimestampCol).collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1000L, 2000L, 3000L))
    assert(rows.forall(_.getAs[Int]("exsym_lookup") == 0))
  }

  test("streaming sessionization closes gap-split sessions at the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Long)]
    val df = input.toDF().toDF("user", TimestampCol)
    val out = StreamingResampler.sessionize(df, Seq("user"), gapMs = 5000L,
      watermarkDelay = "0 seconds")
    val q = out.writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    input.addData(("u1", 1000L), ("u1", 2000L), ("u1", 8000L), ("u2", 1500L))
    q.processAllAvailable()
    // advance the watermark far past every session's close
    input.addData(("u3", 60000L))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("sessions").orderBy("user", "session_start")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // u1: [1000,2000] (gap 6000 splits) then [8000]; u2: [1500]; u3's
    // session is still open at the final watermark, so exactly these rows
    assert(rows.toSeq == Seq(
      ("u1", 1000L, 2000L, 2L),
      ("u1", 8000L, 8000L, 1L),
      ("u2", 1500L, 1500L, 1L)), rows.toSeq.mkString(","))
  }

  test("streaming fuse applies renameCols and exempts __-prefixed columns (batch parity)") {
    implicit val sqlCtx = spark.sqlContext
    val a = MemoryStream[(Long, Double)]
    val b = MemoryStream[(Long, Double)]
    // renameCols maps event_time -> ts before timestamp handling; both
    // sources use tsConvert so each produces a preserved original __ts,
    // which must MERGE by name (not collide into __ts||A / __ts||B).
    val fused = StreamingFuser.fuseStreams(Seq(
      graft.sources.FrameSource(a.toDF().toDF("event_time", "px"), "A", "ts",
        renameCols = Map("event_time" -> "ts"),
        tsConvert = Some(c => c * 1000)),
      graft.sources.FrameSource(b.toDF().toDF("ts", "px"), "B", "ts",
        tsConvert = Some(c => c * 1000))))
    assert(fused.columns.count(_ == "__ts") == 1, fused.columns.toSeq)
    assert(fused.columns.toSet ==
      Set(TimestampCol, "__ts", "px||A", "px||B", "exsym_lookup"), fused.columns.toSeq)
  }

  test("stream-stream range join pairs rows within the window, watermark-bounded") {
    implicit val sqlCtx = spark.sqlContext
    val trades = MemoryStream[(String, Long, Double)]
    val quotes = MemoryStream[(String, Long, Double)]
    val out = graft.ops.RangeJoin.timeRangeStream(
      trades.toDF().toDF("sym", TimestampCol, "qty"),
      quotes.toDF().toDF("sym", TimestampCol, "px"),
      keyCols = Seq("sym"), tsCol = TimestampCol,
      lookbackMs = 5000L, lookaheadMs = 0L,
      rightCols = Seq("px"), rightPrefix = "q_",
      watermarkDelay = "0 seconds")
    val q = out.writeStream.format("memory").queryName("rjstream")
      .outputMode("append").start()
    quotes.addData(("A", 4000L, 1.0), ("A", 8000L, 2.0), ("B", 7000L, 3.0))
    trades.addData(("A", 9000L, 10.0), ("B", 20000L, 20.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("rjstream")
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getDouble(r.fieldIndex("q_px")))).sorted.toSeq
    // A@9000 window [4000,9000] pairs both A-quotes at 4000 and 8000;
    // B@20000 window [15000,20000] pairs nothing
    assert(rows == Seq(("A", 9000L, 1.0), ("A", 9000L, 2.0)), rows)
  }

  test("streaming as-of join mirrors batch backward semantics (tolerance + cross-batch state)") {
    implicit val sqlCtx = spark.sqlContext
    val trades = MemoryStream[(String, Long, Double)]
    val quotes = MemoryStream[(String, Long, Double)]
    val out = StreamingAsOfJoin.asof(
      trades.toDS(), quotes.toDS(), maxStalenessMs = 5000L)
    val q = out.writeStream.format("memory").queryName("asofstream")
      .outputMode("append").start()

    // batch 1: quotes at 1000/4000 (A), 2000 (B); trades probe them
    quotes.addData(("A", 1000L, 1.0), ("A", 4000L, 1.5), ("B", 2000L, 9.0))
    trades.addData(
      ("A", 4000L, 10.0),  // AT a quote ts -> inclusive match 1.5
      ("A", 3000L, 11.0),  // between quotes -> 1.0
      ("B", 8000L, 12.0),  // staleness: 8000-2000 > 5000 -> None
      ("C", 3000L, 13.0))  // no quotes for key -> None
    q.processAllAvailable()
    // batch 2: state carries A@4000 across batches; a newer quote supersedes
    trades.addData(("A", 6000L, 14.0))
    q.processAllAvailable()
    quotes.addData(("A", 7000L, 2.0))
    trades.addData(("A", 7500L, 15.0))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("asofstream")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        Option(r.get(3)).map(_.asInstanceOf[Double]))).sorted.toSeq
    assert(rows == Seq(
      ("A", 3000L, 11.0, Some(1.0)),
      ("A", 4000L, 10.0, Some(1.5)),
      ("A", 6000L, 14.0, Some(1.5)), // cross-batch state
      ("A", 7500L, 15.0, Some(2.0)), // superseded by newer quote
      ("B", 8000L, 12.0, None),      // beyond staleness horizon
      ("C", 3000L, 13.0, None)), rows)

    // parity with the batch operator on the SAME data (tolerance = staleness)
    val bLeft = Seq(("A", 4000L, 10.0), ("A", 3000L, 11.0), ("B", 8000L, 12.0),
      ("C", 3000L, 13.0), ("A", 6000L, 14.0), ("A", 7500L, 15.0))
      .toDF("sym", "ts", "qty")
    val bRight = Seq(("A", 1000L, 1.0), ("A", 4000L, 1.5), ("B", 2000L, 9.0),
      ("A", 7000L, 2.0)).toDF("sym", "ts", "px")
    val batch = graft.ops.AsOfJoin.asof(bLeft, bRight, Seq("sym"), "ts",
      rightCols = Seq("px"), rightPrefix = "q_", toleranceMs = Some(5000L))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        Option(r.get(r.fieldIndex("q_px"))).map(_.asInstanceOf[Double]))).sorted.toSeq
    assert(batch == rows, s"batch=$batch stream=$rows")
  }

  test("randomized streaming as-of equals batch as-of under ts-ordered batches") {
    implicit val sqlCtx = spark.sqlContext
    val rnd  = new scala.util.Random(17)
    val keys = Seq("A", "B", "C")
    // unique (key, ts) on each side: the batch operator's right-tie rule
    // (struct-max) and the stream's last-arrival rule only coincide when
    // (key, ts) is unique — mirroring how q_asof_join pre-collapses ties
    def gen(n: Int): Seq[(String, Long, Double)] =
      rnd.shuffle(
        (for (k <- keys; ts <- rnd.shuffle((1L to 300L).toList).take(n))
          yield (k, ts * 100L, rnd.nextInt(1000).toDouble)).toList)
    val lefts  = gen(60)
    val rights = gen(40)

    val staleness = 3000L
    // split by event time: batch i holds ts < cut(i) — the in-order arrival
    // the streaming operator documents (cross-batch late rights excluded)
    val cuts = Seq(10000L, 20000L, Long.MaxValue)
    val trades = MemoryStream[(String, Long, Double)]
    val quotes = MemoryStream[(String, Long, Double)]
    val out = StreamingAsOfJoin.asof(trades.toDS(), quotes.toDS(), staleness)
    val q = out.writeStream.format("memory").queryName("asofprop")
      .outputMode("append").start()
    var lo = Long.MinValue
    cuts.foreach { hi =>
      quotes.addData(rights.filter(r => r._2 >= lo && r._2 < hi))
      trades.addData(lefts.filter(l => l._2 >= lo && l._2 < hi))
      q.processAllAvailable()
      lo = hi
    }
    q.stop()

    val streamed = spark.table("asofprop")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        Option(r.get(3)).map(_.asInstanceOf[Double]))).sorted.toSeq
    val batch = graft.ops.AsOfJoin.asof(
        lefts.toDF("k", "ts", "v"), rights.toDF("k", "ts", "v"),
        Seq("k"), "ts", rightCols = Seq("v"), rightPrefix = "r_",
        toleranceMs = Some(staleness))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        Option(r.get(r.fieldIndex("r_v"))).map(_.asInstanceOf[Double]))).sorted.toSeq
    assert(streamed.length == lefts.length)
    assert(streamed == batch)
  }

  test("streaming as-of caps right-side state for left-lagging keys") {
    implicit val sqlCtx = spark.sqlContext
    val trades = MemoryStream[(String, Long, Double)]
    val quotes = MemoryStream[(String, Long, Double)]
    // hard cap 5: 20 quotes arrive before any trade; only the newest 5
    // survive in state, so a very-late trade matches within that window
    // and a trade older than the kept window finds nothing
    val out = StreamingAsOfJoin.asof(
      trades.toDS(), quotes.toDS(), maxStalenessMs = 1000000L, maxRightRows = 5)
    val q = out.writeStream.format("memory").queryName("asofcap")
      .outputMode("append").start()
    quotes.addData((1L to 20L).map(i => ("K", i * 100L, i.toDouble)))
    q.processAllAvailable() // rights-only batch: state must cap at 5
    trades.addData(("K", 2000L, 1.0), ("K", 1200L, 2.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("asofcap")
      .collect().map(r => (r.getLong(1), Option(r.get(3)).map(_.asInstanceOf[Double])))
      .sortBy(_._1).toSeq
    // kept quotes after cap: ts 1600..2000 (values 16..20)
    assert(rows == Seq((1200L, None), (2000L, Some(20.0))), rows)
  }

  test("streaming fuse unions heterogeneous sources with provenance") {
    implicit val sqlCtx = spark.sqlContext
    val a = MemoryStream[(Long, Double)]
    val b = MemoryStream[(Long, String)]
    val fused = StreamingFuser.fuseStreams(Seq(
      graft.sources.FrameSource(a.toDF().toDF("ts", "price"), "trades", "ts"),
      graft.sources.FrameSource(b.toDF().toDF("ts", "note"), "news", "ts")))
    assert(fused.isStreaming)
    assert(fused.columns.toSet ==
      Set(TimestampCol, "price", "exsym_lookup", "note"))

    val q = fused.writeStream.format("memory").queryName("fusedstream")
      .outputMode("append").start()
    a.addData((1000L, 1.5)); b.addData((1500L, "hello"))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("fusedstream").orderBy(TimestampCol).collect()
    assert(rows.length == 2)
    assert(rows.map(_.getAs[Int]("exsym_lookup")).sorted.toSeq == Seq(0, 1))
  }

  test("streaming windowed CMS is bit-identical to a batch sketch of the window") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String)]
    val df = input.toDF().toDF("ts", "word")

    val out = StreamingProfile.windowedHeavyHitters(
      df, "ts", "word", windowDuration = "10 seconds",
      watermarkDelay = "0 seconds", eps = 0.01, confidence = 0.9, seed = 7)
    val q = out.writeStream.format("memory").queryName("cmswin")
      .outputMode("append").start()

    def t(s: Long) = new java.sql.Timestamp(1700000000000L + s * 1000L)
    // window [0,10s) items arrive across TWO batches (partial-sketch merge
    // path exercised), with a null that must contribute nothing
    val w1 = Seq("a", "b", "a", "c", "a", "b")
    input.addData(w1.take(3).map(w => (t(2), w)): _*)
    q.processAllAvailable()
    input.addData(w1.drop(3).map(w => (t(7), w)): _*)
    input.addData((t(8), null))
    q.processAllAvailable()
    input.addData((t(25), "z")) // advance watermark past the window
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("cmswin").orderBy("window_start").collect()
    assert(rows.length == 1, s"expected one closed window: ${rows.toSeq}")
    assert(rows(0).getAs[Long]("n_rows") == 6L)
    val streamBytes = rows(0).getAs[Array[Byte]]("cms_sketch")

    // batch sketch of the same rows, same aggregate, weight 1: CM linearity
    // says the serialized bytes must be IDENTICAL
    val batchBytes = w1.map(w => Tuple1(w)).toDF("word")
      .agg(graft.functions.CountMinSketchWeighted
        .cmSketchWeighted(col("word"), lit(1L), 0.01, 0.9, 7).as("sk"))
      .head().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(streamBytes, batchBytes))

    // and the artifact answers frequency probes with the CM guarantee
    val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(streamBytes))
    def est(w: String) =
      cms.estimateCount(w.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    assert(est("a") >= 3 && est("b") >= 2 && est("c") >= 1)
    assert(cms.totalCount() == 6L)
  }

  test("streaming windowed profile emits closed windows whose sketches re-union") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String)]
    val df = input.toDF().toDF("ts", "user")

    val out = StreamingProfile.windowedDistinct(
      df, "ts", "user", windowDuration = "10 seconds",
      watermarkDelay = "0 seconds")
    val q = out.writeStream.format("memory").queryName("profiled")
      .outputMode("append").start()

    def t(s: Long) = new java.sql.Timestamp(1700000000000L + s * 1000L)
    // window [0,10s): users u1,u2,u1 (n=3, distinct=2)
    // window [10,20s): users u2,u3,u4,u3 (n=4, distinct=3); u2 overlaps w1
    input.addData((t(1), "u1"), (t(2), "u2"), (t(3), "u1"))
    q.processAllAvailable()
    input.addData((t(11), "u2"), (t(12), "u3"), (t(13), "u4"), (t(15), "u3"))
    q.processAllAvailable()
    input.addData((t(25), "uZ")) // advance watermark past both windows
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("profiled").orderBy("window_start").collect()
    assert(rows.length == 2, s"expected both closed windows: ${rows.toSeq}")
    assert(rows.map(r => (r.getAs[Long]("n_rows"), r.getAs[Long]("n_distinct_est")))
      .toSeq == Seq((3L, 2L), (4L, 3L)))

    // the emitted artifacts are the SAME mergeable sketches as the batch
    // side: re-union across windows = distinct over the union (u1..u4 = 4)
    val unioned = graft.pipeline.Sketches.hllUnionEstimate(
      spark.table("profiled").select(col("n_rows"), col("hll_sketch")))
      .head()
    assert(unioned.getLong(0) == 2L)                       // n_parts
    assert(unioned.getLong(1) == 7L)                       // n_rows
    assert(unioned.getLong(2) == 4L, s"$unioned")          // distinct est
  }

  test("streaming ohlc matches the batch candles, ties and all") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Long, Double, Long)]
    val df = input.toDF().toDF("k", TimestampCol, "value", "tie")

    val out = StreamingBars.ohlc(df, "1s", Seq("k"), tieCols = Seq("tie"),
      watermarkDelay = "0 seconds")
    val q = out.writeStream.format("memory").queryName("candles")
      .outputMode("append").start()

    val base = 1700000000000L
    // bucket 0 of key a arrives out of order ACROSS batches (watermark 0
    // still admits them while the bucket is open); equal-ts pair at +300
    // resolves open by the LOWER tie (5.0)
    input.addData(
      ("a", base + 900, 7.0, 1L), ("a", base + 300, 2.0, 2L))
    q.processAllAvailable()
    input.addData(
      ("a", base + 300, 5.0, 1L), ("a", base + 1100, 1.0, 1L),
      ("b", base + 100, -1.0, 1L))
    q.processAllAvailable()
    input.addData(("a", base + 5000, 99.0, 1L)) // close all earlier buckets
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("candles").orderBy("k", "bar_start")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getLong(6)))
    assert(rows.toSeq == Seq(
      // a/bucket0: order (300,tie1,5.0)(300,tie2,2.0)(900,7.0) -> o=5 h=7 l=2 c=7
      ("a", base, 5.0, 7.0, 2.0, 7.0, 3L),
      ("a", base + 1000, 1.0, 1.0, 1.0, 1.0, 1L),
      ("b", base, -1.0, -1.0, -1.0, -1.0, 1L)))

    // same events through the batch operator = the same candles
    val batch = graft.ops.Bars.ohlc(
      Seq(("a", base + 900, 7.0, 1L), ("a", base + 300, 2.0, 2L),
        ("a", base + 300, 5.0, 1L), ("a", base + 1100, 1.0, 1L),
        ("b", base + 100, -1.0, 1L))
        .toDF("k", TimestampCol, "value", "tie"),
      "1s", Seq("k"), TimestampCol, "value", tieCols = Seq("tie"))
      .orderBy("k", "bar_start")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getLong(6)))
    // (the 99.0 watermark-advancer's own bucket never closed, so the
    // streaming output is exactly the three batch candles)
    assert(batch.toSeq == rows.toSeq)
  }

  test("streaming debounce passes burst leaders only, matching batch across batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Long)]
    val out = StreamingBars.debounce(input.toDS(), gapMs = 50L)
    val q = out.writeStream.format("memory").queryName("debounced")
      .outputMode("append").start()

    input.addData(("a", 0L), ("a", 30L), ("b", 10L))
    q.processAllAvailable()
    // 40 continues a's burst (dt=10 from 30); 200 opens a new one; the
    // stale ("a", 20) is dropped, not treated as a new leader
    input.addData(("a", 40L), ("a", 200L), ("a", 20L), ("b", 45L))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("debounced").orderBy("_1", "_2")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(rows.toSeq == Seq(("a", 0L), ("a", 200L), ("b", 10L)))

    // batch parity on the delivered (non-stale) events
    val batch = graft.ops.Sessionize.debounce(
      Seq(("a", 0L), ("a", 30L), ("a", 40L), ("a", 200L), ("b", 10L), ("b", 45L))
        .toDF("k", "t"),
      Seq("k"), "t", gapMs = 50L)
      .orderBy("k", "t").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(batch.toSeq == rows.toSeq)
  }

  test("streaming gap report emits each above-threshold silence once, across batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Long)]
    val out = StreamingBars.gaps(input.toDS(), thresholdMs = 100L)
    val q = out.writeStream.format("memory").queryName("gapstream")
      .outputMode("append").start()

    input.addData(("a", 0L), ("a", 50L), ("b", 10L))
    q.processAllAvailable()
    // a resumes 250ms later -> gap (50, 300); b's 90ms silence is under
    // threshold; the stale ("a", 40) must be dropped, not re-open history
    input.addData(("a", 300L), ("a", 40L), ("b", 100L))
    q.processAllAvailable()
    input.addData(("b", 500L)) // b: gap (100, 500)
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("gapstream").orderBy("_1", "_2")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.toSeq == Seq(("a", 50L, 300L, 250L), ("b", 100L, 500L, 400L)))

    // batch parity on the delivered (non-stale) events
    val batch = graft.ops.Bars.gaps(
      Seq(("a", 0L), ("a", 50L), ("a", 300L), ("b", 10L), ("b", 100L), ("b", 500L))
        .toDF("k", "t"),
      Seq("k"), thresholdMs = 100L, tsCol = "t")
      .orderBy("k", "gap_start").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(batch.toSeq == rows.toSeq)
  }

  test("streaming TWAP closes bars on bucket advance; batch parity; stale dropped") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Long, Double)]
    val out = StreamingBars.twap(input.toDS(), "10l", roundTo = 4)
      .toDF("k", "bucket", "twap", "n_segments", "weight_ms")
    val q = out.writeStream.format("memory").queryName("twap_stream")
      .outputMode("append").start()

    // all three segments start in bucket 0, which stays open: no emission
    input.addData(("a", 2L, 1.0), ("a", 4L, 3.0), ("a", 8L, 5.0))
    q.processAllAvailable()
    assert(spark.table("twap_stream").isEmpty)

    // 13 -> segment (8,w5,v5) still starts in bucket 0: STILL open (the
    // straddling segment belongs to the bucket of its start, as in batch)
    input.addData(("a", 13L, 7.0))
    q.processAllAvailable()
    assert(spark.table("twap_stream").isEmpty)

    // 21 -> segment (13,w8,v7) starts in bucket 10: bucket 0 is final.
    // sumVW = 1*2 + 3*4 + 5*5 = 39, sumW = 11
    input.addData(("a", 21L, 9.0))
    q.processAllAvailable()
    val after3 = spark.table("twap_stream").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3), r.getLong(4)))
    assert(after3.toSeq == Seq(("a", 0L, math.rint(39.0 / 11.0 * 1e4) / 1e4, 3L, 11L)))

    // 25 closes bucket 10 (single 8ms segment at v=7); a stale t=3 is
    // dropped by the cross-batch ordering contract, not re-accumulated
    input.addData(("a", 25L, 11.0), ("a", 3L, 99.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("twap_stream").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._2)

    // exact parity: the batch operator over the same events, restricted to
    // the buckets the stream has closed (< 20), must emit identical bars
    val batch = graft.ops.Bars.twap(
      Seq(("a", 2L, 1.0), ("a", 4L, 3.0), ("a", 8L, 5.0), ("a", 13L, 7.0),
        ("a", 21L, 9.0), ("a", 25L, 11.0)).toDF("k", "t", "value"),
      "10l", Seq("k"), "t", "value", roundTo = 4)
      .filter(col("bucket") < 20).orderBy("bucket").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3), r.getLong(4)))
    assert(rows.toSeq == batch.toSeq, s"stream ${rows.toSeq} vs batch ${batch.toSeq}")
  }

  test("streaming EWMA: bit-exact batch parity across micro-batches; stale dropped") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Long, Double)]
    val out = StreamingBars.ewma(input.toDS(), frameRows = 3, decay = 0.5)
      .toDF("k", "t", "value", "ewma")
    val q = out.writeStream.format("memory").queryName("ewma_stream")
      .outputMode("append").start()

    // frame must carry ACROSS micro-batches, and the frame bound must
    // evict the oldest value (t=1 leaves at t=4); two keys interleaved
    input.addData(("a", 1L, 8.0), ("a", 2L, 4.0), ("b", 1L, 2.0))
    q.processAllAvailable()
    input.addData(("a", 3L, 2.0), ("a", 4L, 6.0), ("b", 5L, 10.0))
    q.processAllAvailable()
    // a stale arrival (t=2 <= last seen 4) must not perturb the frame
    input.addData(("a", 2L, 99.0), ("a", 6L, 1.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("ewma_stream").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .sortBy(r => (r._1, r._2))

    // hand-check one interior value: frame at a/t=4 is [4,2,6] ->
    // ws = ((0*.5+4)*.5+2)*.5+6 = 8.0, weight = (1-.5^3)/.5 = 1.75
    assert(rows.find(r => r._1 == "a" && r._2 == 4L).get._4 == 8.0 / 1.75)

    // bit-exact parity with the batch operator on the SAME events (the
    // stale row never entered the stream state, so it is absent here too)
    val batch = graft.ops.Bars.ewma(
      Seq(("a", 1L, 8.0), ("a", 2L, 4.0), ("a", 3L, 2.0), ("a", 4L, 6.0),
        ("a", 6L, 1.0), ("b", 1L, 2.0), ("b", 5L, 10.0))
        .toDF("k", "t", "value"),
      Seq("k"), "t", "value", frameRows = 3, decay = 0.5)
      .select(col("k"), col("t"), col("value"), col("ewma"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .sortBy(r => (r._1, r._2))
    assert(rows.toSeq == batch.toSeq, s"stream ${rows.toSeq} vs batch ${batch.toSeq}")
  }

  test("streaming rolling corr: batch parity incl. null pairs; stale dropped") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Long, Option[Double], Option[Double])]
    val out = StreamingRollingStats.rollingCorr(input.toDS(), frameRows = 3)
      .toDF("k", "t", "roll_corr", "n_pairs")
    val q = out.writeStream.format("memory").queryName("rollcorr_stream")
      .outputMode("append").start()

    // frame carries across micro-batches; the null-pair row at t=3 holds a
    // frame slot but contributes to no sum; two keys interleave
    input.addData(("a", 1L, Some(1.0), Some(2.0)), ("a", 2L, Some(2.0), Some(3.5)),
      ("b", 1L, Some(5.0), Some(5.0)))
    q.processAllAvailable()
    input.addData(("a", 3L, None, Some(9.0)), ("a", 4L, Some(4.0), Some(8.0)),
      ("b", 2L, Some(6.0), Some(4.0)))
    q.processAllAvailable()
    // stale arrival (t=2 <= last seen 4) must not perturb the frame
    input.addData(("a", 2L, Some(99.0), Some(99.0)), ("a", 5L, Some(5.0), Some(1.0)))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("rollcorr_stream").collect()
      .map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)), r.getLong(3)))
      .sortBy(r => (r._1, r._2))

    // interior hand-check: frame at a/t=4 is [(2,3.5),slot,(4,8)] -> the 2
    // pairs are exactly linear -> corr 1.0
    assert(rows.find(r => r._1 == "a" && r._2 == 4L).get._3.contains(1.0))

    val batch = graft.ops.RollingStats.rollingCorr(
      Seq(("a", 1L, Some(1.0), Some(2.0)), ("a", 2L, Some(2.0), Some(3.5)),
        ("a", 3L, None: Option[Double], Some(9.0)), ("a", 4L, Some(4.0), Some(8.0)),
        ("a", 5L, Some(5.0), Some(1.0)), ("b", 1L, Some(5.0), Some(5.0)),
        ("b", 2L, Some(6.0), Some(4.0))).toDF("k", "t", "x", "y"),
      Seq("k"), "t", "x", "y", frameRows = 3)
      .select(col("k"), col("t"), col("roll_corr"), col("n_pairs"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)), r.getLong(3)))
      .sortBy(r => (r._1, r._2))
    assert(rows.toSeq == batch.toSeq, s"stream ${rows.toSeq} vs batch ${batch.toSeq}")
  }

  test("streaming rolling slope: batch parity; degenerate frames NULL") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Long, Option[Double], Option[Double])]
    val out = StreamingRollingStats.rollingSlope(input.toDS(), frameRows = 3)
      .toDF("k", "t", "roll_slope", "roll_icept", "n_pairs")
    val q = out.writeStream.format("memory").queryName("rollslope_stream")
      .outputMode("append").start()

    // key c is CONSTANT in x -> zero x-variance -> slope must stay NULL
    input.addData(("a", 1L, Some(0.0), Some(1.0)), ("a", 2L, Some(1.0), Some(3.0)),
      ("c", 1L, Some(2.0), Some(1.0)), ("c", 2L, Some(2.0), Some(7.0)))
    q.processAllAvailable()
    input.addData(("a", 3L, Some(2.0), Some(5.0)), ("a", 4L, Some(3.0), Some(6.0)))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("rollslope_stream").collect()
      .map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)), r.getLong(4)))
      .sortBy(r => (r._1, r._2))

    // hand-check: a/t=3 frame pairs (0,1),(1,3),(2,5) -> slope 2, icept 1
    assert(rows.find(r => r._1 == "a" && r._2 == 3L).get._3.contains(2.0))
    assert(rows.find(r => r._1 == "a" && r._2 == 3L).get._4.contains(1.0))
    assert(rows.filter(_._1 == "c").forall(r => r._3.isEmpty && r._4.isEmpty))

    val batch = graft.ops.RollingStats.rollingSlope(
      Seq(("a", 1L, Some(0.0), Some(1.0)), ("a", 2L, Some(1.0), Some(3.0)),
        ("a", 3L, Some(2.0), Some(5.0)), ("a", 4L, Some(3.0), Some(6.0)),
        ("c", 1L, Some(2.0), Some(1.0)), ("c", 2L, Some(2.0), Some(7.0)))
        .toDF("k", "t", "x", "y"),
      Seq("k"), "t", "x", "y", frameRows = 3)
      .select(col("k"), col("t"), col("roll_slope"), col("roll_icept"), col("n_pairs"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)), r.getLong(4)))
      .sortBy(r => (r._1, r._2))
    assert(rows.toSeq == batch.toSeq, s"stream ${rows.toSeq} vs batch ${batch.toSeq}")
  }

  test("streaming rolling band: bit-exact batch parity; null slots; stale dropped") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Long, Option[Double])]
    val out = StreamingRollingStats.rollingBand(input.toDS(), frameRows = 3,
        nSigma = 1.0)
      .toDF("key", "t", "roll_mean", "roll_std", "outside_band", "n_in")
    val q = out.writeStream.format("memory").queryName("band_stream")
      .outputMode("append").start()
    input.addData(("k", 1L, Some(10.0)), ("k", 2L, Some(20.0)))
    q.processAllAvailable()
    // cross-batch frame; a null holds a slot; stale t=1 drops
    input.addData(("k", 3L, Some(60.0)), ("k", 4L, None),
      ("k", 5L, Some(21.0)), ("k", 1L, Some(999.0)))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("band_stream").collect()
      .map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)),
        if (r.isNullAt(4)) None else Some(r.getBoolean(4)),
        r.getLong(5)))
      .sortBy(_._2)
    // frame 3, sigma 1: t3 sees (10,20,60): mean 30, sd 21.602469, |60-30|>sd
    assert(rows.map(_._2).toSeq === Seq(1L, 2L, 3L, 4L, 5L))
    assert(rows(2)._3 === Some(30.0) && rows(2)._5 === Some(true))
    assert(rows(3)._5 === None) // null value row: no band decision
    // t5 frame holds (60, null, 21): n=2
    assert(rows(4)._6 === 2L)

    // batch parity on the delivered events, bit-exact
    val delivered = Seq(("k", 1L, Some(10.0)), ("k", 2L, Some(20.0)),
      ("k", 3L, Some(60.0)), ("k", 4L, None), ("k", 5L, Some(21.0)))
      .toDF("key", "t", "value")
    val batch = graft.ops.RollingStats.rollingBand(delivered, Seq("key"), "t",
        "value", frameRows = 3, nSigma = 1.0)
      .select("key", "t", "roll_mean", "roll_std", "outside_band").collect()
      .map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)),
        if (r.isNullAt(4)) None else Some(r.getBoolean(4))))
      .sortBy(_._2)
    assert(rows.map(r => (r._1, r._2, r._3, r._4, r._5)).toSeq === batch.toSeq,
      s"stream ${rows.toSeq} vs batch ${batch.toSeq}")
  }

  test("streaming CUSUM: bit-exact batch parity incl. null carry; stale dropped; alarm fires") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Long, Option[Long])]
    // mu0 = 100, k = 10, h = 50: values 200,210 push S+ by 90+100 -> alarm
    val out = StreamingCusum.cusum(input.toDS(), mu0 = 100L, slack = 10L,
        threshold = 50L)
      .toDF("key", "t", "s_pos", "s_neg", "alarm")
    val q = out.writeStream.format("memory").queryName("cusum_stream")
      .outputMode("append").start()
    input.addData(("a", 1L, Some(100L)), ("a", 2L, Some(200L)), ("b", 1L, Some(20L)))
    q.processAllAvailable()
    // cross-batch state; a null carries S; a strictly-earlier arrival drops
    input.addData(("a", 3L, None), ("a", 4L, Some(210L)), ("a", 1L, Some(999L)))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("cusum_stream").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))
      .sortBy(r => (r._1, r._2))
    // a: S+ walks 0 -> 90 -> 90(null) -> 190; b: S- = 100-20-10 = 70 -> alarm
    assert(rows.toSeq === Seq(
      ("a", 1L, 0L, 0L, false), ("a", 2L, 90L, 0L, true),
      ("a", 3L, 90L, 0L, true), ("a", 4L, 190L, 0L, true),
      ("b", 1L, 0L, 70L, true)))

    // batch parity on the delivered (non-stale) events, bit-exact
    val delivered = Seq(("a", 1L, Some(100L)), ("a", 2L, Some(200L)),
      ("a", 3L, None), ("a", 4L, Some(210L)), ("b", 1L, Some(20L)))
      .toDF("key", "t", "cents")
    val batch = graft.ops.Anomalies.cusumOnline(delivered, Seq("key"), "t",
        "cents", mu0 = 100L, slack = 10L, threshold = 50L)
      .select("key", "t", "s_pos", "s_neg", "alarm").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))
      .sortBy(r => (r._1, r._2))
    assert(rows.toSeq === batch.toSeq, s"stream ${rows.toSeq} vs batch ${batch.toSeq}")
  }

  test("streaming transitions: pair stream matches batch lag; stale dropped; TTL-free chain") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Long, String)]
    val out = StreamingTransitions.transitions(input.toDS())
      .toDF("user", "from_type", "to_type", "t")
    val q = out.writeStream.format("memory").queryName("trans_stream")
      .outputMode("append").start()
    input.addData(("u1", 10L, "a"), ("u1", 20L, "b"), ("u2", 5L, "x"))
    q.processAllAvailable()
    // chain carries across batches; a strictly-earlier arrival is stale;
    // a NULL type breaks the chain (it occupies the batch lag slot)
    input.addData(("u1", 30L, "a"), ("u1", 15L, "zzz"), ("u2", 7L, "y"),
      ("u2", 8L, null), ("u2", 9L, "z"))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("trans_stream").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3)))
      .sortBy(r => (r._1, r._4))
    // no (y -> z) pair: the null at t=8 broke the chain
    assert(rows.toSeq === Seq(
      ("u1", "a", "b", 20L), ("u1", "b", "a", 30L), ("u2", "x", "y", 7L)))

    // batch parity on the delivered (non-stale) events: lag pairs per user
    import org.apache.spark.sql.expressions.Window
    val delivered = Seq(("u1", 10L, "a"), ("u1", 20L, "b"), ("u1", 30L, "a"),
      ("u2", 5L, "x"), ("u2", 7L, "y"), ("u2", 8L, null), ("u2", 9L, "z"))
      .toDF("user", "t", "typ")
    val w = Window.partitionBy($"user").orderBy($"t")
    val batch = delivered
      .withColumn("from_type", lag($"typ", 1).over(w))
      .filter($"from_type".isNotNull && $"typ".isNotNull)
      .select($"user", $"from_type", $"typ".as("to_type"), $"t")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3)))
      .sortBy(r => (r._1, r._4))
    assert(rows.toSeq === batch.toSeq)
  }

  test("streaming funnel emits each first completion once; batch parity on ms-unique feeds") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Long, String)]
    val out = StreamingFunnel.funnelStages(input.toDS(),
        Seq("view", "click", "purchase"))
      .toDF("user", "stage", "stage_idx", "t")
    val q = out.writeStream.format("memory").queryName("funnel_stream")
      .outputMode("append").start()

    input.addData(("u1", 10L, "view"), ("u1", 15L, "click"),
      ("u2", 10L, "click")) // u2 has no view: click ignored
    q.processAllAvailable()
    // chain carries across batches; a second view must NOT re-emit;
    // purchase before click's ts is stale and dropped
    input.addData(("u1", 20L, "view"), ("u1", 30L, "purchase"),
      ("u2", 20L, "view"))
    q.processAllAvailable()
    input.addData(("u2", 25L, "click"), ("u2", 25L, "purchase")) // same-ms: no chain
    q.processAllAvailable()
    // a noise event must not shadow a same-ms stage event arriving in a
    // LATER batch: equal-ts arrivals are not stale (only strictly earlier)
    input.addData(("u3", 40L, "noise"))
    q.processAllAvailable()
    input.addData(("u3", 40L, "view"))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("funnel_stream").collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2), r.getLong(3)))
      .sortBy(r => (r._1, r._3))
    assert(rows.toSeq === Seq(
      ("u1", "view", 0, 10L), ("u1", "click", 1, 15L), ("u1", "purchase", 2, 30L),
      ("u2", "view", 0, 20L), ("u2", "click", 1, 25L),
      ("u3", "view", 0, 40L)))

    // batch parity: the emitted (stage -> ts) cells match funnelStages
    val batch = graft.ops.Funnel.funnelStages(
      Seq(("u1", 10L, "view"), ("u1", 15L, "click"), ("u1", 20L, "view"),
        ("u1", 30L, "purchase"), ("u2", 10L, "click"), ("u2", 20L, "view"),
        ("u2", 25L, "click"), ("u2", 25L, "purchase"),
        ("u3", 40L, "noise"), ("u3", 40L, "view"))
        .toDF("user", "t", "typ"),
      "user", "t", "typ", Seq("view", "click", "purchase"))
      .collect().flatMap { r =>
        Seq("view", "click", "purchase").zipWithIndex.flatMap { case (s, i) =>
          if (r.isNullAt(r.fieldIndex(s"${s}_ms"))) None
          else Some((r.getString(0), s, i, r.getLong(r.fieldIndex(s"${s}_ms"))))
        }
      }.sortBy(r => (r._1, r._3))
    assert(rows.toSeq === batch.toSeq, s"stream ${rows.toSeq} vs batch ${batch.toSeq}")
  }

  test("streaming drawdown: bit-exact batch parity; nulls keep the peak; stale dropped") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Long, Option[Double])]
    val out = StreamingRollingStats.runningDrawdown(input.toDS())
      .toDF("k", "t", "value", "peak", "drawdown")
    val q = out.writeStream.format("memory").queryName("drawdown_stream")
      .outputMode("append").start()

    input.addData(("a", 1L, Some(5.0)), ("a", 2L, Some(3.0)), ("b", 1L, None))
    q.processAllAvailable()
    // peak carries across micro-batches; null at a/t=3 keeps peak 5, null dd;
    // b's leading null means no peak until its first value
    input.addData(("a", 3L, None), ("a", 4L, Some(7.0)), ("b", 2L, Some(2.0)))
    q.processAllAvailable()
    input.addData(("a", 2L, Some(99.0)), ("a", 5L, Some(6.5))) // first is stale
    q.processAllAvailable()
    q.stop()
    def tup(r: org.apache.spark.sql.Row) = (r.getString(0), r.getLong(1),
      if (r.isNullAt(2)) None else Some(r.getDouble(2)),
      if (r.isNullAt(3)) None else Some(r.getDouble(3)),
      if (r.isNullAt(4)) None else Some(r.getDouble(4)))
    val rows = spark.table("drawdown_stream").collect().map(tup)
      .sortBy(r => (r._1, r._2))
    assert(rows.find(r => r._1 == "a" && r._2 == 2L).get._5.contains(2.0))
    assert(rows.find(r => r._1 == "a" && r._2 == 3L).get._4.contains(5.0))
    assert(rows.find(r => r._1 == "a" && r._2 == 3L).get._5.isEmpty)
    assert(rows.find(r => r._1 == "a" && r._2 == 5L).get._5.contains(0.5))
    assert(rows.find(r => r._1 == "b" && r._2 == 1L).get._4.isEmpty)

    val batch = graft.ops.RollingStats.runningDrawdown(
      Seq(("a", 1L, Some(5.0)), ("a", 2L, Some(3.0)), ("a", 3L, None: Option[Double]),
        ("a", 4L, Some(7.0)), ("a", 5L, Some(6.5)),
        ("b", 1L, None: Option[Double]), ("b", 2L, Some(2.0)))
        .toDF("k", "t", "value"),
      Seq("k"), "t", "value")
      .select(col("k"), col("t"), col("value"), col("peak"), col("drawdown"))
      .collect().map(tup).sortBy(r => (r._1, r._2))
    assert(rows.toSeq == batch.toSeq, s"stream ${rows.toSeq} vs batch ${batch.toSeq}")
  }

  test("streaming SemDeDup drops same-cell cosine dups vs prior; cross-batch incrKeep parity") {
    implicit val sqlCtx = spark.sqlContext
    // two orthogonal unit centroids: cell 0 = x-axis, cell 1 = y-axis
    val centroids = Array(
      (0L, Array(1.0, 0.0)),
      (1L, Array(0.0, 1.0)))
    val prior = Seq(
      (100L, Array(1.0, 0.0)),   // cell 0
      (101L, Array(0.0, 1.0)))   // cell 1
      .toDF("vec_id", "embedding")
    val priorAssigned = graft.pipeline.Similarity
      .ivfAssignWithSim(prior, "embedding", centroids)
      .select(col("vec_id"), col("embedding"), col("cell_id"))
      .cache()

    val input = MemoryStream[(Long, Array[Double])]
    val out = StreamingSemDedup.keepAgainstPrior(
      input.toDS().toDF("vec_id", "embedding"),
      priorAssigned, "embedding", centroids, threshold = 0.9)
    val q = out.writeStream.format("memory").queryName("semdedup_stream")
      .outputMode("append").start()

    // batch 1: 1 = dup of prior 100 (same cell, cos 1.0) -> dropped;
    //          2 = cell-0 but far from prior (cos ~.707 < .9) -> kept
    input.addData((1L, Array(1.0, 0.0)), (2L, Array(0.9, 0.44)))
    q.processAllAvailable()
    // batch 2: 3 = dup of prior 101 -> dropped; 4 and 5 land in cell 1
    // with cosine vs prior 101 just under the gate (~.898, ~.8) -> kept
    input.addData((3L, Array(0.0, 1.0)), (4L, Array(0.44, 0.9)),
      (5L, Array(0.6, 0.8)))
    q.processAllAvailable()
    q.stop()

    val streamKept = spark.table("semdedup_stream")
      .select("vec_id", "cell_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)

    // batch contract on the SAME arrivals (both micro-batches unioned)
    val allFresh = Seq(
      (1L, Array(1.0, 0.0)), (2L, Array(0.9, 0.44)),
      (3L, Array(0.0, 1.0)), (4L, Array(0.44, 0.9)), (5L, Array(0.6, 0.8)))
      .toDF("vec_id", "embedding")
    val batchKept = graft.pipeline.SemDedup.incrKeep(
      allFresh, prior, "vec_id", "embedding", centroids, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)

    assert(streamKept.toSeq == batchKept.toSeq,
      s"stream ${streamKept.toSeq} vs batch ${batchKept.toSeq}")
    // the dups of prior rows are gone, survivors carry their cells
    val keptIds = streamKept.map(_._1).toSet
    assert(!keptIds.contains(1L) && !keptIds.contains(3L), streamKept.toSeq.toString)
    assert(keptIds.contains(2L), streamKept.toSeq.toString)
  }

  test("streaming SemDeDup rejects an uncached derivation prior; artifact overload caches it") {
    implicit val sqlCtx = spark.sqlContext
    val centroids = Array(
      (0L, Array(1.0, 0.0)),
      (1L, Array(0.0, 1.0)))
    val prior = Seq(
      (100L, Array(1.0, 0.0)),
      (101L, Array(0.0, 1.0)))
      .toDF("vec_id", "embedding")
    // an UNCACHED derivation (the k-means assignment itself contains a
    // per-row kernel + here a planted aggregate) must be refused: the
    // static side of a stream-static join re-runs it every micro-batch
    val derived = graft.pipeline.Similarity
      .ivfAssignWithSim(prior, "embedding", centroids)
      .groupBy(col("cell_id"), col("vec_id"), col("embedding"))
      .agg(count(lit(1)).as("__dup"))
      .select(col("vec_id"), col("embedding"), col("cell_id"))
    val input0 = MemoryStream[(Long, Array[Double])]
    val err = intercept[IllegalArgumentException] {
      StreamingSemDedup.keepAgainstPrior(
        input0.toDS().toDF("vec_id", "embedding"),
        derived, "embedding", centroids, threshold = 0.9)
    }
    assert(err.getMessage.contains("stream-static"), err.getMessage)
    // ...but the SAME derivation cached is fine (one evaluation, reused)
    val cachedOk = derived.cache()
    try {
      StreamingSemDedup.keepAgainstPrior(
        input0.toDS().toDF("vec_id", "embedding"),
        cachedOk, "embedding", centroids, threshold = 0.9)
    } finally cachedOk.unpersist()

    // artifact-path overload: persisted prior is loaded + cached ONCE —
    // the stream's static side is an InMemoryRelation over the artifact,
    // structurally incapable of re-deriving anything per batch
    val dir = java.nio.file.Files.createTempDirectory("semdedup_prior_").toFile
    try {
      graft.pipeline.Similarity
        .ivfAssignWithSim(prior, "embedding", centroids)
        .select(col("vec_id"), col("embedding"), col("cell_id"))
        .write.mode("overwrite").parquet(dir.toString)
      val input = MemoryStream[(Long, Array[Double])]
      val out = StreamingSemDedup.keepAgainstPrior(
        input.toDS().toDF("vec_id", "embedding"),
        dir.toString, "embedding", centroids, threshold = 0.9)
      // the overload's static side must really sit behind a cache (a
      // streaming plan refuses batch inspection, so pin it on the shared
      // prior handle itself: cached, and reused — not re-read — per call)
      val priorHandle = StreamingSemDedup.priorCache((spark, dir.toString))
      assert(priorHandle.storageLevel !=
        org.apache.spark.storage.StorageLevel.NONE, "prior not cached")
      val out2 = StreamingSemDedup.keepAgainstPrior(
        input.toDS().toDF("vec_id", "embedding"),
        dir.toString, "embedding", centroids, threshold = 0.9)
      assert(StreamingSemDedup.priorCache((spark, dir.toString)) eq priorHandle,
        "second stream must reuse the cached prior plan")
      val _ = out2
      val q = out.writeStream.format("memory").queryName("semdedup_artifact")
        .outputMode("append").start()
      input.addData((1L, Array(1.0, 0.0)), (2L, Array(0.9, 0.44)))
      q.processAllAvailable()
      input.addData((3L, Array(0.0, 1.0)), (4L, Array(0.44, 0.9)))
      q.processAllAvailable()
      q.stop()
      val kept = spark.table("semdedup_artifact")
        .select("vec_id").collect().map(_.getLong(0)).sorted
      assert(kept.toSeq == Seq(2L, 4L), kept.toSeq.toString)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(dir)
    }
  }

  test("streaming quantile transform scores arrivals against the trained grids; batch parity") {
    implicit val sqlCtx = spark.sqlContext
    // grids trained by the two-phase trainer on a small reference corpus
    // (types with distinct distributions + one untrained type arriving)
    val train = (1 to 200).map(i => ("click", i.toDouble)) ++
      (1 to 100).map(i => ("view", i * 10.0))
    val grids = graft.pipeline.RankSelect.exactQuantileGrid(
      train.toDF("t", "v"), "t", "v", Seq(0.25, 0.5, 0.75))

    val input = MemoryStream[(Long, String, Option[Double])]
    val out = StreamingQuantile.transformAgainstGrids(
      input.toDS().toDF("id", "t", "v"), "t", "v", grids)
    val q = out.writeStream.format("memory").queryName("quantile_stream")
      .outputMode("append").start()
    val batch1 = Seq((1L, "click", Some(3.0)), (2L, "view", Some(555.0)),
      (3L, "click", None: Option[Double]))
    val batch2 = Seq((4L, "view", Some(10.0)), (5L, "purchase", Some(7.0)),
      (6L, "click", Some(200.0)))
    input.addData(batch1: _*)
    q.processAllAvailable()
    input.addData(batch2: _*)
    q.processAllAvailable()
    q.stop()

    def tup(r: org.apache.spark.sql.Row) = (r.getLong(0),
      if (r.isNullAt(1)) None else Some(r.getLong(1)),
      if (r.isNullAt(2)) None else Some(r.getDouble(2)))
    val streamed = spark.table("quantile_stream")
      .select(col("id"), col("q_bucket"), col("qscore"))
      .collect().map(tup).sortBy(_._1)
    val batch = graft.pipeline.RankSelect.transformAgainstGrids(
      (batch1 ++ batch2).toDF("id", "t", "v"), "t", "v", grids)
      .select(col("id"), col("q_bucket"), col("qscore"))
      .collect().map(tup).sortBy(_._1)
    assert(streamed.toSeq == batch.toSeq,
      s"stream ${streamed.toSeq} vs batch ${batch.toSeq}")
    // spot semantics: untrained type and null value stay null; view's
    // grid is [250, 500, 750] (ranks 25/50/75 of 10..1000 step 10), so
    // 555.0 clears two splits -> bucket 2, qscore 2/4
    val byId = streamed.map(r => r._1 -> r).toMap
    assert(byId(3L)._2.isEmpty && byId(5L)._2.isEmpty)
    assert(byId(2L)._2.contains(2L) && byId(2L)._3.contains(0.5))
  }

  test("streaming DSIR scoring against the trained log-ratio artifact; batch parity") {
    implicit val sqlCtx = spark.sqlContext
    // ratios trained on a reference corpus; arrivals scored per row (the
    // scoreAgainstRatios face is pure narrow work, so it runs on a
    // stream unchanged — no dedicated streaming operator needed)
    val ref = Seq((1L, "alpha beta beta", true), (2L, "gamma delta", false),
      (3L, "alpha gamma", true)).toDF("doc_id", "text", "is_t")
    val lr = graft.pipeline.Dsir.trainLogRatios(ref, "text",
      org.apache.spark.sql.functions.col("is_t"), buckets = 16)

    val input = MemoryStream[(Long, String)]
    val out = graft.pipeline.Dsir.scoreAgainstRatios(
      input.toDS().toDF("doc_id", "text"), "doc_id", "text", lr)
    val q = out.writeStream.format("memory").queryName("dsir_stream")
      .outputMode("append").start()
    val batch1 = Seq((10L, "alpha beta"), (11L, "  "))
    val batch2 = Seq((12L, "gamma gamma delta"), (13L, "alpha"))
    input.addData(batch1: _*)
    q.processAllAvailable()
    input.addData(batch2: _*)
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("dsir_stream")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1)
    val batch = graft.pipeline.Dsir.scoreAgainstRatios(
      (batch1 ++ batch2).toDF("doc_id", "text"), "doc_id", "text", lr)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1)
    assert(streamed.toSeq == batch.toSeq,
      s"stream ${streamed.toSeq} vs batch ${batch.toSeq}")
    // degenerate (whitespace-only) arrival emits nothing, like the batch
    assert(!streamed.map(_._1).contains(11L))
    assert(streamed.map(_._1).toSeq == Seq(10L, 12L, 13L))
  }

  test("streaming BPE encode tokenizes arrivals against trained merges; batch parity") {
    implicit val sqlCtx = spark.sqlContext
    // merges trained on a tiny reference corpus; 'ab' then 'abc' fuse
    val train = Seq((1L, "abc abc abd xy"), (2L, "abc xy xy"))
      .toDF("doc_id", "text")
    val merges = graft.pipeline.Bpe.trainMerges(train, "text", nMerges = 2)
    assert(merges.map(m => (m.l, m.r)) == Seq(("a", "b"), ("ab", "c")), merges)

    val input = MemoryStream[(Long, String)]
    val out = StreamingBpe.encode(
      input.toDS().toDF("doc_id", "text"), "doc_id", "text", merges)
    val q = out.writeStream.format("memory").queryName("bpe_stream")
      .outputMode("append").start()
    val batch1 = Seq((1L, "abc abd"), (2L, "zz abcabc"))
    val batch2 = Seq((3L, "xy abc zz abd q"), (4L, "   "))
    input.addData(batch1: _*)
    q.processAllAvailable()
    input.addData(batch2: _*)
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("bpe_stream")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    // batch parity on the unioned arrivals — BOTH batch faces
    val all = (batch1 ++ batch2).toDF("doc_id", "text")
    val batchRow = graft.pipeline.Bpe.encodeRow(all, "doc_id", "text", merges)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(streamed.toSeq == batchRow.toSeq,
      s"stream ${streamed.toSeq} vs encodeRow ${batchRow.toSeq}")
    val batchDict = graft.pipeline.Bpe.encode(all, "doc_id", "text", merges)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    // the dict-join face drops zero-word docs; the stream face keeps them
    // as (0, 0) — every other row identical
    assert(streamed.filter(_._2 > 0).toSeq == batchDict.toSeq,
      s"stream ${streamed.toSeq} vs encode ${batchDict.toSeq}")
    // hand checks: "abc abd" -> [abc] + [ab, d] = 3 tokens;
    // "zz abcabc" -> [z, z] + [abc, abc] = 4; whitespace-only doc -> (0, 0)
    val m = streamed.map(r => r._1 -> (r._2, r._3)).toMap
    assert(m(1L) == ((2L, 3L)), m(1L).toString)
    assert(m(2L) == ((2L, 4L)), m(2L).toString)
    assert(m(4L) == ((0L, 0L)), m(4L).toString)
  }

  test("streaming rank-normalization scores arrivals against the trained grid; batch parity") {
    implicit val sqlCtx = spark.sqlContext
    val grid = Map(
      0 -> Array(1.0, 2.0, 3.0),
      1 -> Array(10.0))
    val input = MemoryStream[(Long, Array[Double])]
    val out = StreamingSemDedup.rankNormalize(
      input.toDS().toDF("vec_id", "embedding"), "vec_id", "embedding", grid)
    val q = out.writeStream.format("memory").queryName("ranknorm_stream")
      .outputMode("append").start()
    input.addData((1L, Array(0.5, 20.0)), (2L, Array(2.0, 5.0)))
    q.processAllAvailable()
    input.addData((3L, Array(9.0, 10.0, 7.0))) // dim 2 untrained -> nulls
    q.processAllAvailable()
    q.stop()
    def tup(r: org.apache.spark.sql.Row) = (r.getLong(0), r.getInt(1),
      if (r.isNullAt(2)) None else Some(r.getLong(2)),
      if (r.isNullAt(3)) None else Some(r.getDouble(3)))
    val rows = spark.table("ranknorm_stream").collect().map(tup)
      .sortBy(r => (r._1, r._2))
    val batch = graft.pipeline.EmbedStats.rankTransform(
      Seq((1L, Array(0.5, 20.0)), (2L, Array(2.0, 5.0)),
        (3L, Array(9.0, 10.0, 7.0))).toDF("vec_id", "embedding"),
      "vec_id", "embedding", grid)
      .collect().map(tup).sortBy(r => (r._1, r._2))
    assert(rows.toSeq == batch.toSeq, s"stream ${rows.toSeq} vs batch ${batch.toSeq}")
    // hand-checks: vec 1 dim 0: 0.5 below all splits -> bucket 0, score 0;
    // vec 2 dim 0: 2.0 <= two splits -> bucket 2/4; vec 3 dim 2 -> nulls
    assert(rows.find(r => r._1 == 1L && r._2 == 0).get._3.contains(0L))
    assert(rows.find(r => r._1 == 2L && r._2 == 0).get._4.contains(0.5))
    assert(rows.find(r => r._1 == 3L && r._2 == 2).get._3.isEmpty)
  }

  test("streaming quality gate filters against the trained threshold; batch parity") {
    implicit val sqlCtx = spark.sqlContext
    // reference corpus: stopword-free docs score 0, stopword-rich score high
    val corpus = Seq(
      (100L, "the cat sat on the mat and the dog ran"),
      (101L, "a bird in the hand is worth two in a bush"),
      (102L, "quantum flux capacitor module vector tensor units"),
      (103L, "gamma delta epsilon zeta eta theta iota kappa"))
      .toDF("doc_id", "text")
    val thr = graft.pipeline.TextAnalysis.qualityThreshold(corpus, "text", p = 0.5)
    assert(thr > 0.0, s"threshold $thr")

    val input = MemoryStream[(Long, String)]
    val out = StreamingTextQuality.gateAgainstThreshold(
      input.toDS().toDF("doc_id", "text"), "text", "doc_id", thr)
    val q = out.writeStream.format("memory").queryName("qgate_stream")
      .outputMode("append").start()
    input.addData((1L, "the cat and the dog and the bird sat"), // stopword-rich: keep
      (2L, "alpha beta gamma delta epsilon zeta"))              // zero stopwords: drop
    q.processAllAvailable()
    input.addData((3L, "short one"),                            // < 5 tokens: drop
      (4L, "it is what it is and that is that"))                // keep
    q.processAllAvailable()
    q.stop()
    val kept = spark.table("qgate_stream").select("doc_id").collect()
      .map(_.getLong(0)).sorted
    assert(kept.toSeq == Seq(1L, 4L), kept.toSeq.toString)

    // batch parity on the unioned arrivals
    val batch = graft.pipeline.TextAnalysis.gateAgainstThreshold(
      Seq((1L, "the cat and the dog and the bird sat"),
        (2L, "alpha beta gamma delta epsilon zeta"),
        (3L, "short one"), (4L, "it is what it is and that is that"))
        .toDF("doc_id", "text"), "text", "doc_id", thr)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(kept.toSeq == batch.toSeq)

    // self-training consistency: gating the corpus against its OWN trained
    // threshold reproduces the batch qualityGate row set
    val viaArtifact = graft.pipeline.TextAnalysis.gateAgainstThreshold(
      corpus, "text", "doc_id", thr).select("doc_id").collect()
      .map(_.getLong(0)).toSet
    val viaGate = graft.pipeline.TextAnalysis.qualityGate(
      corpus, "text", "doc_id", p = 0.5).select("doc_id").collect()
      .map(_.getLong(0)).toSet
    assert(viaArtifact == viaGate, s"$viaArtifact vs $viaGate")
  }

  test("streaming quality-model scoring: trained-artifact scores match the batch face") {
    implicit val sqlCtx = spark.sqlContext
    // reference corpus with a real quality gradient for the OLS teacher
    val corpus = Seq(
      (100L, "the cat sat on the mat and the dog ran after the cat"),
      (101L, "a bird in the hand is worth two in a bush they say"),
      (102L, "quantum flux capacitor module vector tensor units spin"),
      (103L, "aaa aaa aaa aaa aaa aaa aaa aaa aaa aaa"),
      (104L, "the quick brown fox jumps over the lazy dog again today"))
      .toDF("doc_id", "text")
    val w = graft.pipeline.QualityModel.train(
      graft.pipeline.QualityModel.featureFrame(corpus, "text", "doc_id"))

    val arrivals = Seq(
      (1L, "the cat and the dog and the bird sat together"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "aaa aaa aaa aaa aaa"),
      (4L, ""), // empty doc: no tokens, drops on both faces
      (5L, "it is what it is and that is that"))
    val input = MemoryStream[(Long, String)]
    val out = StreamingQualityScore.scoreAgainstModel(
      input.toDS().toDF("doc_id", "text"), "text", "doc_id", w)
    val q = out.writeStream.format("memory").queryName("qscore_stream")
      .outputMode("append").start()
    input.addData(arrivals.take(2): _*)
    q.processAllAvailable()
    input.addData(arrivals.drop(2): _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("qscore_stream").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1).toSeq
    val batch = graft.pipeline.QualityModel.score(
        arrivals.toDF("doc_id", "text"), "text", "doc_id", w)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1).toSeq
    assert(streamed === batch) // bit-for-bit: same kernel, same weights
    assert(streamed.map(_._1) === Seq(1L, 2L, 3L, 5L)) // empty doc dropped
    // the model discriminates: degenerate repetition scores differently
    // from natural text (guards against a constant-column regression)
    assert(streamed.map(_._2).distinct.size > 1)
  }

  // ---- equal-millisecond stale-rule pins -----------------------------------
  // The family contract: only arrivals STRICTLY before the key's last seen ts
  // are stale. An arrival at the SAME millisecond — whether in the same
  // micro-batch or a later one — is a real row, because the batch ROWS window
  // counts every row. Each test below feeds an equal-ts collision and asserts
  // (a) the colliding arrival produces an output row (under a `>` stale rule
  // it would be silently dropped and the count assert fails), and (b)
  // bit-exact batch parity over the full delivered sequence, ties in arrival
  // order. These pin the five `>=` sites in StreamingRollingStats /
  // StreamingBars plus the family sharers StreamingCusum and
  // StreamingTransitions (StreamingFunnel's pin lives in its own test above).

  test("equal-ms EWMA: same-ts arrivals enter the frame; batch parity") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Long, Double)]
    val out = StreamingBars.ewma(input.toDS(), frameRows = 3, decay = 0.5)
      .toDF("k", "t", "value", "ewma")
    val q = out.writeStream.format("memory").queryName("ewma_eqms")
      .outputMode("append").start()
    input.addData(("a", 1L, 10.0), ("a", 2L, 20.0))
    q.processAllAvailable()
    input.addData(("a", 2L, 30.0)) // equal-ts in a LATER batch: not stale
    q.processAllAvailable()
    input.addData(("a", 2L, 40.0), ("a", 3L, 50.0)) // same-batch tie too
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("ewma_eqms").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .sortBy(r => (r._1, r._2, r._3))
    // a `>` stale rule drops both later t=2 arrivals -> only 3 rows
    assert(rows.length == 5, s"equal-ts arrivals were dropped: ${rows.toSeq}")
    val batch = graft.ops.Bars.ewma(
      Seq(("a", 1L, 10.0), ("a", 2L, 20.0), ("a", 2L, 30.0), ("a", 2L, 40.0),
        ("a", 3L, 50.0)).toDF("k", "t", "value"),
      Seq("k"), "t", "value", frameRows = 3, decay = 0.5)
      .select(col("k"), col("t"), col("value"), col("ewma"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .sortBy(r => (r._1, r._2, r._3))
    assert(rows.toSeq == batch.toSeq, s"stream ${rows.toSeq} vs batch ${batch.toSeq}")
  }

  test("equal-ms rolling corr: same-ts arrivals hold frame slots; batch parity") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Long, Option[Double], Option[Double])]
    val out = StreamingRollingStats.rollingCorr(input.toDS(), frameRows = 3)
      .toDF("k", "t", "roll_corr", "n_pairs")
    val q = out.writeStream.format("memory").queryName("rollcorr_eqms")
      .outputMode("append").start()
    input.addData(("a", 1L, Some(1.0), Some(2.0)), ("a", 2L, Some(2.0), Some(4.0)))
    q.processAllAvailable()
    input.addData(("a", 2L, Some(3.0), Some(5.0))) // equal-ts later batch
    q.processAllAvailable()
    input.addData(("a", 3L, Some(4.0), Some(9.0)))
    q.processAllAvailable()
    q.stop()
    def tup(r: org.apache.spark.sql.Row) = (r.getString(0), r.getLong(1),
      if (r.isNullAt(2)) None else Some(r.getDouble(2)), r.getLong(3))
    val rows = spark.table("rollcorr_eqms").collect().map(tup)
      .sortBy(r => (r._1, r._2, r._4))
    assert(rows.length == 4, s"equal-ts arrival was dropped: ${rows.toSeq}")
    // the t=3 frame must hold BOTH t=2 rows: n_pairs = 3, not 2
    assert(rows.last._4 == 3L, s"frame lost the equal-ts row: ${rows.toSeq}")
    val batch = graft.ops.RollingStats.rollingCorr(
      Seq(("a", 1L, Some(1.0), Some(2.0)), ("a", 2L, Some(2.0), Some(4.0)),
        ("a", 2L, Some(3.0), Some(5.0)), ("a", 3L, Some(4.0), Some(9.0)))
        .toDF("k", "t", "x", "y"),
      Seq("k"), "t", "x", "y", frameRows = 3)
      .select(col("k"), col("t"), col("roll_corr"), col("n_pairs"))
      .collect().map(tup).sortBy(r => (r._1, r._2, r._4))
    assert(rows.toSeq == batch.toSeq, s"stream ${rows.toSeq} vs batch ${batch.toSeq}")
  }

  test("equal-ms rolling slope: same-ts arrivals hold frame slots; batch parity") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Long, Option[Double], Option[Double])]
    val out = StreamingRollingStats.rollingSlope(input.toDS(), frameRows = 3)
      .toDF("k", "t", "roll_slope", "roll_icept", "n_pairs")
    val q = out.writeStream.format("memory").queryName("rollslope_eqms")
      .outputMode("append").start()
    input.addData(("a", 1L, Some(0.0), Some(1.0)), ("a", 2L, Some(1.0), Some(3.0)))
    q.processAllAvailable()
    input.addData(("a", 2L, Some(2.0), Some(5.0))) // equal-ts later batch
    q.processAllAvailable()
    q.stop()
    def tup(r: org.apache.spark.sql.Row) = (r.getString(0), r.getLong(1),
      if (r.isNullAt(2)) None else Some(r.getDouble(2)),
      if (r.isNullAt(3)) None else Some(r.getDouble(3)), r.getLong(4))
    val rows = spark.table("rollslope_eqms").collect().map(tup)
      .sortBy(r => (r._1, r._2, r._5))
    assert(rows.length == 3, s"equal-ts arrival was dropped: ${rows.toSeq}")
    // the second t=2 row's frame holds all three exactly-linear points
    assert(rows.last._3.contains(2.0) && rows.last._5 == 3L, rows.toSeq.toString)
    val batch = graft.ops.RollingStats.rollingSlope(
      Seq(("a", 1L, Some(0.0), Some(1.0)), ("a", 2L, Some(1.0), Some(3.0)),
        ("a", 2L, Some(2.0), Some(5.0))).toDF("k", "t", "x", "y"),
      Seq("k"), "t", "x", "y", frameRows = 3)
      .select(col("k"), col("t"), col("roll_slope"), col("roll_icept"), col("n_pairs"))
      .collect().map(tup).sortBy(r => (r._1, r._2, r._5))
    assert(rows.toSeq == batch.toSeq, s"stream ${rows.toSeq} vs batch ${batch.toSeq}")
  }

  test("equal-ms rolling band: same-ts arrivals hold frame slots; batch parity") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Long, Option[Double])]
    val out = StreamingRollingStats.rollingBand(input.toDS(), frameRows = 3,
        nSigma = 1.0)
      .toDF("key", "t", "roll_mean", "roll_std", "outside_band", "n_in")
    val q = out.writeStream.format("memory").queryName("band_eqms")
      .outputMode("append").start()
    input.addData(("k", 1L, Some(10.0)), ("k", 2L, Some(20.0)))
    q.processAllAvailable()
    input.addData(("k", 2L, Some(60.0))) // equal-ts later batch
    q.processAllAvailable()
    q.stop()
    def tup(r: org.apache.spark.sql.Row) = (r.getString(0), r.getLong(1),
      if (r.isNullAt(2)) None else Some(r.getDouble(2)),
      if (r.isNullAt(3)) None else Some(r.getDouble(3)),
      if (r.isNullAt(4)) None else Some(r.getBoolean(4)), r.getLong(5))
    val rows = spark.table("band_eqms").collect().map(tup)
      .sortBy(r => (r._1, r._2, r._6))
    assert(rows.length == 3, s"equal-ts arrival was dropped: ${rows.toSeq}")
    // the equal-ts row's frame is (10,20,60): mean 30, outside the 1-sigma band
    assert(rows.last._3 == Some(30.0) && rows.last._5 == Some(true) &&
      rows.last._6 == 3L, rows.toSeq.toString)
    val batch = graft.ops.RollingStats.rollingBand(
      Seq(("k", 1L, Some(10.0)), ("k", 2L, Some(20.0)), ("k", 2L, Some(60.0)))
        .toDF("key", "t", "value"),
      Seq("key"), "t", "value", frameRows = 3, nSigma = 1.0)
      .select("key", "t", "roll_mean", "roll_std", "outside_band").collect()
      .map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)),
        if (r.isNullAt(4)) None else Some(r.getBoolean(4))))
      .sortBy(r => (r._1, r._2, r._3))
    assert(rows.map(r => (r._1, r._2, r._3, r._4, r._5)).sortBy(r => (r._1, r._2, r._3)).toSeq
      === batch.toSeq, s"stream ${rows.toSeq} vs batch ${batch.toSeq}")
  }

  test("equal-ms drawdown: same-ts arrivals advance the peak; batch parity") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Long, Option[Double])]
    val out = StreamingRollingStats.runningDrawdown(input.toDS())
      .toDF("k", "t", "value", "peak", "drawdown")
    val q = out.writeStream.format("memory").queryName("drawdown_eqms")
      .outputMode("append").start()
    input.addData(("a", 1L, Some(5.0)), ("a", 2L, Some(3.0)))
    q.processAllAvailable()
    input.addData(("a", 2L, Some(7.0))) // equal-ts later batch: new peak
    q.processAllAvailable()
    q.stop()
    def tup(r: org.apache.spark.sql.Row) = (r.getString(0), r.getLong(1),
      if (r.isNullAt(2)) None else Some(r.getDouble(2)),
      if (r.isNullAt(3)) None else Some(r.getDouble(3)),
      if (r.isNullAt(4)) None else Some(r.getDouble(4)))
    val rows = spark.table("drawdown_eqms").collect().map(tup)
      .sortBy(r => (r._1, r._2, r._3))
    assert(rows.length == 3, s"equal-ts arrival was dropped: ${rows.toSeq}")
    assert(rows.last._4.contains(7.0) && rows.last._5.contains(0.0),
      rows.toSeq.toString)
    val batch = graft.ops.RollingStats.runningDrawdown(
      Seq(("a", 1L, Some(5.0)), ("a", 2L, Some(3.0)), ("a", 2L, Some(7.0)))
        .toDF("k", "t", "value"),
      Seq("k"), "t", "value")
      .select(col("k"), col("t"), col("value"), col("peak"), col("drawdown"))
      .collect().map(tup).sortBy(r => (r._1, r._2, r._3))
    assert(rows.toSeq == batch.toSeq, s"stream ${rows.toSeq} vs batch ${batch.toSeq}")
  }

  test("equal-ms CUSUM: same-ts arrivals update S; batch parity") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Long, Option[Long])]
    val out = StreamingCusum.cusum(input.toDS(), mu0 = 100L, slack = 10L,
        threshold = 50L)
      .toDF("key", "t", "s_pos", "s_neg", "alarm")
    val q = out.writeStream.format("memory").queryName("cusum_eqms")
      .outputMode("append").start()
    input.addData(("a", 1L, Some(100L)), ("a", 2L, Some(200L)))
    q.processAllAvailable()
    input.addData(("a", 2L, Some(210L))) // equal-ts later batch: S+ walks again
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("cusum_eqms").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))
      .sortBy(r => (r._1, r._2, r._3))
    // a `>` rule drops the second t=2 row; `>=` walks S+ 0 -> 90 -> 190
    assert(rows.toSeq === Seq(
      ("a", 1L, 0L, 0L, false), ("a", 2L, 90L, 0L, true),
      ("a", 2L, 190L, 0L, true)))
    val batch = graft.ops.Anomalies.cusumOnline(
      Seq(("a", 1L, Some(100L)), ("a", 2L, Some(200L)), ("a", 2L, Some(210L)))
        .toDF("key", "t", "cents"),
      Seq("key"), "t", "cents", mu0 = 100L, slack = 10L, threshold = 50L)
      .select("key", "t", "s_pos", "s_neg", "alarm").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))
      .sortBy(r => (r._1, r._2, r._3))
    assert(rows.toSeq === batch.toSeq, s"stream ${rows.toSeq} vs batch ${batch.toSeq}")
  }

  test("equal-ms transitions: same-ts arrivals extend the chain; batch parity") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Long, String)]
    val out = StreamingTransitions.transitions(input.toDS())
      .toDF("user", "from_type", "to_type", "t")
    val q = out.writeStream.format("memory").queryName("trans_eqms")
      .outputMode("append").start()
    input.addData(("u", 10L, "a"), ("u", 20L, "b"))
    q.processAllAvailable()
    input.addData(("u", 20L, "c")) // equal-ts later batch: emits (b -> c)
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("trans_eqms").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3)))
      .sortBy(r => (r._1, r._4, r._3))
    assert(rows.toSeq === Seq(("u", "a", "b", 20L), ("u", "b", "c", 20L)))
    import org.apache.spark.sql.expressions.Window
    val delivered = Seq(("u", 10L, "a"), ("u", 20L, "b"), ("u", 20L, "c"))
      .toDF("user", "t", "typ")
    val w = Window.partitionBy($"user").orderBy($"t")
    val batch = delivered
      .withColumn("from_type", lag($"typ", 1).over(w))
      .filter($"from_type".isNotNull && $"typ".isNotNull)
      .select($"user", $"from_type", $"typ".as("to_type"), $"t")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3)))
      .sortBy(r => (r._1, r._4, r._3))
    assert(rows.toSeq === batch.toSeq)
  }

  test("streaming quality-model scoring: stateless kernel path, batch parity") {
    // QualityModel.score is one TokenStats kernel projection — stateless per
    // row, so the IDENTICAL code path runs over a stream in Append mode with
    // no watermark/state store, and every micro-batch scores bit-identically
    // to the batch face (the BM25-kernel convention).
    implicit val sqlCtx = spark.sqlContext
    val w = Array(0.1, 0.002, 0.5, -0.3, 0.04)
    val input = MemoryStream[(Long, String)]
    val scored = graft.pipeline.QualityModel.score(
      input.toDF().toDF("doc_id", "text"), "text", "doc_id", w)
    assert(scored.isStreaming)
    val q = scored.writeStream.format("memory").queryName("qm_scores")
      .outputMode("append").start()
    input.addData((1L, "a a b c"), (2L, "x y"), (3L, "   "))
    q.processAllAvailable()
    input.addData((4L, "b b b b"))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("qm_scores").orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val batch = graft.pipeline.QualityModel.score(
      Seq((1L, "a a b c"), (2L, "x y"), (3L, "   "), (4L, "b b b b"))
        .toDF("doc_id", "text"), "text", "doc_id", w)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.toSeq === batch.toSeq)
    assert(got.map(_._1).toSeq === Seq(1L, 2L, 4L)) // the empty doc drops
  }

  test("streaming leakage-safe split: stream-static cluster join, batch parity") {
    // clusterAtomicSplit is a LEFT join against the (cached) cluster
    // artifact + a narrow hash filter — stateless per row, so the same
    // code path assigns splits to arriving documents in Append mode, and
    // an arrival whose near-dup cluster already exists lands on that
    // cluster's (stable) side.
    implicit val sqlCtx = spark.sqlContext
    val clusters = Seq((1L, 1L), (2L, 1L), (7L, 7L), (8L, 7L))
      .toDF("id", "cluster_id").cache()
    val input = MemoryStream[Long]
    val out = graft.pipeline.Sampling.clusterAtomicSplit(
      input.toDF().toDF("doc_id"), "doc_id", clusters, 0.5)
    assert(out.isStreaming)
    val q = out.writeStream.format("memory").queryName("split_stream")
      .outputMode("append").start()
    input.addData(1L, 7L, 100L)
    q.processAllAvailable()
    input.addData(2L, 8L, 101L)
    q.processAllAvailable()
    q.stop()
    val got = spark.table("split_stream").orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val batch = graft.pipeline.Sampling.clusterAtomicSplit(
      Seq(1L, 2L, 7L, 8L, 100L, 101L).toDF("doc_id"), "doc_id", clusters, 0.5)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(got.toSeq === batch.toSeq)
    // cross-batch cluster stability: 2 (batch 2) matches 1 (batch 1), 8 matches 7
    val m = got.map(r => r._1 -> r._3).toMap
    assert(m(1L) === m(2L)); assert(m(7L) === m(8L))
  }

  test("streaming components: foreachBatch artifact fold equals batch components") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("stream_comps_").toFile
    val artifact = new java.io.File(dir, "components").getAbsolutePath
    try {
      val input = MemoryStream[(Long, Long)]
      val edges = input.toDF().toDF("src", "dst")
      val q = edges.writeStream
        .foreachBatch(StreamingComponents.sink(artifact, "src", "dst") _)
        .start()
      // batch 1: two disjoint rings; batch 2: a bridge merges two KNOWN
      // components and a fresh chain arrives; batch 3: extends the chain
      val b1 = Seq((0L, 1L), (1L, 2L), (2L, 0L), (10L, 11L), (11L, 10L))
      val b2 = Seq((2L, 11L), (20L, 21L))
      val b3 = Seq((21L, 22L), (22L, 10L))
      input.addData(b1: _*); q.processAllAvailable()
      // mid-stream check: the artifact already merges nothing across rings
      val mid = StreamingComponents.current(spark, artifact)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(mid(10L) === 10L && mid(0L) === 0L)
      input.addData(b2: _*); q.processAllAvailable()
      input.addData(b3: _*); q.processAllAvailable()
      q.stop()
      val folded = StreamingComponents.current(spark, artifact)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val batch = graft.pipeline.Dedup.withMaterialized {
        graft.ops.Graph.connectedComponents(
          (b1 ++ b2 ++ b3).toDF("src", "dst"), "src", "dst")
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      }
      assert(folded === batch)
      // everything is one component rooted at 0 after the bridges
      assert(folded.values.toSet === Set(0L))
    } finally org.apache.commons.io.FileUtils.deleteQuietly(dir)
  }

  test("streaming line dedup: foreachBatch fold matches the against-prior operator") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("stream_ld_").toFile
    val counts = new java.io.File(dir, "counts").getAbsolutePath
    val out = new java.io.File(dir, "out").getAbsolutePath
    try {
      val input = MemoryStream[(Long, String)]
      val docs = input.toDF().toDF("id", "t")
      val q = docs.writeStream
        .foreachBatch(StreamingLineDedup.sink(counts, out, "t", "id",
          maxCount = 2) _)
        .start()
      // "B" crosses the threshold only once batch 2 lands: batch 1's doc
      // keeps it (arrival-time knowledge), batch 2's docs lose it
      val b1 = Seq((1L, "B\nalpha"), (2L, "keep\nB"))
      val b2 = Seq((3L, "B\nbeta"), (4L, "gamma\nkeep"))
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
      q.stop()
      val got = spark.read.parquet(out)
        .collect()
        .map(r => r.getAs[Long]("id") ->
          ((r.getAs[Long]("n_lines"), r.getAs[Long]("n_kept"),
            r.getAs[String]("text_kept"))))
        .toMap
      // batch 1: B count = 2 == max -> kept everywhere
      assert(got(1L) === ((2L, 2L, "B\nalpha")))
      assert(got(2L) === ((2L, 2L, "keep\nB")))
      // batch 2: prior B = 2, batch adds 1 -> 3 > max -> dropped; "keep"
      // reads 2 prior+batch occurrences -> kept
      assert(got(3L) === ((2L, 1L, "beta")))
      assert(got(4L) === ((2L, 2L, "gamma\nkeep")))
      // batch-2 rows equal the against-prior operator fed counts(b1)
      val expect = graft.pipeline.TextAnalysis.lineDedupAgainstPrior(
          b2.toDF("id", "t"), "t", "id",
          prior = graft.pipeline.TextAnalysis.lineCounts(b1.toDF("id", "t"), "t"),
          maxCount = 2)
        .collect()
        .map(r => r.getAs[Long]("id") ->
          ((r.getAs[Long]("n_lines"), r.getAs[Long]("n_kept"),
            r.getAs[String]("text_kept"))))
        .toMap
      assert(got.filter(_._1 >= 3) === expect)
      // the folded artifact equals lineCounts over everything seen
      val folded = StreamingLineDedup.currentCounts(spark, counts)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val full = graft.pipeline.TextAnalysis.lineCounts(
          (b1 ++ b2).toDF("id", "t"), "t")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(folded === full)
    } finally org.apache.commons.io.FileUtils.deleteQuietly(dir)
  }

  test("streaming pagerank: warm fold matches the replayed schedule; redelivery idempotent") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("stream_pr_").toFile
    val edgesP = new java.io.File(dir, "edges").getAbsolutePath
    val ranksP = new java.io.File(dir, "ranks").getAbsolutePath
    try {
      val b0 = Seq((0L, 1L), (1L, 2L), (2L, 0L), (0L, 3L), (3L, 0L))
      val b1 = Seq((2L, 3L), (3L, 4L), (4L, 0L))
      // an empty FIRST batch is a no-op, not a dead stream (cold-start
      // pageRank over zero edges would throw) and commits no artifact
      StreamingPageRank.sink(edgesP, ranksP, "src", "dst", iterations = 3)(
        Seq.empty[(Long, Long)].toDF("src", "dst"), 0L)
      assert(StreamingPageRank.currentRanks(spark, ranksP).isEmpty)
      StreamingPageRank.sink(edgesP, ranksP, "src", "dst", iterations = 3)(
        b0.toDF("src", "dst"), 0L)
      StreamingPageRank.sink(edgesP, ranksP, "src", "dst", iterations = 3)(
        b1.toDF("src", "dst"), 1L)
      // contribution summation order follows edge order, which differs
      // between the artifact round-trip and an in-memory replay — the
      // query contract absorbs that by rounding, so compare at 9 dp
      def r9(m: Map[Long, Double]) =
        m.view.mapValues(v => math.rint(v * 1e9) / 1e9).toMap
      def ranksNow() = r9(StreamingPageRank.currentRanks(spark, ranksP)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap)
      val got = ranksNow()
      // exact replay: cold 10-iteration ranks on batch 0, then a 3-step
      // warm fold of batch 1 over the accumulated edge set
      val expect = r9(graft.pipeline.Dedup.withMaterialized {
        val prior = graft.ops.Graph.pageRank(b0.toDF("src", "dst"), "src", "dst")
        graft.ops.Graph.pageRankWarmStart((b0 ++ b1).toDF("src", "dst"),
            "src", "dst", prior, iterations = 3)
          .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      })
      assert(got === expect)
      // invariant: the batch added node 4, which the prior doesn't cover,
      // so r0 sums to 1 + 1/5; three warm steps decay the excess at d³ —
      // mass is CONVERGING to 1, bounded by the decayed excess
      val excess = got.values.sum - 1.0
      assert(excess > 0 && excess < 0.2 * math.pow(0.85, 3) + 1e-9,
        s"mass excess $excess outside the d^3 decay envelope")
      // redelivery: same batchId → ranks unchanged (no extra fold)
      StreamingPageRank.sink(edgesP, ranksP, "src", "dst", iterations = 3)(
        b1.toDF("src", "dst"), 1L)
      assert(ranksNow() === got)
      // crash window: edges committed for batch 2 but ranks not — the
      // redelivered batch recomputes against the pre-batch prior and the
      // (idempotent) distinct-union edge fold, same final answer
      val b2 = Seq((4L, 1L))
      FoldArtifact.commit(
        (b0 ++ b1 ++ b2).distinct.toDF("src", "dst"), edgesP, 2L)
      StreamingPageRank.sink(edgesP, ranksP, "src", "dst", iterations = 3)(
        b2.toDF("src", "dst"), 2L)
      val after2 = ranksNow()
      val expect2 = r9(graft.pipeline.Dedup.withMaterialized {
        val prior0 = graft.ops.Graph.pageRank(b0.toDF("src", "dst"), "src", "dst")
        val prior1 = graft.ops.Graph.pageRankWarmStart(
          (b0 ++ b1).toDF("src", "dst"), "src", "dst", prior0, iterations = 3)
        graft.ops.Graph.pageRankWarmStart((b0 ++ b1 ++ b2).toDF("src", "dst"),
            "src", "dst", prior1, iterations = 3)
          .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      })
      assert(after2 === expect2)
    } finally org.apache.commons.io.FileUtils.deleteQuietly(dir)
  }

  test("fold sinks: batch redelivery is idempotent, uncommitted versions ignored") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("fold_replay_").toFile
    val counts = new java.io.File(dir, "counts").getAbsolutePath
    val out = new java.io.File(dir, "out").getAbsolutePath
    val comps = new java.io.File(dir, "comps").getAbsolutePath
    try {
      // drive the sinks directly — foreachBatch redelivery is exactly a
      // second call with the same (batch, batchId)
      val b0 = Seq((1L, "B\nalpha"), (2L, "keep\nB")).toDF("id", "t")
      val b1 = Seq((3L, "B\nbeta"), (4L, "gamma\nkeep")).toDF("id", "t")
      StreamingLineDedup.sink(counts, out, "t", "id", maxCount = 2)(b0, 0L)
      StreamingLineDedup.sink(counts, out, "t", "id", maxCount = 2)(b1, 1L)
      def countsNow() = StreamingLineDedup.currentCounts(spark, counts)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      def outNow() = spark.read.parquet(out)
        .collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("n_kept")))
        .sortBy(_._1).toSeq
      val (c1, o1) = (countsNow(), outNow())
      // redeliver batch 1: counts must not double-fold, output must not
      // duplicate (the failure mode ADVICE flagged on the old append sink)
      StreamingLineDedup.sink(counts, out, "t", "id", maxCount = 2)(b1, 1L)
      assert(countsNow() === c1)
      assert(outNow() === o1)
      // an uncommitted version (no commit marker — a crash mid-write) is
      // invisible: reads stay on the committed prior, and the next batch
      // overwrites it cleanly
      val stale = new java.io.File(counts, "v=2")
      stale.mkdirs()
      java.nio.file.Files.writeString(
        new java.io.File(stale, "part-junk.parquet").toPath, "not parquet")
      assert(countsNow() === c1)
      val b2 = Seq((5L, "B\ndelta")).toDF("id", "t")
      StreamingLineDedup.sink(counts, out, "t", "id", maxCount = 2)(b2, 2L)
      assert(countsNow()("B") === c1("B") + 1)
      // components: same contract through the same FoldArtifact
      val e0 = Seq((0L, 1L), (1L, 2L)).toDF("src", "dst")
      val e1 = Seq((2L, 3L)).toDF("src", "dst")
      StreamingComponents.sink(comps, "src", "dst")(e0, 0L)
      StreamingComponents.sink(comps, "src", "dst")(e1, 1L)
      def compsNow() = StreamingComponents.current(spark, comps)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val a1 = compsNow()
      StreamingComponents.sink(comps, "src", "dst")(e1, 1L)
      assert(compsNow() === a1)
      assert(a1.values.toSet === Set(0L))
    } finally org.apache.commons.io.FileUtils.deleteQuietly(dir)
  }

  test("fold sinks: checkpoint reset (batchId below committed version) skips AND alarms") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("fold_reset_").toFile
    val path = new java.io.File(dir, "art").getAbsolutePath
    try {
      FoldArtifact.commit(Seq((1L, 2L)).toDF("src", "dst"), path, 5L)
      // normal cases: redelivery of the committed id skips silently, the
      // successor proceeds
      assert(FoldArtifact.isCommitted(spark, path, 5L))
      assert(!FoldArtifact.isCommitted(spark, path, 6L))
      // a RESET checkpoint restarts batch numbering at 0 against the old
      // artifact — the sink still skips (double-folding is worse), but the
      // lineage mismatch must be an operator-visible event on stderr
      val buf = new java.io.ByteArrayOutputStream()
      val oldErr = System.err
      System.setErr(new java.io.PrintStream(buf, true, "UTF-8"))
      val skipped =
        try FoldArtifact.isCommitted(spark, path, 0L)
        finally System.setErr(oldErr)
      assert(skipped)
      val msg = buf.toString("UTF-8")
      assert(msg.contains("checkpoint") && msg.contains("v=5"),
        s"expected a loud checkpoint-reset warning, got: $msg")
    } finally org.apache.commons.io.FileUtils.deleteQuietly(dir)
  }

  test("streaming line dedup: refuses an output root with flat (non-partition) files") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("line_mixed_").toFile
    val counts = new java.io.File(dir, "counts").getAbsolutePath
    val out = new java.io.File(dir, "out")
    try {
      // a flat parquet file at the root — the pre-partition layout, or
      // another job's output; mixing it with __batch= dirs breaks
      // partition discovery for spark.read.parquet(outputPath)
      out.mkdirs()
      java.nio.file.Files.writeString(
        new java.io.File(out, "part-00000-old.parquet").toPath, "old layout")
      val b = Seq((1L, "B\nalpha")).toDF("id", "t")
      val e = intercept[IllegalArgumentException] {
        StreamingLineDedup.sink(counts, out.getAbsolutePath, "t", "id")(b, 0L)
      }
      assert(e.getMessage.contains("non-`__batch=`"))
      // and nothing was folded — the refusal happened before any write
      assert(StreamingLineDedup.currentCounts(spark, counts).isEmpty)
    } finally org.apache.commons.io.FileUtils.deleteQuietly(dir)
  }

  test("streaming pagerank: crash-window replay does not re-commit the edge artifact") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("stream_pr_crash_").toFile
    val edgesP = new java.io.File(dir, "edges").getAbsolutePath
    val ranksP = new java.io.File(dir, "ranks").getAbsolutePath
    try {
      val b0 = Seq((0L, 1L), (1L, 2L), (2L, 0L))
      StreamingPageRank.sink(edgesP, ranksP, "src", "dst", iterations = 2)(
        b0.toDF("src", "dst"), 0L)
      // crash window: edges committed for batch 1, ranks not
      val b1 = Seq((2L, 3L), (3L, 0L))
      FoldArtifact.commit((b0 ++ b1).toDF("src", "dst"), edgesP, 1L)
      // sentinel inside the committed version: an in-place re-commit
      // (overwrite of the directory the lazy re-fold READS — the unsafe
      // pattern ADVICE flagged) would delete it; parquet readers skip
      // underscore files, so it is otherwise inert
      val sentinel = new java.io.File(dir, "edges/v=1/_sentinel")
      java.nio.file.Files.writeString(sentinel.toPath, "committed by test")
      StreamingPageRank.sink(edgesP, ranksP, "src", "dst", iterations = 2)(
        b1.toDF("src", "dst"), 1L)
      assert(sentinel.exists(),
        "edge artifact was re-committed over the version the fold reads")
      // and the ranks are the ones the committed edge set implies
      def r9(m: Map[Long, Double]) =
        m.view.mapValues(v => math.rint(v * 1e9) / 1e9).toMap
      val got = r9(StreamingPageRank.currentRanks(spark, ranksP)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap)
      val expect = r9(graft.pipeline.Dedup.withMaterialized {
        val prior = graft.ops.Graph.pageRank(b0.toDF("src", "dst"), "src", "dst")
        graft.ops.Graph.pageRankWarmStart((b0 ++ b1).toDF("src", "dst"),
            "src", "dst", prior, iterations = 2)
          .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      })
      assert(got === expect)
    } finally org.apache.commons.io.FileUtils.deleteQuietly(dir)
  }

  test("streaming generalization release: increments match generalizeChosen over everything seen") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("stream_gen_").toFile
    val counts = new java.io.File(dir, "counts").getAbsolutePath
    val out = new java.io.File(dir, "out").getAbsolutePath
    try {
      // the chosen width SHIFTS between batches: b0's 12 rows leave every
      // fine (seg, bucket) group a singleton, so only the widest rung
      // meets k; b1 adds 10 rows to every group and the choice narrows to
      // the finest width — each batch must be released at ITS corpus's
      // minimal generalization
      def rows(ids: Range) =
        ids.map(i => (i.toLong, "s" + (i % 2), (i % 12) * 250.0))
      val b0 = rows(0 until 12)
      val b1 = rows(12 until 132)
      val widths = Seq(500L, 1000L, 2000L, 4000L)
      def drive(b: Seq[(Long, String, Double)], id: Long) =
        StreamingGeneralize.sink(counts, out, Seq("segment"), "bal",
          widths, k = 5)(b.toDF("id", "segment", "bal"), id)
      drive(b0, 0L)
      drive(b1, 1L)
      def batchOut(id: Long) = spark.read
        .parquet(s"$out/__batch=$id")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
        .sortBy(_._1).toSeq
      // parity: the batch-N increment equals the full rebuild over
      // B1 ∪ … ∪ BN restricted to BN's rows (the fold IS that count table)
      def rebuild(all: Seq[(Long, String, Double)], ids: Set[Long]) =
        graft.pipeline.Privacy.generalizeChosen(
            all.toDF("id", "segment", "bal"), Seq("segment"), "bal",
            widths, k = 5)
          .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
          .filter(t => ids(t._1)).sortBy(_._1).toSeq
      assert(batchOut(0L) === rebuild(b0, b0.map(_._1).toSet))
      assert(batchOut(1L) === rebuild(b0 ++ b1, b1.map(_._1).toSet))
      // the test is only meaningful if the width actually shifted: batch 0
      // released at the widest rung (every bal collapses to 0), batch 1 at
      // the finest (sub-4000 range starts appear)
      assert(batchOut(0L).nonEmpty && batchOut(0L).forall(_._3 == 0L),
        "fixture did not force the widest rung on batch 0")
      assert(batchOut(1L).exists(t => t._3 % 4000L != 0L),
        "fixture did not narrow the chosen width on batch 1")
      // redelivery: same batchId → counts unchanged, output unchanged
      val c1 = StreamingGeneralize.currentCounts(spark, counts, Seq("segment"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(t => (t._1, t._2)).toSeq
      val o1 = batchOut(1L)
      drive(b1, 1L)
      assert(StreamingGeneralize.currentCounts(spark, counts, Seq("segment"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(t => (t._1, t._2)).toSeq === c1)
      assert(batchOut(1L) === o1)
      // whole-root read: the documented consumer sees both increments with
      // arrival provenance
      val root = spark.read.parquet(out)
      assert(root.count() === batchOut(0L).size + batchOut(1L).size)
      assert(root.columns.contains("__batch"))
    } finally org.apache.commons.io.FileUtils.deleteQuietly(dir)
  }

  test("streaming positional index: cross-batch search equals full rebuild; replay idempotent") {
    val dir = java.nio.file.Files.createTempDirectory("stream_posidx_").toFile
    val ledger = new java.io.File(dir, "ledger").getAbsolutePath
    val index = new java.io.File(dir, "index").getAbsolutePath
    try {
      val b0 = Seq(
        (1L, "spark merge fast spark slow merge"),
        (2L, "merge spark")).toDF("doc_id", "text")
      val b1 = Seq(
        (3L, "spark a b c merge"),
        (4L, "nothing relevant here")).toDF("doc_id", "text")
      def drive(b: org.apache.spark.sql.DataFrame, id: Long) =
        StreamingPositionalIndex.sink(ledger, index, "text", "doc_id")(b, id)
      drive(b0, 0L)
      drive(b1, 1L)
      def search(idx: org.apache.spark.sql.DataFrame) =
        graft.pipeline.Bm25.proximityOccurrences(idx, "doc_id",
            "spark", "merge", window = 4)
          .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
      val streamed = search(
        StreamingPositionalIndex.currentIndex(spark, index, "doc_id"))
      val rebuilt = search(graft.pipeline.Bm25.buildPositionalIndex(
        b0.unionByName(b1), "text", "doc_id"))
      assert(streamed === rebuilt) // the fold IS the rebuild, bit-for-bit
      assert(streamed.nonEmpty)
      // phrase answers agree too (same postings, different join)
      def phrase(idx: org.apache.spark.sql.DataFrame) =
        graft.pipeline.Bm25.phraseOccurrences(idx, "doc_id",
            Seq("merge", "spark"))
          .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
      assert(phrase(StreamingPositionalIndex.currentIndex(spark, index, "doc_id"))
        === phrase(graft.pipeline.Bm25.buildPositionalIndex(
          b0.unionByName(b1), "text", "doc_id")))
      // redelivery: same batchId -> no duplicate occurrences
      drive(b1, 1L)
      assert(search(StreamingPositionalIndex.currentIndex(spark, index, "doc_id"))
        === streamed)
      // empty batch: no-op, no empty partition dir committed
      drive(b1.limit(0), 2L)
      assert(search(StreamingPositionalIndex.currentIndex(spark, index, "doc_id"))
        === streamed)
      // empty-index read has the right schema before any batch
      val fresh = new java.io.File(dir, "fresh").getAbsolutePath
      assert(StreamingPositionalIndex.currentIndex(spark, fresh, "doc_id")
        .columns.toSeq === Seq("doc_id", "term", "pos", "dl"))
    } finally org.apache.commons.io.FileUtils.deleteQuietly(dir)
  }

  test("streaming image dedup: perceptual gate vs artifact, batch-local keep-lowest, passthrough") {
    def grayPng(v: (Int, Int) => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(9, 8,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 8; x <- 0 until 9) {
        val g = v(x, y); img.setRGB(x, y, (g << 16) | (g << 8) | g)
      }
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }
    def pat(g: Int)(x: Int, y: Int) = (g * 37 + x * 11 + y * 23) % 200
    val dir = java.nio.file.Files.createTempDirectory("stream_imgdedup_").toFile
    val sigs = new java.io.File(dir, "sigs").getAbsolutePath
    val out = new java.io.File(dir, "out").getAbsolutePath
    try {
      def drive(rows: Seq[(Long, Array[Byte])], id: Long) =
        StreamingImageDedup.sink(sigs, out, "doc_id")(
          rows.toDF("doc_id", "payload"), id)
      def kept(id: Long) = spark.read.parquet(s"$out/__batch=$id")
        .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
      // batch 0: 2 is a brightness twin of 1 (within-batch dup, keep the
      // lower id); 3 is unrelated; 10 is undecodable (passes through)
      drive(Seq(
        1L -> grayPng(pat(0)),
        2L -> grayPng((x, y) => pat(0)(x, y) + 30),
        3L -> grayPng(pat(7)),
        10L -> "not an image".getBytes("UTF-8")), 0L)
      assert(kept(0L) === Seq(1L, 3L, 10L))
      assert(StreamingImageDedup.currentSigs(spark, sigs, "doc_id")
        .collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 3L))
      // batch 1: 4 bumps one pixel of pattern 0 (dup of PRIOR 1 — dropped
      // without re-decoding 1's payload); 5 is new; 6 twins prior 3
      drive(Seq(
        4L -> grayPng((x, y) => pat(0)(x, y) + (if (x == 3 && y == 5) 48 else 0)),
        5L -> grayPng(pat(11)),
        6L -> grayPng((x, y) => pat(7)(x, y) + 30)), 1L)
      assert(kept(1L) === Seq(5L))
      assert(StreamingImageDedup.currentSigs(spark, sigs, "doc_id")
        .collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 3L, 5L))
      // redelivery: same batchId folds nothing twice, output unchanged
      drive(Seq(5L -> grayPng(pat(11))), 1L)
      assert(kept(1L) === Seq(5L))
      assert(StreamingImageDedup.currentSigs(spark, sigs, "doc_id")
        .count() === 3L)
      // whole-root read: every survivor with arrival provenance
      assert(spark.read.parquet(out).count() === 4L)
    } finally org.apache.commons.io.FileUtils.deleteQuietly(dir)
  }

  test("streaming image curate: dispositions at the ingest door; low-quality sigs still gate") {
    def grayPng(v: (Int, Int) => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(9, 8,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 8; x <- 0 until 9) {
        val g = v(x, y); img.setRGB(x, y, (g << 16) | (g << 8) | g)
      }
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }
    def bright(x: Int, y: Int) = (x * 11 + y * 23) % 200       // mean ~97
    def dim(x: Int, y: Int)    = ((x * 13 + y * 29) % 200) / 8 // mean ~12
    def other(x: Int, y: Int)  = (11 * 37 + x * 11 + y * 23) % 200
    val dir = java.nio.file.Files.createTempDirectory("stream_imgcurate_").toFile
    val sigs = new java.io.File(dir, "sigs").getAbsolutePath
    val out = new java.io.File(dir, "out").getAbsolutePath
    try {
      def drive(rows: Seq[(Long, Array[Byte])], id: Long) =
        StreamingImageCurate.sink(sigs, out, "doc_id", threshold = 60.0)(
          rows.toDF("doc_id", "payload"), id)
      def statuses(id: Long) = spark.read.parquet(s"$out/__batch=$id")
        .select("doc_id", "status").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      // batch 0: 2 is a brightness twin of 1 (dup, keep the lower id); 3
      // is dim (below the trained bar -> low_quality, but its signature
      // STILL folds); 9 is not an image (invalid)
      drive(Seq(
        1L -> grayPng(bright),
        2L -> grayPng((x, y) => bright(x, y) + 30),
        3L -> grayPng(dim),
        9L -> "not an image".getBytes("UTF-8")), 0L)
      assert(statuses(0L) === Map(1L -> "kept", 2L -> "dup",
        3L -> "low_quality", 9L -> "invalid"))
      // batch 1: 4 bumps one pixel of batch 0's kept pattern (dup of
      // prior 1); 5 is a brightness shift of the LOW-QUALITY 3 — judged
      // dup, proving low-quality survivors' signatures gate later twins
      // (the batch faces' cluster semantics); 6 is new and bright (kept)
      drive(Seq(
        4L -> grayPng((x, y) => bright(x, y) + (if (x == 3 && y == 5) 48 else 0)),
        5L -> grayPng((x, y) => dim(x, y) + 2),
        6L -> grayPng(other)), 1L)
      assert(statuses(1L) === Map(4L -> "dup", 5L -> "dup", 6L -> "kept"))
      // redelivery: same batchId is a no-op (output + artifact unchanged)
      drive(Seq(6L -> grayPng(other)), 1L)
      assert(statuses(1L).size === 3)
      // artifact holds kept + low_quality signatures, never dups/invalid
      assert(StreamingImageDedup.currentSigs(spark, sigs, "doc_id")
        .collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 3L, 6L))
    } finally org.apache.commons.io.FileUtils.deleteQuietly(dir)
  }

  test("streaming audio dedup: gain-twin arrivals dropped against the fingerprint artifact") {
    def wav(n: Int)(v: Int => Int): Array[Byte] =
      graft.pipeline.Multimodal.encodeWavPcm16(
        Array.tabulate(n)(i => v(i).toShort), 16000)
    def base(seed: Long)(i: Int) = ((((seed * 7919 + i * 104729L) % 8000L) - 4000L)).toInt
    val dir = java.nio.file.Files.createTempDirectory("stream_auddedup_").toFile
    val sigs = new java.io.File(dir, "sigs").getAbsolutePath
    val out = new java.io.File(dir, "out").getAbsolutePath
    try {
      def drive(rows: Seq[(Long, Array[Byte])], id: Long) =
        StreamingAudioDedup.sink(sigs, out, "doc_id")(
          rows.toDF("doc_id", "payload"), id)
      def kept(id: Long) = spark.read.parquet(s"$out/__batch=$id")
        .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
      // batch 0: 2 is a 3x gain twin of 1 (within-batch, keep the lower
      // id); 3 is a different signal; 9 is not audio (passes through)
      drive(Seq(
        1L -> wav(400)(base(1)),
        2L -> wav(400)(i => 3 * base(1)(i)),
        3L -> wav(400)(base(5)),
        9L -> "not audio".getBytes("UTF-8")), 0L)
      assert(kept(0L) === Seq(1L, 3L, 9L))
      // batch 1: 4 is a 2x gain re-upload of prior 1 — dropped without
      // re-reading 1's payload; 5 is new
      drive(Seq(
        4L -> wav(400)(i => 2 * base(1)(i)),
        5L -> wav(400)(base(11))), 1L)
      assert(kept(1L) === Seq(5L))
      assert(StreamingAudioDedup.currentSigs(spark, sigs, "doc_id")
        .collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 3L, 5L))
    } finally org.apache.commons.io.FileUtils.deleteQuietly(dir)
  }

  test("streaming audio curate: quiet arrivals judged low_quality, gain twins dup") {
    def wav(n: Int)(v: Int => Int): Array[Byte] =
      graft.pipeline.Multimodal.encodeWavPcm16(
        Array.tabulate(n)(i => v(i).toShort), 16000)
    def base(seed: Long)(i: Int) = ((((seed * 7919 + i * 104729L) % 8000L) - 4000L)).toInt
    def quiet(seed: Long)(i: Int) = ((((seed * 7919 + i * 104729L) % 500L) - 250L)).toInt
    val dir = java.nio.file.Files.createTempDirectory("stream_audcurate_").toFile
    val sigs = new java.io.File(dir, "sigs").getAbsolutePath
    val out = new java.io.File(dir, "out").getAbsolutePath
    try {
      def drive(rows: Seq[(Long, Array[Byte])], id: Long) =
        StreamingAudioCurate.sink(sigs, out, "doc_id", threshold = 0.01)(
          rows.toDF("doc_id", "payload"), id)
      def statuses(id: Long) = spark.read.parquet(s"$out/__batch=$id")
        .select("doc_id", "status").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      // batch 0: 1 is loud (rms ~0.07, kept); 2 is an exact 2x gain twin
      // (hamming 0 -> dup); 3 is quiet, rms ~0.004 (low_quality, sig
      // folds); 9 is not audio (invalid)
      drive(Seq(
        1L -> wav(400)(base(1)),
        2L -> wav(400)(i => 2 * base(1)(i)),
        3L -> wav(400)(quiet(5)),
        9L -> "static".getBytes("UTF-8")), 0L)
      assert(statuses(0L) === Map(1L -> "kept", 2L -> "dup",
        3L -> "low_quality", 9L -> "invalid"))
      // batch 1: 4 is a LOUD (8x) gain re-upload of the low-quality 3 —
      // its signature gates the twin even though 3 never shipped
      drive(Seq(4L -> wav(400)(i => 8 * quiet(5)(i))), 1L)
      assert(statuses(1L) === Map(4L -> "dup"))
    } finally org.apache.commons.io.FileUtils.deleteQuietly(dir)
  }

  test("streaming generalization release: empty micro-batch is a no-op, not a crash") {
    // with no prior counts artifact an empty batch used to reach the
    // ladder audit, whose min over an empty merged table is null →
    // NullPointerException killing the query (the StreamingPageRank
    // empty-batch guard, now mirrored here)
    val dir = java.nio.file.Files.createTempDirectory("stream_gen_empty_").toFile
    val counts = new java.io.File(dir, "counts").getAbsolutePath
    val out = new java.io.File(dir, "out").getAbsolutePath
    try {
      val empty = Seq.empty[(Long, String, Double)].toDF("id", "segment", "bal")
      def drive(b: org.apache.spark.sql.DataFrame, id: Long) =
        StreamingGeneralize.sink(counts, out, Seq("segment"), "bal",
          Seq(500L, 4000L), k = 2)(b, id)
      drive(empty, 0L) // must not throw; commits nothing
      assert(StreamingGeneralize.currentCounts(spark, counts, Seq("segment"))
        .isEmpty)
      // a real batch after the empty one proceeds normally...
      val b1 = (0 until 8).map(i => (i.toLong, "s" + (i % 2), (i % 2) * 250.0))
      drive(b1.toDF("id", "segment", "bal"), 1L)
      val released = spark.read.parquet(s"$out/__batch=1")
      assert(released.count() === 8)
      // ...and a later empty batch with a PRIOR artifact is also a no-op
      val before = StreamingGeneralize.currentCounts(spark, counts, Seq("segment"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(t => (t._1, t._2)).toSeq
      drive(empty, 2L)
      assert(StreamingGeneralize.currentCounts(spark, counts, Seq("segment"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(t => (t._1, t._2)).toSeq === before)
    } finally org.apache.commons.io.FileUtils.deleteQuietly(dir)
  }

  test("streaming k-anonymity: per-batch statuses match kAnonAgainstPrior") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[String] // QI key, one element per record
    val out = StreamingKAnon.groupCounts(input.toDS(), k = 3)
      .toDF("qi", "prior_n", "batch_n", "total_n", "status")
    val q = out.writeStream.format("memory").queryName("kanon_stream")
      .outputMode("update").start()

    def table() = spark.table("kanon_stream").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4)))

    val b1 = Seq("A", "A", "B", "C", "C", "C")
    input.addData(b1: _*)
    q.processAllAvailable()
    val after1 = table().sortBy(_._1)
    assert(after1.toSeq === Seq(
      ("A", 0L, 2L, 2L, "new_at_risk"),
      ("B", 0L, 1L, 1L, "new_at_risk"),
      ("C", 0L, 3L, 3L, "new_safe")))

    // batch 2: A crosses k (became_safe), C grows (still_safe), D appears
    // below k, B untouched -> NOT re-emitted
    val b2 = Seq("A", "C", "D")
    input.addData(b2: _*)
    q.processAllAvailable()
    val newRows = table().diff(after1).sortBy(_._1)
    assert(newRows.toSeq === Seq(
      ("A", 2L, 1L, 3L, "became_safe"),
      ("C", 3L, 1L, 4L, "still_safe"),
      ("D", 0L, 1L, 1L, "new_at_risk")))
    q.stop()

    // bit parity with the batch operator: batch 2 against prior = counts(b1)
    val batch = graft.pipeline.Privacy.kAnonAgainstPrior(
        b2.toDF("qi"), Seq("qi"), k = 3,
        prior = graft.pipeline.Privacy.qiCounts(b1.toDF("qi"), Seq("qi")))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4)))
      .filter(r => Set("A", "C", "D")(r._1)) // streaming emits touched only
      .sortBy(_._1)
    assert(newRows.toSeq === batch.toSeq)
  }
}
