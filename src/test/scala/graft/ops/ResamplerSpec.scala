package graft.ops

import graft.SparkTestBase
import graft.ops.Resampler.ResampleOptions
import org.apache.spark.sql.Row

/** Ports the reference's canonical dense-grid tests
  * (tests/integration/test_batchinterval_fill.py:57-204 — the 21-row
  * A,None,...,E vs A,A,A,...,E fixtures; data =
  * data/interval_handler/1second_letters_gaps.parquet) and the boundary
  * semantics of test_batchinterval_handler.py.
  */
class ResamplerSpec extends SparkTestBase {

  import spark.implicits._

  // The 5 rows of 1second_letters_gaps.parquet (values copied, not the file).
  private def lettersGapDf = Seq(
    (1577836800191L, "2020-01-01 00:00:00.191000+00:00", "A", "A"),
    (1577836805654L, "2020-01-01 00:00:05.654000+00:00", "B", "B"),
    (1577836810155L, "2020-01-01 00:00:10.155000+00:00", "C", "C"),
    (1577836815418L, "2020-01-01 00:00:15.418000+00:00", "D", "D"),
    (1577836820013L, "2020-01-01 00:00:20.013000+00:00", "E", "E")
  ).toDF("__timestamp", "Human_Timestamp", "Letter", "Nonfill_letter")

  private val expectedTs = (1 to 21).map(s => 1577836800000L + s * 1000L)

  test("1s grid without ffill keys: gaps are all-null rows") {
    val out  = Resampler.resample(lettersGapDf, "1s")
    val rows = out.collect()
    assert(rows.map(_.getLong(0)).toSeq == expectedTs)
    val letters = rows.map(r => Option(r.getAs[String]("Letter")).orNull).toSeq
    val expected = Seq("A", null, null, null, null, "B", null, null, null, null,
      "C", null, null, null, null, "D", null, null, null, null, "E")
    assert(letters == expected)
  }

  test("1s grid with ffill keys: keys carry forward, others stay null") {
    val out = Resampler.resample(lettersGapDf, "1s",
      opts = ResampleOptions(ffillKeys = Seq("Letter")))
    val rows = out.collect()
    assert(rows.map(_.getLong(0)).toSeq == expectedTs)
    val letters = rows.map(_.getAs[String]("Letter")).toSeq
    assert(letters == Seq("A", "A", "A", "A", "A", "B", "B", "B", "B", "B",
      "C", "C", "C", "C", "C", "D", "D", "D", "D", "D", "E"))
    val nonfill = rows.map(r => Option(r.getAs[String]("Nonfill_letter")).orNull).toSeq
    assert(nonfill == Seq("A", null, null, null, null, "B", null, null, null, null,
      "C", null, null, null, null, "D", null, null, null, null, "E"))
  }

  test("processBatchEnd=false drops the tail flush row") {
    val out = Resampler.resample(lettersGapDf, "1s",
      opts = ResampleOptions(processBatchEnd = false))
    val ts = out.collect().map(_.getLong(0)).toSeq
    assert(ts == expectedTs.dropRight(1))
  }

  test("event exactly on a boundary reports to the next boundary") {
    // Events at exactly 00:00:01.000 and 00:00:03.500.
    val df = Seq((1577836801000L, "X"), (1577836803500L, "Y"))
      .toDF("__timestamp", "v")
    val rows = Resampler.resample(df, "1s").collect()
    // b0 = nextBoundary(1577836801000, init) = 00:00:02 (on-boundary → next).
    assert(rows.map(_.getLong(0)).toSeq ==
      Seq(1577836802000L, 1577836803000L, 1577836804000L))
    assert(rows.map(r => Option(r.getAs[String]("v")).orNull).toSeq ==
      Seq("X", null, "Y"))
  }

  test("multiple events in one interval: last wins (tiebreak by order cols)") {
    val df = Seq(
      (1577836800100L, 1L, "a"),
      (1577836800200L, 2L, "b"),
      (1577836800200L, 3L, "c"), // same ts, higher tiebreak id
      (1577836801700L, 4L, "d")
    ).toDF("__timestamp", "id", "v")
    val rows = Resampler.resample(df, "1s",
      opts = ResampleOptions(tieCols = Seq("id"))).collect()
    assert(rows.map(r => (r.getLong(0), r.getAs[String]("v"))).toSeq ==
      Seq((1577836801000L, "c"), (1577836802000L, "d")))
  }

  test("single event resamples to a single flushed boundary") {
    val df   = Seq((1577836800191L, "A")).toDF("__timestamp", "v")
    val rows = Resampler.resample(df, "1s").collect()
    assert(rows.map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1577836801000L, "A")))
  }

  test("1m grid matches handler-test boundary alignment") {
    // Minute-grid variant of test_batchinterval_handler.py: events jittered
    // inside successive minutes emit at the following minute boundary.
    val base = 1577836800000L
    val df = (0 until 5).map(i => (base + i * 60000L + 13000L, ('A' + i).toChar.toString))
      .toDF("__timestamp", "Letter")
    val rows = Resampler.resample(df, "1m").collect()
    assert(rows.map(_.getLong(0)).toSeq == (1 to 5).map(i => base + i * 60000L))
    assert(rows.map(_.getAs[String]("Letter")).toSeq == Seq("A", "B", "C", "D", "E"))
  }

  test("per-key resample: independent grids per key, matches global per group") {
    val base = 1577836800000L
    val df = Seq(
      ("a", base + 191L, "A1"), ("a", base + 5654L, "A2"),
      ("b", base + 60191L, "B1"), ("b", base + 62100L, "B2"), ("b", base + 65900L, "B3")
    ).toDF("sym", "__timestamp", "v")
    val out = Resampler.resampleByKey(df, "1s", Seq("sym"))
      .collect().map(r => (r.getString(0), r.getLong(1), Option(r.getString(2)).orNull))
    // Per key, the keyed result equals resampling that key's stream alone.
    val expected = Seq("a", "b").flatMap { k =>
      Resampler.resample(df.filter($"sym" === k).drop("sym"), "1s")
        .collect().map(r => (k, r.getLong(0), Option(r.getString(1)).orNull))
    }
    assert(out.toSeq == expected)
    // and key b's grid starts at its own aligned boundary, not key a's.
    assert(out.filter(_._1 == "b").head._2 == base + 61000L)
  }

  test("per-key resample with ffill keys") {
    val df = Seq(
      ("x", 1000L, Some(1.0)), ("x", 5500L, Some(2.0)),
      ("y", 2200L, Some(9.0)), ("y", 4100L, None)
    ).toDF("sym", "__timestamp", "p")
    val out = Resampler.resampleByKey(df, "1s", Seq("sym"),
      opts = ResampleOptions(ffillKeys = Seq("p")))
      .collect().map(r => (r.getString(0), r.getLong(1), Option(r.get(2)).orNull))
    assert(out.toSeq == Seq(
      ("x", 2000L, 1.0), ("x", 3000L, 1.0), ("x", 4000L, 1.0), ("x", 5000L, 1.0),
      ("x", 6000L, 2.0),
      ("y", 3000L, 9.0), ("y", 4000L, 9.0),
      // gap semantics verbatim: the covering real row's p is null → stays null
      ("y", 5000L, null)))
  }

  test("sorted=false: same rows, no top-level global sort in the plan") {
    val opts = ResampleOptions(ffillKeys = Seq("Letter"))
    val sortedOut = Resampler.resample(lettersGapDf, "1s", opts = opts)
    val unsorted  = Resampler.resample(lettersGapDf, "1s",
      opts = opts.copy(sorted = false))
    assert(unsorted.collect().toSeq.sortBy(_.getLong(0)) ==
      sortedOut.collect().toSeq)
    // the unsorted plan must not range-shuffle: no Sort above the projection
    val plan = unsorted.queryExecution.optimizedPlan.toString()
    assert(!plan.trim.startsWith("Sort"), s"unexpected top-level sort:\n$plan")
    // keyed path honors the flag too
    val df = Seq(("a", 1000L, 1.0), ("a", 5500L, 2.0), ("b", 2200L, 9.0))
      .toDF("sym", "__timestamp", "p")
    val kOpts = ResampleOptions(ffillKeys = Seq("p"))
    val kSorted = Resampler.resampleByKey(df, "1s", Seq("sym"), opts = kOpts)
    val kUnsorted = Resampler.resampleByKey(df, "1s", Seq("sym"),
      opts = kOpts.copy(sorted = false))
    assert(kUnsorted.collect().toSeq.sortBy(r => (r.getString(0), r.getLong(1))) ==
      kSorted.collect().toSeq)
    assert(!kUnsorted.queryExecution.optimizedPlan.toString().trim.startsWith("Sort"))
  }

  test("day interval aligns to midnight in a configured timezone (A3)") {
    // 2021-08-01T00:02:03.213Z = 2021-07-31T20:02 in America/New_York (UTC-4):
    // next NY midnight boundary = 2021-08-01T00:00 NY = 2021-08-01T04:00Z.
    val df = Seq((1627776123213L, "A")).toDF("__timestamp", "v")
    val rows = Resampler.resample(df, "1d",
      opts = Resampler.ResampleOptions(tz = java.time.ZoneId.of("America/New_York")))
      .collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1627790400000L))
  }

  test("per-key day grid aligns to midnight in a configured timezone (A3 keyed)") {
    val df = Seq(
      ("x", 1627776123213L, "A"), // 2021-08-01T00:02Z = 07-31 20:02 NY → b0 = 08-01T04:00Z
      ("y", 1627869600000L, "B")  // 2021-08-02T02:00Z = 08-01 22:00 NY → b0 = 08-02T04:00Z
    ).toDF("k", "__timestamp", "v")
    val rows = Resampler.resampleByKey(df, "1d", Seq("k"),
      opts = Resampler.ResampleOptions(tz = java.time.ZoneId.of("America/New_York")))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(rows == Seq(("x", 1627790400000L), ("y", 1627876800000L)))
  }

  test("keyed resample streams a huge per-key gap through bounded chunks") {
    // one key with a ~200k-point gap on a 10l grid: the span must explode
    // through bounded chunk arrays, and counts match the closed form
    val df = Seq(("k", 1000000L, 1.0), ("k", 3000000L, 2.0))
      .toDF("key", "__timestamp", "v")
    val out = Resampler.resampleByKey(df, "10l", Seq("key"),
      opts = Resampler.ResampleOptions(ffillKeys = Seq("v")))
    // b0 = 1000010; 200000 boundaries <= 3000000 (on-grid) + tail flush
    assert(out.count() == 200001L)
    val first = out.orderBy("__timestamp").limit(1).collect().head
    assert(first.getLong(1) == 1000010L && first.getDouble(2) == 1.0)
  }

  test("day interval aligns to UTC midnight") {
    val df = Seq(
      (1627776123213L, "A"), // 2021-08-01T00:02:03.213Z
      (1627862400000L + 3600000L, "B") // 2021-08-02T01:00:00Z
    ).toDF("__timestamp", "v")
    val rows = Resampler.resample(df, "1d").collect()
    // b0 = 2021-08-02T00:00:00Z; tail flush at 2021-08-03.
    assert(rows.map(_.getLong(0)).toSeq == Seq(1627862400000L, 1627948800000L))
    assert(rows.map(_.getAs[String]("v")).toSeq == Seq("A", "B"))
  }
}
