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
}
