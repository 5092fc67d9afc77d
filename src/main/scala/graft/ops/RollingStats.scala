package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Bounded-frame rolling statistics beyond a plain mean — the pairs-trading
  * / sensor-drift surface (kdb `mcor`, TimescaleDB `stats_agg` rolling are
  * the public analogs): per-key windowed Pearson correlation between two
  * columns over the last `frameRows` rows.
  *
  * Scale shape: one hash shuffle on the key, then ONE sorted window pass
  * computing the six co-moment sums (n, Σx, Σy, Σxy, Σx², Σy²) over the
  * same frame — Spark's WindowExec streams all six aggregates in a single
  * frame buffer, exactly like the rolling mean; no self-join, no explode,
  * O(frame) memory per partition.
  */
object RollingStats {

  /** Rolling Pearson correlation of (`xCol`, `yCol`) over the last
    * `frameRows` rows per key, ordered by (`tsCol`, `tieCols`).
    *
    * Computed from explicit co-moment sums —
    * `(nΣxy − ΣxΣy) / (√(nΣx²−(Σx)²) · √(nΣy²−(Σy)²))`
    * — NOT the engine's streaming `corr` aggregate: both engines then
    * evaluate the identical arithmetic expression on frame sums (the
    * fixed-association window-fold pattern that hash-matches cross-engine),
    * instead of each engine's own Welford-style update whose intermediate
    * rounding differs. The result is rounded to `roundTo`; the ratio is
    * sqrt-messy, so it cannot land on a decimal rounding boundary the way
    * clean-decimal means can.
    *
    * Rows where either input is NULL contribute nothing to the frame
    * (SQL `corr` pair semantics); `roll_corr` is NULL when fewer than two
    * pairs are in frame or either variance term is zero (constant series
    * — correlation undefined, and both engines must agree on NULL rather
    * than split between NULL/NaN/±Inf).
    *
    * Output: input key/order columns + `roll_corr` + `n_pairs`.
    */
  def rollingCorr(
      df: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      xCol: String,
      yCol: String,
      frameRows: Int = 20,
      tieCols: Seq[String] = Nil,
      roundTo: Int = 6): DataFrame = {
    require(frameRows >= 2, s"frame must be >= 2 rows: $frameRows")
    val keys  = keyCols.map(col)
    val order = (col(tsCol) +: tieCols.map(col)).map(_.asc)
    val w = Window.partitionBy(keys: _*).orderBy(order: _*)
      .rowsBetween(-(frameRows - 1), 0)
    val both = col(xCol).isNotNull && col(yCol).isNotNull
    val px = when(both, col(xCol))
    val py = when(both, col(yCol))
    def s(c: Column): Column = sum(c).over(w)
    val n   = count(px).over(w).cast("double")
    val sx  = s(px); val sy = s(py)
    val sxy = s(px * py); val sxx = s(px * px); val syy = s(py * py)
    val varX = n * sxx - sx * sx
    val varY = n * syy - sy * sy
    val corr = when(n >= 2 && varX > 0 && varY > 0,
      round((n * sxy - sx * sy) / (sqrt(varX) * sqrt(varY)), roundTo))
    df.withColumn("roll_corr", corr)
      .withColumn("n_pairs", count(px).over(w).cast("long"))
  }

  /** Rolling least-squares line of `yCol` on `xCol` over the last
    * `frameRows` rows per key: `roll_slope = (nΣxy − ΣxΣy)/(nΣx² − (Σx)²)`
    * and `roll_icept = (Σy − slope·Σx)/n` — the windowed drift/trend
    * signal (`regr_slope` is the global analog, [[rollingCorr]] the
    * normalized one). Same single-window co-moment shape and NULL rules
    * (fewer than two pairs, or zero x-variance → NULL).
    *
    * Conditioning caveat for callers: `nΣx² − (Σx)²` subtracts numbers
    * ~n²·x̄² apart to get one ~n²·var(x) — with raw epoch-millisecond x
    * (~1.7e12) that cancellation leaves too few significant digits for a
    * rounded cross-engine hash-compare to survive. Re-anchor the x axis
    * to a small range first (e.g. days since a fixed epoch), as
    * `Queries.rollingSlope` does; the slope is invariant under the shift
    * and only rescaled by the unit change.
    */
  def rollingSlope(
      df: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      xCol: String,
      yCol: String,
      frameRows: Int = 20,
      tieCols: Seq[String] = Nil,
      roundTo: Int = 6): DataFrame = {
    require(frameRows >= 2, s"frame must be >= 2 rows: $frameRows")
    val keys  = keyCols.map(col)
    val order = (col(tsCol) +: tieCols.map(col)).map(_.asc)
    val w = Window.partitionBy(keys: _*).orderBy(order: _*)
      .rowsBetween(-(frameRows - 1), 0)
    val both = col(xCol).isNotNull && col(yCol).isNotNull
    val px = when(both, col(xCol))
    val py = when(both, col(yCol))
    def s(c: Column): Column = sum(c).over(w)
    val n   = count(px).over(w).cast("double")
    val sx  = s(px); val sy = s(py)
    val sxy = s(px * py); val sxx = s(px * px)
    val varX  = n * sxx - sx * sx
    val slope = (n * sxy - sx * sy) / varX
    val ok    = n >= 2 && varX > 0
    df.withColumn("roll_slope", when(ok, round(slope, roundTo)))
      .withColumn("roll_icept", when(ok, round((sy - slope * sx) / n, roundTo)))
      .withColumn("n_pairs", count(px).over(w).cast("long"))
  }
}
