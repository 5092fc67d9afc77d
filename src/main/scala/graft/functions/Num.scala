package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{lit, round}

/** Tiny numeric normalization helpers shared by query outputs. */
object Num {

  /** `round(c, scale)` with the sign of zero normalized away.
    *
    * A rounded statistic whose true value is within an ulp of zero can land
    * on `0.0` in one engine and `-0.0` in another purely from float
    * summation order — `round` preserves the sign of zero, and a byte-level
    * hash compare then flags two value-equal dumps as different. IEEE 754
    * guarantees `-0.0 + 0.0 == +0.0`, so adding a zero literal after the
    * round collapses both cases to the positive zero while leaving every
    * non-zero value bit-identical. Oracle SQL must apply the same
    * normalization (`round(...) + 0`) for the pairing to hold.
    */
  def round0(c: Column, scale: Int): Column = round(c, scale) + lit(0.0)

  /** Driver-side twin of [[round0]]: BigDecimal HALF_UP (the same rule
    * Spark's `round` and DuckDB's `round` apply to doubles) with the sign
    * of zero normalized away — for bounded driver-side walks whose rounded
    * outputs must hash-match a relational oracle.
    */
  def roundHalfUp(d: Double, scale: Int): Double =
    if (d.isNaN || d.isInfinite) d
    else BigDecimal(d).setScale(scale, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
}
