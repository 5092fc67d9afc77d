package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, reproducible sampling for training-data pipelines.
  *
  * `sample(fraction)` on a DataFrame is seed-stable only for a fixed
  * partition layout — repartition the input and the sample changes. Hash
  * sampling keys the decision on the ROW (an id column), so the same row is
  * always in or out: stable across partitioning, engines, re-runs and
  * appends (new rows don't reshuffle old decisions), which is what
  * reproducible corpus subsetting needs. The hash is md5 (identically
  * defined everywhere), so an oracle reproduces the exact sample.
  *
  * Scale shape: a narrow filter — no shuffle, no sort, full codegen;
  * stratified rates are just a per-stratum threshold map applied in the
  * same single pass.
  */
object Sampling {

  /** Uniform [0, 1) sampling score for an id column: the first 8 hex chars
    * of `md5(id)` as an integer over 2³². Deterministic and engine-neutral.
    */
  def hashScore(idCol: Column): Column =
    conv(substring(md5(idCol.cast("string")), 1, 8), 16, 10).cast("long")
      .cast("double") / lit(4294967296.0)

  /** Keep each row iff its hash score < `fraction`. */
  def deterministicSample(df: DataFrame, idCol: String, fraction: Double): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction out of range: $fraction")
    df.filter(hashScore(col(idCol)) < fraction)
  }

  /** Per-stratum sampling rates (e.g. downweight a dominant source): rows in
    * a stratum missing from `rates` fall back to `defaultFraction`.
    */
  def stratifiedSample(
      df: DataFrame,
      idCol: String,
      strataCol: String,
      rates: Map[String, Double],
      defaultFraction: Double): DataFrame = {
    require((rates.values ++ Seq(defaultFraction)).forall(r => r >= 0.0 && r <= 1.0),
      "fractions must be in [0, 1]")
    val rate = rates.foldLeft(lit(defaultFraction)) { case (acc, (k, r)) =>
      when(col(strataCol) === lit(k), lit(r)).otherwise(acc)
    }
    df.filter(hashScore(col(idCol)) < rate)
  }
}
