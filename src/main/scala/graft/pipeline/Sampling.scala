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

  /** Contiguous token-budget packing (pretraining sequence packing): walk
    * the documents of each stratum in a deterministic order, accumulate
    * token counts, and assign bin `floor(startOffset / budget)` — docs
    * whose cumulative window crosses a budget boundary start the next
    * fill. A bin may overflow by at most its last document's tokens (the
    * standard greedy contiguous scheme; exact first-fit-with-reset is
    * inherently sequential state and does not distribute).
    *
    * Scale shape: one window cumsum per stratum — key-partitioned,
    * parallel across strata, no global window. Adds `bin_id` and
    * `bin_offset` (the doc's token start offset within its bin).
    * `orderCols` must define a TOTAL order within each stratum (include a
    * tiebreaker) or the cumsum — and therefore the packing — is
    * nondeterministic. One stratum's packing is one window task (the
    * hot-key caveat of every per-key running ordinal; see Sessionize).
    */
  def packByBudget(
      df: DataFrame,
      strataCol: String,
      tokenCol: String,
      budget: Long,
      orderCols: Seq[Column]): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol)).orderBy(orderCols: _*)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val start = coalesce(sum(col(tokenCol)).over(w), lit(0L))
    df.withColumn("bin_id", floor(start / lit(budget)).cast("long"))
      .withColumn("bin_offset", (start - floor(start / lit(budget)) * lit(budget)).cast("long"))
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
