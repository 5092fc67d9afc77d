package graft.pipeline

import graft.functions.{VectorCovSums, VectorDot}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Corpus-level statistics over an embedding column — the monitoring /
  * preprocessing layer in front of the ANN and SemDeDup operators: a
  * training-data pipeline watches per-dimension drift (a feature extractor
  * change shows up as a mean/variance jump in specific dimensions) and
  * feeds the covariance matrix into whitening / PCA before indexing.
  *
  * Scale shapes:
  *  - [[dimStats]]: `posexplode` is NARROW (no shuffle); the groupBy has
  *    exactly `d` keys, so the map-side partial aggregation reduces each
  *    partition to `d` rows before the one tiny exchange.
  *  - [[covarianceMatrix]]: a single [[graft.functions.VectorCovSums]]
  *    aggregate — one pass, one `d(d+3)/2+1`-double buffer per partition,
  *    merged elementwise; the d(d+1)/2 output rows are generated from the
  *    ONE aggregated row, so nothing row-count-shaped ever shuffles. The
  *    same plan at 1000 executors moves ~34 KB per partition for d = 64.
  */
object EmbedStats {

  /** Per-dimension profile of a vector column: `dim` (0-based), `n`,
    * `mean`, `var_pop`, `min`, `max`. Vectors shorter than the row's own
    * length participate per-position (posexplode emits what's there);
    * float values widen exactly to double, so min/max are exact copies
    * and only the two summed moments are rounded.
    */
  def dimStats(embeds: DataFrame, vecCol: String, roundTo: Int = 6): DataFrame = {
    val x = col("x").cast("double")
    embeds
      .select(posexplode(col(vecCol)).as(Seq("dim", "x")))
      .groupBy(col("dim"))
      .agg(
        count(x).as("n"),
        round(sum(x) / count(x), roundTo).as("mean"),
        // population variance from raw moments: (Σx² − (Σx)²/n)/n — the
        // same arithmetic the oracle's var_pop resolves to, rounded
        // because the two engines sum partials in different orders
        round((sum(x * x) - sum(x) * sum(x) / count(x)) / count(x), roundTo)
          .as("var_pop"),
        min(x).as("min_x"),
        max(x).as("max_x"))
  }

  /** Upper-triangle population covariance matrix of a `dim`-dimensional
    * vector column: one row per (i ≤ j) with `n` and `cov` — the diagonal
    * is the per-dimension variance. Rows with null/short/null-element
    * vectors are skipped whole (all matrix entries come from the same row
    * subset; see [[graft.functions.VectorCovSums]]).
    */
  def covarianceMatrix(embeds: DataFrame, vecCol: String, dim: Int,
      roundTo: Int = 6): DataFrame = {
    embeds
      .agg(VectorCovSums.vectorCovSums(col(vecCol), dim).as("sums"))
      .select(explode(col("sums")).as("s"))
      .select(
        col("s.i").as("dim_i"),
        col("s.j").as("dim_j"),
        col("s.n").as("n"),
        round((col("s.sij") - col("s.si") * col("s.sj") / col("s.n")) / col("s.n"),
          roundTo).as("cov"))
  }
}
