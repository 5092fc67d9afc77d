package graft.streaming

import org.apache.spark.sql.DataFrame

/** Streaming quantile-transform — the stream face of the trained
  * per-key discrete-quantile grid ([[graft.pipeline.RankSelect]]: the
  * two-phase exact trainer produces the grid artifact once per corpus
  * snapshot; this face scores every ARRIVING row against it).
  *
  * Same pattern as [[StreamingSemDedup.rankNormalize]]: the transform is
  * PURE per-row narrow work (one [[graft.functions.RankBucket]] kernel
  * call against the trained reference object), so the operator is
  * stateless, watermark-free, and Append by construction — and batch
  * parity is structural: the union of outputs over any micro-batch split
  * equals [[graft.pipeline.RankSelect.transformAgainstGrids]] on the
  * unioned arrivals (StreamingSpec pins it).
  */
object StreamingQuantile {

  /** All input columns + `q_bucket` + `qscore`; rows whose key has no
    * trained grid, or with null values, get null bucket/score.
    */
  def transformAgainstGrids(
      df: DataFrame,
      keyCol: String,
      valueCol: String,
      grids: Map[String, Array[Double]],
      roundTo: Int = 6): DataFrame =
    graft.pipeline.RankSelect.transformAgainstGrids(
      df, keyCol, valueCol, grids, roundTo)
}
