package graft.streaming

import org.apache.spark.sql.DataFrame

/** Regression quality-model scoring at the ingest door — the streaming
  * face of [[graft.pipeline.QualityModel.score]], completing the
  * quality family's batch/streaming symmetry: [[StreamingTextQuality]]
  * gates on the heuristic threshold artifact, this scores on the TRAINED
  * linear-model artifact (the last trained operator that had no ingest
  * door).
  *
  * The contract is the trained-artifact split every ingest operator uses:
  * the weights come from [[graft.pipeline.QualityModel.train]] over a
  * reference corpus — never from the stream itself, which would let a
  * low-quality burst recalibrate its own judge — and every arrival is
  * scored against them. Scoring is one
  * [[graft.functions.QualityCounts]]-backed feature scan plus one codegen
  * projection per row: STATELESS, watermark-free, Append by construction,
  * so batch parity is structural (scores over any micro-batch split equal
  * `QualityModel.score` on the unioned arrivals — spec-pinned anyway,
  * because structural claims rot).
  */
object StreamingQualityScore {

  /** Scored arrivals as (idCol, score): `ŷ` from the trained weights,
    * rounded like the batch face so the two answers are comparable
    * bit-for-bit.
    */
  def scoreAgainstModel(
      df: DataFrame,
      textCol: String,
      idCol: String,
      weights: Array[Double]): DataFrame =
    graft.pipeline.QualityModel.score(df, textCol, idCol, weights)
}
