package graft.streaming

import org.apache.spark.sql.DataFrame

/** Quality gating at the ingest door — the streaming face of
  * [[graft.pipeline.TextAnalysis.qualityGate]].
  *
  * The batch gate derives its threshold from its OWN input's score
  * percentile; a stream cannot (and should not — a low-quality burst
  * would lower its own bar). The streaming contract is therefore the
  * trained-artifact split every other ingest operator uses: train the
  * threshold once from a reference corpus
  * ([[graft.pipeline.TextAnalysis.qualityThreshold]] — a driver scalar,
  * the smallest artifact in the repo) and gate every arrival against it.
  * Gating is one [[graft.functions.QualityCounts]] kernel evaluation and
  * two comparisons per row — STATELESS, watermark-free, Append by
  * construction, and batch parity is structural: the union of survivors
  * over any micro-batch split equals `gateAgainstThreshold` on the
  * unioned arrivals.
  */
object StreamingTextQuality {

  /** Kept arrivals as (idCol, n_tokens, score). */
  def gateAgainstThreshold(
      df: DataFrame,
      textCol: String,
      idCol: String,
      threshold: Double,
      minTokens: Long = 5L): DataFrame =
    graft.pipeline.TextAnalysis.gateAgainstThreshold(
      df, textCol, idCol, threshold, minTokens)
}
