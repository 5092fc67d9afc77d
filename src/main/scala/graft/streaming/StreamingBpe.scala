package graft.streaming

import org.apache.spark.sql.DataFrame

/** Streaming BPE tokenization — the stream face of the trained-merges
  * artifact ([[graft.pipeline.Bpe]]: train once per corpus snapshot,
  * persist the merge rules, tokenize every ARRIVING document against
  * them).
  *
  * Same pattern as [[StreamingQuantile]]: the per-row encode
  * ([[graft.pipeline.Bpe.encodeRow]]) rewrites every word inside the row
  * — no explode, no dict join, no aggregation — so the operator is
  * stateless, watermark-free, and Append by construction. Batch parity
  * is structural: the union of outputs over any micro-batch split equals
  * the batch encode on the unioned arrivals (StreamingSpec pins it
  * against BOTH batch faces).
  */
object StreamingBpe {

  /** `(id, n_words, n_bpe_tokens)` per arriving document. */
  def encode(
      df: DataFrame,
      idCol: String,
      textCol: String,
      merges: Seq[graft.pipeline.Bpe.Merge]): DataFrame =
    graft.pipeline.Bpe.encodeRow(df, idCol, textCol, merges)
}
