package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document chunking for LLM training pipelines: split each document into
  * overlapping token windows (context-window packing feeds on these).
  *
  * Scale shape: chunking is pure per-row work — tokenize, generate window
  * starts, explode — so the whole operator is NARROW: no shuffle, no window,
  * perfectly parallel over any number of documents. The explode multiplies
  * rows by ~`n_tokens / stride`, which Spark streams (the generator does not
  * materialize per-document chunk lists). The only care needed at 100 TB is
  * output-partition sizing; callers writing the result should size
  * `spark.sql.files.maxRecordsPerFile` / repartition by a hash of the id.
  */
object Chunking {

  /** Overlapping token-window chunks of `chunkTokens` words every
    * `strideTokens` words.
    *
    * Semantics: tokens are the whitespace-split words of `textCol`
    * ([[TextAnalysis.words]]); chunk `k` covers tokens
    * `[k*stride, k*stride + chunkTokens)`; starts run `0, stride, ...` while
    * `start < n_tokens`, so the final chunk may be short (standard
    * tail-keeping chunking). Documents with zero tokens yield no chunks.
    *
    * Output: `(id, chunk_idx, n_tokens, chunk_text)` — one row per chunk.
    */
  def chunk(docs: DataFrame, textCol: String, idCol: String,
            chunkTokens: Int, strideTokens: Int): DataFrame = {
    require(chunkTokens > 0, s"chunkTokens must be > 0, got $chunkTokens")
    require(strideTokens > 0, s"strideTokens must be > 0, got $strideTokens")
    val withWords = docs
      .select(col(idCol), TextAnalysis.words(col(textCol)).as("__ws"))
      .filter(size(col("__ws")) > 0)
    // starts = 0, stride, ... <= n-1 (sequence's stop is inclusive, and
    // n >= 1 here, so the start list is never empty or descending)
    val starts = sequence(lit(0), size(col("__ws")) - 1, lit(strideTokens))
    withWords
      .select(col(idCol), col("__ws"),
        posexplode(starts).as(Seq("chunk_idx", "__start")))
      .select(
        col(idCol),
        col("chunk_idx").cast("long").as("chunk_idx"),
        size(slice(col("__ws"), col("__start") + 1, lit(chunkTokens))).cast("long")
          .as("n_tokens"),
        array_join(slice(col("__ws"), col("__start") + 1, lit(chunkTokens)), " ")
          .as("chunk_text"))
  }
}
