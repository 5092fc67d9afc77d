package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-trained n-gram language-model scoring — the perplexity-style
  * quality filter of the CCNet pipeline (Wenzek et al. 2020,
  * arXiv:1911.00359) with the LM reduced to an interpolated bigram model
  * (Jelinek–Mercer smoothing) so the whole thing stays relational and
  * engine-reproducible:
  *
  *   score(d) = avg over d's bigrams of
  *              ln( λ·P̂(w₂|w₁) + (1−λ)·P̂(w₂) )
  *
  * with P̂(w₂|w₁) = c(w₁,w₂)/c(w₁,·) and P̂(w₂) = c(w₂)/N estimated from
  * the scored corpus itself (the self-trained regime; feeding a reference
  * corpus' counts instead is the CCNet shape and needs no new machinery —
  * the count frames are just built from a different DataFrame). The
  * unigram back-off keeps every bigram probability positive, so the log
  * never sees zero. Documents with fewer than two tokens produce no
  * bigrams and drop out, mirroring how perplexity is undefined for them.
  *
  * Scale shape: ONE descent of the corpus builds the (doc, pos, token)
  * frame, materialized once ([[Dedup.materializeOnce]] — ids and tokens,
  * no full text); bigrams come from a per-document `lead` window (each
  * partition is one document). The count tables are token/bigram-type
  * bounded (vocabulary-scale, far smaller than the corpus), the unigram
  * table broadcasts, and the bigram-count join is the only content-keyed
  * shuffle.
  */
object LanguageModel {

  /** `oneMinusLambda` is a separate literal rather than computed as
    * `1 - lambda`: `1.0 - 0.7` in binary floating point is
    * 0.30000000000000004 while an engine parsing the literal `0.3` gets
    * 0.29999999999999999 — passing both keeps the engine and any
    * independent re-derivation multiplying by the IDENTICAL double.
    */
  def bigramLmScore(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      lambda: Double = 0.7,
      oneMinusLambda: Double = 0.3): DataFrame = {
    val tok = Dedup.materializeOnce(
      docs.select(col(idCol),
        posexplode(TextAnalysis.words(col(textCol))).as(Seq("__pos", "__w"))))
    val byDoc = Window.partitionBy(col(idCol)).orderBy(col("__pos"))
    val bigrams = tok
      .withColumn("__w2", lead(col("__w"), 1).over(byDoc))
      .filter(col("__w2").isNotNull)
    val uni = tok.groupBy(col("__w").as("__w2")).agg(count(lit(1)).as("__c1"))
    val grand = tok.agg(count(lit(1)).as("__n"))
    val big = bigrams.groupBy(col("__w"), col("__w2")).agg(count(lit(1)).as("__c2"))
    val starts = bigrams.groupBy(col("__w")).agg(count(lit(1)).as("__cs"))
    val probs = big.join(starts, Seq("__w"))
    bigrams.select(col(idCol), col("__w"), col("__w2"))
      .join(probs, Seq("__w", "__w2"))
      .join(broadcast(uni), Seq("__w2"))
      .crossJoin(broadcast(grand))
      .withColumn("__lp",
        log(lit(lambda) * (col("__c2").cast("double") / col("__cs").cast("double")) +
          lit(oneMinusLambda) * (col("__c1").cast("double") / col("__n").cast("double"))))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        round(avg(col("__lp")), 6).as("avg_logp"))
  }
}
