package graft.pipeline

import graft.functions.Num
import org.apache.spark.sql.{Column, DataFrame}
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
  * Scale shape (rewritten r7c): ONE descent tokenizes each document to
  * its words ARRAY, materialized once ([[Dedup.materializeOnce]] — ids
  * and word arrays, no full text); bigrams slice straight out of the
  * array (`arrays_zip` of the array with its own tail) in a NARROW
  * explode — the previous formulation's corpus-wide (doc, pos) sort and
  * `lead` window are gone entirely, which alone was the difference
  * between 1.46 s and ~0.8 s at sf0.1. The count tables are
  * token/bigram-type bounded (vocabulary-scale), and the bigram-count
  * join is the only content-keyed shuffle.
  *
  * The unigram join carries NO broadcast hint on purpose: vocabulary is
  * corpus-dependent (a few 100k types at test scale, ~1e8 on a 100 TB
  * web corpus — far past any broadcast limit), so the plan lets AQE's
  * runtime size check pick broadcast-hash when the table is actually
  * small and fall back to a shuffled join when it isn't, instead of
  * hard-coding a hint that would OOM the driver at scale. Only the
  * one-row grand-total frame keeps an explicit broadcast.
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
    val toks = Dedup.materializeOnce(
      docs.select(col(idCol), TextAnalysis.words(col(textCol)).as("__ws")))
    val tok = toks.select(col(idCol), explode(col("__ws")).as("__w"))
    // bigrams = the array zipped with its own tail: a narrow explode with
    // no (doc, pos) sort and no window — order within the array IS
    // document order
    val nPairs = greatest(size(col("__ws")) - 1, lit(0))
    val bigrams = toks
      .select(col(idCol), explode(arrays_zip(
        slice(col("__ws"), lit(1), nPairs).as("__a"),
        slice(col("__ws"), lit(2), nPairs).as("__b"))).as("__bg"))
      .select(col(idCol), col("__bg.__a").as("__w"), col("__bg.__b").as("__w2"))
    val uni = tok.groupBy(col("__w").as("__w2")).agg(count(lit(1)).as("__c1"))
    val grand = tok.agg(count(lit(1)).as("__n"))
    val big = bigrams.groupBy(col("__w"), col("__w2")).agg(count(lit(1)).as("__c2"))
    val starts = bigrams.groupBy(col("__w")).agg(count(lit(1)).as("__cs"))
    val probs = big.join(starts, Seq("__w"))
    bigrams.select(col(idCol), col("__w"), col("__w2"))
      .join(probs, Seq("__w", "__w2"))
      .join(uni, Seq("__w2"))
      .crossJoin(broadcast(grand))
      .withColumn("__lp",
        log(lit(lambda) * (col("__c2").cast("double") / col("__cs").cast("double")) +
          lit(oneMinusLambda) * (col("__c1").cast("double") / col("__n").cast("double"))))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        Num.round0(avg(col("__lp")), 6).as("avg_logp"))
  }
}
