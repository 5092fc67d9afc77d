package graft.pipeline

import graft.functions.Num
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
  * the training corpus. The unigram back-off keeps every bigram
  * probability positive, so the log never sees zero. Documents with fewer
  * than two tokens produce no bigrams and drop out, mirroring how
  * perplexity is undefined for them.
  *
  * TRAINED-ARTIFACT BOUNDARY (r10): training and scoring are separate
  * operations joined by a persisted model table, the
  * [[PQ.saveCodebooks]] / [[Profiler.jsDriftAgainstPrior]] convention.
  * [[trainBigramModel]] folds the four count frames (bigram counts,
  * bigram-start counts, unigram counts, grand total) into ONE
  * vocabulary-bounded table `(__w, __w2, __lp)` with the per-bigram-TYPE
  * log-probability precomputed — every input to the `ln` is a type-level
  * integer-count division, so computing it once per type is bit-identical
  * to computing it per occurrence. [[saveModel]]/[[loadModel]] persist it
  * as a distributed parquet artifact (vocabulary-scale — ~1e8 bigram
  * types on a 100 TB web corpus — so it is NEVER collected to the
  * driver, unlike the KB-scale centroid/codebook artifacts).
  * [[scoreAgainstModel]] is then tokenize → bigram explode → ONE
  * content-keyed join → per-doc average; the production shape is train
  * once per corpus snapshot (or use a reference corpus' model, the CCNet
  * regime) and score every later batch against the loaded artifact.
  *
  * Scale shape of training: ONE descent tokenizes each document to its
  * words ARRAY, materialized once ([[Dedup.materializeOnce]] — ids and
  * word arrays, no full text); bigrams slice straight out of the array
  * (`arrays_zip` of the array with its own tail) in a NARROW explode —
  * no corpus-wide (doc, pos) sort, no `lead` window. All model-building
  * joins are between vocabulary-bounded TYPE tables; the only
  * occurrence-scale shuffle in the whole pipeline is the single scoring
  * join (the pre-r10 shape ran TWO occurrence-scale joins — probs on
  * (w₁,w₂) and unigrams on w₂ — per scoring pass).
  *
  * The scoring join carries NO broadcast hint on purpose: vocabulary is
  * corpus-dependent (a few 100k types at test scale, far past any
  * broadcast limit on a web corpus), so the plan lets AQE's runtime size
  * check pick broadcast-hash when the model is actually small and fall
  * back to a shuffled join when it isn't, instead of hard-coding a hint
  * that would OOM the driver at scale. Only the one-row grand-total frame
  * (inside training) keeps an explicit broadcast.
  */
object LanguageModel {

  /** `materialize` only when the caller descends the token frame twice
    * (training reads both the unigram stream and the bigram stream);
    * scoring reads it once, and a checkpoint there would be a pure
    * materialization barrier in an otherwise narrow pipeline.
    */
  private def bigramsOf(docs: DataFrame, idCol: String, textCol: String,
      materialize: Boolean): (DataFrame, DataFrame) = {
    val raw = docs.select(col(idCol), TextAnalysis.words(col(textCol)).as("__ws"))
    val toks = if (materialize) Dedup.materializeOnce(raw) else raw
    // bigrams = the array zipped with its own tail: a narrow explode with
    // no (doc, pos) sort and no window — order within the array IS
    // document order
    val nPairs = greatest(size(col("__ws")) - 1, lit(0))
    val bigrams = toks
      .select(col(idCol), explode(arrays_zip(
        slice(col("__ws"), lit(1), nPairs).as("__a"),
        slice(col("__ws"), lit(2), nPairs).as("__b"))).as("__bg"))
      .select(col(idCol), col("__bg.__a").as("__w"), col("__bg.__b").as("__w2"))
    (toks, bigrams)
  }

  /** Train the interpolated bigram model: one row per bigram TYPE seen in
    * `docs`, columns `(__w, __w2, __lp)` where
    * `__lp = ln(λ·c(w₁,w₂)/c(w₁,·) + (1−λ)·c(w₂)/N)`.
    *
    * `oneMinusLambda` is a separate literal rather than computed as
    * `1 - lambda`: `1.0 - 0.7` in binary floating point is
    * 0.30000000000000004 while an engine parsing the literal `0.3` gets
    * 0.29999999999999999 — passing both keeps the engine and any
    * independent re-derivation multiplying by the IDENTICAL double.
    */
  def trainBigramModel(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      lambda: Double = 0.7,
      oneMinusLambda: Double = 0.3): DataFrame = {
    val (toks, bigrams) = bigramsOf(docs, idCol, textCol, materialize = true)
    val tok    = toks.select(explode(col("__ws")).as("__w2"))
    val uni    = tok.groupBy(col("__w2")).agg(count(lit(1)).as("__c1"))
    val grand  = tok.agg(count(lit(1)).as("__n"))
    val big    = bigrams.groupBy(col("__w"), col("__w2")).agg(count(lit(1)).as("__c2"))
    val starts = bigrams.groupBy(col("__w")).agg(count(lit(1)).as("__cs"))
    big.join(starts, Seq("__w"))
      .join(uni, Seq("__w2"))
      .crossJoin(broadcast(grand))
      .select(col("__w"), col("__w2"),
        log(lit(lambda) * (col("__c2").cast("double") / col("__cs").cast("double")) +
          lit(oneMinusLambda) * (col("__c1").cast("double") / col("__n").cast("double")))
          .as("__lp"))
  }

  /** Persist a trained model as a parquet artifact. Vocabulary-scale, so
    * it stays distributed — no coalesce, no driver collect.
    */
  def saveModel(model: DataFrame, path: String): Unit =
    model.write.mode("overwrite").parquet(path)

  /** Load a model persisted by [[saveModel]], with the size-gated
    * broadcast hint ([[Artifacts.sizedBroadcast]] — the on-disk size is
    * known at plan time, so the broadcast decision is a measurement, not
    * a guess; a vocabulary-scale model takes the unhinted shuffled-join
    * path and can never OOM the driver).
    */
  def loadModel(spark: SparkSession, path: String): DataFrame =
    Artifacts.sizedBroadcast(spark, path, spark.read.parquet(path)
      .select(col("__w").cast("string"), col("__w2").cast("string"),
        col("__lp").cast("double")))

  /** Score documents against a trained model: per doc, the count of its
    * bigrams and the round-6 average of the model's per-type
    * log-probabilities. The join is INNER: every bigram of a corpus scored
    * against its own self-trained model matches by construction; scoring
    * against a FOREIGN model (the CCNet reference-corpus regime) drops
    * out-of-vocabulary bigrams from the average — callers wanting a
    * smoothed open-vocabulary floor should union a floor row per unseen
    * type before scoring.
    */
  def scoreAgainstModel(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      model: DataFrame): DataFrame = {
    val (_, bigrams) = bigramsOf(docs, idCol, textCol, materialize = false)
    bigrams
      .join(model, Seq("__w", "__w2"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        Num.round0(avg(col("__lp")), 6).as("avg_logp"))
  }

  /** Self-trained scoring — train on `docs`, score `docs` — the regime the
    * relational oracle replays end-to-end. Kept as the single-call entry;
    * production pipelines split it at the artifact boundary
    * ([[trainBigramModel]] → [[saveModel]] / [[loadModel]] →
    * [[scoreAgainstModel]]).
    */
  def bigramLmScore(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      lambda: Double = 0.7,
      oneMinusLambda: Double = 0.3): DataFrame =
    scoreAgainstModel(docs, idCol, textCol,
      trainBigramModel(docs, idCol, textCol, lambda, oneMinusLambda))
}
