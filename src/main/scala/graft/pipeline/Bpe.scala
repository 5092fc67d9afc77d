package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer with a trained-merges artifact — the real
  * tokenizer shape every training-data pipeline runs (Sennrich et al.,
  * ACL'16; the GPT-2/RoBERTa vocabulary recipe): train the merge rules
  * ONCE on a corpus snapshot, persist them, and tokenize every later
  * batch against the loaded artifact.
  *
  * The whole algorithm is kept RELATIONAL and cross-engine reproducible
  * (the repo's oracle discipline): a word's symbol sequence is its
  * own-space representation `" h  e  l  l  o "` ([[wordRepr]] — every
  * symbol carries both its delimiters, so merge matches are disjoint),
  * an adjacent-pair merge is one literal `replace(repr, " l  r ",
  * " lr ")` — the same non-overlapping left-to-right scan every SQL
  * engine's `replace` implements, which over disjoint matches is exactly
  * BPE's greedy merge of every occurrence — and the top pair each round
  * is `ORDER BY cnt DESC, l, r LIMIT 1` (total tie-break). An
  * independent SQL engine replays training and encoding bit-for-bit.
  *
  * Scale shape ([[TextAnalysis.bpePairStats]]'s argument, extended): the
  * corpus → vocabulary groupBy is the ONLY full-width pass — training
  * then loops over the Zipf-shrunk (word, count, repr) frame, each round
  * one map-side-combined pair count + a 1-row collect; the merges table
  * itself is `nMerges` rows, a true bounded artifact. Encoding goes
  * through the same vocabulary frame: each DISTINCT word is tokenized
  * once (the replace chain is per-TYPE work), documents re-attach by a
  * word equi-join that AQE broadcasts for ordinary vocabularies.
  */
object Bpe {

  /** One trained merge rule: at `rank`, the adjacent symbols `l` + `r`
    * (corpus-weighted `cnt` occurrences at training time) fuse into the
    * symbol `l+r`.
    */
  final case class Merge(rank: Int, l: String, r: String, cnt: Long)

  /** `" h  e  l  l  o "` — the symbol representation BPE rewrites: every
    * symbol carries its OWN leading and trailing space (adjacent symbols
    * are therefore double-spaced). Self-delimited symbols are
    * load-bearing: with a single shared separator, two adjacent
    * occurrences of the top pair share the boundary space, the first
    * replace consumes it, and the second occurrence no longer matches —
    * `replace` would then merge only alternate repeats (`a a a a` →
    * `[aa, a, a]`), diverging from BPE's greedy left-to-right merge.
    * With own-space symbols the matches are disjoint by construction and
    * `replace(" l  r ", " lr ")` merges EVERY occurrence — textbook BPE.
    */
  def wordRepr(word: Column): Column =
    regexp_replace(word, "(.)", " $1 ")

  /** The vocabulary frame: distinct word, corpus count, symbol repr. */
  private def vocabFrame(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TextAnalysis.words(col(textCol))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("wc"))
      .withColumn("repr", wordRepr(col("word")))

  /** Adjacent symbol pairs of a repr column with the word count attached:
    * `(l, r, wc)` one row per pair OCCURRENCE (duplicates within a word
    * stay — their counts add, the Sennrich counting rule).
    */
  private def pairsOf(voc: DataFrame): DataFrame = {
    val syms = filter(split(col("repr"), " "), s => length(s) > 0)
    val nPairs = greatest(size(syms) - 1, lit(0))
    voc.select(col("wc"), explode(arrays_zip(
        slice(syms, lit(1), nPairs).as("__l"),
        slice(syms, lit(2), nPairs).as("__r"))).as("__p"))
      .select(col("__p.__l").as("l"), col("__p.__r").as("r"), col("wc"))
  }

  /** Apply trained merges (in rank order) to a repr column — the encode
    * half's rewrite chain, shared by training's vocabulary rewrite.
    */
  def applyMerges(repr: Column, merges: Seq[Merge]): Column =
    merges.sortBy(_.rank).foldLeft(repr) { (r, m) =>
      replace(r, lit(s" ${m.l}  ${m.r} "), lit(s" ${m.l}${m.r} "))
    }

  /** Train `nMerges` merge rules on the corpus. Each round: count
    * adjacent symbol pairs over the current vocabulary (weighted by word
    * count), take the most frequent (ties: smallest `(l, r)` — a TOTAL
    * order, so training is deterministic), rewrite the vocabulary, and
    * recount. Stops early if no pair remains (every word fused to one
    * symbol). The returned rules are the persistable artifact
    * ([[saveMerges]]/[[loadMerges]]).
    */
  def trainMerges(docs: DataFrame, textCol: String, nMerges: Int): Seq[Merge] = {
    require(nMerges > 0, s"nMerges must be positive: $nMerges")
    val base = Dedup.materializeOnce(vocabFrame(docs, textCol))
    val out = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var voc = base
    var rank = 1
    while (rank <= nMerges) {
      val top = pairsOf(voc)
        .groupBy(col("l"), col("r")).agg(sum(col("wc")).as("cnt"))
        .orderBy(col("cnt").desc, col("l").asc, col("r").asc)
        .limit(1).collect()
      if (top.isEmpty) rank = nMerges + 1
      else {
        val m = Merge(rank, top(0).getString(0), top(0).getString(1),
          top(0).getLong(2))
        out += m
        voc = voc.withColumn("repr",
          replace(col("repr"), lit(s" ${m.l}  ${m.r} "), lit(s" ${m.l}${m.r} ")))
        rank += 1
      }
    }
    out.toSeq
  }

  /** Persist trained merges as a parquet artifact (nMerges rows). */
  def saveMerges(spark: SparkSession, merges: Seq[Merge], path: String): Unit = {
    import spark.implicits._
    Artifacts.save(merges.toDF("merge_rank", "l_sym", "r_sym", "cnt"), path)
  }

  /** Load merges persisted by [[saveMerges]]. */
  def loadMerges(spark: SparkSession, path: String): Seq[Merge] =
    spark.read.parquet(path)
      .select(col("merge_rank"), col("l_sym"), col("r_sym"), col("cnt"))
      .collect()
      .map(r => Merge(r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .sortBy(_.rank).toSeq

  /** The merges table as a frame (`merge_rank, l_sym, r_sym, cnt`). */
  def mergesFrame(spark: SparkSession, merges: Seq[Merge]): DataFrame = {
    import spark.implicits._
    merges.toDF("merge_rank", "l_sym", "r_sym", "cnt")
      .orderBy("merge_rank")
  }

  /** Tokenize documents against trained merges: per document, the word
    * count and the BPE token count after applying every merge rule. Each
    * DISTINCT word is rewritten once (the replace chain runs over the
    * vocabulary frame, not the corpus); documents re-attach by a word
    * equi-join. Output: `(id, n_words, n_bpe_tokens)`.
    */
  def encode(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[Merge]): DataFrame = {
    val wordRows = docs.select(col(idCol),
      explode(TextAnalysis.words(col(textCol))).as("word"))
    val dict = wordRows.select(col("word")).distinct()
      .withColumn("__toks",
        size(filter(split(applyMerges(wordRepr(col("word")), merges), " "),
          s => length(s) > 0)).cast("long"))
    wordRows.join(dict, "word")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"), sum(col("__toks")).as("n_bpe_tokens"))
  }

  /** PER-ROW tokenization against trained merges — the stream face
    * ([[graft.streaming.StreamingBpe]]) and the narrow batch path: every
    * word of a document is rewritten inside the row (a `transform` over
    * the words array — no explode, no dict join, no aggregation), so the
    * operator is stateless and Append by construction. Same rows as
    * [[encode]] for every document WITH words (the dict join only dedups
    * the rewrite work); zero-word documents — which [[encode]]'s explode
    * drops — are kept here as `(0, 0)`, the right contract for a stream
    * (every arrival gets a verdict). Prefer [[encode]] for batch corpora
    * with Zipf-repeated vocabularies, this face for streams and
    * wide-vocabulary scans.
    */
  def encodeRow(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[Merge]): DataFrame = {
    val ws = TextAnalysis.words(col(textCol))
    val toks = transform(ws, w =>
      size(filter(split(applyMerges(wordRepr(w), merges), " "),
        s => length(s) > 0)).cast("long"))
    docs.select(col(idCol),
      size(ws).cast("long").as("n_words"),
      coalesce(aggregate(toks, lit(0L), (a, b) => a + b), lit(0L))
        .as("n_bpe_tokens"))
  }
}
