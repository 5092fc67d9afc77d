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

  /** BYTE-LEVEL [[wordRepr]] — the GPT-2-family recipe: the word's UTF-8
    * bytes, each an own-space symbol. Bytes render as uppercase hex pairs
    * (`"thé"` → `" 74  68  C3  A9 "`), so the whole relational machinery
    * ([[applyMerges]]'s `replace`, the pair explode, the oracle's CTE
    * replay) carries over unchanged — a trained merge just fuses hex
    * strings (`" 74  68 " → " 7468 "`). Cross-engine exact: `hex(encode(w))`
    * is the same uppercase byte spelling in Spark and DuckDB.
    */
  def wordReprBytes(word: Column): Column =
    regexp_replace(
      hex(org.apache.spark.sql.functions.encode(word, "UTF-8")),
      "(..)", " $1 ")

  /** The per-level repr column ([[wordRepr]] / [[wordReprBytes]]). */
  private def reprOf(word: Column, byteLevel: Boolean): Column =
    if (byteLevel) wordReprBytes(word) else wordRepr(word)

  /** The vocabulary frame: distinct word, corpus count, symbol repr. */
  private def vocabFrame(docs: DataFrame, textCol: String,
      byteLevel: Boolean): DataFrame =
    docs.select(explode(TextAnalysis.words(col(textCol))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("wc"))
      .withColumn("repr", reprOf(col("word"), byteLevel))

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
  def trainMerges(docs: DataFrame, textCol: String, nMerges: Int,
      byteLevel: Boolean = false): Seq[Merge] = {
    require(nMerges > 0, s"nMerges must be positive: $nMerges")
    val base = Dedup.materializeOnce(vocabFrame(docs, textCol, byteLevel))
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

  /** Train `nMerges` merge rules with the classic IN-MEMORY pair-heap
    * trainer (Sennrich's algorithm) over the collected vocabulary —
    * the PRODUCTION-VOCABULARY path. [[trainMerges]] is exactly right as
    * the cross-engine oracle twin but pays one Spark round per merge and
    * an nMerges-deep rewrite chain, which caps it at toy merge counts; a
    * real 32k-50k-merge vocabulary needs the driver loop. The two
    * trainers are BIT-IDENTICAL on the same corpus (spec-pinned): same
    * per-occurrence Sennrich pair counting, same greedy disjoint
    * left-to-right merge [[wordRepr]]'s own-space `replace` performs,
    * same total `(cnt desc, l, r)` tie-break.
    *
    * Scale shape: the corpus → vocabulary groupBy stays distributed (the
    * only full-width pass); ONLY the Zipf-shrunk `(word, count)` frame is
    * collected, bounded by `maxVocab` (fails loudly over the bound —
    * raise `minCount` to shrink a web-scale tail, the standard trainer
    * knob). Training is then pure driver compute: a lazy-deletion
    * priority queue over pair counts + an occurrence index, so each merge
    * touches only the words containing its pair — O(corpus symbols +
    * Σ affected-word lengths), not O(nMerges × vocabulary).
    */
  def trainMergesHeap(
      docs: DataFrame,
      textCol: String,
      nMerges: Int,
      minCount: Long = 1L,
      maxVocab: Int = 10000000,
      byteLevel: Boolean = false): Seq[Merge] = {
    require(nMerges > 0, s"nMerges must be positive: $nMerges")
    require(minCount >= 1, s"minCount must be >= 1: $minCount")
    val rows = docs.select(explode(TextAnalysis.words(col(textCol))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("wc"))
      .filter(col("wc") >= minCount)
      .limit(maxVocab + 1)
      .collect()
    require(rows.length <= maxVocab,
      s"trainMergesHeap: vocabulary exceeds maxVocab=$maxVocab after " +
        s"minCount=$minCount — raise minCount (rare types contribute " +
        "negligible pair mass) or maxVocab")
    trainHeapFromVocab(
      rows.map(r => (r.getString(0), r.getLong(1))), nMerges, byteLevel)
  }

  /** The in-memory trainer core, exposed for spec-level property runs:
    * `vocab` is the distinct `(word, count)` table.
    */
  private[graft] def trainHeapFromVocab(
      vocab: Array[(String, Long)], nMerges: Int,
      byteLevel: Boolean = false): Seq[Merge] = {
    import scala.collection.mutable
    // each word as its initial symbol sequence: codepoints (wordRepr's
    // "(.)" splits by codepoint) or UTF-8 bytes as uppercase hex pairs
    // (wordReprBytes) — the merge loop below is level-agnostic
    val syms = vocab.map { case (w, _) =>
      val buf = mutable.ArrayBuffer.empty[String]
      if (byteLevel) {
        w.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          .foreach(b => buf += f"${b & 0xFF}%02X")
      } else {
        var i = 0
        while (i < w.length) {
          val cp = w.codePointAt(i)
          val n = Character.charCount(cp)
          buf += w.substring(i, i + n)
          i += n
        }
      }
      buf
    }
    val wc = vocab.map(_._2)
    val pairCnt = mutable.HashMap.empty[(String, String), Long]
    val pairWords = mutable.HashMap.empty[(String, String), mutable.BitSet]
    def addPairs(wi: Int, sign: Long): Unit = {
      val s = syms(wi)
      var i = 0
      while (i + 1 < s.length) {
        val p = (s(i), s(i + 1))
        val c = pairCnt.getOrElse(p, 0L) + sign * wc(wi)
        if (c == 0L) pairCnt.remove(p) else pairCnt.update(p, c)
        if (sign > 0) pairWords.getOrElseUpdate(p, mutable.BitSet.empty) += wi
        i += 1
      }
    }
    syms.indices.foreach(addPairs(_, 1L))
    // lazy-deletion MAX-heap popping the trainer's total tie-break
    // (cnt desc, l asc, r asc): max cnt first, then Reversed makes the
    // SMALLEST symbol the max
    val heap = mutable.PriorityQueue.empty[(Long, String, String)](
      Ordering.by[(Long, String, String), (Long, Reversed, Reversed)] {
        case (c, l, r) => (c, Reversed(l), Reversed(r))
      })
    pairCnt.foreach { case ((l, r), c) => heap.enqueue((c, l, r)) }
    val out = mutable.ArrayBuffer.empty[Merge]
    var rank = 1
    while (rank <= nMerges && heap.nonEmpty) {
      val (c, l, r) = heap.dequeue()
      if (pairCnt.getOrElse((l, r), 0L) != c) {
        // stale heap entry — the pair's count changed since enqueue
      } else {
        out += Merge(rank, l, r, c)
        val fused = l + r
        val affected = pairWords.getOrElse((l, r), mutable.BitSet.empty).toArray
        val touched = mutable.HashSet.empty[(String, String)]
        affected.foreach { wi =>
          val s = syms(wi)
          // verify on use (the index keeps stale entries): does the pair
          // still occur adjacently in this word?
          var has = false
          var i = 0
          while (!has && i + 1 < s.length) {
            if (s(i) == l && s(i + 1) == r) has = true
            i += 1
          }
          if (has) {
            var j = 0
            while (j + 1 < s.length) { touched += ((s(j), s(j + 1))); j += 1 }
            addPairs(wi, -1L)
            // greedy disjoint left-to-right — replace(" l  r ", " lr ")
            val nw = mutable.ArrayBuffer.empty[String]
            var k = 0
            while (k < s.length) {
              if (k + 1 < s.length && s(k) == l && s(k + 1) == r) {
                nw += fused; k += 2
              } else { nw += s(k); k += 1 }
            }
            syms(wi) = nw
            addPairs(wi, 1L)
            var m = 0
            while (m + 1 < nw.length) { touched += ((nw(m), nw(m + 1))); m += 1 }
          }
        }
        touched.foreach { p =>
          pairCnt.get(p).foreach(cc => heap.enqueue((cc, p._1, p._2)))
        }
        rank += 1
      }
    }
    out.toSeq
  }

  /** Orders strings DESCENDING inside an ascending tuple ordering — the
    * heap pops (cnt desc, l asc, r asc) as a max-heap of
    * (cnt, Reversed(l), Reversed(r)).
    */
  private final case class Reversed(s: String) extends Ordered[Reversed] {
    def compare(that: Reversed): Int = that.s.compareTo(s)
  }

  /** Persist trained merges as a parquet artifact (nMerges rows). The
    * `byte_level` flag column records which symbol alphabet the rules
    * were trained over — encoding with the wrong repr would silently
    * tokenize everything to singles.
    */
  def saveMerges(spark: SparkSession, merges: Seq[Merge], path: String,
      byteLevel: Boolean = false): Unit = {
    import spark.implicits._
    Artifacts.save(merges.toDF("merge_rank", "l_sym", "r_sym", "cnt")
      .withColumn("byte_level", lit(byteLevel)), path)
  }

  /** Load merges persisted by [[saveMerges]]. Pass `expectByteLevel` to
    * ENFORCE the artifact's alphabet: merge rules from the wrong level
    * never match the other repr, so every word would silently tokenize
    * to singletons — the exact failure the `byte_level` flag records.
    */
  def loadMerges(spark: SparkSession, path: String,
      expectByteLevel: Option[Boolean] = None): Seq[Merge] = {
    expectByteLevel.foreach { want =>
      val got = mergesByteLevel(spark, path)
      require(got == want,
        s"loadMerges: artifact at $path is ${if (got) "byte" else "codepoint"}-level " +
          s"but the caller encodes at ${if (want) "byte" else "codepoint"} level — " +
          "the rules would never match and every word would tokenize to singletons")
    }
    spark.read.parquet(path)
      .select(col("merge_rank"), col("l_sym"), col("r_sym"), col("cnt"))
      .collect()
      .map(r => Merge(r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .sortBy(_.rank).toSeq
  }

  /** The artifact's symbol-alphabet flag (false for pre-flag artifacts —
    * everything before the flag existed was codepoint-level).
    */
  def mergesByteLevel(spark: SparkSession, path: String): Boolean = {
    val df = spark.read.parquet(path)
    df.columns.contains("byte_level") &&
      df.select(col("byte_level")).limit(1).collect()
        .headOption.exists(_.getBoolean(0))
  }

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
      merges: Seq[Merge], byteLevel: Boolean = false): DataFrame = {
    val wordRows = docs.select(col(idCol),
      explode(TextAnalysis.words(col(textCol))).as("word"))
    val dict = wordRows.select(col("word")).distinct()
      .withColumn("__toks",
        size(filter(split(applyMerges(reprOf(col("word"), byteLevel), merges),
          " "), s => length(s) > 0)).cast("long"))
    wordRows.join(dict, "word")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"), sum(col("__toks")).as("n_bpe_tokens"))
  }

  /** Per-word BPE token count against trained merges — the per-row scalar
    * [[encodeRow]] and aggregate reports (tokenizer-fit compression by
    * source) share: apply every merge to the word's own-space repr, count
    * the surviving symbols. Pure projection work — no explode, no join.
    */
  def wordTokenCount(word: Column, merges: Seq[Merge],
      byteLevel: Boolean = false): Column =
    size(filter(split(applyMerges(reprOf(word, byteLevel), merges), " "),
      s => length(s) > 0)).cast("long")

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
  /** [[encodeRow]]'s PRODUCTION-MERGE-COUNT twin: per-row tokenization
    * through the [[graft.functions.BpeTokenCount]] kernel, whose cost per
    * word scales with the pairs PRESENT in the word (hash lookups against
    * the merge-rank table) instead of the merge count — the encode face
    * for [[trainMergesHeap]]'s 32k-50k-merge vocabularies, where the
    * nMerges-deep `replace` chain would blow the codegen method-size
    * cliff. Bit-identical rows to [[encodeRow]] (spec-pinned; same
    * zero-word `(0, 0)` stream contract), stateless and Append by
    * construction.
    */
  def encodeKernel(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[Merge]): DataFrame = {
    val st = graft.functions.BpeTokenCount.bpeTokenCount(col(textCol), merges)
    docs.select(col(idCol), st.as("__st"))
      .select(col(idCol), col("__st.n_words").as("n_words"),
        col("__st.n_bpe_tokens").as("n_bpe_tokens"))
  }

  def encodeRow(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[Merge], byteLevel: Boolean = false): DataFrame = {
    val ws = TextAnalysis.words(col(textCol))
    val toks = transform(ws, w => wordTokenCount(w, merges, byteLevel))
    docs.select(col(idCol),
      size(ws).cast("long").as("n_words"),
      coalesce(aggregate(toks, lit(0L), (a, b) => a + b), lit(0L))
        .as("n_bpe_tokens"))
  }
}
