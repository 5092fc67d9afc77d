package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Okapi BM25 retrieval over a document corpus — the text-side similarity
  * search next to the embedding-side ANN family: train the corpus model
  * once (term document-frequencies → idf weights, plus the corpus length
  * stats), persist it as a parquet artifact, then score any batch or
  * stream of documents against a query with PURE per-row narrow work.
  *
  * Model semantics (the Robertson–Spärck Jones form):
  *
  * {{{
  * idf(t)      = ln(1 + (N − df_t + 0.5) / (df_t + 0.5))
  * score(D, Q) = Σ_{t∈Q} idf(t) · (tf_{t,D}·(k1+1)) / (tf_{t,D} + k1·(1 − b + b·|D|/avgdl))
  * }}}
  *
  * Scale shape (the trained-artifact boundary, the
  * [[LanguageModel.trainBigramModel]] convention):
  *
  *  - '''train''' is one tokenizing scan ([[graft.functions.WordCounts]] —
  *    the per-document term grouping happens row-locally inside the
  *    native kernel, so the plan goes straight from the scan to
  *    (term, df) rows through one map-side-combined vocabulary
  *    aggregation). The model table is vocabulary-sized and stays
  *    DISTRIBUTED ([[Artifacts.save]] — ~1e8 term types on a web corpus
  *    must never funnel through the driver).
  *  - '''scoring''' never touches the vocabulary: the driver collects the
  *    ≤|query| idf rows (bounded by the QUERY, not the corpus) and one
  *    stats row, folds them into a [[graft.functions.Bm25Score]] flat
  *    reference object, and the scan scores each document in ONE byte
  *    pass — no explode, no tf aggregation, no term join, no exchange.
  *    Stateless per-row work, so the same code path runs over a
  *    Structured Streaming source unchanged.
  *  - '''top-k''' is `ORDER BY … LIMIT n` — Spark plans
  *    TakeOrderedAndProject (per-partition partial top-k, then one
  *    n-row merge on the driver), never a global sort.
  */
object Bm25 {

  /** Train the term model: `(term, df, idf)` — one row per term TYPE.
    * `n_docs` counts every document (including zero-token ones that never
    * reach the tf frame), riding in from an id-only column-pruned scan as
    * a broadcast scalar. idf is precomputed per TYPE (bit-identical to
    * computing it per occurrence — the
    * [[LanguageModel.trainBigramModel]] argument).
    */
  def trainModel(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val dfreq = docs
      .select(explode(graft.functions.WordCounts.wordCounts(col(textCol))).as("__wc"))
      .select(col("__wc.term").as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
    val nDocs = docs.agg(countDistinct(col(idCol)).as("__n_docs"))
    dfreq.crossJoin(broadcast(nDocs))
      .select(col("term"), col("df"),
        log(lit(1.0) + (col("__n_docs") - col("df") + lit(0.5)) /
          (col("df") + lit(0.5))).as("idf"))
  }

  /** Corpus length stats — ONE scan, one row:
    * `(n_docs, total_tokens, avgdl)` with `avgdl = total_tokens / n_docs`
    * (one IEEE division). The per-document token count folds row-locally
    * over the [[graft.functions.WordCounts]] array, so the scan emits one
    * long per document into a scalar aggregate — no explode.
    */
  def corpusStats(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    // token count via the codegen QualityCounts byte kernel, NOT a
    // higher-order fold over the WordCounts array: HOFs are interpreted
    // (CodegenFallback) — measured 2.04 s vs 0.66 s at 500k docs for this
    // exact aggregate, and 109 s when the same fold sat next to the
    // index explode
    docs.agg(countDistinct(col(idCol)).as("n_docs"),
        sum(dlColumn(col(textCol))).as("total_tokens"))
      .select(col("n_docs"), col("total_tokens"),
        (col("total_tokens").cast("double") / col("n_docs").cast("double"))
          .as("avgdl"))
  }

  /** Document length (token count, the BM25 `|D|`) as a codegen column:
    * the [[graft.functions.QualityCounts]] byte kernel's `n_tokens` field
    * — the same six-whitespace-byte tokenizer as [[graft.functions.WordCounts]],
    * so `dl` ≡ the sum of the word-counts tfs, in one codegen'd scan.
    */
  private def dlColumn(text: Column): Column =
    // the kernel requires a non-empty stopword set; n_tokens is
    // stopword-independent, so any placeholder works
    graft.functions.QualityCounts.qualityCounts(text, Seq("the"))
      .getField("n_tokens").cast("long")

  /** Persist the trained model: the vocabulary-scale term table under
    * `path/terms` (distributed), the one-row stats under `path/stats`.
    */
  def saveModel(terms: DataFrame, stats: DataFrame, path: String): Unit = {
    Artifacts.save(terms, path + "/terms")
    Artifacts.save(stats, path + "/stats")
    // two-part artifact: a top-level completion marker, written only
    // after BOTH children commit, so loaders never read a half-written
    // model (and the load-or-train convention has one path to probe)
    val p = new org.apache.hadoop.fs.Path(path, "_SUCCESS")
    val fs = p.getFileSystem(
      terms.sparkSession.sparkContext.hadoopConfiguration)
    fs.create(p, true).close()
  }

  /** Load a persisted model: `(terms, stats)`. The term table gets the
    * measured size-gated broadcast hint ([[Artifacts.sizedBroadcast]]) for
    * callers that join it wholesale; [[scoreQuery]] itself only ever
    * collects the ≤|query| matching rows.
    */
  def loadModel(spark: SparkSession, path: String): (DataFrame, DataFrame) =
    (Artifacts.sizedBroadcast(spark, path + "/terms",
        spark.read.parquet(path + "/terms")),
      spark.read.parquet(path + "/stats"))

  /** Score every document against `query`: `(<idCol>, dl, score)`,
    * unrounded, one row per non-null-text document. Out-of-vocabulary
    * query terms contribute nothing (they have no trained idf row — the
    * INNER-join contract of every scoring face in this package); a
    * document matching no query term scores 0.0.
    *
    * The ≤|query| idf rows and the single stats row are the only driver
    * collects — bounded by the query, independent of corpus and
    * vocabulary size. Stateless per-row scoring: works unchanged on a
    * streaming `docs`.
    */
  def scoreQuery(docs: DataFrame, textCol: String, idCol: String,
      terms: DataFrame, stats: DataFrame, query: Seq[String],
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(query.nonEmpty, "bm25 query must have at least one term")
    docs.select(col(idCol),
      scoreColumn(col(textCol), terms, stats, query, k1, b).as("__bm"))
      .select(col(idCol), col("__bm.dl").as("dl"), col("__bm.score").as("score"))
  }

  /** The raw scoring column (`struct<dl, score>`) for callers embedding
    * BM25 in a wider projection (the streaming face uses this directly).
    */
  def scoreColumn(text: Column, terms: DataFrame, stats: DataFrame,
      query: Seq[String], k1: Double = 1.2, b: Double = 0.75): Column =
    graft.functions.Bm25Score.bm25Score(text,
      buildQueryModel(terms, stats, query, k1, b))

  /** Collect the bounded query-side model: ≤|query| idf rows + 1 stats
    * row → the kernel's flat reference object.
    */
  def buildQueryModel(terms: DataFrame, stats: DataFrame, query: Seq[String],
      k1: Double, b: Double): graft.functions.Bm25Score.QueryModel = {
    val qterms = query.distinct
    val idfByTerm = terms
      .filter(col("term").isin(qterms: _*))
      .select(col("term"), col("idf"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val statsRow = stats.select(col("avgdl")).collect()
    require(statsRow.nonEmpty && !statsRow(0).isNullAt(0),
      "bm25 corpus stats are empty — train on a non-empty corpus")
    val avgdl = statsRow(0).getDouble(0)
    require(avgdl > 0.0,
      s"bm25 avgdl is $avgdl — the training corpus has no tokens")
    val present = qterms.filter(idfByTerm.contains)
    new graft.functions.Bm25Score.QueryModel(
      present.map(_.getBytes(java.nio.charset.StandardCharsets.UTF_8)).toArray,
      present.map(idfByTerm).toArray, k1, b, avgdl)
  }

  /** Build the inverted-index artifact: one posting row
    * `(<idCol>, term, tf, dl)` per (document, term TYPE) — `dl`
    * denormalized onto every posting (the impact-index trick: scoring
    * needs the document length next to the tf, and a doc-length join at
    * query time would re-touch the corpus). One scan, two codegen byte
    * kernels per row ([[dlColumn]] for the length, WordCounts for the
    * tfs) — measured 109 s → ~35 s at 500k docs vs the interpreted
    * higher-order fold this replaced.
    */
  def buildIndex(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs
      .select(col(idCol), dlColumn(col(textCol)).as("dl"),
        explode(graft.functions.WordCounts.wordCounts(col(textCol))).as("__e"))
      .select(col(idCol), col("__e.term").as("term"), col("__e.tf").as("tf"),
        col("dl"))

  /** Persist the index TERM-CLUSTERED (repartition by term, sort within
    * partitions): every parquet row group then covers a narrow term
    * range, so a query-term `IN` filter prunes to just the touched
    * groups via footer min/max stats — query cost scales with the
    * QUERY's postings, not the corpus. The one-row corpus stats and a
    * completion marker ride along, so the index is a self-contained
    * retrieval artifact.
    */
  def saveIndex(index: DataFrame, stats: DataFrame, path: String): Unit = {
    index.repartition(col("term")).sortWithinPartitions(col("term"))
      .write.mode("overwrite").parquet(path + "/postings")
    Artifacts.save(stats, path + "/stats")
    val p = new org.apache.hadoop.fs.Path(path, "_SUCCESS")
    val fs = p.getFileSystem(
      index.sparkSession.sparkContext.hadoopConfiguration)
    fs.create(p, true).close()
  }

  /** Load a persisted index: `(postings, stats)`. */
  def loadIndex(spark: SparkSession, path: String): (DataFrame, DataFrame) =
    (spark.read.parquet(path + "/postings"),
      spark.read.parquet(path + "/stats"))

  /** Append a document batch to a persisted index — the incremental
    * maintenance face (the pq_encode_incr convention: index once, absorb
    * every later crawl batch without re-touching the old corpus). The
    * design makes this EXACT, not approximate: postings are per-document
    * independent, df/idf derive from the postings at query time, and the
    * corpus stats are a sum — so an appended index answers queries
    * bit-identically to a full rebuild over the union (spec-pinned).
    * New postings land term-clustered among themselves (each batch's
    * files prune independently; re-cluster with a periodic rebuild if
    * batch counts grow large). Caller must ensure the new batch's ids are
    * disjoint from the indexed corpus — appending a duplicate id would
    * double-count its postings.
    */
  def appendToIndex(newDocs: DataFrame, textCol: String, idCol: String,
      path: String): Unit = {
    val spark = newDocs.sparkSession
    val old = spark.read.parquet(path + "/stats").collect()(0)
    val delta = corpusStats(newDocs, textCol, idCol).collect()(0)
    buildIndex(newDocs, textCol, idCol)
      .repartition(col("term")).sortWithinPartitions(col("term"))
      .write.mode("append").parquet(path + "/postings")
    val nDocs = old.getLong(0) + delta.getLong(0)
    val total = old.getLong(1) + delta.getLong(1)
    import spark.implicits._
    // exact-long sums; avgdl recomputed from them, so it equals the
    // full-rebuild division bit-for-bit
    Artifacts.save(Seq((nDocs, total, total.toDouble / nDocs.toDouble))
      .toDF("n_docs", "total_tokens", "avgdl"), path + "/stats")
  }

  /** Positional postings: one row per token OCCURRENCE —
    * `(<idCol>, term, pos, dl)` with `pos` 1-based — the index shape that
    * answers phrase and proximity queries. One tokenizing scan; the
    * token array is referenced by both the posexplode and the length, in
    * separate projections so the split runs once. Persist with
    * [[saveIndex]]'s layout if needed (same term-clustered argument).
    */
  def buildPositionalIndex(docs: DataFrame, textCol: String,
      idCol: String): DataFrame =
    docs
      .select(col(idCol),
        filter(split(col(textCol), "\\s+"), w => length(w) > 0).as("__ws"))
      .select(col(idCol), size(col("__ws")).cast("long").as("dl"),
        posexplode(col("__ws")).as(Seq("__p0", "term")))
      .select(col(idCol), col("term"), (col("__p0") + 1).cast("long").as("pos"),
        col("dl"))

  /** Persist a positional index TERM-CLUSTERED ([[saveIndex]]'s layout
    * argument): row groups cover narrow term ranges, so a query term's
    * equality filter prunes at the parquet footer and search cost scales
    * with the QUERY's postings, not the corpus.
    */
  def savePositionalIndex(posIndex: DataFrame, path: String): Unit =
    posIndex.repartition(col("term")).sortWithinPartitions(col("term"))
      .write.mode("overwrite").parquet(path)

  /** Fold a document batch's postings into a saved positional index —
    * the incremental-maintenance face ([[appendToIndex]]'s convention for
    * the positional shape). EXACT, not approximate: positional postings
    * are per-occurrence rows with no cross-document state (df/idf never
    * enter phrase/proximity answers, and `dl` rides per row), so the
    * appended index answers every query bit-identically to a full rebuild
    * over the union (oracle-pinned by `q_proximity_incr`). The new batch
    * lands term-clustered among itself — each batch's files prune
    * independently; re-cluster with a periodic rebuild if batch counts
    * grow large. Caller must keep batch ids disjoint from the indexed
    * corpus (a duplicate id would double-count its occurrences).
    */
  def appendToPositionalIndex(newDocs: DataFrame, textCol: String,
      idCol: String, path: String): Unit =
    buildPositionalIndex(newDocs, textCol, idCol)
      .repartition(col("term")).sortWithinPartitions(col("term"))
      .write.mode("append").parquet(path)

  /** Exact-phrase occurrence counts from a positional index:
    * `(<idCol>, n_occurrences)` for documents containing the phrase at
    * least once. Each phrase term's postings prune from the index (a
    * pushed `IN` on a saved index), then every term joins on its ANCHOR —
    * `pos − i`, the phrase's start position — so a k-term phrase is k−1
    * equi-joins on (id, anchor) over query-bounded posting sets, and the
    * count of surviving anchors per document IS the occurrence count.
    * Repeated phrase terms (e.g. "fast fast") work unchanged: both
    * position sets come from the same pruned postings, the anchor join
    * demands both offsets exist.
    */
  def phraseOccurrences(posIndex: DataFrame, idCol: String,
      phrase: Seq[String]): DataFrame = {
    require(phrase.length >= 2, s"a phrase needs at least 2 terms: $phrase")
    val parts = phrase.zipWithIndex.map { case (t, i) =>
      posIndex.filter(col("term") === lit(t))
        .select(col(idCol), (col("pos") - lit(i.toLong)).as("__anchor"))
    }
    parts.reduce((a, b) => a.join(b, Seq(idCol, "__anchor")))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_occurrences"))
  }

  /** Proximity (NEAR) occurrences from a positional index:
    * `(<idCol>, n_occurrences)` — position pairs where `second` follows
    * `first` within `window` tokens (`0 < posB − posA ≤ window`;
    * window = 1 degenerates to the two-term phrase). Two query-pruned
    * posting sets meet in ONE doc-id equi-join (never an inequality
    * join — that would plan a nested loop); the window condition is a
    * post-filter whose fan-out is bounded by the two terms' per-document
    * frequencies.
    */
  def proximityOccurrences(posIndex: DataFrame, idCol: String,
      first: String, second: String, window: Int): DataFrame = {
    require(window >= 1, s"window must be >= 1: $window")
    val a = posIndex.filter(col("term") === lit(first))
      .select(col(idCol), col("pos").as("__pa"))
    val b = posIndex.filter(col("term") === lit(second))
      .select(col(idCol), col("pos").as("__pb"))
    a.join(b, Seq(idCol))
      .filter(col("__pb") > col("__pa") &&
        col("__pb") <= col("__pa") + lit(window.toLong))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_occurrences"))
  }

  /** Retrieval through the inverted index — the face whose cost is
    * independent of the corpus scan: the query-term filter reaches the
    * postings scan (PushedFilters + row-group pruning on the
    * term-clustered layout), df/idf derive from the pruned postings
    * themselves (postings per term ARE the document frequency — no model
    * join), and everything downstream aggregates frames bounded by the
    * query's postings. Bit-equal to [[topK]] on the same corpus after the
    * 6-decimal rounding (the two faces sum per-term contributions in
    * different orders; rounding absorbs the last-ulp difference, the same
    * contract the SQL oracle relies on).
    */
  def searchIndex(index: DataFrame, stats: DataFrame, idCol: String,
      query: Seq[String], n: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(query.nonEmpty, "bm25 query must have at least one term")
    require(n > 0, s"searchIndex n must be positive: $n")
    val statsRow = stats.select(col("n_docs"), col("avgdl")).collect()
    require(statsRow.nonEmpty && !statsRow(0).isNullAt(1),
      "bm25 corpus stats are empty — index a non-empty corpus")
    val nDocs = statsRow(0).getLong(0)
    val avgdl = statsRow(0).getDouble(1)
    require(avgdl > 0.0,
      s"bm25 avgdl is $avgdl — the indexed corpus has no tokens")
    val qterms = query.distinct
    val post = index.filter(col("term").isin(qterms: _*))
    val dfreq = post.groupBy(col("term")).agg(count(lit(1)).as("df"))
    // arithmetic shape mirrored verbatim from the Bm25Score kernel (and
    // the SQL oracle): idf · (tf·(k1+1)) / (tf + k1·(1 − b + b·(dl/avgdl)))
    val contrib =
      log(lit(1.0) + (lit(nDocs) - col("df") + lit(0.5)) /
          (col("df") + lit(0.5))) *
        (col("tf") * lit(k1 + 1.0)) /
        (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * (col("dl") / lit(avgdl))))
    post.join(broadcast(dfreq), "term")
      .groupBy(col(idCol))
      .agg(sum(contrib).as("score"), first(col("dl")).as("dl"))
      .filter(col("score") > 0.0)
      .select(col(idCol), col("dl"), round(col("score"), 6).as("score"))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(n)
  }

  /** Multi-query retrieval through the index — the evaluation-harness
    * shape (a TABLE of queries against the corpus, e.g. a relevance test
    * set): `queries` is one row per (query, term). Returns
    * `(<queryIdCol>, <idCol>, dl, score, rank)`, the per-query top `n` by
    * (rounded score desc, doc id asc).
    *
    * Scale shape: the postings prune by an equi-join with the DISTINCT
    * query-term set (each surviving posting appears ONCE, so the df
    * derived from it stays per-term exact even when queries share terms);
    * per-posting contributions attach to queries by one term join; the
    * per-(query, doc) sum and the per-query rank window are both keyed by
    * query — nothing global. The rank predicate stays on the raw
    * `row_number` so Spark plans WindowGroupLimit (partial top-n BEFORE
    * the query-key exchange).
    */
  def searchMany(index: DataFrame, stats: DataFrame, idCol: String,
      queries: DataFrame, queryIdCol: String, termCol: String, n: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(n > 0, s"searchMany n must be positive: $n")
    val statsRow = stats.select(col("n_docs"), col("avgdl")).collect()
    require(statsRow.nonEmpty && !statsRow(0).isNullAt(1),
      "bm25 corpus stats are empty — index a non-empty corpus")
    val nDocs = statsRow(0).getLong(0)
    val avgdl = statsRow(0).getDouble(1)
    require(avgdl > 0.0,
      s"bm25 avgdl is $avgdl — the indexed corpus has no tokens")
    val qterms = queries.select(col(termCol).as("term")).distinct()
    val pruned = index.join(qterms, "term")
    val dfreq = pruned.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val contrib =
      log(lit(1.0) + (lit(nDocs) - col("df") + lit(0.5)) /
          (col("df") + lit(0.5))) *
        (col("tf") * lit(k1 + 1.0)) /
        (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * (col("dl") / lit(avgdl))))
    val scored = pruned.join(broadcast(dfreq), "term")
      .withColumn("__contrib", contrib)
      // distinct mirrors the single-query face's query.distinct — a
      // duplicated (query, term) row must not double its contribution
      .join(queries.select(col(queryIdCol), col(termCol).as("term")).distinct(),
        "term")
      .groupBy(col(queryIdCol), col(idCol))
      .agg(sum(col("__contrib")).as("__score"), first(col("dl")).as("dl"))
      .filter(col("__score") > 0.0)
      .withColumn("score", round(col("__score"), 6))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(queryIdCol))
      .orderBy(col("score").desc, col(idCol).asc)
    scored.withColumn("__rank", row_number().over(w))
      .filter(col("__rank") <= n)
      .select(col(queryIdCol), col(idCol), col("dl"), col("score"),
        col("__rank").cast("long").as("rank"))
  }

  /** Retrieval face: the `n` best-scoring documents for `query`, rounded
    * to 6 decimals and totally ordered (score desc, id asc) — the order
    * and the cut are deterministic and engine-independent. Plans as
    * TakeOrderedAndProject over the narrow scoring scan.
    */
  def topK(docs: DataFrame, textCol: String, idCol: String,
      terms: DataFrame, stats: DataFrame, query: Seq[String], n: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(n > 0, s"topK n must be positive: $n")
    scoreQuery(docs, textCol, idCol, terms, stats, query, k1, b)
      .filter(col("score") > 0.0)
      .select(col(idCol), col("dl"), round(col("score"), 6).as("score"))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(n)
  }
}
