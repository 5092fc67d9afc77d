package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class Bm25Spec extends SparkTestBase {

  import testImplicits._
  private lazy val testImplicits = spark.implicits

  private val corpus = Seq(
    (0L, "spark merge spark table window"),
    (1L, "vector vector vector"),
    (2L, "the quick brown fox"),
    (3L, "spark"),
    (4L, ""), // zero tokens
    (5L, "window merge window merge window spark table scan row value"))

  private def docs = corpus.toDF("doc_id", "text")

  /** Brute-force BM25 over the same corpus — independent arithmetic. */
  private def brute(query: Seq[String], k1: Double = 1.2, b: Double = 0.75)
      : Map[Long, (Long, Double)] = {
    val toks = corpus.map { case (id, t) =>
      id -> t.split("\\s+").filter(_.nonEmpty).toSeq }.toMap
    val n = corpus.length.toLong
    val dfOf = toks.values.flatMap(_.distinct).groupBy(identity)
      .map { case (t, xs) => t -> xs.size.toLong }
    val total = toks.values.map(_.length.toLong).sum
    val avgdl = total.toDouble / n.toDouble
    toks.map { case (id, ws) =>
      val dl = ws.length.toLong
      val score =
        if (dl == 0) 0.0
        else {
          val norm = k1 * (1.0 - b + b * (dl.toDouble / avgdl))
          query.distinct.filter(dfOf.contains).map { t =>
            val tf = ws.count(_ == t).toLong
            if (tf == 0) 0.0
            else math.log(1.0 + (n - dfOf(t) + 0.5) / (dfOf(t) + 0.5)) *
              (tf.toDouble * (k1 + 1.0)) / (tf.toDouble + norm)
          }.sum
        }
      id -> (dl, score)
    }
  }

  private def trained = {
    val d = docs
    (Bm25.trainModel(d, "text", "doc_id"), Bm25.corpusStats(d, "text", "doc_id"))
  }

  test("scoreQuery matches an independent brute-force BM25 bit-for-bit") {
    val (terms, stats) = trained
    val query = Seq("spark", "window", "vector")
    val got = Bm25.scoreQuery(docs, "text", "doc_id", terms, stats, query)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val want = brute(query)
    assert(got.keySet === want.keySet)
    for ((id, (dl, s)) <- want) {
      assert(got(id)._1 === dl, s"dl for doc $id")
      assert(got(id)._2 === s, s"score for doc $id") // exact: same op sequence
    }
  }

  test("corpus stats: n_docs counts zero-token docs; avgdl is total/n") {
    val (_, stats) = trained
    val r = stats.collect()(0)
    assert(r.getLong(0) === 6L)
    val total = corpus.map(_._2.split("\\s+").count(_.nonEmpty)).sum.toLong
    assert(r.getLong(1) === total)
    assert(r.getDouble(2) === total.toDouble / 6.0)
  }

  test("out-of-vocabulary query terms contribute nothing") {
    val (terms, stats) = trained
    val base = Bm25.scoreQuery(docs, "text", "doc_id", terms, stats, Seq("spark"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val oov = Bm25.scoreQuery(docs, "text", "doc_id", terms, stats,
        Seq("spark", "zzz_never_seen"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(oov === base)
  }

  test("zero-token and non-matching docs score 0.0; null text scores null") {
    val (terms, stats) = trained
    val withNull = docs.unionByName(
      Seq((9L, null.asInstanceOf[String])).toDF("doc_id", "text"))
    val rows = Bm25.scoreQuery(withNull, "text", "doc_id", terms, stats,
        Seq("spark")).collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(rows(4L) === Some(0.0)) // zero tokens
    assert(rows(2L) === Some(0.0)) // no query term
    assert(rows(9L) === None)      // null text propagates
  }

  test("topK is totally ordered, positive-only, and cut at n") {
    val (terms, stats) = trained
    val top = Bm25.topK(docs, "text", "doc_id", terms, stats,
      Seq("spark", "window", "vector"), n = 3).collect()
    assert(top.length === 3)
    val scores = top.map(_.getDouble(2))
    assert(scores.forall(_ > 0.0) || scores.forall(_ >= 0.0))
    assert(scores.sameElements(scores.sortBy(-_)))
    // ties (if any) broken by ascending id
    val pairs = top.map(r => (r.getDouble(2), r.getLong(0)))
    assert(pairs.sameElements(pairs.sortBy { case (s, id) => (-s, id) }))
  }

  test("save/load roundtrip scores identically to the in-memory model") {
    val (terms, stats) = trained
    val dir = java.nio.file.Files.createTempDirectory("bm25_model").toString
    Bm25.saveModel(terms, stats, dir)
    assert(new java.io.File(dir, "_SUCCESS").exists(), "completion marker")
    val (lt, ls) = Bm25.loadModel(spark, dir)
    val q = Seq("spark", "merge")
    val a = Bm25.scoreQuery(docs, "text", "doc_id", terms, stats, q)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    val b = Bm25.scoreQuery(docs, "text", "doc_id", lt, ls, q)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    assert(a.sameElements(b))
  }

  test("scoring plan is narrow: no exchange, no join, one kernel per row") {
    val (terms, stats) = trained
    // a local Seq corpus constant-folds to LocalTableScan (the kernel
    // would run at plan time) — score a parquet-backed frame instead
    val dir = java.nio.file.Files.createTempDirectory("bm25_docs").toString
    docs.write.mode("overwrite").parquet(dir)
    val plan = Bm25.scoreQuery(spark.read.parquet(dir), "text", "doc_id",
      terms, stats, Seq("spark")).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"scoring must not shuffle:\n$plan")
    assert(!plan.contains("Join"), s"scoring must not join:\n$plan")
    assert(plan.toLowerCase.contains("bm25"), s"kernel missing from plan:\n$plan")
  }

  test("index face: searchIndex equals the kernel-scan topK after rounding") {
    val (terms, stats) = trained
    val q = Seq("spark", "window", "vector", "merge")
    val viaScan = Bm25.topK(docs, "text", "doc_id", terms, stats, q, n = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    val index = Bm25.buildIndex(docs, "text", "doc_id")
    val viaIndex = Bm25.searchIndex(index, stats, "doc_id", q, n = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    assert(viaIndex.sameElements(viaScan))
  }

  test("index build: postings carry denormalized dl; one row per (doc, term type)") {
    val index = Bm25.buildIndex(docs, "text", "doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // doc 0: "spark merge spark table window" → 4 types, dl 5, tf(spark)=2
    val d0 = index.filter(_._1 == 0L)
    assert(d0.length === 4)
    assert(d0.forall(_._4 == 5L))
    assert(d0.find(_._2 == "spark").get._3 === 2L)
    // zero-token doc 4 contributes no postings
    assert(!index.exists(_._1 == 4L))
  }

  test("saved index prunes by query term: the IN filter reaches the scan") {
    val dir = java.nio.file.Files.createTempDirectory("bm25_index").toString
    Bm25.saveIndex(Bm25.buildIndex(docs, "text", "doc_id"),
      Bm25.corpusStats(docs, "text", "doc_id"), dir)
    assert(new java.io.File(dir, "_SUCCESS").exists(), "completion marker")
    val (postings, stats) = Bm25.loadIndex(spark, dir)
    val q = Seq("spark", "window")
    val plan = Bm25.searchIndex(postings, stats, "doc_id", q, n = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("In(term"),
      s"query-term filter must reach the postings scan:\n$plan")
    val got = Bm25.searchIndex(postings, stats, "doc_id", q, n = 5)
      .collect().map(_.getLong(0)).toSet
    val want = Bm25.topK(docs, "text", "doc_id",
        Bm25.trainModel(docs, "text", "doc_id"), stats, q, n = 5)
      .collect().map(_.getLong(0)).toSet
    assert(got === want)
  }

  test("searchMany: per-query top-n equals per-query searchIndex; shared terms keep df exact") {
    val (_, stats) = trained
    val index = Bm25.buildIndex(docs, "text", "doc_id")
    // q_a and q_b SHARE the term "spark" — df must not double-count
    val queries = Seq(
      ("q_a", "spark"), ("q_a", "merge"),
      ("q_a", "spark"), // duplicated row must not double its contribution
      ("q_b", "spark"), ("q_b", "vector"),
      ("q_c", "zzz_never_seen")).toDF("query_id", "term")
    val many = Bm25.searchMany(index, stats, "doc_id", queries,
        "query_id", "term", n = 3)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getLong(4)))
    assert(!many.exists(_._1 == "q_c"), "no-match query must be absent")
    for ((qid, terms) <- Seq("q_a" -> Seq("spark", "merge"),
                             "q_b" -> Seq("spark", "vector"))) {
      val single = Bm25.searchIndex(index, stats, "doc_id", terms, n = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .sortBy(_._1)
      val got = many.filter(_._1 == qid).map(t => (t._2, t._3, t._4)).sortBy(_._1)
      assert(got.sameElements(single), s"per-query slice for $qid")
    }
    // ranks are 1..k dense per query in (score desc, id) order
    val ranks = many.filter(_._1 == "q_a").sortBy(_._5)
    assert(ranks.map(_._5).sameElements(1L to ranks.length))
  }

  test("appendToIndex: incremental index answers bit-identically to a full rebuild") {
    val full = java.nio.file.Files.createTempDirectory("bm25_full").toString
    val incr = java.nio.file.Files.createTempDirectory("bm25_incr").toString
    val even = docs.filter(col("doc_id") % 2 === 0)
    val odd  = docs.filter(col("doc_id") % 2 === 1)
    Bm25.saveIndex(Bm25.buildIndex(docs, "text", "doc_id"),
      Bm25.corpusStats(docs, "text", "doc_id"), full)
    Bm25.saveIndex(Bm25.buildIndex(even, "text", "doc_id"),
      Bm25.corpusStats(even, "text", "doc_id"), incr)
    Bm25.appendToIndex(odd, "text", "doc_id", incr)
    val (fp, fs) = Bm25.loadIndex(spark, full)
    val (ip, is) = Bm25.loadIndex(spark, incr)
    // stats identical (exact long sums; avgdl the same division)
    assert(is.collect()(0).toSeq === fs.collect()(0).toSeq)
    val q = Seq("spark", "window", "merge")
    val a = Bm25.searchIndex(fp, fs, "doc_id", q, n = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    val b = Bm25.searchIndex(ip, is, "doc_id", q, n = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    assert(a.sameElements(b))
  }

  test("phrase search: anchor join counts exact occurrences, incl. repeated and 3-term phrases") {
    val corpus2 = Seq(
      (0L, "a b a b a"),     // "a b": 2; "b a": 2; "a b a": 2; "a a": 0
      (1L, "x x x"),         // "x x": 2 (overlapping occurrences both count)
      (2L, "a b"),           // "a b": 1
      (3L, "b a b"),         // "a b": 1
      (4L, ""))
    val idx = Bm25.buildPositionalIndex(corpus2.toDF("doc_id", "text"),
      "text", "doc_id")
    def occ(phrase: Seq[String]): Map[Long, Long] =
      Bm25.phraseOccurrences(idx, "doc_id", phrase)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(occ(Seq("a", "b")) === Map(0L -> 2L, 2L -> 1L, 3L -> 1L))
    assert(occ(Seq("x", "x")) === Map(1L -> 2L))
    assert(occ(Seq("a", "b", "a")) === Map(0L -> 2L))
    assert(occ(Seq("a", "a")) === Map.empty)
  }

  test("proximity: ordered within-window pairs; window=1 degenerates to the phrase") {
    val idx = Bm25.buildPositionalIndex(Seq(
      (0L, "a x x b a b"),   // (a,b) pairs within 3: a@1→b@4; a@5→b@6 → 2
      (1L, "b a"),           // b BEFORE a only — ordered, so no hit
      (2L, "a b")).toDF("doc_id", "text"), "text", "doc_id")
    def prox(w: Int): Map[Long, Long] =
      Bm25.proximityOccurrences(idx, "doc_id", "a", "b", w)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(prox(3) === Map(0L -> 2L, 2L -> 1L))
    assert(prox(5) === Map(0L -> 3L, 2L -> 1L)) // adds a@1→b@6
    val phrase = Bm25.phraseOccurrences(idx, "doc_id", Seq("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(prox(1) === phrase)
  }

  test("positional index: 1-based positions, dl on every posting, empty docs absent") {
    val idx = Bm25.buildPositionalIndex(
        Seq((7L, "p q p"), (8L, "")).toDF("doc_id", "text"), "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(idx.toSet === Set(
      (7L, "p", 1L, 3L), (7L, "q", 2L, 3L), (7L, "p", 3L, 3L)))
  }

  test("streaming face: the same scorer over a stream matches the batch run") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val (terms, stats) = trained
    val mem = MemoryStream[(Long, String)]
    val scored = Bm25.scoreQuery(
      mem.toDF().toDF("doc_id", "text"), "text", "doc_id",
      terms, stats, Seq("spark", "window"))
    val q = scored.writeStream.format("memory")
      .queryName("bm25_stream").outputMode("append").start()
    try {
      mem.addData(corpus.take(3): _*)
      q.processAllAvailable()
      mem.addData(corpus.drop(3): _*)
      q.processAllAvailable()
      val streamed = spark.table("bm25_stream").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
      val batch = Bm25.scoreQuery(docs, "text", "doc_id", terms, stats,
          Seq("spark", "window")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
      assert(streamed.sameElements(batch))
    } finally q.stop()
  }
}
