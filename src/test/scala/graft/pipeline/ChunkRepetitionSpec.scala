package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Closed-form specs for the chunking / decontamination / repetition
  * operators (the round-4 additions now wired into the verified surface).
  */
class ChunkRepetitionSpec extends SparkTestBase {

  import spark.implicits._

  test("chunk: window starts, tail keeping, overlap content, empty docs") {
    // 10 tokens w0..w9, chunk=4, stride=3 -> starts 0,3,6,9:
    //   [w0..w3] [w3..w6] [w6..w9] [w9]   (last is the kept short tail)
    val docs = Seq(
      (1L, (0 until 10).map(i => s"w$i").mkString(" ")),
      (2L, "a b"),        // 2 tokens, one short chunk
      (3L, "   "),        // whitespace only -> zero tokens -> no chunks
      (4L, "solo")
    ).toDF("doc_id", "text")

    val out = Chunking.chunk(docs, "text", "doc_id", chunkTokens = 4, strideTokens = 3)
      .orderBy("doc_id", "chunk_idx")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))

    assert(out.toSeq == Seq(
      (1L, 0L, 4L, "w0 w1 w2 w3"),
      (1L, 1L, 4L, "w3 w4 w5 w6"),
      (1L, 2L, 4L, "w6 w7 w8 w9"),
      (1L, 3L, 1L, "w9"),
      (2L, 0L, 2L, "a b"),
      (4L, 0L, 1L, "solo")))
  }

  test("chunk: stride == chunk gives a disjoint exact partition of the tokens") {
    val text = (0 until 9).map(i => s"t$i").mkString(" ")
    val out = Chunking.chunk(Seq((7L, text)).toDF("doc_id", "text"),
      "text", "doc_id", chunkTokens = 3, strideTokens = 3)
      .orderBy("chunk_idx").collect()
    assert(out.map(_.getString(3)).toSeq ==
      Seq("t0 t1 t2", "t3 t4 t5", "t6 t7 t8"))
    assert(out.map(_.getLong(2)).sum == 9L) // no token lost or duplicated
  }

  test("chunk rejects non-positive sizes") {
    val df = Seq((1L, "a")).toDF("doc_id", "text")
    intercept[IllegalArgumentException](Chunking.chunk(df, "text", "doc_id", 0, 1))
    intercept[IllegalArgumentException](Chunking.chunk(df, "text", "doc_id", 4, 0))
  }

  test("contaminationPairs finds planted overlaps and nothing else") {
    // bench doc B shares exactly the trigrams of "leaked secret eval prompt
    // here" with corpus doc 10 (planted) and nothing with doc 11.
    val corpus = Seq(
      (10L, "intro text then leaked secret eval prompt here and more words"),
      (11L, "completely unrelated corpus document about spark internals"),
      (12L, "leaked secret eval prompt here") // exact eval fragment
    ).toDF("doc_id", "text")
    val bench = Seq((900L, "leaked secret eval prompt here"))
      .toDF("bench_id", "text")

    val pairs = Dedup.contaminationPairs(corpus, bench, "text", "doc_id",
      "bench_id", n = 3, minShared = 3L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // "leaked secret eval prompt here" has 3 trigrams; both carriers share all 3.
    assert(pairs == Set((10L, 900L, 3L), (12L, 900L, 3L)))

    // minShared above the overlap silences both.
    val none = Dedup.contaminationPairs(corpus, bench, "text", "doc_id",
      "bench_id", n = 3, minShared = 4L).count()
    assert(none == 0L)
  }

  test("contaminationPairs dedups repeated shingles per document") {
    // the corpus doc repeats the leaked trigram 3 times; distinct-per-doc
    // postings must count it ONCE, not fan out to 3
    val corpus = Seq(
      (1L, "x y z x y z x y z")
    ).toDF("doc_id", "text")
    val bench = Seq((9L, "x y z")).toDF("bench_id", "text")
    val out = Dedup.contaminationPairs(corpus, bench, "text", "doc_id",
      "bench_id", n = 3, minShared = 1L).collect()
    assert(out.length == 1)
    assert(out.head.getLong(2) == 1L) // "x y z" counted once
  }

  test("clusters: transitive chains fold to the smallest reachable id") {
    // components: {1,2,3} via 1-2, 2-3; {7,9}; 100 pairs nothing
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 9L)).toDF("id_a", "id_b")
    val out = Dedup.clusters(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 9L -> 7L))
  }

  test("clusters: deep path converges (diameter bound, not one round)") {
    // a 12-node path, worst case for hash-min: the min label must walk the
    // whole chain, one hop per round. unionFindNodeLimit = 0 pins the
    // label-propagation LOOP (the beyond-gate path) — the default would
    // take the one-pass union-find and never exercise the rounds.
    val pairs = (0L until 11L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val out = Dedup.clusters(pairs, unionFindNodeLimit = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.length == 12)
    assert(out.forall(_._2 == 0L), s"chain not folded: ${out.toSeq.sorted}")
  }

  test("clusters: empty pair set yields empty labels, no convergence error") {
    val pairs = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(Dedup.clusters(pairs).count() == 0L)
  }

  test("clusters: pointer jumping folds a 64-node chain within O(log n) rounds") {
    // worst-case depth: a length-64 path. Plain 1-hop hash-min needs 63
    // rounds — far past maxIters = 10 — so this converging proves the
    // jump step is actually halving distance-to-root each round
    // (~log2(64) + slack), not just that the answer is right.
    val pairs = (0L until 63L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val out = Dedup.clusters(pairs, maxIters = 10, unionFindNodeLimit = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.length == 64)
    assert(out.forall(_._2 == 0L), s"chain not folded: ${out.toSeq.sorted.take(8)}")
  }

  test("clusters matches brute-force union-find on randomized graphs") {
    val rnd = new scala.util.Random(20260812L)
    for (trial <- 0 until 5) {
      val nNodes = 30 + rnd.nextInt(40)
      val nEdges = 10 + rnd.nextInt(50)
      val pairs = Seq.fill(nEdges) {
        val a = rnd.nextInt(nNodes).toLong
        val b = rnd.nextInt(nNodes).toLong
        (math.min(a, b), math.max(a, b))
      }.filter(p => p._1 != p._2).distinct

      // driver-side union-find ground truth
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      pairs.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = pairs.flatMap(p => Seq(p._1, p._2)).distinct
        .map(x => x -> find(x)).toMap

      // default gate (one-pass union-find) and forced loop must BOTH
      // match ground truth: the size gate may never change the answer
      val got = Dedup.clusters(pairs.toDF("id_a", "id_b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected, s"trial $trial: $got vs $expected")
      val gotLoop = Dedup.clusters(pairs.toDF("id_a", "id_b"), unionFindNodeLimit = 0)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(gotLoop == expected, s"trial $trial (loop): $gotLoop vs $expected")
    }
  }

  test("dedupByClusters keeps one representative per cluster plus singletons") {
    val docs = Seq(1L, 2L, 3L, 7L, 9L, 42L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 9L)).toDF("id_a", "id_b")
    val kept = Dedup.dedupByClusters(docs, pairs, "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(kept == Seq(1L, 7L, 42L))
  }

  test("repetitionStats: hand-computed fractions") {
    // doc 1: "a a a b" -> n=4, distinct=2, top=3
    //   trigrams: "a a a","a a b" -> n_tri=2, distinct=2 -> dup_tri=0
    // doc 2: "a b a b a b" -> n=6, distinct=2, top=3
    //   trigrams: aba, bab, aba, bab -> n_tri=4, nd=2 -> dup_tri=0.5
    // doc 3: "x y" -> shorter than 3 words -> dup_trigram_frac = 0.0
    // doc 4: "" -> no words -> NO row
    val docs = Seq(
      (1L, "a a a b"),
      (2L, "a b a b a b"),
      (3L, "x y"),
      (4L, "")
    ).toDF("doc_id", "text")

    val out = TextAnalysis.repetitionStats(docs, "text", "doc_id")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))

    assert(out.toSeq == Seq(
      (1L, 4L, 0.5, 0.75, 0.0),
      (2L, 6L, 4.0 / 6.0, 0.5, 0.5),
      (3L, 2L, 0.0, 0.5, 0.0)))
  }

  test("tfIdfTopK: hand-computed scores and ranks") {
    // n_docs = 3; df: apple 1, banana 2, cherry 2, date 1
    val docs = Seq(
      (1L, "apple banana apple"),
      (2L, "banana cherry"),
      (3L, "cherry cherry cherry date")
    ).toDF("doc_id", "text")

    val out = TextAnalysis.tfIdfTopK(docs, "text", "doc_id", k = 2)
      .orderBy("doc_id", "rank").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getLong(5)))

    assert(out.toSeq == Seq(
      (1L, "apple", 2L, 1L, 6.0, 1L),   // 2 * (3/1)
      (1L, "banana", 1L, 2L, 1.5, 2L),  // 1 * (3/2)
      (2L, "banana", 1L, 2L, 1.5, 1L),  // tie with cherry: term asc
      (2L, "cherry", 1L, 2L, 1.5, 2L),
      (3L, "cherry", 3L, 2L, 4.5, 1L),  // 3 * (3/2)
      (3L, "date", 1L, 1L, 3.0, 2L)))   // 1 * (3/1)
  }

  test("qualityGate: hand-computed scores, floor, and p25 threshold") {
    // en stopword scores: d1 3/8=0.375, d2 0.0, d3 4/7, d5 2/8=0.25;
    // d4 falls to the 5-token floor. p25 over [0, .25, .375, .571429] =
    // 0 + 0.75*(0.25-0) = 0.1875 -> keep d1, d3, d5.
    val docs = Seq(
      (1L, "the cat and the dog runs fast today"),
      (2L, "xyz qwe rty uio asd fgh"),
      (3L, "it is the best of the things"),
      (4L, "a b"),
      (5L, "to be or not to be here now")
    ).toDF("doc_id", "text")

    val out = TextAnalysis.qualityGate(docs, "text", "doc_id",
      minTokens = 5L, p = 0.25)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))

    assert(out.toSeq == Seq(
      (1L, 8L, 0.375),
      (3L, 7L, 0.571429),
      (5L, 8L, 0.25)))
  }

  test("unigramScore: hand-computed mean unigram probabilities") {
    // tf: d1{a:2,b:1} d2{a:1,c:1}; cf: a=3,b=1,c=1; total=5
    // d1: (2*3 + 1*1) / (3*5) = 7/15; d2: (1*3 + 1*1) / (2*5) = 0.4
    val docs = Seq((1L, "a a b"), (2L, "a c")).toDF("doc_id", "text")
    val out = TextAnalysis.unigramScore(docs, "text", "doc_id")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq == Seq((1L, 3L, 7.0 / 15.0), (2L, 2L, 0.4)))
  }
}
