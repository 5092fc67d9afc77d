package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Hand-computed cases for the round-8 curation additions: directed
  * containment, n-gram novelty, and URL canonicalization.
  */
class CurationR8Spec extends SparkTestBase {

  import spark.implicits._

  test("containmentPairs: short doc inside long doc is directed, not mutual") {
    val docs = Seq(
      (1L, "a b c d"),                // trigrams: {a b c, b c d}
      (2L, "a b c d e f g h"),        // contains all of doc 1's trigrams
      (3L, "x y z q r s")             // unrelated
    ).toDF("doc_id", "text")
    val out = Dedup.containmentPairs(docs, "text", "doc_id",
      n = 3, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(out === Seq((1L, 2L, 1.0)), s"got $out")
    // jaccard would miss it: 2 shared / (2 + 6 - 2) = 0.33
  }

  test("containmentPairs: identical docs contain each other both ways") {
    val docs = Seq((1L, "a b c d"), (5L, "a b c d")).toDF("doc_id", "text")
    val out = Dedup.containmentPairs(docs, "text", "doc_id",
      n = 3, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(out === Set((1L, 5L, 1.0), (5L, 1L, 1.0)))
  }

  test("ngramNovelty: fresh 1.0, verbatim copy 0.0, half-new in between") {
    val docs = Seq(
      (1L, "a b c d e"),      // 3 trigrams, all first here -> 1.0
      (2L, "a b c d e"),      // all seen in doc 1 -> 0.0
      (3L, "a b c p q r")     // {a b c} old; {b c p, c p q, p q r} new -> 3/4
    ).toDF("doc_id", "text")
    val out = TextAnalysis.ngramNovelty(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3))).toMap
    assert(out(1L) === ((3L, 3L, 1.0)))
    assert(out(2L) === ((3L, 0L, 0.0)))
    assert(out(3L) === ((4L, 3L, 0.75)))
  }

  test("ngramNovelty: docs under n words drop out") {
    val docs = Seq((1L, "a b"), (2L, "a b c")).toDF("doc_id", "text")
    val ids = TextAnalysis.ngramNovelty(docs, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(ids === Set(2L))
  }

  test("normalizedForDedup: case/punct/whitespace variants share one form") {
    val out = Seq(
      ("Hello,  World!", "hello world"),
      ("hello world", "hello world"),
      ("  HELLO---WORLD  ", "hello world"),
      ("a1 b2", "a1 b2")
    ).toDF("t", "want")
      .withColumn("got", TextAnalysis.normalizedForDedup($"t")).collect()
    out.foreach { r =>
      assert(r.getAs[String]("got") === r.getAs[String]("want"),
        s"normalize(${r.getAs[String]("t")})")
    }
  }

  test("snapshotDiff: added/removed/changed/same per id from digest compare") {
    val before = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text")
    val after  = Seq((2L, "b"), (3L, "C2"), (4L, "d")).toDF("doc_id", "text")
    val m = Dedup.snapshotDiff(before, after, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(m === Map(1L -> "removed", 2L -> "same", 3L -> "changed", 4L -> "added"))
  }

  test("NormalizeForDedup kernel == declarative regex composition (ASCII + Unicode)") {
    val rnd = new scala.util.Random(7L)
    val alphabet = "abXY 09!,.\t\n-_&é漢K"
    val cases = Seq("", " ", "!!!", "  a  ", "A.b,C", "KELVIN",
      "é é", "a\tb\nc") ++
      Seq.fill(300)((0 until rnd.nextInt(40))
        .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    val df = cases.toDF("t")
    val declarative = trim(regexp_replace(
      regexp_replace(lower($"t"), "[^a-z0-9\\s]+", " "), "\\s+", " "))
    val rows = df.select($"t",
      TextAnalysis.normalizedForDedup($"t").as("k"),
      declarative.as("d")).collect()
    rows.foreach { r =>
      assert(r.getString(1) == r.getString(2),
        s"kernel '${r.getString(1)}' != declarative '${r.getString(2)}' for input '${r.getString(0)}'")
    }
  }

  test("jsDriftAgainstPrior: identical dist ~0, disjoint vocab = ln 2") {
    val prior = Profiler.termCounts(
      Seq((1L, "a b c a")).toDF("id", "text"), "text")
    val fresh = Seq(
      ("same", "a b c a"),       // identical distribution -> 0
      ("new", "x y z x")         // fully disjoint -> ln 2
    ).toDF("grp", "text")
    val out = Profiler.jsDriftAgainstPrior(fresh, "text", "grp", prior)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(out("same") === 0.0)
    assert(math.abs(out("new") - math.log(2.0)) < 1e-6, s"disjoint: ${out("new")}")
  }

  test("jsDriftAgainstPrior: hand-computed mixed-support value") {
    // prior: a:3, b:1 (T=4 -> q_a=.75, q_b=.25); batch grp: a:1, x:1
    // (G=2 -> p_a=.5, p_x=.5). m_a=.625;
    // js = [ .5 ln(.5/.625) + .75 ln(.75/.625)   (a, both)
    //      + .5 ln2                              (x, batch-only)
    //      + ln2 (1 - .75) ] / 2
    val prior = Profiler.termCounts(Seq((1L, "a a a b")).toDF("id", "text"), "text")
    val fresh = Seq(("g", "a x")).toDF("grp", "text")
    val got = Profiler.jsDriftAgainstPrior(fresh, "text", "grp", prior)
      .head().getDouble(2)
    val want = (0.5 * math.log(0.5 / 0.625) + 0.75 * math.log(0.75 / 0.625) +
      0.5 * math.log(2.0) + math.log(2.0) * 0.25) / 2.0
    assert(math.abs(got - want) < 1e-6, s"$got vs $want")
  }

  test("canonicalUrl: tracking params out, rest sorted, host lowered, slash trimmed") {
    val cases = Seq(
      ("https://WWW.Shop.Example.com/Item/7?utm_source=m&ref=x&page=2#frag",
       "https://www.shop.example.com/Item/7?page=2"),   // path case KEPT
      ("https://www.shop.example.com/Item/7?page=2",
       "https://www.shop.example.com/Item/7?page=2"),   // same canonical as above
      ("http://a.example.org/post/3/", "http://a.example.org/post/3"),
      ("https://X.com/?utm_campaign=z", "https://x.com"),
      ("https://x.com/p?b=2&a=1", "https://x.com/p?a=1&b=2") // params sorted
    ).toDF("url", "want")
    val out = cases.withColumn("got", TextAnalysis.canonicalUrl($"url"))
      .collect()
    out.foreach { r =>
      assert(r.getAs[String]("got") === r.getAs[String]("want"),
        s"canonicalUrl(${r.getAs[String]("url")})")
    }
  }

  test("lineDedup: corpus-repeated lines drop, order survives, empty docs stay") {
    // "BOILER" appears 3 times (> maxCount=2) -> dropped everywhere;
    // "twice" appears twice (== maxCount) -> kept
    val docs = Seq(
      (1L, "alpha\nBOILER\nbeta"),
      (2L, "BOILER\ntwice\ngamma"),
      (3L, "twice\nBOILER"),
      (4L, "solo")).toDF("id", "t")
    val out = TextAnalysis.lineDedup(docs, "t", "id", maxCount = 2)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(out(1L) === ((3L, 2L, "alpha\nbeta")))
    assert(out(2L) === ((3L, 2L, "twice\ngamma")))
    assert(out(3L) === ((2L, 1L, "twice")))
    assert(out(4L) === ((1L, 1L, "solo")))
    // a doc whose every line is boilerplate keeps an EMPTY rewrite, not a
    // missing row
    val all = Seq((1L, "B"), (2L, "B"), (3L, "B"), (4L, "B\nx"))
      .toDF("id", "t")
    val gone = TextAnalysis.lineDedup(all, "t", "id", maxCount = 2)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(gone(1L) === "" && gone(4L) === "x")
    intercept[IllegalArgumentException] {
      TextAnalysis.lineDedup(docs, "t", "id", maxCount = 0)
    }
  }

  test("lineDedupAgainstPrior: batch rewrite equals rebuild over the union") {
    val prior = Seq(
      (10L, "B\nold1"), (11L, "B\nold2"), (12L, "P\nP2")).toDF("id", "t")
    val batch = Seq(
      (1L, "B\nfresh"),      // B: 2 prior + 1 batch = 3 > 2 -> dropped
      (2L, "P\nnew\nnew2"),  // P: 1 prior + 1 batch = 2 == max -> kept
      (3L, "C\nC\nC")).toDF("id", "t") // C: 3 in batch alone -> dropped
    val incr = TextAnalysis.lineDedupAgainstPrior(batch, "t", "id",
        prior = TextAnalysis.lineCounts(prior, "t"), maxCount = 2)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(incr(1L) === ((2L, 1L, "fresh")))
    assert(incr(2L) === ((3L, 3L, "P\nnew\nnew2")))
    assert(incr(3L) === ((3L, 0L, "")))
    // exactness: identical to the batch operator over prior ∪ batch,
    // restricted to batch ids
    val rebuilt = TextAnalysis.lineDedup(prior.unionAll(batch), "t", "id",
        maxCount = 2)
      .filter($"id" < 10)
      .select($"id", $"n_lines", $"n_kept", $"text_kept")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(incr === rebuilt)
  }
}
