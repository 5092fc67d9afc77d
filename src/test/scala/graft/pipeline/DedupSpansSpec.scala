package graft.pipeline

import graft.SparkTestBase

/** [[Dedup.sharedSpans]] — positional shingle matching + islands runs. */
class DedupSpansSpec extends SparkTestBase {

  import spark.implicits._

  private def spans(docs: Seq[(Long, String)], pairs: Seq[(Long, Long)], n: Int) =
    Dedup.sharedSpans(docs.toDF("doc_id", "text"), "text", "doc_id",
        pairs.toDF("id_a", "id_b"), n = n)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap

  test("sharedSpans: contiguous run survives an offset, breaks on an edit") {
    val docs = Seq(
      1L -> "a b c d e x y",   // 2-gram positions 0..5
      2L -> "z a b c d e w",   // same 4-shingle run shifted by one
      3L -> "a b q c d")       // two isolated matches vs doc 1
    val out = spans(docs, Seq((1L, 2L), (1L, 3L)), n = 2)
    // doc1-doc2: "a b","b c","c d","d e" all on diagonal -1, consecutive
    assert(out((1L, 2L)) == ((4L, 4L)))
    // doc1-doc3: "a b" and "c d" on different diagonals -> two runs of 1
    assert(out((1L, 3L)) == ((2L, 1L)))
  }

  test("sharedSpans: repeated shingles produce per-diagonal runs, not chaos") {
    // d4 shingles: "a b","b a","a b","b a","a b" (pos 0..4)
    // d5 shingles: "a b","b a","a b" (pos 0..2)
    // diag 0 -> pos_a {0,1,2} (run 3); diag 2 -> pos_a {2,3,4} (run 3);
    // diag -2 -> {0}; diag 4 -> {4}; total 8 matches, longest 3
    val docs = Seq(4L -> "a b a b a b", 5L -> "a b a b")
    val out = spans(docs, Seq((4L, 5L)), n = 2)
    assert(out((4L, 5L)) == ((8L, 3L)))
  }

  test("sharedSpans: pairs with no shared shingle drop out") {
    val docs = Seq(6L -> "p q r s", 7L -> "t u v w")
    assert(spans(docs, Seq((6L, 7L)), n = 2).isEmpty)
  }
}
