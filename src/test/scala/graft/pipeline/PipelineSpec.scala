package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class PipelineSpec extends SparkTestBase {

  import spark.implicits._

  private def docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "the quick brown fox jumps over the lazy dog"),           // exact dup of 0
    (2L, "the quick brown fox jumps over the lazy cat today"),     // near dup of 0
    (3L, "completely different words about spark and scala code"),
    (4L, "der hund und die katze sind nicht mit der maus")
  ).toDF("doc_id", "text")

  test("exact dedup keeps lowest id per duplicate group") {
    val groups = Dedup.exactGroups(docs, "text", "doc_id").collect()
    assert(groups.length == 4)
    val dupGroup = groups.find(_.getAs[Long]("dup_count") == 2L).get
    assert(dupGroup.getAs[Long]("keep_id") == 0L)
    val kept = Dedup.exact(docs, "text", "doc_id").select("doc_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(kept == Seq(0L, 2L, 3L, 4L))
  }

  test("ngram jaccard finds exact and near duplicates") {
    val pairs = Dedup.jaccardPairs(docs, "text", "doc_id", n = 3, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L))) // identical → jaccard 1.0
    val loose = Dedup.jaccardPairs(docs, "text", "doc_id", n = 3, threshold = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(loose.contains((0L, 2L)) || loose.contains((1L, 2L)))
  }

  test("minhash LSH candidates contain all high-jaccard pairs") {
    val exact = Dedup.jaccardPairs(docs, "text", "doc_id", n = 2, threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashLshPairs(docs, "text", "doc_id", n = 2,
      bands = 8, rowsPerBand = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.subsetOf(lsh), s"LSH missed ${exact.diff(lsh)}")
  }

  test("simhash: identical docs share signature, different docs don't") {
    val sigs = Dedup.simhashDf(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getDecimal(1)).toMap
    assert(sigs(0L) == sigs(1L))
    assert(sigs(0L) != sigs(3L))
  }

  test("language id picks the dominant stopword language") {
    val out = docs.select(col("doc_id"), TextAnalysis.langId(col("text")).as("lang"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(0L) == "en")
    assert(out(4L) == "de")
  }

  test("token count and quality signals") {
    val sig = docs.filter($"doc_id" === 0L)
      .select(TextAnalysis.qualitySignals($"text").map { case (n, c) => c.as(n) }: _*)
      .first()
    assert(sig.getAs[Long]("n_tokens") == 9L)
    assert(sig.getAs[Long]("n_chars") == 43L)
    assert(sig.getAs[Double]("stopword_ratio") > 0.2)
  }

  test("fingerprint is stable and equal for identical docs") {
    val fps = docs.select(col("doc_id"), TextAnalysis.minFingerprint(col("text")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fps(0L) == fps(1L))
    assert(fps(0L) != fps(3L))
    assert(fps(0L).matches("[0-9a-f]{32}"))
  }

  private def vecs = {
    val rnd = new scala.util.Random(11)
    (0 until 60).map { i =>
      val base = Array.fill(8)(rnd.nextGaussian().toFloat)
      (i.toLong, base)
    }.toDF("vec_id", "embedding")
  }

  test("brute force topk is exact and self-excluding") {
    val out = Similarity.bruteForceTopK(vecs.filter($"vec_id" < 3), vecs,
      "vec_id", "embedding", k = 5)
    val rows = out.collect()
    assert(rows.length == 15)
    assert(rows.forall(r => r.getAs[Long]("query_id") != r.getAs[Long]("neighbor_id")))
    // ranks are 1..5 per query, cosine non-increasing.
    val byQ = rows.groupBy(_.getAs[Long]("query_id"))
    byQ.values.foreach { rs =>
      val sorted = rs.sortBy(_.getAs[Long]("rank"))
      assert(sorted.map(_.getAs[Long]("rank")).toSeq == (1L to 5L))
      val cosines = sorted.map(_.getAs[Double]("cosine")).toSeq
      assert(cosines == cosines.sorted.reverse)
    }
  }

  test("LSH pairs are a subset of exact threshold pairs and find near-identical vectors") {
    // Plant a near-duplicate pair.
    val planted = vecs.union(
      vecs.filter($"vec_id" === 0L)
        .select(lit(999L).as("vec_id"), $"embedding"))
    val exact = Similarity.thresholdPairs(planted, "vec_id", "embedding", 0.999)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.contains((0L, 999L)))
    val lsh = Similarity.lshPairs(planted, "vec_id", "embedding", dim = 8,
      threshold = 0.999, bitsPerTable = 6, tables = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.contains((0L, 999L))) // identical vectors always share buckets
    assert(lsh.subsetOf(exact))      // verification step guarantees precision
  }

  test("IVF top-k returns ranked neighbors from the query cell") {
    val out = Similarity.ivfTopK(vecs, vecs.filter($"vec_id" < 5), "vec_id",
      "embedding", nCells = 4, k = 3).collect()
    val byQ = out.groupBy(_.getAs[Long]("query_id"))
    assert(byQ.keySet == Set(0L, 1L, 2L, 3L, 4L))
    byQ.foreach { case (q, rs) =>
      // the query vector itself lives in its own cell → exact-match rank 1
      val r1 = rs.find(_.getAs[Long]("rank") == 1L).get
      assert(r1.getAs[Double]("cosine") >= rs.map(_.getAs[Double]("cosine")).max - 1e-9)
    }
  }

  test("multimodal blob plumbing: schema, features, metadata pruning") {
    val blobs = Multimodal.toBlobTable(docs, "doc_id", "text", "text")
    assert(blobs.schema("payload").dataType.typeName == "binary")
    val feats = Multimodal.extractFeatures(blobs, "doc_id").collect()
    assert(feats.length == 5)
    val f0 = feats.find(_.getLong(0) == 0L).get.getSeq[Double](1)
    assert(f0.length == 16)
    assert(math.abs(f0.sum - 1.0) < 1e-9) // L1-normalized histogram
    val meta = Multimodal.metaSummary(blobs).collect()
    assert(meta.length == 1 && meta.head.getAs[Long]("n") == 5L)
  }
}
