package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class BpeSpec extends SparkTestBase {

  import spark.implicits._

  private def corpus(rows: Seq[String]) =
    rows.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  test("heap trainer is bit-identical to the relational trainer") {
    val docs = corpus(Seq(
      "the cat sat on the mat", "the cat ate the rat",
      "low lower lowest", "new newer newest", "wide wider widest",
      "aaaa aaa aa a", "abab abab ab", "xyzzy xyzzy plugh"))
    val rel = Dedup.withMaterialized {
      Bpe.trainMerges(docs, "text", nMerges = 10)
    }
    val heap = Bpe.trainMergesHeap(docs, "text", nMerges = 10)
    assert(heap === rel)
  }

  test("heap trainer matches the relational trainer on random corpora") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 8) {
      val alphabet = "abcde"
      val words = Seq.fill(12)(
        (1 to (1 + rnd.nextInt(6))).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
      val docs = corpus(Seq.fill(6)(
        (1 to (1 + rnd.nextInt(5))).map(_ => words(rnd.nextInt(words.length))).mkString(" ")))
      val n = 1 + rnd.nextInt(7)
      val rel = Dedup.withMaterialized { Bpe.trainMerges(docs, "text", n) }
      val heap = Bpe.trainMergesHeap(docs, "text", n)
      assert(heap === rel, s"trial $trial (nMerges=$n)")
    }
  }

  test("byte-level: heap trainer matches the relational trainer, multibyte exact") {
    // multibyte words are the point: at byte level 'é' is TWO symbols
    // (C3, A9) and merges cross what the codepoint level sees as one
    val docs = corpus(Seq(
      "thé thé café café café", "née née thé", "aaaa aaa aa a",
      "naïve naïve café"))
    val rel = Dedup.withMaterialized {
      Bpe.trainMerges(docs, "text", nMerges = 8, byteLevel = true)
    }
    val heap = Bpe.trainMergesHeap(docs, "text", nMerges = 8, byteLevel = true)
    assert(heap === rel)
    // symbols are uppercase hex pairs; the top merges fuse real byte runs
    assert(heap.nonEmpty && heap.forall(m =>
      (m.l + m.r).forall(c => c.isDigit || ('A' to 'F').contains(c))))
    // the 'é' byte pair (C3, A9) must appear fused in some merge over
    // this accent-heavy corpus
    assert(heap.exists(m => (m.l + m.r).contains("C3A9")))
    // random corpora, both trainers, byte level
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 4) {
      val alphabet = "abé"
      val words = Seq.fill(10)(
        (1 to (1 + rnd.nextInt(5))).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
      val d = corpus(Seq.fill(5)(
        (1 to (1 + rnd.nextInt(4))).map(_ => words(rnd.nextInt(words.length))).mkString(" ")))
      val n = 1 + rnd.nextInt(6)
      val r = Dedup.withMaterialized { Bpe.trainMerges(d, "text", n, byteLevel = true) }
      val h = Bpe.trainMergesHeap(d, "text", n, byteLevel = true)
      assert(h === r, s"trial $trial (nMerges=$n)")
    }
  }

  test("byte-level artifact round-trips with its flag; encode counts bytes") {
    val docs = corpus(Seq("thé thé ab", "thé ab ab"))
    val merges = Bpe.trainMergesHeap(docs, "text", nMerges = 3, byteLevel = true)
    val dir = java.nio.file.Files.createTempDirectory("bpe_bytes_").toFile
    try {
      val p = new java.io.File(dir, "m").getAbsolutePath
      Bpe.saveMerges(spark, merges, p, byteLevel = true)
      assert(Bpe.loadMerges(spark, p) === merges)
      assert(Bpe.mergesByteLevel(spark, p))
      val p2 = new java.io.File(dir, "m2").getAbsolutePath
      Bpe.saveMerges(spark, merges, p2) // default: codepoint level
      assert(!Bpe.mergesByteLevel(spark, p2))
      // the flag ENFORCES: loading a byte-level artifact for codepoint
      // encoding (or vice versa) fails loudly instead of tokenizing
      // everything to singletons
      assert(Bpe.loadMerges(spark, p, expectByteLevel = Some(true)) === merges)
      val e = intercept[IllegalArgumentException] {
        Bpe.loadMerges(spark, p, expectByteLevel = Some(false))
      }
      assert(e.getMessage.contains("byte-level"))
      intercept[IllegalArgumentException] {
        Bpe.loadMerges(spark, p2, expectByteLevel = Some(true))
      }
      // with zero merges applied, token count = UTF-8 byte count ("thé"
      // = 4 bytes); with the trained merges it can only shrink
      val zero = Bpe.encode(docs, "doc_id", "text", Seq.empty, byteLevel = true)
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      assert(zero(0L) === 4L + 4L + 2L) // thé thé ab
      val enc = Bpe.encode(docs, "doc_id", "text", merges, byteLevel = true)
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      assert(enc(0L) < zero(0L))
      // the per-row face agrees with the dict-join face at byte level
      val row = Bpe.encodeRow(docs, "doc_id", "text", merges, byteLevel = true)
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      assert(row === enc)
    } finally org.apache.commons.io.FileUtils.deleteQuietly(dir)
  }

  test("heap trainer: minCount prunes the tail, maxVocab fails loudly") {
    val docs = corpus(Seq("aa aa aa bb", "aa aa cc"))
    // minCount=2 drops bb and cc from the vocabulary: only (a,a) remains
    val pruned = Bpe.trainMergesHeap(docs, "text", nMerges = 5, minCount = 2)
    assert(pruned === Seq(Bpe.Merge(1, "a", "a", 5L)))
    val e = intercept[IllegalArgumentException] {
      Bpe.trainMergesHeap(docs, "text", nMerges = 2, maxVocab = 2)
    }
    assert(e.getMessage.contains("maxVocab"))
  }

  test("kernel encode is bit-identical to the replace-chain encode") {
    val docs = corpus(Seq(
      "the cat sat on the mat", "the cat ate the rat",
      "aaaa aaa aa a", "abab abab ab",
      "", "   ",                       // zero-word stream contract
      "naïve café über naïve",          // multi-byte codepoints
      "lowest newest widest"))
    val merges = Bpe.trainMergesHeap(docs, "text", nMerges = 12)
    val viaChain = Bpe.encodeRow(docs, "doc_id", "text", merges)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val viaKernel = Bpe.encodeKernel(docs, "doc_id", "text", merges)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(viaKernel.toSeq === viaChain.toSeq)
  }

  test("kernel honors STRICT rank order: a pair formed by a later merge does not re-fuse") {
    // merge 1 = (ab, c) is absent until merge 2 = (a, b) creates "ab" —
    // by then rank 1's replace already ran, so "abc" stays 2 tokens on
    // BOTH paths (greedy lowest-rank-anywhere would give 1)
    val merges = Seq(Bpe.Merge(1, "ab", "c", 9L), Bpe.Merge(2, "a", "b", 9L))
    val docs = corpus(Seq("abc"))
    val chain = Bpe.encodeRow(docs, "doc_id", "text", merges).collect()(0)
    val kernel = Bpe.encodeKernel(docs, "doc_id", "text", merges).collect()(0)
    assert(chain.getLong(2) === 2L)
    assert(kernel.getLong(2) === 2L)
  }

  test("kernel encode parity at a merge count the replace chain cannot codegen") {
    val rnd = new scala.util.Random(7)
    val words = Seq.fill(400)(
      (1 to (2 + rnd.nextInt(8))).map(_ => ('a' + rnd.nextInt(6)).toChar).mkString)
    val docs = corpus(Seq.fill(80)(
      (1 to (3 + rnd.nextInt(10))).map(_ => words(rnd.nextInt(words.length))).mkString(" ")))
    val merges = Bpe.trainMergesHeap(docs, "text", nMerges = 200)
    assert(merges.length > 100, s"fixture too small: ${merges.length} merges trained")
    val viaChain = Bpe.encodeRow(docs, "doc_id", "text", merges)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val viaKernel = Bpe.encodeKernel(docs, "doc_id", "text", merges)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(viaKernel.toSeq === viaChain.toSeq)
  }
}
