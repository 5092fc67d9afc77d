package graft.pipeline

import graft.SparkTestBase

class LanguageModelSpec extends SparkTestBase {

  import spark.implicits._

  test("bigramLmScore reproduces hand-computed interpolated probabilities") {
    // corpus: "a b a b" and "a b". N = 6 tokens.
    // unigrams: a→3, b→3. bigrams: (a,b)→3, (b,a)→1; starts: a→3, b→1.
    val docs = Seq((1L, "a b a b"), (2L, "a b")).toDF("doc_id", "text")
    val got = LanguageModel.bigramLmScore(docs, "doc_id", "text")
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    val pAB = 0.7 * (3.0 / 3.0) + 0.3 * (3.0 / 6.0) // P(b|a)
    val pBA = 0.7 * (1.0 / 1.0) + 0.3 * (3.0 / 6.0) // P(a|b)
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // doc 1: bigrams ab, ba, ab
    val exp1 = r6((2 * math.log(pAB) + math.log(pBA)) / 3.0)
    // doc 2: single bigram ab
    val exp2 = r6(math.log(pAB))
    assert(got.length == 2)
    assert(got(0) == ((1L, 3L, exp1)), s"doc1: ${got(0)} vs $exp1")
    assert(got(1) == ((2L, 1L, exp2)), s"doc2: ${got(1)} vs $exp2")
  }

  test("single-token and empty documents drop out") {
    val docs = Seq((1L, "solo"), (2L, ""), (3L, "x y")).toDF("doc_id", "text")
    val ids = LanguageModel.bigramLmScore(docs, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(ids == Set(3L), s"ids=$ids")
  }

  test("scoring against the saved/loaded model artifact is bit-identical to self-trained") {
    val docs = Seq((1L, "a b a b c"), (2L, "a b"), (3L, "c a b c c d"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("lm_artifact").toFile
    try {
      val path = s"${dir.getAbsolutePath}/bigram_lm"
      LanguageModel.saveModel(
        LanguageModel.trainBigramModel(docs, "doc_id", "text"), path)
      val viaArtifact = LanguageModel.scoreAgainstModel(docs, "doc_id", "text",
          LanguageModel.loadModel(spark, path))
        .as[(Long, Long, Double)].collect().sortBy(_._1)
      val selfTrained = LanguageModel.bigramLmScore(docs, "doc_id", "text")
        .as[(Long, Long, Double)].collect().sortBy(_._1)
      assert(viaArtifact.toSeq == selfTrained.toSeq,
        s"artifact ${viaArtifact.toSeq} vs self ${selfTrained.toSeq}")
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(dir)
    }
  }

  test("rarer continuations score lower") {
    // "c d" appears once, "a b" five times: avg_logp("a b") > avg_logp("c d")
    val docs = (1L to 5L).map(i => (i, "a b")) :+ (6L, "c d")
    val scored = LanguageModel.bigramLmScore(docs.toDF("doc_id", "text"),
      "doc_id", "text")
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._3)).toMap
    assert(scored(1L) > scored(6L), s"$scored")
  }
}
