package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Every native expression must survive whole-stage codegen COMPILATION,
  * not just planning: Spark compiles generated Java lazily at first
  * execution and, with the default `spark.sql.codegen.fallback=true`,
  * retreats to interpreted eval on a compile error without failing the
  * query. That silent retreat costs the whole point of a native expression
  * (seen live: NfcNormalize's kernel was named `eval`, colliding with
  * `Expression.eval(InternalRow)` so Scala suppressed the static forwarder
  * the generated Java called — every row of every NFC query ran
  * interpreted while results stayed correct).
  *
  * fallback=false makes the compile error fatal; executing each expression
  * under it pins "compiles AND runs codegen'd" for the full inventory.
  */
class CodegenCompileSpec extends SparkTestBase {

  import spark.implicits._

  private def withNoFallback[T](body: => T): T = {
    val prev = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try body
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.codegen.fallback", v)
      case None    => spark.conf.unset("spark.sql.codegen.fallback")
    }
  }

  test("all native expressions compile and execute under codegen") {
    withNoFallback {
      val docs = Seq(
        (1L, "the quick brown fox jumps over the lazy dog",
          Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f), 0.37),
        (2L, "pack my box with five dozen liquor jugs",
          Array(0.5f, 0.5f, 0.5f), Array(1.0f, 0.0f, 1.0f), 1.9)
      ).toDF("id", "text", "va", "vb", "x")

      val bloom = {
        val bf = docs.stat.bloomFilter("text", 100L, 0.01)
        val bos = new java.io.ByteArrayOutputStream()
        bf.writeTo(bos)
        bos.toByteArray
      }

      val out = docs.select(
        NfcNormalize.nfcNormalize($"text").as("nfc"),
        MinMd5Hex.minMd5Hex(split($"text", " ")).as("md5"),
        RollingMinHash.rollingMinHash($"text", 8).as("rmh"),
        SearchSorted.searchSorted($"x", Array(0.0, 1.0, 2.0)).as("bucket"),
        CosineSim.cosineSim($"va", $"vb").as("cos"),
        VectorDot.vectorDot($"va", $"vb").as("dot"),
        WordListHits.wordListHits($"text", Seq("the", "with")).as("hits"),
        WordShingles.wordShingles($"text", 3).as("shingles"),
        BloomMightContain.mightContain($"text", bloom).as("maybe"),
        WordCounts.wordCounts($"text").as("wc"),
        RepetitionCounts.repetitionCounts($"text").as("rep"),
        QualityCounts.qualityCounts($"text", Seq("the", "with"))
          .getField("n_stops").as("qstops"),
        PQKernels.pqEncodeCodes($"va",
          Array(Array(Array(0.0, 0.0, 0.0), Array(1.0, 1.0, 1.0)))).as("pq"),
        PQKernels.pqAdcScore($"va", array(lit(1)),
          Array(Array(Array(0.0, 0.0, 0.0), Array(1.0, 1.0, 1.0)))).as("adc"),
        PQKernels.pqResidualCodes($"va", lit(0L),
          Array(Array(0.5, 0.5, 0.5)),
          Array(Array(Array(0.0, 0.0, 0.0), Array(1.0, 1.0, 1.0)))).as("pqr"),
        NearestCentroid.nearestCentroid($"va",
          Array(Array(0.0, 0.0, 0.0), Array(1.0, 2.0, 3.0)))
          .getField("idx").as("ncIdx"),
        PrefixCosines.prefixCosines($"va", $"vb", Seq(1, 3)).as("pcos")
      ).collect()

      assert(out.length == 2)
      assert(out.forall(_.getBoolean(8)), "bloom built from the same column")
      assert(out(0).getLong(6) == 2L && out(1).getLong(6) == 1L, "word hits")
      assert(out(0).getLong(11) == 2L && out(1).getLong(11) == 1L, "quality stops")
      assert(out.forall(r => !r.isNullAt(12) && !r.isNullAt(13)), "pq kernels")
      assert(out.forall(r => !r.isNullAt(14)), "residual pq kernel")
      assert(out(0).getInt(15) == 1 && out(1).getInt(15) == 0,
        "nearest centroid (caught live: kernel named eval ran interpreted)")
      assert(out.forall(r => r.getSeq[Double](16).length == 2), "prefix cosines")
    }
  }

  test("reference-object kernels compile and execute under codegen") {
    withNoFallback {
      val docs = Seq((1L, "aa ab ba bb aa"), (2L, "xyz")).toDF("id", "text")
      val merges = Seq(graft.pipeline.Bpe.Merge(1, "a", "a", 2L),
        graft.pipeline.Bpe.Merge(2, "b", "b", 1L))
      val out = docs.select(
        TokenStats.tokenStats($"text").getField("n_tokens").as("nt"),
        BpeTokenCount.bpeTokenCount($"text", merges)
          .getField("n_bpe_tokens").as("bpe")
      ).orderBy($"id").collect()
      assert(out(0).getLong(0) == 5L && out(1).getLong(0) == 1L)
      // "aa"->1 tok, "ab"->2, "ba"->2, "bb"->1, "aa"->1 = 7; "xyz" = 3
      assert(out(0).getLong(1) == 7L,
        "bpe kernel under codegen (caught live: the companion's eval had " +
          "no static forwarder, every call silently fell back interpreted)")
      assert(out(1).getLong(1) == 3L)
      val pii = Seq((1L, "u@ex.com https://x 555-867-5309 10.0.0.1"))
        .toDF("id", "text")
        .select(PiiCounts.piiCounts($"text").as("p"),
          PiiCounts.piiScrub($"text").as("s")).head()
      val pc = pii.getStruct(0)
      assert((0 until 4).map(pc.getLong) == Seq(1L, 1L, 1L, 1L))
      assert(pii.getString(1) == "<EMAIL> <URL> 555-867-5309 10.0.0.1")
    }
  }
}
