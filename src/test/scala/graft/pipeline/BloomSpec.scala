package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class BloomSpec extends SparkTestBase {

  import spark.implicits._

  private def items(r: Range): org.apache.spark.sql.DataFrame =
    r.map(i => s"item_$i").toDF("s")

  test("bloomProbe: zero false negatives, FPs within budget") {
    val bloom = Sketches.bloomBuild(items(1 to 5000), "s", 5000L, 0.01)
    val probed = Sketches.bloomProbe(items(1 to 20000), "s", bloom)
      .withColumn("member", expr("CAST(substr(s, 6) AS BIGINT) <= 5000"))
    val Array(row) = probed.agg(
      sum(when($"member" && !$"might_contain", 1L).otherwise(0L)),
      sum(when(!$"member" && $"might_contain", 1L).otherwise(0L))).collect()
    assert(row.getLong(0) == 0L, "false negative — Bloom guarantee broken")
    assert(row.getLong(1) <= (3 * 0.01 * 15000).toLong,
      s"false positives ${row.getLong(1)} above budget")
  }

  test("bloom artifact survives a parquet write/read round trip") {
    val bloom = Sketches.bloomBuild(items(1 to 1000), "s", 1000L, 0.01)
    val dir = java.nio.file.Files.createTempDirectory("bloomrt").toString
    try {
      Seq(Tuple1(bloom)).toDF("bloom").write.mode("overwrite").parquet(dir)
      val back = spark.read.parquet(dir).head().getAs[Array[Byte]]("bloom")
      val before = Sketches.bloomProbe(items(1 to 1000), "s", bloom)
        .filter($"might_contain").count()
      val after = Sketches.bloomProbe(items(1 to 1000), "s", back)
        .filter($"might_contain").count()
      assert(before == 1000L && after == 1000L)
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  test("bloomMerge: union of part artifacts covers every part's members") {
    val parts = Seq(1 to 400, 401 to 800, 801 to 1200)
      .map(r => Sketches.bloomBuild(items(r), "s", 1200L, 0.01))
    val merged = Sketches.bloomMerge(parts)
    val hits = Sketches.bloomProbe(items(1 to 1200), "s", merged)
      .filter($"might_contain").count()
    assert(hits == 1200L, s"merged filter missed members: $hits/1200")
  }

  test("long-typed probe matches string-world semantics") {
    val df = (1L to 3000L).toDF("v")
    val bloom = Sketches.bloomBuild(df, "v", 3000L, 0.01)
    val probed = Sketches.bloomProbe((1L to 9000L).toDF("v"), "v", bloom)
    assert(probed.filter($"v" <= 3000 && !$"might_contain").count() == 0L)
    val fps = probed.filter($"v" > 3000 && $"might_contain").count()
    assert(fps <= (3 * 0.01 * 6000).toLong, s"FPs $fps above budget")
  }

  test("bloomCertificate: certifies membership on data with exact dupes") {
    // 100 distinct texts, each duplicated 3x; blocklist = 10 of them
    val docs = spark.range(300).select(
      $"id".as("doc_id"), concat(lit("text_"), pmod($"id", lit(100))).as("text"))
    val members = docs.filter(pmod($"doc_id", lit(100)) < 10).select($"text")
    val Array(row) = Sketches.bloomCertificate(
      docs, "text", members, "text", expectedItems = 30L).collect()
    assert(row.getLong(0) == 300L)       // n_corpus
    assert(row.getLong(1) == 30L)        // 10 texts x 3 dupes
    assert(row.getBoolean(2), "false negative in certificate")
    assert(row.getBoolean(3), "FP bound violated in certificate")
  }

  test("newAgainstPrior equals the plain anti-join, even with a saturated filter") {
    // prior: texts t0..t49; batch: t25..t74 (25 dupes, 25 new)
    val prior = spark.range(50).select(concat(lit("t"), $"id").as("text"))
    val batch = spark.range(25, 75).select(
      $"id".as("doc_id"), concat(lit("t"), $"id").as("text"))
    val out = graft.pipeline.Dedup.newAgainstPrior(
        batch, "text", prior, "text", expectedPriorDistinct = 50L)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(out.sameElements((50L until 75L).toArray[Long]))

    // a deliberately undersized filter (expected=1 → saturated, ~all FPs)
    // must only grow the suspect side, never change the answer
    val sat = graft.pipeline.Dedup.newAgainstPrior(
        batch, "text", prior, "text", expectedPriorDistinct = 1L, fpp = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(sat.sameElements((50L until 75L).toArray[Long]))
  }

  test("probe rejects unsupported item types with a clear error") {
    val err = intercept[Exception] {
      Seq(1.5, 2.5).toDF("d").select(
        graft.functions.BloomMightContain.mightContain(
          $"d", Sketches.bloomBuild(items(1 to 10), "s", 10L, 0.01)))
        .collect()
    }
    assert(err.getMessage.contains("bloom_might_contain"))
  }
}
