package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Incremental near-dup ([[Dedup.nearDupsAgainstPrior]]) and the linear
  * duplicate-shingle profile ([[Dedup.dupShingleFraction]]).
  */
class IncrNearDupSpec extends SparkTestBase {
  import spark.implicits._

  /** Deterministic word-soup docs: 60 hash-chosen words each (accidental
    * cross-doc shingle matches need 3 consecutive 1/1000 collisions).
    * Ids [50, 60) near-duplicate id `i - 49` — the ODD offset makes every
    * planted pair straddle an odd/even id split. One changed word out of 60
    * puts the planted jaccard at ~55/61 ≈ 0.90.
    */
  private def corpus = {
    import scala.util.hashing.MurmurHash3
    (0 until 100).map { i =>
      val base = if (i >= 50 && i < 60) i - 49 else i
      val ws = (0 until 60).map { j =>
        if (i != base && j == 7) "mutated"
        else s"w${math.floorMod(MurmurHash3.productHash((base, j)), 1000)}"
      }
      (i.toLong, ws.mkString(" "))
    }.toDF("doc_id", "text")
  }

  test("nearDupsAgainstPrior equals the exact cross-side jaccard pair set") {
    val docs  = corpus
    val prior = docs.filter($"doc_id" % 2 === 0)
    val fresh = docs.filter($"doc_id" % 2 === 1)
    val sigs  = Dedup.minhashSignatures(prior, "text", "doc_id", n = 3, numHashes = 32)

    val got = Dedup.nearDupsAgainstPrior(fresh, sigs, prior, "text", "doc_id",
        n = 3, bands = 16, rowsPerBand = 2, verifyThreshold = 0.8)
      .select("id_new", "id_prior").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    // truth: uncapped exact jaccard over the union, restricted to cross pairs
    val truth = Dedup.jaccardPairs(docs, "text", "doc_id", n = 3, threshold = 0.8)
      .collect().flatMap { r =>
        val (a, b) = (r.getLong(0), r.getLong(1))
        if (a % 2 == 1 && b % 2 == 0) Some((a, b))
        else if (b % 2 == 1 && a % 2 == 0) Some((b, a))
        else None
      }.toSet
    assert(truth.nonEmpty, "fixture must plant cross-side near-dup pairs")
    assert(got == truth)
  }

  test("nearDupsAgainstPrior works from a persisted signature artifact") {
    val docs  = corpus
    val prior = docs.filter($"doc_id" % 2 === 0)
    val fresh = docs.filter($"doc_id" % 2 === 1)
    val dir = java.nio.file.Files.createTempDirectory("sigs").toString
    Dedup.minhashSignatures(prior, "text", "doc_id", n = 3, numHashes = 32)
      .write.mode("overwrite").parquet(dir)

    val live = Dedup.nearDupsAgainstPrior(fresh,
        Dedup.minhashSignatures(prior, "text", "doc_id", n = 3, numHashes = 32),
        prior, "text", "doc_id").collect().map(_.toSeq).toSet
    val fromArtifact = Dedup.nearDupsAgainstPrior(fresh,
        spark.read.parquet(dir), prior, "text", "doc_id")
      .collect().map(_.toSeq).toSet
    assert(fromArtifact == live && live.nonEmpty)
  }

  test("dupShingleFraction: hand-computed fractions") {
    val docs = Seq(
      (1L, "a b c d"),   // shingles {a b c, b c d}
      (2L, "a b c x"),   // shingles {a b c, b c x}
      (3L, "p q r s")    // shingles {p q r, q r s}
    ).toDF("doc_id", "text")
    val out = Dedup.dupShingleFraction(docs, "text", "doc_id", n = 3)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq((1L, 2L, 1L, 0.5), (2L, 2L, 1L, 0.5), (3L, 2L, 0L, 0.0)))
  }

  test("dupShingleFraction: exact duplicates score 1.0, uniques 0.0") {
    val docs = corpus.filter($"doc_id" < 50 || $"doc_id" >= 60) // drop mutated
      .union(corpus.filter($"doc_id" < 10)
        .select($"doc_id" + 1000, $"text"))                     // plant exact dups
    val out = Dedup.dupShingleFraction(docs, "text", "doc_id", n = 3)
    val dup = out.filter($"doc_id" >= 1000 || $"doc_id" < 10)
    assert(dup.filter($"dup_fraction" < 1.0).count() == 0)
    assert(out.filter($"dup_fraction" > 0).count() >= dup.count())
  }
}
