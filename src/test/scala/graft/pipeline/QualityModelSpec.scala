package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class QualityModelSpec extends SparkTestBase {

  import spark.implicits._

  private def feat(rows: Seq[(Long, Double, Double, Double, Double, Double)]) =
    rows.toDF("doc_id", "n_tokens", "ttr", "max_tf_ratio", "avg_token_len", "y")

  test("train on an empty feature frame fails with the descriptive error") {
    val e = intercept[IllegalArgumentException] {
      QualityModel.train(feat(Seq.empty).filter(lit(false)))
    }
    assert(e.getMessage.contains("empty feature frame"))
  }

  test("train recovers an exactly-linear signal; residuals read 0.000") {
    // y = 0.5 - 0.01*n_tokens + 2*ttr - 3*max_tf_ratio + 0.25*avg_len,
    // over features varied enough for a well-conditioned moment matrix
    val rows = (0 until 64).map { i =>
      val nt = 10.0 + (i % 17)
      val ttr = 0.3 + 0.04 * (i % 11)
      val mtr = 0.05 + 0.01 * (i % 7)
      val al  = 4.0 + 0.2 * (i % 5)
      val y = 0.5 - 0.01 * nt + 2.0 * ttr - 3.0 * mtr + 0.25 * al
      (i.toLong, nt, ttr, mtr, al, y)
    }
    val f = feat(rows)
    val w = QualityModel.train(f)
    val expect = Array(0.5, -0.01, 2.0, -3.0, 0.25)
    w.zip(expect).zipWithIndex.foreach { case ((got, e), i) =>
      assert(math.abs(got - e) < 1e-7, s"w($i): $got vs $e")
    }
    val rep = Dedup.withMaterialized { QualityModel.report(f, w).collect() }
    assert(rep.map(_.getString(0)).sorted ===
      QualityModel.FeatureNames.sorted.toArray)
    rep.foreach(r => assert(r.getDouble(2) === 0.0, r.getString(0)))
  }

  test("featureFrame: hand-computed features and teacher signal") {
    // doc 1: "a a b" -> nt=3, types=2, maxtf=2, len=5
    // doc 2: "b c"   -> nt=2, types=2, maxtf=1, len=3
    // corpus: cf(a)=2, cf(b)=2, cf(c)=1, total=5
    val docs = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    val got = QualityModel.featureFrame(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5)))).toMap
    val (nt1, ttr1, mtr1, al1, y1) = got(1L)
    assert(nt1 === 3.0); assert(ttr1 === 2.0 / 3.0)
    assert(mtr1 === 2.0 / 3.0); assert(al1 === 5.0 / 3.0)
    // y1 = (tf_a*cf_a + tf_b*cf_b) / (nt * total) = (2*2 + 1*2) / (3*5)
    assert(y1 === 6.0 / 15.0)
    val (nt2, _, _, _, y2) = got(2L)
    assert(nt2 === 2.0)
    assert(y2 === (2.0 + 1.0) / (2.0 * 5.0))
  }

  test("score replays the literal w·x fold; empty docs drop") {
    val docs = Seq((1L, "a a b"), (2L, "   ")).toDF("doc_id", "text")
    val w = Array(0.1, 0.01, 0.2, 0.3, 0.05)
    val got = Dedup.withMaterialized {
      QualityModel.score(docs, "text", "doc_id", w)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    }
    assert(got.keySet === Set(1L))
    val expect = 0.1 + 0.01 * 3.0 + 0.2 * (2.0 / 3.0) + 0.3 * (2.0 / 3.0) +
      0.05 * (5.0 / 3.0)
    assert(got(1L) === graft.functions.Num.roundHalfUp(expect, 6))
  }

  test("degenerate corpus (identical docs): collinear features get weight 0") {
    // every feature is constant => collinear with the intercept; the
    // rank-revealing solve keeps only the intercept (= mean y) and the
    // residuals still read exactly zero
    val docs = (0 until 8).map(i => (i.toLong, "same text here"))
      .toDF("doc_id", "text")
    val f = QualityModel.featureFrame(docs, "text", "doc_id")
    val w = QualityModel.train(f)
    assert(w.drop(1).forall(_ === 0.0))
    // all docs identical => y = mean_unigram_p = (3 * (8*1)) / (3 * 24)...
    // cf of each of the 3 distinct terms is 8, total 24:
    // y = (1*8 + 1*8 + 1*8) / (3 * 24) = 24 / 72
    assert(w(0) === graft.functions.Num.roundHalfUp(24.0 / 72.0, 9))
    val rep = Dedup.withMaterialized { QualityModel.report(f, w).collect() }
    rep.foreach(r => assert(r.getDouble(2) === 0.0, r.getString(0)))
  }

  test("constant-length corpus: n_tokens collinear with intercept, still fits") {
    // every doc exactly 3 tokens but other features vary — the
    // crossover-fixture regime; n_tokens gets weight 0, the rest fit
    val docs = Seq((1L, "a a b"), (2L, "b c d"), (3L, "e e e"),
      (4L, "f gg h"), (5L, "ii ii jj")).toDF("doc_id", "text")
    val f = QualityModel.featureFrame(docs, "text", "doc_id")
    val w = QualityModel.train(f)
    assert(w(1) === 0.0) // n_tokens dropped as dependent
    val rep = Dedup.withMaterialized { QualityModel.report(f, w).collect() }
    rep.foreach(r => assert(r.getDouble(2) === 0.0, r.getString(0)))
  }
}
