package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class DsirSpec extends SparkTestBase {

  import spark.implicits._

  test("bucketOf matches a hand-computed md5 bucket") {
    val got = Seq("hello").toDF("tok")
      .select(Dsir.bucketOf($"tok", 64).as("b")).as[Long].head()
    // first 8 hex chars of md5("hello") = "5d41402a" = 1564557354
    assert(got == 1564557354L % 64, s"bucket $got")
  }

  test("target-like documents outscore target-unlike ones") {
    // target (t) docs are pure "alpha"; the raw pool adds pure "omega"
    // docs. DSIR must rank an alpha doc above an omega doc.
    val docs = Seq(
      (1L, "alpha alpha alpha alpha", true),
      (2L, "alpha alpha alpha", true),
      (3L, "alpha alpha alpha alpha alpha", false), // target-like raw doc
      (4L, "omega omega omega omega omega", false),
      (5L, "alpha omega", false)
    ).toDF("doc_id", "text", "is_t")
    val w = Dsir.logWeights(docs, "doc_id", "text", col("is_t"), buckets = 64)
      .as[(Long, Double)].collect().toMap
    assert(w(3) > w(4), s"alpha doc should beat omega doc: $w")
    assert(w(5) > w(4) && w(5) < w(3), s"mixed doc should sit between: $w")
    // per-token log-ratio is constant within a bucket, so pure-alpha docs
    // scale linearly with length
    val perTok3 = w(3) / 5
    val perTok1 = w(1) / 4
    assert(math.abs(perTok3 - perTok1) < 1e-6,
      s"per-token weight should match across pure-alpha docs: $perTok3 vs $perTok1")
  }

  test("smoothing keeps weights finite when a bucket is unseen in target") {
    val docs = Seq(
      (1L, "only only only", true),
      (2L, "unseen unseen", false)
    ).toDF("doc_id", "text", "is_t")
    val w = Dsir.logWeights(docs, "doc_id", "text", col("is_t"), buckets = 64)
      .as[(Long, Double)].collect().toMap
    assert(w.values.forall(v => !v.isNaN && !v.isInfinite), s"non-finite: $w")
    assert(w(2) < 0, s"unseen-in-target tokens must score negative: $w")
  }
}
