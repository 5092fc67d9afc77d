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

  test("native bucket-count kernel == declarative explode formulation") {
    import graft.functions.DsirBucketCounts
    val texts = Seq(
      "hello world hello",
      "  leading  and\ttab\nnewline\rvt  ",
      "unicode café élève tokens",
      "x",
      "one-token",
      "a b c d e f g h i j k l m n o p q r s t u v w x y z")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val native = df.select(col("id"),
      DsirBucketCounts.dsirBucketCounts(col("text"), 64).as("bc"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val declarative = df
      .select(col("id"), explode(TextAnalysis.words(col("text"))).as("tok"))
      .select(col("id"), Dsir.bucketOf(col("tok"), 64).as("b"))
      .groupBy("id", "b").count()
      .collect().groupBy(_.getLong(0))
      .map { case (id, rows) =>
        val v = new Array[Double](64)
        rows.foreach(r => v(r.getLong(1).toInt) = r.getLong(2).toDouble)
        id -> v.toSeq
      }
    assert(native.keySet === declarative.keySet)
    native.foreach { case (id, v) => assert(v === declarative(id), s"doc $id") }
  }

  test("kernel yields NULL for null and zero-token text (explode parity)") {
    import graft.functions.DsirBucketCounts
    val df = Seq((1L, Some("a b")), (2L, Some("   \t\n ")), (3L, None),
      (4L, Some(""))).toDF("id", "text")
    val got = df.select(col("id"),
      DsirBucketCounts.dsirBucketCounts(col("text"), 8).as("bc"))
      .collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(got === Map(1L -> false, 2L -> true, 3L -> true, 4L -> true))
    // logWeights drops all three degenerate docs, like the explode form
    val w = Dsir.logWeights(df, "id", "text", lit(true), buckets = 8)
      .collect().map(_.getLong(0)).toSet
    assert(w === Set(1L))
  }
}
