package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class MinHashSigSpec extends SparkTestBase {

  import spark.implicits._

  test("bit-identical to the explode/groupBy min(xxhash64(i, shingle)) formulation") {
    val rnd = new scala.util.Random(41)
    val seps = Seq(" ", "  ", "\t", "\n")
    val cases = (0 until 200).map { i =>
      val words = Seq.fill(rnd.nextInt(12))(
        rnd.alphanumeric.take(1 + rnd.nextInt(6)).mkString)
      (i.toLong, words.mkString(seps(rnd.nextInt(seps.length))))
    } ++ Seq((900L, ""), (901L, "one two"), (902L, "héllo wörld ünïcode test é"),
      (903L, "a a a a a")) // heavy duplicate shingles
    val df = cases.toDF("doc_id", "text")
    for ((n, k) <- Seq((3, 4), (2, 16), (1, 8))) {
      val aggs = (0 until k).map(i => min(xxhash64(lit(i), col("shingle"))).as(s"h$i"))
      val rel = df
        .select(col("doc_id"), explode(WordShingles.wordShingles(col("text"), n))
          .as("shingle"))
        .groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
        .collect()
        .map(r => r.getLong(0) -> (1 to k).map(r.getLong).toSeq).toMap
      val kern = df
        .select(col("doc_id"), MinHashSig.minHashSig(col("text"), n, k).as("sig"))
        .filter(col("sig").isNotNull)
        .collect()
        .map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
      assert(kern.keySet == rel.keySet, s"(n=$n,k=$k) doc sets differ")
      for (id <- rel.keySet)
        assert(kern(id) == rel(id), s"(n=$n,k=$k) doc $id: ${kern(id)} vs ${rel(id)}")
    }
  }

  test("null text and short docs give null") {
    val df = Seq((1L, null.asInstanceOf[String]), (2L, "one two"), (3L, "x y z"))
      .toDF("doc_id", "text")
    val out = df.select(col("doc_id"),
        MinHashSig.minHashSig(col("text"), 3, 4).as("sig"))
      .collect().map(r => (r.getLong(0), r.isNullAt(1))).sortBy(_._1)
    assert(out.toSeq == Seq((1L, true), (2L, true), (3L, false)))
  }
}
