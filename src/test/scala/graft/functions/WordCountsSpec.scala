package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class WordCountsSpec extends SparkTestBase {

  import spark.implicits._

  private val wc = WordCounts.wordCounts(col("text"))

  test("exploded counts match the split/explode/groupBy composition on random docs") {
    val rnd = new scala.util.Random(20260813L)
    val vocab = Vector("a", "bb", "ccc", "Ww", "x9", "the", "émile", "日本語", "z",
      "hash-collider", "HASH-COLLIDER")
    val seps = Vector(" ", "  ", "\t", "\n", " \r ")
    val docs = (0 until 300).map { i =>
      val n = rnd.nextInt(40)
      val body = Seq.fill(n)(vocab(rnd.nextInt(vocab.size)))
        .mkString(seps(rnd.nextInt(seps.size)))
      (i.toLong, seps(rnd.nextInt(seps.size)) + body + seps(rnd.nextInt(seps.size)))
    }.toDF("id", "text")

    val native = docs
      .select($"id", explode(wc).as("w"))
      .select($"id", $"w.term", $"w.tf")
      .orderBy("id", "term").collect().map(_.toSeq.toList).toSeq

    val builtin = docs
      .select($"id",
        explode(filter(split($"text", "\\s+"), w => length(w) > 0)).as("term"))
      .groupBy($"id", $"term").agg(count(lit(1)).as("tf"))
      .orderBy("id", "term").collect().map(_.toSeq.toList).toSeq

    assert(native == builtin)
  }

  test("entries come out in first-occurrence order with exact multiplicities") {
    val out = Seq((1L, "b a b c a b")).toDF("id", "text")
      .select(wc.as("w")).head().getSeq[org.apache.spark.sql.Row](0)
    assert(out.map(r => (r.getString(0), r.getLong(1))) == Seq(("b", 3L), ("a", 2L), ("c", 1L)))
  }

  test("null propagates; empty and all-whitespace yield empty arrays") {
    val docs = Seq((1L, null: String), (2L, ""), (3L, " \t\n "), (4L, "only"))
      .toDF("id", "text")
    val out = docs.select($"id", wc.as("w")).orderBy("id").collect()
    assert(out(0).isNullAt(1))
    assert(out(1).getSeq[Any](1).isEmpty)
    assert(out(2).getSeq[Any](1).isEmpty)
    assert(out(3).getSeq[org.apache.spark.sql.Row](1).map(r =>
      (r.getString(0), r.getLong(1))) == Seq(("only", 1L)))
  }

  test("growth past the initial 16-slot table keeps counts exact") {
    // 200 distinct words + 50 repeats forces both array growth and probing
    val text = ((0 until 200).map(i => s"w$i") ++ (0 until 50).map(i => s"w$i"))
      .mkString(" ")
    val out = Seq((1L, text)).toDF("id", "text")
      .select(wc.as("w")).head().getSeq[org.apache.spark.sql.Row](0)
    assert(out.length == 200)
    val m = out.map(r => (r.getString(0), r.getLong(1))).toMap
    assert((0 until 50).forall(i => m(s"w$i") == 2L))
    assert((50 until 200).forall(i => m(s"w$i") == 1L))
  }
}
