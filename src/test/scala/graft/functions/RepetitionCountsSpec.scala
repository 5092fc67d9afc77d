package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class RepetitionCountsSpec extends SparkTestBase {

  import spark.implicits._

  private val counts = RepetitionCounts.repetitionCounts(col("text")).as("r")

  test("matches the builtin split/sort/distinct composition on random docs") {
    val rnd = new scala.util.Random(20260813L)
    val vocab = Vector("a", "bb", "ccc", "Ww", "x9", "the", "émile", "日本語", "z")
    val seps = Vector(" ", "  ", "\t", "\n", " \r ")
    val docs = (0 until 300).map { i =>
      val n = rnd.nextInt(30)
      val body = Seq.fill(n)(vocab(rnd.nextInt(vocab.size)))
        .mkString(seps(rnd.nextInt(seps.size)))
      // random leading/trailing whitespace exercises empty-token filtering
      (i.toLong, seps(rnd.nextInt(seps.size)) + body + seps(rnd.nextInt(seps.size)))
    }.toDF("id", "text")

    val native = docs.select($"id", counts)
      .select($"id", $"r.n_words", $"r.n_distinct", $"r.top_c", $"r.n_tri", $"r.nd_tri")
      .orderBy("id").collect().map(_.toSeq.toList)

    val ws = filter(split($"text", "\\s+"), w => length(w) > 0)
    val tg = graft.functions.WordShingles.wordShingles($"text", 3)
    val builtin = docs.select($"id",
        size(ws).cast("long").as("n_words"),
        size(array_distinct(ws)).cast("long").as("n_distinct"),
        coalesce(array_max(transform(array_distinct(ws),
          w => size(filter(ws, x => x === w)))), lit(0)).cast("long").as("top_c"),
        size(tg).cast("long").as("n_tri"),
        size(array_distinct(tg)).cast("long").as("nd_tri"))
      .orderBy("id").collect().map(_.toSeq.toList)

    assert(native.toSeq == builtin.toSeq)
  }

  test("null text propagates null; empty and all-whitespace yield zero words") {
    val docs = Seq((1L, null: String), (2L, ""), (3L, " \t\n "), (4L, "only"))
      .toDF("id", "text")
    val out = docs.select($"id", counts).orderBy("id").collect()
    assert(out(0).isNullAt(1))
    assert(out(1).getStruct(1).getLong(0) == 0L)
    assert(out(2).getStruct(1).getLong(0) == 0L)
    // single word: 1 word, 1 distinct, top 1, no trigrams
    assert(out(3).getStruct(1).toSeq == Seq(1L, 1L, 1L, 0L, 0L))
  }

  test("repeated words and trigrams count exactly") {
    // "a b a b a b" -> 6 words, 2 distinct, top 3; trigrams: aba bab aba bab
    // -> 4 total, 2 distinct
    val out = Seq((1L, "a b a b a b")).toDF("id", "text")
      .select(counts).head().getStruct(0)
    assert(out.toSeq == Seq(6L, 2L, 3L, 4L, 2L))
  }
}
