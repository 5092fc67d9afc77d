package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class WordListHitsSpec extends SparkTestBase {

  import spark.implicits._

  test("equivalent to regexp_count with the \\b alternation") {
    val targets = Seq("the", "and", "of", "to", "in", "is", "that", "with")
    val pattern = "\\b(" + targets.mkString("|") + ")\\b"
    val rnd     = new scala.util.Random(23)
    val vocab = Seq("the", "The", "THE", "these", "theory", "and", "sand", "of",
      "off", "to", "too", "in", "inn", "is", "that", "with", "without", "x1",
      "don't", "a-b", "the,", "(the)", "_the_", "with.")
    val cases = (0 until 400).map { i =>
      (i.toLong, Seq.fill(rnd.nextInt(25))(vocab(rnd.nextInt(vocab.length)))
        .mkString(Seq(" ", "  ", "\t", ", ", ". ")(rnd.nextInt(5))))
    } ++ Seq((900L, ""), (901L, "the"), (902L, "THE the The"))
    val rows = cases.toDF("id", "text").select($"id",
        WordListHits.wordListHits($"text", targets).as("native"),
        regexp_count(lower($"text"), lit(pattern)).cast("long").as("regex"))
      .collect()
    rows.foreach { r =>
      assert(r.getLong(1) == r.getLong(2), s"id=${r.getLong(0)}")
    }
  }

  test("note: _the_ is NOT a whole-word match (underscore is a word char)") {
    val out = Seq(("_the_ the")).toDF("text")
      .select(WordListHits.wordListHits($"text", Seq("the"))).head.getLong(0)
    assert(out == 1L)
  }
}
