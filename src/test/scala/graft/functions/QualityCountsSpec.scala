package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class QualityCountsSpec extends SparkTestBase {

  import spark.implicits._

  private val stops = Seq("the", "and", "of", "to", "in", "is", "that", "with")

  /** The regex formulation qualitySignals used before the kernel — still
    * the shape every DuckDB oracle mirrors.
    */
  private def regexCols(text: org.apache.spark.sql.Column) = Seq(
    length(text).cast("long").as("r_chars"),
    regexp_count(text, lit("[A-Za-z0-9]+")).cast("long").as("r_tokens"),
    regexp_count(text, lit("[.,!?;:]")).cast("long").as("r_punct"),
    (length(text).cast("long") -
      regexp_count(text, lit("[^A-Za-z0-9]")).cast("long")).as("r_alnum"),
    regexp_count(text, lit("[A-Z]")).cast("long").as("r_upper"),
    regexp_count(lower(text), lit("\\b(" + stops.mkString("|") + ")\\b"))
      .cast("long").as("r_stops"))

  test("every field matches the regex formulation on generated text") {
    val rnd = new scala.util.Random(7)
    val vocab = Seq("the", "The", "THE!", "these,", "and", "Sand", "of", "off.",
      "to", "TO:", "in?", "is", "that;", "with", "x1", "don't", "_the_",
      "Ünïcode", "naïve", "日本語", "a1B2c3", "", "...", "::")
    val cases = (0 until 500).map { i =>
      (i.toLong, Seq.fill(rnd.nextInt(30))(vocab(rnd.nextInt(vocab.length)))
        .mkString(Seq(" ", "  ", "\t", "\n", ", ")(rnd.nextInt(5))))
    } ++ Seq((900L, ""), (901L, "the"), (902L, "_the_ the"), (903L, "ABC!?"),
      (904L, "é"), (905L, "🙂 the 🙂"))
    val qc = QualityCounts.qualityCounts($"text", stops)
    val rows = cases.toDF("id", "text").select(
        Seq(col("id"),
          qc.getField("n_chars"), qc.getField("n_tokens"), qc.getField("n_punct"),
          qc.getField("n_alnum"), qc.getField("n_upper"), qc.getField("n_stops")) ++
        regexCols($"text"): _*)
      .collect()
    rows.foreach { r =>
      for (f <- 0 until 6)
        assert(r.getLong(1 + f) == r.getLong(7 + f),
          s"id=${r.getLong(0)} field=$f text=${cases.find(_._1 == r.getLong(0))}")
    }
  }

  test("matches the regex formulation on the documents table") {
    assumeTestData("/root/testdata/sf0.001")
    val d  = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val qc = QualityCounts.qualityCounts($"text", stops)
    val rows = d.select(
        Seq(col("doc_id"),
          qc.getField("n_chars"), qc.getField("n_tokens"), qc.getField("n_punct"),
          qc.getField("n_alnum"), qc.getField("n_upper"), qc.getField("n_stops")) ++
        regexCols($"text"): _*)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      for (f <- 0 until 6)
        assert(r.getLong(1 + f) == r.getLong(7 + f), s"doc=${r.get(0)} field=$f")
    }
  }

  test("null text propagates null") {
    val out = Seq((1L, null.asInstanceOf[String])).toDF("id", "text")
      .select(QualityCounts.qualityCounts($"text", stops).as("qc")).collect()
    assert(out(0).isNullAt(0))
  }
}
