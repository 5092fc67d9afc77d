package graft.functions

import graft.SparkTestBase
import graft.pipeline.TextAnalysis
import org.apache.spark.sql.functions._

class PiiCountsSpec extends SparkTestBase {

  import spark.implicits._

  /** The four-regexp formulation the DuckDB oracles mirror. */
  private def regexCols(text: org.apache.spark.sql.Column) = Seq(
    regexp_count(text, lit(TextAnalysis.EmailPattern)).cast("long").as("r_emails"),
    regexp_count(text, lit(TextAnalysis.UrlPattern)).cast("long").as("r_urls"),
    regexp_count(text, lit(TextAnalysis.PhonePattern)).cast("long").as("r_phones"),
    regexp_count(text, lit(TextAnalysis.Ipv4Pattern)).cast("long").as("r_ips"))

  private def assertParity(cases: Seq[(Long, String)]): Unit = {
    val pc = PiiCounts.piiCounts($"text")
    val rows = cases.toDF("id", "text").select(
        Seq(col("id"),
          pc.getField("n_emails"), pc.getField("n_urls"),
          pc.getField("n_phones"), pc.getField("n_ips")) ++
        regexCols($"text"): _*)
      .collect()
    rows.foreach { r =>
      for (f <- 0 until 4)
        assert(r.getLong(1 + f) == r.getLong(5 + f),
          s"id=${r.getLong(0)} field=$f " +
            s"text=${cases.find(_._1 == r.getLong(0)).map(_._2)}")
    }
  }

  test("adversarial backtracking and boundary cases match the regexes") {
    assertParity(Seq[(Long, String)](
      // email: match ends mid-domain-run (backtrack to the rightmost
      // viable dot, greedy letters stop before '-f')
      (1L, "a@bc.de-f"),
      // email: first '@' has no viable domain; retry INSIDE the run wins
      (2L, "a@b@c.dd"),
      // email consumed up to second '@' — no local char left for it
      (3L, "a@b.cc@d.ee"),
      (4L, "u7@example.com and x@y.z"), // second: TLD too short
      (5L, "a@b.c0m"),                  // digits stop the TLD letters
      (6L, "@no.local x@.com y@com"),
      (7L, "a..b%+-@x-.y.ZZ tail"),
      // url: overlapping literal prefixes, https vs http, EOS run
      (10L, "httphttps://x"),
      (11L, "http:// nope http://ok"),
      (12L, "see https://a.b/c?d=1#e and http://q"),
      (13L, "xhttps://tail"),
      // phone: optional '+', digit neighbors do NOT disqualify,
      // exactly-3/3/4 windows, mixed separators
      (20L, "+123-456-7890"),
      (21L, "12345-678-9012x"),   // match starts inside the digit run
      (22L, "123-456-78901"),     // extra trailing digit is fine
      (23L, "123.456 7890 and 999-999-999"), // second too short
      (24L, "++123 456 7890"),
      // ipv4: \b flanks, >3-digit runs can never backtrack in,
      // chained dotted runs split into consecutive matches
      (30L, "1234.5.6.7 10.0.0.1"),
      (31L, "1.2.3.4.5"),
      (32L, "1.2.3.4.5.6.7.8"),
      (33L, "x1.2.3.4 1.2.3.4x 1.2.3.4-ok"),
      (34L, "12.3.4.5.6 999.999.999.999"),
      (40L, ""), (41L, "🙂 é 日本語 u@例.com"),
      // Java \b is Unicode-aware in plain mode: 'e1' and '5Ü' are both
      // word-word junctions, so NO ip match hides in this string
      (42L, "10.42.0.17.7Ünïcode1.2.3.4.5Ünïcode://Ünïcode"),
      (43L, "é1.2.3.4 1.2.3.4é 日1.2.3.4 1.2.3.4日")))
  }

  test("kernel matches the regexes on generated text") {
    val rnd = new scala.util.Random(11)
    val vocab = Seq("u7@example.com", "a@b.cc", "x@y.z", "@", "a@", "http",
      "https://ex.org/d1", "http://q", "://", "555-867-5309", "+555 867 5309",
      "555-867-530", "10.42.0.1", "999.1.2.3333", "1.2.3.4.5", "word",
      "Ünïcode", "...", "-", "+", "7.7", "a.b@c.dd-e@f.gg")
    val cases = (0 until 600).map { i =>
      (i.toLong, Seq.fill(rnd.nextInt(25))(vocab(rnd.nextInt(vocab.length)))
        .mkString(Seq(" ", "", "\t", ".", "-")(rnd.nextInt(5))))
    }
    assertParity(cases)
  }

  test("kernel matches the regexes on the documents table with plants") {
    assumeTestData("/root/testdata/sf0.001")
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val planted = concat($"text",
      when(pmod($"doc_id", lit(7)) === 0,
        concat(lit(" contact u"), $"doc_id".cast("string"),
          lit("@example.com"))).otherwise(lit("")),
      when(pmod($"doc_id", lit(11)) === 0,
        concat(lit(" call 555-867-"),
          lpad(pmod($"doc_id", lit(10000)).cast("string"), 4, "0")))
        .otherwise(lit("")),
      when(pmod($"doc_id", lit(13)) === 0,
        concat(lit(" from 10."), pmod($"doc_id", lit(256)).cast("string"),
          lit(".0.1"))).otherwise(lit("")))
    val pc = PiiCounts.piiCounts($"t")
    val rows = d.select($"doc_id", planted.as("t"))
      .select(
        Seq($"doc_id",
          pc.getField("n_emails"), pc.getField("n_urls"),
          pc.getField("n_phones"), pc.getField("n_ips")) ++
        regexCols($"t"): _*)
      .collect()
    assert(rows.nonEmpty)
    var planted7 = 0L
    rows.foreach { r =>
      for (f <- 0 until 4)
        assert(r.getLong(1 + f) == r.getLong(5 + f),
          s"doc_id=${r.getLong(0)} field=$f")
      if (r.getLong(0) % 7 == 0) { assert(r.getLong(1) >= 1); planted7 += 1 }
    }
    assert(planted7 > 0)
  }

  private def regexScrub(text: org.apache.spark.sql.Column) =
    regexp_replace(
      regexp_replace(text, lit(TextAnalysis.EmailPattern), lit("<EMAIL>")),
      lit(TextAnalysis.UrlPattern), lit("<URL>"))

  test("scrub kernel is bit-equal to the chained regexp_replace rewrite") {
    val cases = Seq[(Long, String)](
      // two-pass order is observable: the URL's userinfo email rewrites
      // first, then the URL pass swallows the whole rewritten run
      (1L, "see https://a@b.cc/x ok"),
      (2L, "u7@example.com and https://ex.org/d1 done"),
      (3L, "a@b.cc c@d.ee adjacent"),
      (4L, "no pii here at all"),
      (5L, "a@bc.de-f mid-run end"),
      (6L, "<EMAIL> pre-existing token a@b.cc"),
      (7L, "http://x https://y.z httpnope http:// u@v.ww"),
      (8L, ""), (9L, "🙂 é u@例.com 日本語"),
      (10L, "trailing email a@b.cc"), (11L, "a@b.cc"),
      (12L, "https://tail"))
    val rnd = new scala.util.Random(13)
    val vocab = Seq("u7@example.com", "a@b.cc", "x@y.z", "https://ex.org/d",
      "http://q", "http", "://", "word", "Ünïcode", "a.b@c.dd-e@f.gg", "@")
    val gen = (100 until 400).map { i =>
      (i.toLong, Seq.fill(rnd.nextInt(20))(vocab(rnd.nextInt(vocab.length)))
        .mkString(Seq(" ", "", ".", "-")(rnd.nextInt(4))))
    }
    val rows = (cases ++ gen).toDF("id", "text")
      .select(col("id"), PiiCounts.piiScrub($"text").as("k"),
        regexScrub($"text").as("r"))
      .collect()
    rows.foreach { r =>
      assert(r.getString(1) == r.getString(2),
        s"id=${r.getLong(0)}: kernel='${r.getString(1)}' regex='${r.getString(2)}'")
    }
  }

  test("scrub kernel matches the regexes on the planted documents table") {
    assumeTestData("/root/testdata/sf0.001")
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val planted = concat($"text",
      when(pmod($"doc_id", lit(7)) === 0,
        concat(lit(" contact u"), $"doc_id".cast("string"),
          lit("@example.com at https://ex.org/d"), $"doc_id".cast("string")))
        .otherwise(lit("")))
    val rows = d.select($"doc_id", planted.as("t"))
      .select($"doc_id", PiiCounts.piiScrub($"t").as("k"), regexScrub($"t").as("r"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getString(1) == r.getString(2),
      s"doc_id=${r.getLong(0)}"))
  }

  test("null input yields null") {
    val out = Seq((1L, null: String), (2L, "a@b.cc"))
      .toDF("id", "text")
      .select($"id", PiiCounts.piiCounts($"text").as("p"),
        PiiCounts.piiScrub($"text").as("s"))
      .orderBy("id").collect()
    assert(out(0).isNullAt(1) && out(0).isNullAt(2))
    assert(out(1).getStruct(1).getLong(0) == 1L)
    assert(out(1).getString(2) == "<EMAIL>")
  }
}
