package graft.functions

import graft.SparkTestBase
import graft.pipeline.TextAnalysis
import org.apache.spark.sql.functions._

/** The HTML strip/tag-count kernels must be bit-equal to the declarative
  * regexp formulation the DuckDB oracles keep ([[TextAnalysis.htmlStripDeclarative]]).
  */
class HtmlKernelsSpec extends SparkTestBase {

  import spark.implicits._

  private def assertParity(cases: Seq[(Long, String)]): Unit = {
    val rows = cases.toDF("id", "t").select(
        col("id"),
        TextAnalysis.htmlStrip($"t").as("k_strip"),
        TextAnalysis.htmlStripDeclarative($"t").as("r_strip"),
        TextAnalysis.htmlTagCount($"t").as("k_tags"),
        TextAnalysis.htmlTagCountDeclarative($"t").as("r_tags"))
      .collect()
    rows.foreach { r =>
      val id = r.getLong(0)
      def show = cases.find(_._1 == id).map(_._2).getOrElse("?")
      assert(r.getString(1) == r.getString(2),
        s"id=$id strip kernel='${r.getString(1)}' regex='${r.getString(2)}' input='$show'")
      assert(r.getLong(3) == r.getLong(4),
        s"id=$id tags kernel=${r.getLong(3)} regex=${r.getLong(4)} input='$show'")
    }
  }

  test("adversarial pass-order, nesting, case and entity cases match the regexes") {
    assertParity(Seq[(Long, String)](
      // PASS ORDER is observable: the script pass runs FIRST over raw
      // text, so it consumes the style close that sits inside it — a
      // fused single walk would take the style element instead
      (1L, "<style>A<script>B</style>C</script>D"),
      (2L, "<script>A<style>B</script>C</style>D"),
      // unclosed elements: the open tag falls through to the generic tag
      // pass, content SURVIVES
      (3L, "<script>alert(1); <p>keep me</p>"),
      (4L, "<style>p{} <b>bold</b>"),
      // close-tag whitespace runs, case folding, non-closing lookalikes
      (5L, "<SCRIPT>x</ScRiPt\n\t >y"),
      (6L, "<script>x</scriptfoo> keep </script>gone"),
      (7L, "<script src=\"a>b\">tricky</script>rest"),
      // <scripty...> IS a script open per <script[^>]*> (the class
      // absorbs the 'y'); its element runs to the next close
      (8L, "<scripty attr>hidden</script>tail"),
      // open tag never closed by '>' at all
      (9L, "<script foo"),
      (10L, "<style"),
      // generic tags: '<' inside a tag, empty tag, '>' orphan, EOS '<'
      (20L, "<a<b>c"),
      (21L, "a<>b < c > d<"),
      (22L, "<a\nhref='x'\n>text</a>"),
      (23L, "a < b and a<b > c"),
      // entities: sequential-fold semantics (&amp; LAST, never re-decoded)
      (30L, "&amp;lt; &amp;amp; &lt;b&gt; &quot;q&quot; &#39;s&#39;"),
      (31L, "&nbsp;&nbsp;x&nbsp;"),
      (32L, "&foo; & &# &#39 &amp"),
      (33L, "a&amp;&amp;b"),
      // whitespace: collapse class is [ \t\n\r\f]; \x0B is NOT in it and
      // also blocks the final trim
      (40L, " a \t\n b "),
      (41L, "  \t \n \r \f  "),
      (42L, " lead and trail "),
      (43L, ""),
      // unicode passthrough: multi-byte chars around and inside tags
      (50L, "日本語<p>Ünïcode &amp; 🙂</p>tail"),
      (51L, "<日本語>not-ascii-tag</日本語>"),
      // the planted q_html_strip shapes themselves
      (60L, "<html><head><style type=\"text/css\">p { color: red }</style>" +
        "</head>\n<body><h1>D&amp;D #7</h1><p class=\"c\">body text" +
        "</p><br/><script>if (a &lt; b &amp;&amp; c &gt; d) { x(); }" +
        "</script>\n<p>R&amp;D&nbsp;notes &#39;q&#39;</p></body></html>"),
      (61L, "<p>one</p> <p>two</p> <p>three</p>")))
  }

  test("kernel matches the regexes on generated html-ish text") {
    val rnd = new scala.util.Random(13)
    val vocab = Seq("<p>", "</p>", "<script>", "</script>", "</script >",
      "<SCRIPT a=b>", "<style>", "</style>", "<scripty>", "<br/>", "<",
      ">", "<a href='x'>", "text", "&amp;", "&lt;", "&nbsp;", "&foo;",
      "&", "\t", "\n", "", "Ünï", "日本", " ", "<b", "b>")
    val cases = (0 until 800).map { i =>
      (i.toLong, Seq.fill(rnd.nextInt(30))(vocab(rnd.nextInt(vocab.length)))
        .mkString(Seq(" ", "", "\n")(rnd.nextInt(3))))
    }
    assertParity(cases)
  }

  test("nulls pass through like the regexp chain") {
    val out = Seq((1L, Option("x<y>z")), (2L, Option.empty[String]))
      .toDF("id", "t")
      .select(col("id"), TextAnalysis.htmlStrip($"t").as("k"),
        TextAnalysis.htmlTagCount($"t").as("n"))
      .orderBy("id").collect()
    assert(out(0).getString(1) == "x z" && out(0).getLong(2) == 1L)
    assert(out(1).isNullAt(1) && out(1).isNullAt(2))
  }
}
