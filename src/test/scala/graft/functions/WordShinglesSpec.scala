package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class WordShinglesSpec extends SparkTestBase {

  import spark.implicits._

  private def builtinShingles(text: org.apache.spark.sql.Column, n: Int) = {
    val ws = filter(split(text, "\\s+"), w => length(w) > 0)
    when(size(ws) >= n,
      transform(sequence(lit(0), size(ws) - lit(n)),
        i => concat_ws(" ", slice(ws, i + 1, lit(n)))))
      .otherwise(array().cast("array<string>"))
  }

  test("equivalent to the builtin split/slice/concat_ws composition") {
    val rnd = new scala.util.Random(17)
    val seps = Seq(" ", "  ", "\t", "\n", " \r\n ")
    val cases = (0 until 300).map { i =>
      val words = Seq.fill(rnd.nextInt(8))(rnd.alphanumeric.take(1 + rnd.nextInt(6)).mkString)
      val sep   = seps(rnd.nextInt(seps.length))
      val pad   = if (rnd.nextBoolean()) " " else ""
      (i.toLong, pad + words.mkString(sep) + pad)
    } ++ Seq((900L, ""), (901L, "   "), (902L, "one"), (903L, "héllo wörld ünïcode test"))
    val df = cases.toDF("id", "text")
    for (n <- Seq(1, 2, 3, 5)) {
      val rows = df.select($"id",
        WordShingles.wordShingles($"text", n).as("native"),
        builtinShingles($"text", n).as("builtin")).collect()
      rows.foreach { r =>
        assert(r.getSeq[String](1) == r.getSeq[String](2), s"id=${r.getLong(0)} n=$n")
      }
    }
  }

  test("null text gives null; sql registration works") {
    WordShingles.register(spark)
    val out = spark.sql("SELECT word_shingles('a b c d', 3) AS s").head.getSeq[String](0)
    assert(out == Seq("a b c", "b c d"))
    val nulls = Seq((1L, null.asInstanceOf[String])).toDF("id", "text")
      .select(WordShingles.wordShingles($"text", 2)).head
    assert(nulls.isNullAt(0))
  }
}
