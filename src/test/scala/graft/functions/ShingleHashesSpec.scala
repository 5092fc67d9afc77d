package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class ShingleHashesSpec extends SparkTestBase {

  import spark.implicits._

  test("bit-identical to xxhash64 over word_shingles, incl. unicode and separators") {
    val rnd = new scala.util.Random(23)
    val seps = Seq(" ", "  ", "\t", "\n", " \r\n ")
    val cases = (0 until 300).map { i =>
      val words = Seq.fill(rnd.nextInt(10))(rnd.alphanumeric.take(1 + rnd.nextInt(7)).mkString)
      val sep   = seps(rnd.nextInt(seps.length))
      val pad   = if (rnd.nextBoolean()) "\t" else ""
      (i.toLong, pad + words.mkString(sep) + pad)
    } ++ Seq((900L, ""), (901L, "   "), (902L, "one"),
      (903L, "héllo wörld ünïcode test émoji é"),
      (904L, "a b a b a"))
    val df = cases.toDF("id", "text")
    for (n <- Seq(1, 2, 3, 5)) {
      val rows = df.select($"id",
        ShingleHashes.shingleHashes($"text", n).as("native"),
        transform(WordShingles.wordShingles($"text", n), s => xxhash64(s))
          .as("composed")).collect()
      rows.foreach { r =>
        assert(r.getSeq[Long](1) == r.getSeq[Long](2), s"id=${r.getLong(0)} n=$n")
      }
    }
  }

  test("null text gives null; sql registration works") {
    ShingleHashes.register(spark)
    val viaSql = spark.sql(
      "SELECT shingle_hashes('a b c d', 3) AS h").head.getSeq[Long](0)
    val expected = spark.sql(
      "SELECT array(xxhash64('a b c'), xxhash64('b c d')) AS h").head.getSeq[Long](0)
    assert(viaSql == expected)
    val nulls = Seq((1L, null.asInstanceOf[String])).toDF("id", "text")
      .select(ShingleHashes.shingleHashes($"text", 2)).head
    assert(nulls.isNullAt(0))
  }
}
