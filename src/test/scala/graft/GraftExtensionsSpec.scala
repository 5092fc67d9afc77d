package graft

import org.scalatest.funsuite.AnyFunSuite

class GraftExtensionsSpec extends SparkTestBase {

  test("extensions register native functions for SQL") {
    withExtensionsSession { spark =>
      val row = spark.sql(
        "SELECT word_shingles('a b c d', 2) AS sh, min_md5_hex(array('a','b')) AS fp, " +
        "word_list_hits('the cat sat on the mat', array('the', 'cat')) AS hits").head
      assert(row.getSeq[String](0) == Seq("a b", "b c", "c d"))
      assert(row.getString(1).matches("[0-9a-f]{32}"))
      assert(row.getLong(2) == 3L) // 'the' twice + 'cat' once
      val ss = spark.sql(
        "SELECT search_sorted(15.0D, array(10.0D, 20.0D)) AS b").head
      assert(ss.getLong(0) == 1L)
    }
  }

  test("clear errors for bad SQL arguments") {
    withExtensionsSession { spark =>
      val e1 = intercept[Exception](spark.sql("SELECT cosine_sim(array(1.0D))").head)
      assert(e1.getMessage.contains("2 argument"), e1.getMessage)
      val e2 = intercept[Exception](
        spark.sql("SELECT rolling_min_hash('x', 'not an int')").head)
      assert(e2.getMessage.contains("integer literal"), e2.getMessage)
    }
  }
}
