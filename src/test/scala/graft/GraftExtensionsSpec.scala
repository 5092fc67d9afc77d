package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class GraftExtensionsSpec extends AnyFunSuite {

  test("extensions register native functions for SQL") {
    // Force a genuinely new SparkSession (extensions only apply at build
    // time) while reusing the JVM's SparkContext; restore the shared session
    // afterwards and never stop the shared context.
    val prior = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val spark = SparkSession.builder()
        .master("local[2]")
        .config("spark.ui.enabled", "false")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val row = spark.sql(
        "SELECT word_shingles('a b c d', 2) AS sh, min_md5_hex(array('a','b')) AS fp, " +
        "word_list_hits('the cat sat on the mat', array('the', 'cat')) AS hits").head
      assert(row.getSeq[String](0) == Seq("a b", "b c", "c d"))
      assert(row.getString(1).matches("[0-9a-f]{32}"))
      assert(row.getLong(2) == 3L) // 'the' twice + 'cat' once
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prior.foreach(SparkSession.setDefaultSession)
    }
  }
}
