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

  test("r8 functions: normalize_for_dedup, pair_components, vector_cov_sums via SQL") {
    withExtensionsSession { spark =>
      val n = spark.sql("SELECT normalize_for_dedup('  Hello,  WORLD!! ') AS s").head
      assert(n.getString(0) == "hello world")
      val pc = spark.sql(
        """SELECT explode(pair_components(a, b)) AS c FROM VALUES
          |  (1L, 2L), (2L, 3L), (7L, 9L) AS t(a, b)""".stripMargin)
        .selectExpr("c.id", "c.comp").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(pc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 9L -> 7L))
      val cov = spark.sql(
        """SELECT explode(vector_cov_sums(v, 2)) AS s FROM VALUES
          |  (array(1.0D, 2.0D)), (array(3.0D, 4.0D)) AS t(v)""".stripMargin)
        .selectExpr("s.i", "s.j", "s.n", "s.sij").collect()
        .map(r => (r.getInt(0), r.getInt(1)) -> (r.getLong(2), r.getDouble(3))).toMap
      assert(cov((0, 0)) == ((2L, 10.0))) // 1 + 9
      assert(cov((0, 1)) == ((2L, 14.0))) // 2 + 12
      assert(cov((1, 1)) == ((2L, 20.0))) // 4 + 16
    }
  }

  test("r10 functions: shingle_hashes and min_hash_sig via SQL") {
    withExtensionsSession { spark =>
      val sh = spark.sql(
        "SELECT shingle_hashes('a b c d', 3) AS h, " +
        "array(xxhash64('a b c'), xxhash64('b c d')) AS ref").head
      assert(sh.getSeq[Long](0) == sh.getSeq[Long](1))
      val ms = spark.sql(
        "SELECT min_hash_sig('a b c d', 3, 4) AS sig, " +
        "array(least(xxhash64(0, 'a b c'), xxhash64(0, 'b c d')), " +
        "      least(xxhash64(1, 'a b c'), xxhash64(1, 'b c d')), " +
        "      least(xxhash64(2, 'a b c'), xxhash64(2, 'b c d')), " +
        "      least(xxhash64(3, 'a b c'), xxhash64(3, 'b c d'))) AS ref").head
      assert(ms.getSeq[Long](0) == ms.getSeq[Long](1))
    }
  }

  test("r12 functions: pii_counts and pii_scrub via SQL") {
    withExtensionsSession { spark =>
      val r = spark.sql(
        "SELECT pii_counts('u@ex.com https://x 555-867-5309 10.0.0.1') AS c, " +
        "pii_scrub('mail u@ex.com or https://x.y/z now') AS s").head
      val c = r.getStruct(0)
      assert((0 until 4).map(c.getLong) == Seq(1L, 1L, 1L, 1L))
      assert(r.getString(1) == "mail <EMAIL> or <URL> now")
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
