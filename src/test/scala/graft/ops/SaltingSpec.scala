package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SaltingSpec extends SparkTestBase {

  import spark.implicits._

  // 90% of rows share one hot key; payloads differ so the salt spreads them
  private def skewed = spark.range(10000).select(
    when($"id" < 9000, lit(7L)).otherwise($"id").as("k"),
    $"id".as("payload"))

  private def dim = Seq((7L, "hot"), (9500L, "cold"), (12345L, "absent"))
    .toDF("k", "label")

  test("salted inner/left joins equal their plain counterparts") {
    for (how <- Seq("inner", "left", "left_semi", "left_anti")) {
      val plain  = skewed.join(dim, Seq("k"), how)
      val salted = Salting.saltedJoin(skewed, dim, Seq("k"), buckets = 8, how)
      assert(salted.columns.toSeq == plain.columns.toSeq, how)
      assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty,
        s"$how mismatch")
    }
  }

  test("the hot key actually spreads across all salt buckets") {
    val salts = skewed
      .withColumn("__salt",
        pmod(xxhash64(skewed.columns.map(col): _*), lit(8L)).cast("int"))
      .filter($"k" === 7L)
      .select(countDistinct($"__salt")).head.getLong(0)
    assert(salts == 8L, s"hot key landed in only $salts of 8 buckets")
  }

  test("task-retry determinism: salting twice yields identical assignments") {
    val a = Salting.saltedJoin(skewed, dim, Seq("k"), buckets = 8).collect()
    val b = Salting.saltedJoin(skewed, dim, Seq("k"), buckets = 8).collect()
    assert(a.map(_.toString).sorted.toSeq == b.map(_.toString).sorted.toSeq)
  }

  test("right/full directions are rejected") {
    intercept[IllegalArgumentException] {
      Salting.saltedJoin(skewed, dim, Seq("k"), 8, "right")
    }
    intercept[IllegalArgumentException] {
      Salting.saltedJoin(skewed, dim, Seq("k"), 8, "full_outer")
    }
  }
}
