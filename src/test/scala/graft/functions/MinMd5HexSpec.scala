package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class MinMd5HexSpec extends SparkTestBase {

  import spark.implicits._

  test("equivalent to array_min(transform(arr, md5)) incl. nulls and empties") {
    val rnd = new scala.util.Random(3)
    val data = (0 until 500).map { i =>
      val words = Seq.fill(rnd.nextInt(6))(rnd.alphanumeric.take(1 + rnd.nextInt(12)).mkString)
      (i.toLong, words)
    } :+ (9998L, Seq.empty[String])
    val df = data.toDF("id", "arr")
      .withColumn("arr", when($"id" === 9998L, array().cast("array<string>")).otherwise($"arr"))

    val rows = df.select($"id",
        MinMd5Hex.minMd5Hex($"arr").as("native"),
        array_min(transform($"arr", s => md5(s))).as("builtin"))
      .collect()
    rows.foreach { r =>
      assert(Option(r.getString(1)) == Option(r.getString(2)), s"id=${r.getLong(0)}")
    }
  }

  test("SQL registration") {
    MinMd5Hex.register(spark)
    val out = spark.sql("SELECT min_md5_hex(array('b', 'a')) AS fp").head.getString(0)
    // exact: min(md5('a'), md5('b'))
    val expected = Seq("a", "b").map { s =>
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes)
        .map("%02x".format(_)).mkString
    }.min
    assert(out == expected)
  }

  test("whole-stage codegen keeps the expression compiled") {
    val df = spark.range(3)
      .select(MinMd5Hex.minMd5Hex(array($"id".cast("string"), lit("y"))).as("fp"))
    val plan = df.queryExecution.executedPlan.toString
    // `*(n)` prefixes mark operators inside a WholeStageCodegen stage.
    assert(plan.contains("*(1) Project [minmd5hex"), plan)
    assert(df.head.getString(0).matches("[0-9a-f]{32}"))
  }
}
