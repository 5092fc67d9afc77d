package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class VectorSpec extends SparkTestBase {

  import spark.implicits._

  private def builtinDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  test("native dot and cosine are bit-identical to the builtin forms (float arrays)") {
    val rnd = new scala.util.Random(5)
    val df = (0 until 200).map { i =>
      (i.toLong, Array.fill(64)(rnd.nextGaussian().toFloat),
        Array.fill(64)(rnd.nextGaussian().toFloat))
    }.toDF("id", "a", "b")
    val rows = df.select(
        VectorDot.vectorDot($"a", $"b").as("ndot"),
        builtinDot($"a", $"b").as("bdot"),
        CosineSim.cosineSim($"a", $"b").as("ncos"),
        (builtinDot($"a", $"b") /
          (sqrt(builtinDot($"a", $"a")) * sqrt(builtinDot($"b", $"b")))).as("bcos"))
      .collect()
    rows.foreach { r =>
      assert(r.getDouble(0) == r.getDouble(1)) // bit-identical, no tolerance
      assert(r.getDouble(2) == r.getDouble(3))
    }
  }

  test("mixed float/double element types widen like casts") {
    val df = Seq((Array(1.0f, 2.0f), Array(0.5, 0.25))).toDF("a", "b")
    assert(df.select(VectorDot.vectorDot($"a", $"b")).head.getDouble(0) == 1.0)
    val cos = df.select(CosineSim.cosineSim($"a", $"a".cast("array<double>")))
      .head.getDouble(0)
    assert(math.abs(cos - 1.0) < 1e-12)
  }

  test("length mismatch fails loudly") {
    val df = Seq((Array(1.0f, 2.0f), Array(1.0f))).toDF("a", "b")
    intercept[Exception] {
      df.select(VectorDot.vectorDot($"a", $"b")).collect()
    }
  }
}
