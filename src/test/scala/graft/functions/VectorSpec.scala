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

  test("prefix cosines: each element bit-identical to slice-then-cosine") {
    val rnd = new scala.util.Random(17)
    val dims = Seq(8, 16, 32, 64)
    val df = (0 until 200).map { i =>
      (i.toLong, Array.fill(64)(rnd.nextGaussian().toFloat),
        Array.fill(64)(rnd.nextGaussian().toFloat))
    }.toDF("id", "a", "b")
    val cols = PrefixCosines.prefixCosines($"a", $"b", dims).as("pc") +:
      dims.zipWithIndex.map { case (d, k) =>
        CosineSim.cosineSim(slice($"a", 1, d), slice($"b", 1, d)).as(s"c$k")
      }
    df.select(cols: _*).collect().foreach { r =>
      val pc = r.getSeq[Double](0)
      dims.indices.foreach(k => assert(pc(k) == r.getDouble(k + 1),
        s"prefix dim ${dims(k)} must be bit-identical to the slice form"))
    }
    // a dim past the array length degrades to the full vector (slice
    // semantics), and a null element nulls the whole ladder
    val tiny = Seq((Array(1.0f, 2.0f), Array(2.0f, 1.0f))).toDF("a", "b")
    val row = tiny.select(
      PrefixCosines.prefixCosines($"a", $"b", Seq(1, 5)).as("pc"),
      CosineSim.cosineSim($"a", $"b").as("full")).head()
    assert(row.getSeq[Double](0)(1) == row.getDouble(1))
    val withNull = Seq((Array[java.lang.Float](1.0f, null),
        Array[java.lang.Float](1.0f, 1.0f))).toDF("a", "b")
    assert(withNull.select(
      PrefixCosines.prefixCosines($"a", $"b", Seq(1, 2))).head().isNullAt(0))
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
