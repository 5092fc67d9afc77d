package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** [[HilbertKey]]: the 2×2 base case, bijectivity and unit-step adjacency
  * over a full grid (the defining properties of a Hilbert walk), and the
  * locality claim against Morton order that justifies the operator.
  */
class HilbertKeySpec extends SparkTestBase {

  import spark.implicits._

  test("2x2 base case follows the canonical U walk") {
    assert(HilbertKey.xy2d(0, 0, 1) === 0L)
    assert(HilbertKey.xy2d(0, 1, 1) === 1L)
    assert(HilbertKey.xy2d(1, 1, 1) === 2L)
    assert(HilbertKey.xy2d(1, 0, 1) === 3L)
  }

  test("32x32: bijective onto [0, 1024) and consecutive keys are grid neighbors") {
    val pts = for (x <- 0 until 32; y <- 0 until 32) yield (x, y)
    val byD = pts.map { case (x, y) =>
      HilbertKey.xy2d(x.toLong, y.toLong, 5) -> (x, y) }.sortBy(_._1)
    assert(byD.map(_._1) === (0L until 1024L), "keys must cover 0..1023 exactly")
    byD.sliding(2).foreach { case Seq((_, (x1, y1)), (d2, (x2, y2))) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) === 1,
        s"jump at d=$d2: ($x1,$y1)->($x2,$y2)")
    }
  }

  test("locality: unaligned curve segments cover tighter boxes than Morton") {
    // dyadically ALIGNED power-of-two segments are perfect boxes on both
    // curves; real file splits land anywhere, so compare 24-key segments —
    // Hilbert stays compact (unit-step adjacency), Morton straddles its
    // quadrant jumps
    def segArea(key: (Long, Long) => Long): Double = {
      val segs = (for (x <- 0 until 32; y <- 0 until 32)
        yield (key(x.toLong, y.toLong), x, y))
        .groupBy(_._1 / 24).values
      segs.map { s =>
        val xs = s.map(_._2); val ys = s.map(_._3)
        (xs.max - xs.min + 1).toDouble * (ys.max - ys.min + 1)
      }.sum / segs.size
    }
    val hil = segArea(HilbertKey.xy2d(_, _, 5))
    val mor = segArea { (x, y) =>
      // 5-bit Morton interleave
      (0 until 5).map(i => (((x >> i) & 1L) << (2 * i)) |
        (((y >> i) & 1L) << (2 * i + 1))).sum
    }
    assert(hil < mor, s"hilbert mean box $hil not tighter than morton $mor")
  }

  test("column API: masks out-of-range bits, propagates nulls, codegen path") {
    val df = Seq((Some(3L), Some(5L)), (None, Some(1L)))
      .toDF("x", "y")
    val rows = df.select(HilbertKey.hilbertKey($"x", $"y", 3).as("h")).collect()
    assert(rows(0).getLong(0) === HilbertKey.xy2d(3, 5, 3))
    assert(rows(1).isNullAt(0))
    // masking: coordinates past 2^bits wrap to their low bits
    val m = Seq((11L, 2L)).toDF("x", "y")
      .select(HilbertKey.hilbertKey($"x", $"y", 3)).head().getLong(0)
    assert(m === HilbertKey.xy2d(3, 2, 3))
  }
}
