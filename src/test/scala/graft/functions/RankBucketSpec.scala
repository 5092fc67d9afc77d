package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class RankBucketSpec extends SparkTestBase {

  import spark.implicits._

  test("matches the per-dim SearchSorted dispatch on randomized grids") {
    val rnd = new scala.util.Random(31)
    val grids: Map[Int, Array[Double]] = (0 until 8).map { d =>
      d -> Array.fill(1 + rnd.nextInt(6))(rnd.nextDouble() * 10).distinct.sorted
    }.toMap
    val rows = (0 until 500).map { i =>
      (i.toLong, rnd.nextInt(8), rnd.nextDouble() * 12 - 1)
    }
    val df = rows.toDF("id", "dim_idx", "v")
    // reference: the literal when-chain of SearchSorted calls (the form
    // the kernel replaced — correct, just not codegen-viable at 64 dims)
    val chain = grids.toSeq.sortBy(_._1).foldLeft(lit(null).cast("long")) {
      case (acc, (d, g)) =>
        when(col("dim_idx") === d, SearchSorted.searchSorted(col("v"), g))
          .otherwise(acc)
    }
    val got = df.select(col("id"),
        RankBucket.rankBucket(col("v"), col("dim_idx"), grids)
          .getField("q_bucket").as("kb"),
        chain.as("cb"))
      .collect()
    got.foreach { r =>
      assert(r.getLong(1) == r.getLong(2), s"id=${r.getLong(0)}: $r")
    }
  }

  test("denom is |grid|+1; nulls and ungridded dims yield null struct fields") {
    val grids = Map(0 -> Array(1.0, 2.0, 3.0), 2 -> Array(5.0))
    val df = Seq(
      (1L, Some(0), Some(2.5)),  // bucket 2, denom 4
      (2L, Some(1), Some(2.5)),  // dim 1 has no grid -> nulls
      (3L, Some(5), Some(2.5)),  // beyond trained range -> nulls
      (4L, Some(2), Some(5.0)),  // bucket 1 (5.0 <= 5.0), denom 2
      (5L, Some(0), None),       // null value -> nulls
      (6L, None, Some(1.0)))     // null dim -> nulls
      .toDF("id", "dim_idx", "v")
    val out = df.select(col("id"),
        RankBucket.rankBucket(col("v").cast("double"), col("dim_idx"), grids).as("rb"))
      .select(col("id"), col("rb.q_bucket"), col("rb.denom"))
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .sortBy(_._1)
    assert(out.toSeq == Seq(
      (1L, Some(2L), Some(4.0)),
      (2L, None, None),
      (3L, None, None),
      (4L, Some(1L), Some(2.0)),
      (5L, None, None),
      (6L, None, None)), out.toSeq.toString)
  }
}
