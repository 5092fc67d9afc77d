package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SearchSortedSpec extends SparkTestBase {

  import spark.implicits._

  test("bucketOf counts splits <= value (searchsorted side=right)") {
    val splits = Array(10.0, 20.0, 30.0)
    assert(SearchSorted.bucketOf(5.0, splits) == 0L)
    assert(SearchSorted.bucketOf(10.0, splits) == 1L) // equal counts the split
    assert(SearchSorted.bucketOf(15.0, splits) == 1L)
    assert(SearchSorted.bucketOf(30.0, splits) == 3L)
    assert(SearchSorted.bucketOf(99.0, splits) == 3L)
    assert(SearchSorted.bucketOf(1.0, Array(0.0)) == 1L)
  }

  test("column expression matches the equivalent when-sum on random data") {
    val rnd    = new scala.util.Random(3)
    val splits = (1 to 255).map(_ * 17.0).toArray
    val df     = (0 until 2000).map(_ => rnd.nextDouble() * 5000).toDF("v")
    val whenSum = splits.map(s => when($"v" >= lit(s), 1L).otherwise(0L)).reduce(_ + _)
    val diff = df.select(
        SearchSorted.searchSorted($"v", splits).as("fast"), whenSum.as("slow"))
      .filter($"fast" =!= $"slow").count()
    assert(diff == 0)
  }

  test("null input yields null, not a bucket") {
    val df = Seq(Some(12.0), None).toDF("v")
    val out = df.select(SearchSorted.searchSorted($"v", Array(10.0)).as("b"))
      .collect().map(r => Option(r.get(0)))
    assert(out.toSeq == Seq(Some(1L), None))
  }
}
