package graft

/** The driver's smoke contract: entry() returns rows on a plain session. */
class SparkEntrySpec extends SparkTestBase {

  test("entry runs end-to-end on sf0.001 and returns rows") {
    assumeTestData("/root/testdata/sf0.001")
    val df = SparkEntry.entry(spark)
    assert(df.columns.contains(core.Fuser.TimestampCol))
    assert(df.count() > 0)
  }

  test("every query name has either an oracle or is documented rows-only") {
    // The trained k-means centroid table is the only engine-side artifact
    // with no relational oracle; everything derived from it is oracled.
    val rowsOnly = Set("q_ivf_centroids")
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    assert(SparkEntry.queries.keySet.diff(SparkEntry.oracleSql.keySet) == rowsOnly)
  }

  test("all queries run non-empty at sf0.001") {
    val dir = "/root/testdata/sf0.001"
    assumeTestData(dir)
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, dir).count()
      assert(n > 0, s"$name returned no rows at sf0.001")
    }
  }
}
