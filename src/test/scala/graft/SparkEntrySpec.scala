package graft

/** The driver's smoke contract: entry() returns rows on a plain session. */
class SparkEntrySpec extends SparkTestBase {

  test("entry runs end-to-end on sf0.001 and returns rows") {
    assumeTestData("/root/testdata/sf0.001")
    val df = SparkEntry.entry(spark)
    assert(df.columns.contains(core.Fuser.TimestampCol))
    assert(df.count() > 0)
  }

  test("every query name has an oracle") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    assert(SparkEntry.queries.keySet.diff(SparkEntry.oracleSql.keySet).isEmpty)
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
