package graft.core

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class ForwardFillSpec extends SparkTestBase {

  import spark.implicits._

  test("global fill matches reference semantics (core.py:1034-1072)") {
    val df = Seq(
      (1L, Some(1.0), Some("a")),
      (2L, None, None),
      (3L, Some(3.0), None),
      (4L, None, Some("d")),
      (5L, None, None)
    ).toDF("ts", "x", "s")
    val out = ForwardFill.global(df, Seq("x", "s"), Seq(col("ts")))
      .orderBy("ts").collect()
    assert(out.map(r => Option(r.get(1)).orNull).toSeq == Seq(1.0, 1.0, 3.0, 3.0, 3.0))
    assert(out.map(r => Option(r.get(2)).orNull).toSeq == Seq("a", "a", "a", "d", "d"))
  }

  test("leading nulls stay null") {
    val df  = Seq((1L, None), (2L, Some(2.0)), (3L, None)).toDF("ts", "x")
    val out = ForwardFill.global(df, Seq("x"), Seq(col("ts"))).orderBy("ts").collect()
    assert(out.map(r => Option(r.get(1)).orNull).toSeq == Seq(null, 2.0, 2.0))
  }

  test("partitioned two-phase fill is equivalent to global fill") {
    val rnd = new scala.util.Random(7)
    val data = (0 until 5000).map { i =>
      (i.toLong,
       if (rnd.nextDouble() < 0.7) None else Some(rnd.nextInt(100).toDouble),
       if (rnd.nextDouble() < 0.9) None else Some(s"v${rnd.nextInt(10)}"))
    }
    val df = data.toDF("ts", "x", "s").repartition(8)
    val g = ForwardFill.global(df, Seq("x", "s"), Seq(col("ts")))
      .orderBy("ts").collect().map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2))))
    val p = ForwardFill.partitioned(df, Seq("x", "s"), "ts", numBuckets = 16)
      .orderBy("ts").collect().map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2))))
    assert(g.toSeq == p.toSeq)
  }

  test("null order keys: partitioned matches global (nulls-first leading bucket)") {
    val rnd = new scala.util.Random(13)
    val data = (0 until 2000).map { i =>
      (if (rnd.nextDouble() < 0.02) None else Some(i.toLong), // ~2% null ts
       if (rnd.nextDouble() < 0.5) None else Some(rnd.nextInt(100).toDouble),
       i.toLong) // tiebreak id keeps the order total among null ts
    }
    val df = data.toDF("ts", "x", "id").repartition(8)
    val g = ForwardFill.global(df, Seq("x"), Seq(col("ts"), col("id")))
      .orderBy(col("ts").asc_nulls_first, col("id"))
      .collect().map(r => (Option(r.get(0)), Option(r.get(1)), r.getLong(2)))
    val p = ForwardFill.partitioned(df, Seq("x"), "ts", tieCols = Seq(col("id")),
      numBuckets = 16)
      .orderBy(col("ts").asc_nulls_first, col("id"))
      .collect().map(r => (Option(r.get(0)), Option(r.get(1)), r.getLong(2)))
    assert(g.toSeq == p.toSeq)
  }

  test("bursty distribution: quantile buckets stay balanced and fill stays exact") {
    // 90% of events inside 1% of the time span — uniform value-range buckets
    // would put ~90% of rows into 2-3 buckets (each one window task).
    val rnd = new scala.util.Random(5)
    val data = (0 until 20000).map { i =>
      val ts = if (i < 18000) 1000000L + rnd.nextInt(10000)        // the burst
               else rnd.nextLong() % 1000000L + 1000000L           // the tail
      (math.abs(ts), if (rnd.nextDouble() < 0.6) None else Some(rnd.nextInt(50).toDouble), i.toLong)
    }
    val df = data.toDF("ts", "x", "id").repartition(8)

    val splits = ForwardFill.bucketBounds(df, "ts", 32)
    val counts = data.map { case (ts, _, _) => splits.count(ts.toDouble >= _) }
      .groupBy(identity).map(_._2.size).toSeq.sorted
    val median = counts(counts.size / 2)
    assert(counts.max <= 2 * math.max(median, 1),
      s"max bucket ${counts.max} vs median $median (buckets=${counts.size})")

    val g = ForwardFill.global(df, Seq("x"), Seq(col("ts"), col("id")))
      .orderBy("ts", "id").collect().map(r => (r.getLong(0), Option(r.get(1)), r.getLong(2)))
    val p = ForwardFill.partitioned(df, Seq("x"), "ts", tieCols = Seq(col("id")), numBuckets = 32)
      .orderBy("ts", "id").collect().map(r => (r.getLong(0), Option(r.get(1)), r.getLong(2)))
    assert(g.toSeq == p.toSeq)
  }

  test("NaN order keys bucket last, matching global sort order") {
    // Spark sorts NaN greater than every double: the partitioned fill must
    // place NaN-keyed rows in the LAST bucket or their fills/carries diverge
    val data = (0 until 500).map { i =>
      val ts = if (i % 50 == 0) Double.NaN else i.toDouble
      (ts, if (i % 3 == 0) Some(i.toDouble) else None, i.toLong)
    }
    val df = data.toDF("ts", "x", "id").repartition(4)
    def render(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getLong(2), Option(r.get(1)))).toSeq
    val g = render(ForwardFill.global(df, Seq("x"), Seq(col("ts"), col("id")))
      .orderBy(col("ts"), col("id")).collect())
    val p = render(ForwardFill.partitioned(df, Seq("x"), "ts",
      tieCols = Seq(col("id")), numBuckets = 8)
      .orderBy(col("ts"), col("id")).collect())
    assert(g == p)
  }

  test("partitioned fill with long all-null stretches crossing buckets") {
    // Only the first row non-null: every bucket after the first must carry it.
    val data = (0 until 1000).map(i => (i.toLong, if (i == 0) Some(42.0) else None))
    val df   = data.toDF("ts", "x")
    val out = ForwardFill.partitioned(df, Seq("x"), "ts", numBuckets = 10)
      .orderBy("ts").collect()
    assert(out.forall(_.getDouble(1) == 42.0))
  }
}
