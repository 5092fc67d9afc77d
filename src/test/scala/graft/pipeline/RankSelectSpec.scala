package graft.pipeline

import graft.SparkTestBase

class RankSelectSpec extends SparkTestBase {

  import spark.implicits._

  /** Brute-force reference: driver-side sort per key, value at rank
    * ⌈p·n⌉, deduped sorted — the definition the two-phase trainer must
    * reproduce bit-for-bit.
    */
  private def bruteGrid(data: Seq[(String, Double)], ps: Seq[Double])
      : Map[String, Array[Double]] =
    data.groupBy(_._1).map { case (k, rows) =>
      val sorted = rows.map(_._2).sorted
      val n = sorted.length
      k -> ps.map(p => sorted(math.ceil(p * n).toLong.max(1L).min(n).toInt - 1))
        .distinct.sorted.toArray
    }

  private def check(data: Seq[(String, Double)], ps: Seq[Double],
      accuracy: Int = 10000): Unit = {
    val df = data.toDF("k", "v")
    val got = RankSelect.exactQuantileGrid(df, "k", "v", ps, accuracy)
    val exp = bruteGrid(data, ps)
    assert(got.keySet == exp.keySet, s"keys ${got.keySet} vs ${exp.keySet}")
    for (k <- exp.keySet)
      assert(got(k).toSeq == exp(k).toSeq,
        s"key $k: ${got(k).toSeq} vs ${exp(k).toSeq}")
    // the table-backed unbounded-keys twin must produce the IDENTICAL
    // grids on the same input (bit-exact, not approximately)
    val tbl = RankSelect.exactQuantileGridTable(df, "k", "v", ps, accuracy)
      .collect()
      .map(r => r.getString(0) -> r.getSeq[Double](1).toArray).toMap
    assert(tbl.keySet == exp.keySet, s"table keys ${tbl.keySet} vs ${exp.keySet}")
    for (k <- exp.keySet)
      assert(tbl(k).toSeq == exp(k).toSeq,
        s"table path, key $k: ${tbl(k).toSeq} vs ${exp(k).toSeq}")
  }

  private val ladder = (1 to 19).map(_ * 0.05)

  test("matches the brute-force discrete grid on randomized keys, no sort fallback") {
    val rnd = new scala.util.Random(42)
    val data = for {
      k <- Seq("a", "b", "c", "d", "e")
      _ <- 1 to 2000
    } yield (k, math.floor(rnd.nextDouble() * 500) / 10.0) // heavy duplicate mass
    val before = RankSelect.fallbackCount.get()
    check(data, ladder)
    assert(RankSelect.fallbackCount.get() == before,
      "ordinary data must not pay the exact-sort fallback")
  }

  test("heavy ties: one value owning 90% of a key stays exact") {
    val rnd = new scala.util.Random(7)
    val data = (1 to 9000).map(_ => ("t", 5.0)) ++
      (1 to 1000).map(_ => ("t", rnd.nextDouble() * 10))
    check(data, ladder)
  }

  test("tiny keys and continuous values stay exact") {
    val rnd = new scala.util.Random(3)
    val data = Seq(("one", 3.14)) ++
      (1 to 3).map(i => ("three", i * 1.5)) ++
      (1 to 5000).map(_ => ("big", rnd.nextGaussian()))
    check(data, ladder)
    check(data, Seq(0.5))
    check(data, Seq(0.01, 0.99))
  }

  test("coarse sketch accuracy widens bands but stays exact") {
    val rnd = new scala.util.Random(11)
    val data = (1 to 20000).map(_ => ("k", rnd.nextDouble() * 100))
    check(data, ladder, accuracy = 100)
  }

  test("keys with only null values are absent from the grid") {
    val df = Seq(("a", Some(1.0)), ("a", Some(2.0)), ("z", None), ("z", None))
      .toDF("k", "v")
    val got = RankSelect.exactQuantileGrid(df, "k", "v", Seq(0.5))
    assert(got.keySet == Set("a"))
    assert(got("a").toSeq == Seq(1.0))
    val tbl = RankSelect.exactQuantileGridTable(df, "k", "v", Seq(0.5)).collect()
    assert(tbl.map(_.getString(0)).toSet == Set("a"))
    assert(tbl.head.getSeq[Double](1) == Seq(1.0))
  }

  test("table path: many keys, no sort fallback, plan stays keyed") {
    // the unbounded-keys regime in miniature: 2000 distinct keys — far
    // past anything the literal-fold path would want to collect — each
    // with a small slice; grids must match brute force per key and the
    // whole run must never pay the single-key sort fallback
    val rnd = new scala.util.Random(19)
    val data = for {
      k <- (0 until 2000).map(i => f"k$i%04d")
      _ <- 1 to 5
    } yield (k, math.floor(rnd.nextDouble() * 100) / 2.0)
    val before = RankSelect.fallbackCount.get()
    val exp = bruteGrid(data, Seq(0.25, 0.5, 0.75))
    val tbl = RankSelect.exactQuantileGridTable(
        data.toDF("k", "v"), "k", "v", Seq(0.25, 0.5, 0.75))
      .collect()
      .map(r => r.getString(0) -> r.getSeq[Double](1).toArray).toMap
    assert(tbl.keySet == exp.keySet)
    for (k <- exp.keySet)
      assert(tbl(k).toSeq == exp(k).toSeq,
        s"key $k: ${tbl(k).toSeq} vs ${exp(k).toSeq}")
    assert(RankSelect.fallbackCount.get() == before,
      "ordinary data must not pay the exact-sort fallback")
  }
}
