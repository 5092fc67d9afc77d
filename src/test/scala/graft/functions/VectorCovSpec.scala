package graft.functions

import graft.SparkTestBase
import graft.pipeline.EmbedStats
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** [[VectorCovSums]] / [[EmbedStats]]: the one-pass co-moment aggregate
  * against brute-force sums, including the merge path (many partitions)
  * and the skip-whole-row null contract.
  */
class VectorCovSpec extends SparkTestBase {

  import spark.implicits._

  private val vecs: Seq[Seq[Double]] = Seq(
    Seq(1.0, 2.0, 3.0),
    Seq(4.0, 5.0, 6.0),
    Seq(-1.0, 0.5, 2.5),
    Seq(0.0, -2.0, 1.0),
    Seq(2.0, 2.0, 2.0))

  private def brute(i: Int, j: Int): (Double, Double, Double) =
    (vecs.map(_(i)).sum, vecs.map(_(j)).sum, vecs.map(v => v(i) * v(j)).sum)

  test("vectorCovSums matches brute-force sums across the merge path") {
    // 5 rows over 4 partitions forces partial buffers + merges
    val df = vecs.toDF("v").repartition(4)
    val rows = df.agg(VectorCovSums.vectorCovSums($"v", 3).as("s"))
      .select(explode($"s").as("e")).select("e.*")
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r)).toMap
    assert(rows.size === 6) // d(d+1)/2 for d=3
    for (i <- 0 until 3; j <- i until 3) {
      val r = rows((i, j))
      val (si, sj, sij) = brute(i, j)
      assert(r.getLong(2) === 5L)
      assert(math.abs(r.getDouble(3) - si) < 1e-12, s"si($i,$j)")
      assert(math.abs(r.getDouble(4) - sj) < 1e-12, s"sj($i,$j)")
      assert(math.abs(r.getDouble(5) - sij) < 1e-12, s"sij($i,$j)")
    }
  }

  test("null, short, and null-element vectors are skipped whole") {
    val df = Seq(
      Some(Seq(Some(1.0), Some(2.0), Some(3.0))),
      None,                                       // null vector
      Some(Seq(Some(1.0), Some(2.0))),            // short
      Some(Seq(Some(1.0), None, Some(3.0))),      // null element
      Some(Seq(Some(4.0), Some(5.0), Some(6.0), Some(7.0))) // long prefix used
    ).toDF("v")
    val rows = df.agg(VectorCovSums.vectorCovSums($"v", 3).as("s"))
      .select(explode($"s").as("e")).select("e.*").collect()
    assert(rows.forall(_.getLong(2) == 2L))
    val d00 = rows.find(r => r.getInt(0) == 0 && r.getInt(1) == 0).get
    assert(d00.getDouble(3) === 1.0 + 4.0)
    assert(d00.getDouble(5) === 1.0 + 16.0)
  }

  test("float input widens exactly like the double path") {
    val fv = vecs.map(_.map(_.toFloat))
    val a = fv.toDF("v").agg(VectorCovSums.vectorCovSums($"v", 3)).head.getSeq[Row](0)
    val b = vecs.toDF("v").agg(VectorCovSums.vectorCovSums($"v", 3)).head.getSeq[Row](0)
    // these fixtures are exact binary floats, so widening changes nothing
    assert(a === b)
  }

  test("EmbedStats.covarianceMatrix finishes cov_pop correctly") {
    val out = EmbedStats.covarianceMatrix(vecs.toDF("v"), "v", dim = 3, roundTo = 9)
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getDouble(3))).toMap
    val n = vecs.length.toDouble
    for (i <- 0 until 3; j <- i until 3) {
      val mi = vecs.map(_(i)).sum / n
      val mj = vecs.map(_(j)).sum / n
      val expected = vecs.map(v => (v(i) - mi) * (v(j) - mj)).sum / n
      assert(math.abs(out((i, j)) - expected) < 1e-8, s"cov($i,$j)")
    }
  }

  test("leadingPC converges to the dominant eigenpair on a planted spectrum") {
    // points along (3,4)/5 with tiny off-axis noise: leading PC must be
    // ±(0.6, 0.8) with eigenvalue = variance along the axis
    val ts = Seq(-2.0, -1.0, 0.0, 1.0, 2.0)
    val pts = ts.map(t => Seq(0.6 * t, 0.8 * t, 0.001 * t * t))
    val (e, lam, mu) = EmbedStats.leadingPC(pts.toDF("v"), "v", dim = 3)
    assert(math.abs(math.abs(e(0)) - 0.6) < 1e-6)
    assert(math.abs(math.abs(e(1)) - 0.8) < 1e-6)
    assert(e(0) > 0, "sign convention: first significant component positive")
    assert(math.abs(lam - 2.0) < 1e-3) // var of t over ts = 2
    assert(mu.take(2).forall(m => math.abs(m) < 1e-12))
    // eigen-residual: C e = lam e within tight tolerance
    val n = pts.length.toDouble
    val mus = (0 until 3).map(d => pts.map(_(d)).sum / n)
    def cov(i: Int, j: Int) =
      pts.map(p => (p(i) - mus(i)) * (p(j) - mus(j))).sum / n
    for (i <- 0 until 3) {
      val cei = (0 until 3).map(j => cov(i, j) * e(j)).sum
      assert(math.abs(cei - lam * e(i)) < 1e-9, s"residual at $i")
    }
  }

  test("projectOnto: centered dot against a literal direction") {
    val df = Seq(Seq(1.0, 0.0), Seq(3.0, 0.0), Seq(5.0, 2.0)).toDF("v")
    val out = EmbedStats.projectOnto(df, "v", Array(1.0, 0.0), Array(3.0, 2.0 / 3))
      .select("proj").collect().map(_.getDouble(0)).sorted
    assert(out.toSeq === Seq(-2.0, 0.0, 2.0))
  }

  test("EmbedStats.dimStats per-dimension profile") {
    val out = EmbedStats.dimStats(vecs.toDF("v"), "v", roundTo = 9)
      .collect().map(r => r.getInt(0) -> r).toMap
    for (d <- 0 until 3) {
      val xs = vecs.map(_(d))
      val r = out(d)
      assert(r.getLong(1) === 5L)
      assert(math.abs(r.getDouble(2) - xs.sum / 5) < 1e-8)
      val m = xs.sum / 5
      assert(math.abs(r.getDouble(3) - xs.map(x => (x - m) * (x - m)).sum / 5) < 1e-8)
      assert(r.getDouble(4) === xs.min)
      assert(r.getDouble(5) === xs.max)
    }
  }
}
