package graft.ops

import graft.SparkTestBase
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.forAll

/** Property-based invariants for the round-7 series analytics — the
  * algebraic facts that must hold for ANY input, not just the
  * hand-computed cases. (Plain ScalaCheck runner, like IntervalPropsSpec:
  * the scalatest-plus bridge isn't in the offline cache. Few iterations —
  * each trial runs Spark jobs.)
  */
class SeriesPropsSpec extends SparkTestBase {

  import spark.implicits._

  private def check(prop: Prop, trials: Int = 12): Unit = {
    val res = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(trials).withWorkers(1), prop)
    assert(res.passed, res.status.toString)
  }

  private val series: Gen[List[Double]] =
    Gen.choose(2, 40).flatMap(n =>
      Gen.listOfN(n, Gen.choose(-1000, 1000).map(_ / 10.0)))

  test("drawdown: peak monotone non-decreasing, drawdown >= 0, final peak = max") {
    check(forAll(series) { xs =>
      val df = xs.zipWithIndex.map { case (v, i) => ("k", i.toLong, v) }
        .toDF("key", "t", "value")
      val rows = RollingStats.runningDrawdown(df, Seq("key"), "t", "value")
        .orderBy("t").collect()
      val peaks = rows.map(_.getDouble(3))
      Prop(peaks.zip(peaks.tail).forall { case (a, b) => a <= b } &&
        rows.map(_.getDouble(4)).forall(_ >= 0.0) &&
        peaks.last == xs.max) :| s"xs=$xs"
    })
  }

  test("cusum: the deviation statistic is shift-invariant") {
    // adding a constant c to every value leaves n*cum - rn*S unchanged:
    // dev' = n*(cum + rn*c) - rn*(S + n*c) = dev
    check(forAll(series, Gen.choose(-500, 500)) { (xs, shift) =>
      def run(vals: List[Double]): (Long, Long) = {
        val df = vals.zipWithIndex.map { case (v, i) =>
          ("k", i.toLong, math.round(v * 10)) }.toDF("key", "t", "cents")
        val r = Anomalies.cusumChangepoint(df, Seq("key"), "t", "cents").head()
        (r.getAs[Long]("cp_rank"), r.getAs[Long]("max_abs_dev"))
      }
      Prop(run(xs) == run(xs.map(_ + shift.toDouble))) :| s"xs=$xs shift=$shift"
    }, trials = 8)
  }

  test("spearman is bit-identical under a strictly monotone transform of x") {
    check(forAll(series) { xs =>
      val ys = xs.indices.map(i => ((i * 7919) % 100).toLong)
      def corrOf(trans: Double => Double): Option[Double] = {
        val df = xs.zip(ys).zipWithIndex
          .map { case ((x, y), i) => ("k", i.toLong, trans(x), y) }
          .toDF("key", "id", "x", "y")
        val r = RollingStats.spearmanCorr(df, Seq("key"), "x", "y",
          tieCols = Seq("id")).head()
        if (r.isNullAt(2)) None else Some(r.getDouble(2))
      }
      // x -> x^3 + 2x is strictly increasing; ties collapse to the SAME id
      // order, so the rank frames and hence the statistic are identical
      Prop(corrOf(identity) == corrOf(x => x * x * x + 2 * x)) :| s"xs=$xs"
    }, trials = 8)
  }
}
