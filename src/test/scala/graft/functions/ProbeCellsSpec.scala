package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** [[ProbeCells]]: bit-parity with the declarative sort_array formulation
  * it replaced inside `Similarity.ivfProbeCellsExpr` — full (rounded sim
  * desc, smallest id) pick order, not just the argmax — plus tie, null
  * and large-cell-count contracts, and consistency with [[NearestCell]]
  * at nProbe = 1.
  */
class ProbeCellsSpec extends SparkTestBase {

  import spark.implicits._

  /** The pre-r8 declarative probe, verbatim, as the parity reference. */
  private def declarative(vecCol: String,
      centroids: Array[(Long, Array[Double])], nProbe: Int) = {
    val candidates = centroids.map { case (id, vec) =>
      struct(round(graft.pipeline.Similarity.cosine(
        col(vecCol), array(vec.map(lit): _*)), 6).as("sim"),
        lit(-id).as("negCell"))
    }
    transform(
      slice(sort_array(array(candidates.toSeq: _*), asc = false), 1, nProbe),
      c => -c.getField("negCell"))
  }

  test("random corpus: kernel == declarative probe order, 40 cells, nProbe 4") {
    val rnd = new scala.util.Random(17L)
    val cents = Array.tabulate(40)(i =>
      i.toLong -> Array.fill(8)(rnd.nextGaussian()))
    val df = Seq.fill(200)(Array.fill(8)(rnd.nextGaussian().toFloat))
      .zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val rows = df.select($"id",
      ProbeCells.probeCells($"v", cents, 4).as("k"),
      declarative("v", cents, 4).as("d")).collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](1) === r.getSeq[Long](2), s"probe order differs: $r")
    }
  }

  test("nProbe = 1 equals NearestCell's argmax") {
    val rnd = new scala.util.Random(29L)
    val cents = Array.tabulate(25)(i =>
      i.toLong -> Array.fill(6)(rnd.nextGaussian()))
    val df = Seq.fill(100)(Array.fill(6)(rnd.nextGaussian().toFloat))
      .map(Tuple1(_)).toDF("v")
    val rows = df.select(
      ProbeCells.probeCells($"v", cents, 1).as("p"),
      NearestCell.nearestCell($"v", cents).getField("cell_id").as("a")).collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](0) === Seq(r.getLong(1)), s"probe(1) != argmax: $r")
    }
  }

  test("ties break to smaller cell ids; nProbe beyond cell count truncates") {
    // duplicate centroid under three ids: all sims tie
    val c = Array(9L -> Array(1.0, 0.0), 4L -> Array(1.0, 0.0),
      6L -> Array(1.0, 0.0))
    val df = Seq(Tuple1(Array(0.8f, 0.6f))).toDF("v")
    val got = df.select(ProbeCells.probeCells($"v", c, 5)).head().getSeq[Long](0)
    assert(got === Seq(4L, 6L, 9L))
  }

  test("null vector / null element: smallest ids in order, like the struct sort") {
    val c = Array(5L -> Array(1.0, 0.0), 2L -> Array(0.0, 1.0),
      8L -> Array(0.5, 0.5))
    val df = Seq(
      (1L, null.asInstanceOf[Array[java.lang.Float]]),
      (2L, Array[java.lang.Float](0.5f, null))
    ).toDF("id", "v")
    df.select(ProbeCells.probeCells($"v", c, 2).as("p")).collect().foreach { r =>
      assert(r.getSeq[Long](0) === Seq(2L, 5L), s"null contract: $r")
    }
  }

  test("1500 centroids compile and probe (no 64 KB codegen blowup)") {
    val rnd = new scala.util.Random(31L)
    val cents = Array.tabulate(1500)(i =>
      i.toLong -> Array.fill(16)(rnd.nextGaussian()))
    val df = Seq.fill(20)(Array.fill(16)(rnd.nextGaussian().toFloat))
      .map(Tuple1(_)).toDF("v")
    val out = df.select(ProbeCells.probeCells($"v", cents, 8)).collect()
    assert(out.forall(_.getSeq[Long](0).length == 8))
    // distinct and in-range
    out.foreach { r =>
      val p = r.getSeq[Long](0)
      assert(p.distinct.length == 8 && p.forall(i => i >= 0 && i < 1500))
    }
  }
}
