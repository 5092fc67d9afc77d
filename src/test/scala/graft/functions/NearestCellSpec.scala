package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** [[NearestCell]]: bit-parity with the declarative struct-max formulation
  * it replaced inside [[graft.pipeline.Similarity.ivfCellExpr]] — same
  * rounded cosine, same smallest-id tie-break — plus the null-vector /
  * null-element / NaN edge contracts, at a centroid count past the old
  * formulation's comfort zone.
  */
class NearestCellSpec extends SparkTestBase {

  import spark.implicits._

  /** The pre-r8 declarative argmax, verbatim, as the parity reference. */
  private def declarative(vecCol: String,
      centroids: Array[(Long, Array[Double])]) = {
    val candidates = centroids.map { case (id, vec) =>
      struct(round(graft.pipeline.Similarity.cosine(
        col(vecCol), array(vec.map(lit): _*)), 6).as("sim"),
        lit(-id).as("negCell"))
    }
    val best = array_max(array(candidates.toSeq: _*))
    (-best.getField("negCell"), best.getField("sim"))
  }

  test("random corpus: kernel == declarative argmax, cell and sim, 50 cells") {
    val rnd = new scala.util.Random(3L)
    val cents = Array.tabulate(50)(i =>
      i.toLong -> Array.fill(8)(rnd.nextGaussian()))
    val vecs = Seq.fill(300)(Array.fill(8)(rnd.nextGaussian().toFloat))
      .zipWithIndex.map { case (v, i) => (i.toLong, v) }
    val df = vecs.toDF("id", "v")
    val (dc, ds) = declarative("v", cents)
    val both = df
      .withColumn("kc", NearestCell.nearestCell($"v", cents).getField("cell_id"))
      .withColumn("ks", NearestCell.nearestCell($"v", cents).getField("sim"))
      .withColumn("dc", dc).withColumn("ds", ds)
      .select("id", "kc", "ks", "dc", "ds").collect()
    both.foreach { r =>
      assert(r.getLong(1) == r.getLong(3), s"cell mismatch at id ${r.getLong(0)}: $r")
      assert(r.getDouble(2) == r.getDouble(4), s"sim mismatch at id ${r.getLong(0)}: $r")
    }
  }

  test("exact tie on rounded sim breaks to the smallest cell id") {
    // two identical centroids under different ids: rounded sims are equal
    val c = Array(7L -> Array(1.0, 0.0), 3L -> Array(1.0, 0.0),
      9L -> Array(0.0, 1.0))
    val df = Seq(Tuple1(Array(0.9f, 0.1f))).toDF("v")
    val r = df.select(NearestCell.nearestCell($"v", c).getField("cell_id")).head()
    assert(r.getLong(0) === 3L)
  }

  test("null vector and null element give (smallest id, null sim)") {
    val c = Array(5L -> Array(1.0, 0.0), 2L -> Array(0.0, 1.0))
    val df = Seq(
      (1L, null.asInstanceOf[Array[java.lang.Float]]),
      (2L, Array[java.lang.Float](0.5f, null))
    ).toDF("id", "v")
    val rows = df.select($"id",
      NearestCell.nearestCell($"v", c).getField("cell_id").as("cell"),
      NearestCell.nearestCell($"v", c).getField("sim").as("sim"))
      .orderBy("id").collect()
    rows.foreach { r =>
      assert(r.getLong(1) === 2L, s"null-sim tie must hand the smallest id: $r")
      assert(r.isNullAt(2), s"sim must be null: $r")
    }
  }

  test("zero-norm vector: NaN sim wins like Spark's double ordering") {
    val c = Array(0L -> Array(1.0, 0.0), 1L -> Array(0.0, 1.0))
    val df = Seq(Tuple1(Array(0.0f, 0.0f))).toDF("v")
    val (dc, _) = declarative("v", c)
    val r = df.select(
      NearestCell.nearestCell($"v", c).getField("cell_id").as("k"),
      dc.as("d")).head()
    assert(r.getLong(0) === r.getLong(1),
      s"NaN handling diverges from declarative: $r")
  }

  test("length mismatch throws, like CosineSim") {
    val c = Array(0L -> Array(1.0, 0.0, 0.0))
    val df = Seq(Tuple1(Array(1.0f, 0.0f))).toDF("v")
    val e = intercept[Exception] {
      df.select(NearestCell.nearestCell($"v", c)).collect()
    }
    assert(e.getMessage != null)
  }

  test("1500 centroids: plan compiles and evaluates (no 64 KB codegen blowup)") {
    val rnd = new scala.util.Random(9L)
    val cents = Array.tabulate(1500)(i =>
      i.toLong -> Array.fill(16)(rnd.nextGaussian()))
    val df = Seq.fill(50)(Array.fill(16)(rnd.nextGaussian().toFloat))
      .map(Tuple1(_)).toDF("v")
    val out = df.select(NearestCell.nearestCell($"v", cents).getField("cell_id"))
      .collect()
    assert(out.length === 50)
    assert(out.forall(r => r.getLong(0) >= 0 && r.getLong(0) < 1500))
  }
}
