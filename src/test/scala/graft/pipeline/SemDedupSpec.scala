package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame

/** SemDeDup semantics on planted fixtures: cell pruning, the transitive
  * duplicate grouping, and the least-centroid-typical keep rule.
  */
class SemDedupSpec extends SparkTestBase {

  import spark.implicits._

  // two orthogonal unit centroids: cell 0 = x-axis, cell 1 = y-axis
  private val centroids: Array[(Long, Array[Double])] = Array(
    0L -> Array(1.0, 0.0, 0.0, 0.0),
    1L -> Array(0.0, 1.0, 0.0, 0.0))

  private def emb(rows: (Long, Array[Float])*): DataFrame =
    rows.toDF("vec_id", "embedding")

  private def unit(x: Double, y: Double, z: Double, w: Double): Array[Float] = {
    val n = math.sqrt(x * x + y * y + z * z + w * w)
    Array((x / n).toFloat, (y / n).toFloat, (z / n).toFloat, (w / n).toFloat)
  }

  test("pairs: within-cell twins found, cross-cell near pair pruned") {
    // 1 and 2 are twins in cell 0. 10 sits in cell 1 yet is geometrically
    // close to 3 (45° split across the cell boundary) — SemDeDup must NOT
    // pair them because they land in different cells.
    val e = emb(
      1L -> unit(1, 0.05, 0, 0),
      2L -> unit(1, 0.06, 0, 0),
      3L -> unit(1, 0.9, 0, 0),  // cell 0 (x wins)
      10L -> unit(0.9, 1, 0, 0), // cell 1 (y wins), cosine(3,10) ≈ 0.999
      11L -> unit(0, 1, 0.4, 0))
    val assigned = Similarity.ivfAssignWithSim(e, "embedding", centroids)
    val p = SemDedup.pairs(assigned, "vec_id", "embedding", threshold = 0.95)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(p.contains((1L, 2L)), s"twins not paired: $p")
    assert(!p.exists { case (a, b) => Set(a, b) == Set(3L, 10L) },
      s"cross-cell pair leaked through cell pruning: $p")
  }

  test("keep: least-centroid-similar member of each group survives") {
    // twins in cell 0: id 1 hugs the centroid, id 2 sits further out.
    // The paper's rule keeps the LESS typical member — id 2.
    val e = emb(
      1L -> unit(1, 0.02, 0, 0),
      2L -> unit(1, 0.20, 0, 0),
      11L -> unit(0, 1, 0.5, 0)) // unpaired, must survive
    val kept = SemDedup.keep(e, "vec_id", "embedding", centroids, threshold = 0.95)
      .select("vec_id").as[Long].collect().toSet
    assert(kept == Set(2L, 11L), s"kept=$kept")
  }

  test("keep: chain a~b~c collapses to one even when a~c is sub-threshold") {
    // consecutive cosines ≥ t but cos(a,c) < t — transitive grouping must
    // still drop two of the three.
    val a = unit(1, 0.00, 0, 0)
    val b = unit(1, 0.32, 0, 0) // cos(a,b) ≈ 0.952
    val c = unit(1, 0.66, 0, 0) // cos(b,c) ≈ 0.965, cos(a,c) ≈ 0.835
    val e = emb(1L -> a, 2L -> b, 3L -> c)
    val pairs = SemDedup.pairs(
      Similarity.ivfAssignWithSim(e, "embedding", centroids),
      "vec_id", "embedding", threshold = 0.95)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L), (2L, 3L)), s"pairs=$pairs")
    val kept = SemDedup.keep(e, "vec_id", "embedding", centroids, threshold = 0.95)
      .select("vec_id").as[Long].collect().toSet
    assert(kept.size == 1, s"chain not collapsed: kept=$kept")
    // the keeper is the member least similar to the x-axis centroid = c
    assert(kept == Set(3L), s"wrong keeper: $kept")
  }

  test("keep: tie on centroid_sim breaks to the smallest id") {
    // mirror twins across the centroid: identical rounded centroid_sim
    val e = emb(
      5L -> unit(1, 0.1, 0, 0),
      7L -> unit(1, -0.1, 0, 0)) // cos to centroid equal; cos(5,7) ≈ 0.980
    val kept = SemDedup.keep(e, "vec_id", "embedding", centroids, threshold = 0.95)
      .select("vec_id").as[Long].collect().toSet
    assert(kept == Set(5L), s"tie should keep the smaller id: $kept")
  }

  test("incrKeep: fresh vector drops on same-cell prior twin only") {
    val prior = emb(
      2L -> unit(1, 0.05, 0, 0), // cell 0
      4L -> unit(0, 1, 0, 0))    // cell 1
    val fresh = emb(
      1L -> unit(1, 0.06, 0, 0),  // twin of prior 2 in cell 0 → dropped
      3L -> unit(1, 0.9, 0, 0),   // cell 0, far from prior 2 → kept
      11L -> unit(0.9, 1, 0, 0))  // cell 1; close to CELL-0 fresh 3 but no
                                  // same-cell prior is near → kept
    val kept = SemDedup.incrKeep(fresh, prior, "vec_id", "embedding",
      centroids, threshold = 0.95)
      .select("vec_id").as[Long].collect().toSet
    assert(kept == Set(3L, 11L), s"kept=$kept")
  }

  test("incrKeep: fresh twins both survive (no within-batch grouping)") {
    // against-prior semantics only — two near-identical FRESH vectors both
    // pass when no prior is near; the full keep() pass owns within-batch
    // grouping.
    val prior = emb(4L -> unit(0, 1, 0, 0))
    val fresh = emb(1L -> unit(1, 0.05, 0, 0), 3L -> unit(1, 0.06, 0, 0))
    val kept = SemDedup.incrKeep(fresh, prior, "vec_id", "embedding",
      centroids, threshold = 0.95)
      .select("vec_id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L), s"kept=$kept")
  }

  test("ivfAssignWithSim agrees with ivfCellExpr and exports the max sim") {
    val e = emb(
      1L -> unit(1, 0.3, 0, 0),
      2L -> unit(0.2, 1, 0, 0),
      3L -> unit(0.7, 0.7, 0, 0)) // near-tie → rounded argmax, cell 0 wins ties
    val viaExpr = e.withColumn("cell_id",
      Similarity.ivfCellExpr("embedding", centroids))
      .select("vec_id", "cell_id").as[(Long, Long)].collect().toMap
    val withSim = Similarity.ivfAssignWithSim(e, "embedding", centroids)
    val got = withSim.select("vec_id", "cell_id").as[(Long, Long)].collect().toMap
    assert(got == viaExpr, s"assignment mismatch: $got vs $viaExpr")
    // exported sim equals the rounded cosine against the assigned centroid
    val rows = withSim.select("vec_id", "cell_id", "centroid_sim")
      .as[(Long, Long, Double)].collect()
    rows.foreach { case (id, cell, sim) =>
      val v = e.filter($"vec_id" === id).select("embedding")
        .as[Array[Float]].head().map(_.toDouble)
      val cvec = centroids.find(_._1 == cell).get._2
      val cos = v.zip(cvec).map { case (x, y) => x * y }.sum /
        (math.sqrt(v.map(x => x * x).sum) * math.sqrt(cvec.map(x => x * x).sum))
      assert(math.abs(sim - BigDecimal(cos).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9,
        s"centroid_sim $sim != rounded cosine $cos for vec $id")
    }
  }
}
