package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`Array[Float]`).
  *
  * Baseline is brute-force cosine top-k (exact); the scale paths are
  * random-hyperplane LSH bucketing and a centroid-partitioned IVF. All
  * vector math uses `zip_with`/`aggregate` builtins in double precision —
  * codegen'd, no UDF boxing.
  *
  * Scale shape: brute force is a broadcast nested loop (queries broadcast,
  * corpus streamed — linear in corpus size, embarrassingly parallel).
  * LSH/IVF turn that into a bucket-equijoin so the per-query cost is the
  * bucket size, not the corpus.
  */
object Similarity {

  /** Dot product of two array columns in double precision (sequential
    * left-to-right summation — deterministic). Native single-pass
    * expression; the builtin equivalent is
    * `aggregate(zip_with(a,b,(x,y)->x*y), 0d, +)`.
    */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorDot.vectorDot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity — native single-pass expression
    * ([[graft.functions.CosineSim]]), bit-identical to
    * `dot(a,b)/(norm(a)*norm(b))` (same sequential double summation).
    */
  def cosine(a: Column, b: Column): Column =
    graft.functions.CosineSim.cosineSim(a, b)

  /** Exact brute-force top-k by cosine: for every row of `queries`, the `k`
    * nearest rows of `corpus` (excluding self-matches by id). Rank by
    * (rounded cosine desc, corpus id asc) so ordering is stable across
    * engines despite float summation differences.
    */
  def bruteForceTopK(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      roundTo: Int = 6): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", round(cosine(col("__qv"), col("__cv")), roundTo))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rank").cast("long").as("rank"))
  }

  /** All corpus pairs with cosine >= threshold (embedding near-dup). Exact;
    * O(n²) — restrict the inputs or use [[lshPairs]] at scale.
    */
  def thresholdPairs(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      roundTo: Int = 6): DataFrame = {
    val a = df.select(col(idCol).as("id_a"), col(vecCol).as("__va"))
    val b = df.select(col(idCol).as("id_b"), col(vecCol).as("__vb"))
    a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("cosine", round(cosine(col("__va"), col("__vb")), roundTo))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }

  /** Deterministic random hyperplanes: `numPlanes` x `dim`, seeded. */
  def hyperplanes(dim: Int, numPlanes: Int, seed: Long): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(numPlanes)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** Hyperplane count that keeps expected bucket occupancy near
    * `targetBucketSize` for a corpus of `n` vectors: candidate-pair work per
    * bucket is O(occupancy²), so bits must grow with log₂(n) — a fixed bit
    * width that is fine at 10⁵ vectors quietly goes quadratic at 10⁷.
    */
  def lshBitsFor(n: Long, targetBucketSize: Int = 32): Int = {
    require(n > 0 && targetBucketSize > 0)
    val bits = math.ceil(math.log(n.toDouble / targetBucketSize) / math.log(2)).toInt
    math.min(30, math.max(4, bits))
  }

  /** Sign-random-projection LSH bucket id for each vector: bit b set iff
    * dot(vec, plane_b) > 0. Vectors in the same bucket are near in angle.
    */
  def lshBucket(vec: Column, planes: Array[Array[Double]]): Column = {
    val bits = planes.zipWithIndex.map { case (p, i) =>
      val planeCol = array(p.map(lit): _*)
      when(dot(vec, planeCol) > 0, lit(1L << i)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** LSH-bucketed near-neighbor pairs: only pairs sharing a bucket under at
    * least one of `tables` independent plane sets are compared, then exact
    * cosine filters at `threshold`.
    */
  def lshPairs(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      threshold: Double,
      bitsPerTable: Int = 12,
      tables: Int = 4,
      seed: Long = 42L): DataFrame = {
    val bucketed = df.select(
      col(idCol), col(vecCol),
      explode(array((0 until tables).map { t =>
        struct(lit(t).as("table"),
          lshBucket(col(vecCol), hyperplanes(dim, bitsPerTable, seed + t)).as("bucket"))
      }: _*)).as("tb"))
      .select(col(idCol), col(vecCol), col("tb.table"), col("tb.bucket"))

    // Dedup candidate pairs on the narrow (id, id) key, then join the
    // vectors back for verification — running distinct() with the embedding
    // arrays as grouping keys would shuffle and compare full vectors.
    val a = bucketed.select(col(idCol).as("id_a"), col("table"), col("bucket"))
    val b = bucketed.select(col(idCol).as("id_b"), col("table"), col("bucket"))
    val cands = a.join(b, Seq("table", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    val vecs = df.select(col(idCol), col(vecCol))
    cands
      .join(vecs.select(col(idCol).as("id_a"), col(vecCol).as("__va")), Seq("id_a"))
      .join(vecs.select(col(idCol).as("id_b"), col(vecCol).as("__vb")), Seq("id_b"))
      .withColumn("cosine", round(cosine(col("__va"), col("__vb")), 6))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }

  /** IVF index: pick `nCells` seed centroids deterministically (the corpus
    * rows with the lowest ids — collected once, like a broadcast), assign
    * every vector to its nearest centroid with a single codegen'd
    * `array_max` over per-centroid similarity structs: no crossJoin, no
    * shuffle, no window — one narrow map over the corpus.
    */
  /** Collect the seed centroids (lowest-id corpus rows): one bounded job. */
  def ivfCentroids(df: DataFrame, idCol: String, vecCol: String,
      nCells: Int): Array[(Long, Array[Double])] =
    df.orderBy(col(idCol)).limit(nCells)
      .select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))

  /** Nearest-centroid cell id as a single codegen'd column expression. */
  def ivfCellExpr(vecCol: String, centroids: Array[(Long, Array[Double])]): Column = {
    // struct ordering = (sim, -cell): max picks highest sim, smallest cell on tie
    val candidates = centroids.map { case (id, vec) =>
      struct(cosine(col(vecCol), array(vec.map(lit): _*)).as("sim"),
        lit(-id).as("negCell"))
    }
    -array_max(array(candidates.toSeq: _*)).getField("negCell")
  }

  def ivfAssign(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      nCells: Int): DataFrame =
    df.withColumn("cell_id", ivfCellExpr(vecCol, ivfCentroids(df, idCol, vecCol, nCells)))

  /** IVF top-k: search only within the query vector's own cell(s). */
  def ivfTopK(
      df: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      nCells: Int,
      k: Int): DataFrame = {
    // Centroids collected once; the corpus-wide assignment expression runs in
    // exactly one pass. Queries are assigned from their OWN vectors (the
    // query frame needn't be a corpus subset — external query tables work,
    // and a query id coinciding with a corpus id never silently swaps in the
    // corpus vector).
    val centroids = ivfCentroids(df, idCol, vecCol, nCells)
    val cellOf    = ivfCellExpr(vecCol, centroids)
    val qAssigned = queries.select(col(idCol), col(vecCol))
      .withColumn("cell_id", cellOf)
      .select(col(idCol).as("query_id"), col(vecCol).as("__qv"), col("cell_id"))
    val c = df.withColumn("cell_id", cellOf)
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"), col("cell_id"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    c.join(broadcast(qAssigned), Seq("cell_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", round(cosine(col("__qv"), col("__cv")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rank").cast("long").as("rank"))
  }
}
