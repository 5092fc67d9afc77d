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

  /** Maximal Marginal Relevance re-ranking (Carbonell & Goldstein 1998):
    * greedy k-step selection maximizing
    *
    *   score(c) = λ·rel(c) − (1−λ)·max_{s ∈ selected} sim(c, s)
    *
    * (diversity term 0 for the empty selection; ties broken by id asc) —
    * the result-diversification pass run on a retrieval arm's top-k.
    *
    * Scale shape: MMR is inherently sequential — every pick changes every
    * remaining candidate's score — so the GREEDY WALK runs on the driver,
    * while everything that scales stays distributed: candidate generation
    * is whatever bounded top-k produced `candidates`, and the pairwise
    * similarity matrix is computed IN SPARK (one bounded self-join over
    * the ≤`maxCandidates` rows, broadcast both sides) and rounded to
    * `roundTo` BEFORE the walk, so an independent engine replaying the
    * same rounded inputs makes bit-identical picks (the raw greedy
    * arithmetic is then the same IEEE ops on the same doubles). The
    * candidate set is bounded BY CONTRACT; `maxCandidates` fails loudly
    * if a caller points this at a corpus.
    *
    * Returns (rank, id, rel, mmr) for the k selected candidates in pick
    * order, `mmr` rounded to `roundTo` (signed zero normalized).
    */
  def mmrRerank(
      candidates: DataFrame,
      idCol: String,
      relCol: String,
      vecCol: String,
      k: Int,
      lambda: Double,
      maxCandidates: Int = 4096,
      roundTo: Int = 6): DataFrame = {
    require(k >= 1, s"k must be positive: $k")
    require(lambda >= 0.0 && lambda <= 1.0, s"lambda out of [0, 1]: $lambda")
    val spark = candidates.sparkSession
    import spark.implicits._
    val cv = Dedup.materializeOnce(candidates.select(
      col(idCol).cast("long").as("id"), col(relCol).cast("double").as("rel"),
      col(vecCol).as("__v")))
    val rels = cv.select(col("id"), col("rel")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1))
    require(rels.length <= maxCandidates,
      s"mmrRerank: ${rels.length} candidates exceed maxCandidates=$maxCandidates — " +
        "this is a re-ranker for a bounded retrieval arm, not a corpus pass")
    // non-finite scores poison the greedy argmax (every `>` comparison is
    // false, leaving no pick) — fail loudly like the maxCandidates guard
    rels.find(r => !java.lang.Double.isFinite(r._2)).foreach { case (id, rel) =>
      throw new IllegalArgumentException(
        s"mmrRerank: non-finite relevance $rel for candidate $id")
    }
    val relOf = rels.toMap
    val sims = cv.as("x")
      .join(broadcast(cv.as("y")), col("x.id") =!= col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b"),
        round(cosine(col("x.__v"), col("y.__v")), roundTo).as("sim"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    sims.find(s => !java.lang.Double.isFinite(s._2)).foreach { case ((a, b), s) =>
      throw new IllegalArgumentException(
        s"mmrRerank: non-finite cosine $s for pair ($a, $b) — " +
          "a zero-norm candidate vector has no cosine; filter such rows out")
    }
    val remaining = scala.collection.mutable.SortedSet[Long](relOf.keys.toSeq: _*)
    val selected = scala.collection.mutable.ArrayBuffer[Long]()
    val picks = scala.collection.mutable.ArrayBuffer[(Int, Long, Double, Double)]()
    val steps = math.min(k, rels.length)
    for (step <- 1 to steps) {
      var bestId = -1L
      var bestScore = Double.NegativeInfinity
      remaining.foreach { c =>
        val ms = if (selected.isEmpty) 0.0
          else selected.iterator.map(s => sims((c, s))).max
        val score = lambda * relOf(c) - (1.0 - lambda) * ms
        // strict > plus ascending-id iteration = (score desc, id asc)
        if (score > bestScore) { bestScore = score; bestId = c }
      }
      remaining -= bestId
      selected += bestId
      picks += ((step, bestId, relOf(bestId),
        graft.functions.Num.roundHalfUp(bestScore, roundTo)))
    }
    picks.toSeq.toDF("rank", "id", "rel", "mmr")
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
    require(targetBucketSize > 0)
    if (n <= 0) 4 // empty corpus: minimum width (no pairs exist anyway)
    else {
      val bits = math.ceil(math.log(n.toDouble / targetBucketSize) / math.log(2)).toInt
      math.min(30, math.max(4, bits))
    }
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
    // (id, table, bucket) only — the vectors are re-attached from `df` for
    // verification below. Materialized once: the bucket computation is
    // tables × bits dot products per vector, and AQE would otherwise
    // descend it once per self-join side (Dedup.materializeOnce scaladoc).
    val bucketed = Dedup.materializeOnce(df.select(
      col(idCol),
      explode(array((0 until tables).map { t =>
        struct(lit(t).as("table"),
          lshBucket(col(vecCol), hyperplanes(dim, bitsPerTable, seed + t)).as("bucket"))
      }: _*)).as("tb"))
      .select(col(idCol), col("tb.table"), col("tb.bucket")))

    // Dedup candidate pairs on the narrow (id, id) key, then join the
    // vectors back for verification — running distinct() with the embedding
    // arrays as grouping keys would shuffle and compare full vectors.
    val a = bucketed.select(col(idCol).as("id_a"), col("table"), col("bucket"))
    val b = bucketed.select(col(idCol).as("id_b"), col("table"), col("bucket"))
    val cands = Dedup.materializeOnce(
      a.join(b, Seq("table", "bucket"))
        .filter(col("id_a") < col("id_b"))
        .select("id_a", "id_b").distinct())
    // Vectors re-attached candidate-bounded: semi-join the corpus to the ids
    // that appear in some candidate pair, materialize once, feed both sides
    // — the full-width embedding column is read from parquet exactly once.
    val ids = cands.select(col("id_a").as(idCol))
      .union(cands.select(col("id_b").as(idCol))).distinct()
    val vecs = Dedup.materializeOnce(
      df.select(col(idCol), col(vecCol)).join(ids, Seq(idCol), "left_semi"))
    cands
      .join(vecs.select(col(idCol).as("id_a"), col(vecCol).as("__va")), Seq("id_a"))
      .join(vecs.select(col(idCol).as("id_b"), col(vecCol).as("__vb")), Seq("id_b"))
      .withColumn("cosine", round(cosine(col("__va"), col("__vb")), 6))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }

  /** IVF index: train `nCells` centroids, assign every vector to its nearest
    * centroid with a single codegen'd `array_max` over per-centroid
    * similarity structs: no crossJoin, no shuffle, no window — one narrow
    * map over the corpus.
    */
  /** Train centroids with spherical k-means on a bounded driver-side sample:
    * a deterministic pseudo-random sample (ordered by `xxhash64(id)` — a
    * top-K job, not a full sort), k-means++ seeding, then `iters` Lloyd
    * iterations with cosine assignment (mean-then-normalize updates). Empty
    * cells are reseeded to the point farthest from its centroid, so all
    * `nCells` cells stay live — balanced cells are what keep the per-cell
    * probe join sub-quadratic at corpus scale. Everything is seeded and the
    * sample order is data-determined, so centroids are reproducible across
    * runs. Returned cell ids are 0..nCells-1.
    */
  def ivfCentroids(df: DataFrame, idCol: String, vecCol: String,
      nCells: Int, sampleSize: Option[Int] = Some(4096), iters: Int = 8,
      seed: Long = 42L, oversample: Int = 2048, rounds: Int = 5): Array[(Long, Array[Double])] = {
    require(nCells > 0, "nCells must be positive")
    val prepared = df
      .select(col(idCol).cast("long").as("__id"), col(vecCol).cast("array<double>").as("__v"))
      // null / null-element vectors are excluded BEFORE sampling (a null
      // cell would NPE at extraction and could not vote a centroid anyway)
      .filter(col("__v").isNotNull &&
        !exists(col("__v"), e => e.isNull) && size(col("__v")) > 0)
    if (sampleSize.isEmpty) {
      // distributed path: k-means‖ coreset on L2-NORMALIZED vectors —
      // Euclidean d² on the unit sphere is 2(1−cos), so the oversampling
      // is exactly the angular-distance version and the weighted spherical
      // Lloyd below optimizes the same objective as the sampled trainer
      val sq   = aggregate(transform(col("__v"), x => x * x), lit(0.0), (a, b) => a + b)
      val normed = Dedup.materializeOnce(prepared.withColumn("__v",
        when(sq === 0.0, col("__v"))
          .otherwise(transform(col("__v"), x => x / sqrt(sq)))))
      val (cands, wts) = kmeansParCoreset(normed, oversample, rounds, seed)
      val cents = weightedSphericalKmeans(cands, wts, nCells, iters = iters, seed = seed)
      return cents.zipWithIndex.map { case (v, i) => (i.toLong, v) }
    }
    val sample = prepared
      .orderBy(xxhash64(col("__id")), col("__id"))
      .limit(math.max(sampleSize.get, nCells))
      .collect()
      .map(r => r.getSeq[Double](1).toArray)
    require(sample.nonEmpty, "cannot train IVF centroids on an empty corpus")

    def normalize(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      if (n == 0) v.clone() else v.map(_ / n)
    }
    val pts = sample.map(normalize)
    val k   = math.min(nCells, pts.length)
    val rnd = new scala.util.Random(seed)

    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    // k-means++ seeding on angular distance (1 - cosine)
    val centroids = new Array[Array[Double]](k)
    centroids(0) = pts(rnd.nextInt(pts.length)).clone()
    val bestD = pts.map(p => 1.0 - dot(p, centroids(0)))
    for (c <- 1 until k) {
      val total = bestD.sum
      val pick =
        if (total <= 0) rnd.nextInt(pts.length)
        else {
          var r = rnd.nextDouble() * total; var i = 0
          while (i < pts.length - 1 && r > bestD(i)) { r -= bestD(i); i += 1 }
          i
        }
      centroids(c) = pts(pick).clone()
      var i = 0
      while (i < pts.length) {
        val d = 1.0 - dot(pts(i), centroids(c))
        if (d < bestD(i)) bestD(i) = d
        i += 1
      }
    }
    // Lloyd: assign to max-cosine centroid (lowest index on ties), update to
    // the normalized mean, reseed empty cells to the globally worst-fit point
    val assign = new Array[Int](pts.length)
    for (_ <- 0 until iters) {
      var i = 0
      while (i < pts.length) {
        var best = 0; var bestSim = dot(pts(i), centroids(0)); var c = 1
        while (c < k) {
          val s = dot(pts(i), centroids(c))
          if (s > bestSim) { bestSim = s; best = c }
          c += 1
        }
        assign(i) = best
        i += 1
      }
      val sums   = Array.fill(k)(new Array[Double](pts.head.length))
      val counts = new Array[Int](k)
      i = 0
      while (i < pts.length) {
        val c = assign(i); counts(c) += 1
        var j = 0
        while (j < pts(i).length) { sums(c)(j) += pts(i)(j); j += 1 }
        i += 1
      }
      for (c <- 0 until k) {
        if (counts(c) > 0) centroids(c) = normalize(sums(c))
        else {
          val worst = pts.indices.maxBy(i => 1.0 - dot(pts(i), centroids(assign(i))))
          centroids(c) = pts(worst).clone()
        }
      }
    }
    centroids.zipWithIndex.map { case (v, i) => (i.toLong, v) }
  }

  /** k-means‖ distributed oversampling (Bahmani, Moseley, Vattani, Kumar &
    * Vassilvitskii, "Scalable K-Means++", VLDB 2012): a few rounds, each
    * sampling every point independently with probability
    * `min(1, ℓ·d²(x,C)/φ)` against the CURRENT candidate set, give an
    * O(ℓ·rounds)-point coreset whose weighted k-means solution matches
    * k-means++ quality — while the driver only ever sees the coreset, not
    * a fixed-size corpus sample. This is the 100 TB trainer: a 4096-row
    * sample under-fits 1024 cells on a diverse corpus; the coreset's
    * candidates are drawn from the FULL corpus, cost-weighted.
    *
    * Determinism: the per-point coin is `xxhash64(id, seed+round)` mapped
    * to [0,1) — no RNG state, so the same corpus + seed always selects the
    * same candidates; collects are ordered by id. Each round's distance
    * update is incremental (`d²' = min(d², d² to the NEW candidates)`, one
    * narrow [[graft.functions.NearestCentroid]] map over a re-materialized
    * frame), so a round costs O(ℓ·dim) per row, not O(|C|·dim).
    *
    * Returns (candidates, weights): weight = number of corpus points whose
    * nearest candidate it is (the one O(|C|·dim) pass, at the end).
    */
  private[pipeline] def kmeansParCoreset(
      prepared: DataFrame,
      ell: Int,
      rounds: Int,
      seed: Long): (Array[Array[Double]], Array[Long]) = {
    require(ell > 0 && rounds > 0, s"bad coreset params: ell=$ell rounds=$rounds")
    import graft.functions.NearestCentroid.nearestCentroid
    val firstRows = prepared.orderBy(xxhash64(col("__id"), lit(seed)), col("__id"))
      .limit(1).select(col("__v")).collect()
    require(firstRows.nonEmpty, "cannot build a coreset from an empty corpus")
    val first = firstRows(0).getSeq[Double](0).toArray
    val cands = scala.collection.mutable.ArrayBuffer[Array[Double]](first)
    var state = Dedup.materializeOnce(prepared.withColumn("__d2",
      nearestCentroid(col("__v"), Array(first)).getField("d2")))
    var r = 1
    var exhausted = false
    while (r <= rounds && !exhausted) {
      val phiRow = state.agg(sum(col("__d2"))).head()
      val phi    = if (phiRow.isNullAt(0)) 0.0 else phiRow.getDouble(0)
      if (phi <= 0) exhausted = true // every point IS a candidate already
      else {
        // u in [0,1) from a per-(id, round) hash; select iff u < ℓ·d²/φ
        val u = (xxhash64(col("__id"), lit(seed + r)).bitwiseAND(lit(Long.MaxValue)))
          .cast("double") / 9.223372036854776e18
        val picked = state.filter(u * lit(phi) < col("__d2") * lit(ell.toDouble))
          .orderBy(col("__id")).select(col("__v")).collect()
          .map(_.getSeq[Double](0).toArray)
        if (picked.isEmpty) exhausted = true
        else {
          cands ++= picked
          state = Dedup.materializeOnce(state.withColumn("__d2",
            least(col("__d2"), nearestCentroid(col("__v"), picked).getField("d2"))))
        }
      }
      r += 1
    }
    val all = cands.toArray
    val wRows = state
      .select(nearestCentroid(col("__v"), all).getField("idx").as("__idx"))
      .groupBy(col("__idx")).agg(count(lit(1)).as("__w"))
      .collect()
    val weights = new Array[Long](all.length)
    wRows.foreach(r => weights(r.getInt(0)) = r.getLong(1))
    (all, weights)
  }

  /** Weighted spherical k-means on a coreset (driver-side, coreset-sized):
    * the weighted mirror of the sampled trainer — k-means++ seeding with
    * probability ∝ w·(1−cos), Lloyd with weight-scaled sums then
    * normalization, empty cells reseeded to the point with the largest
    * weighted misfit. Zero-weight candidates are dropped up front (no
    * corpus point elected them). Seeded and order-stable → reproducible.
    */
  private def weightedSphericalKmeans(
      cands: Array[Array[Double]],
      wts: Array[Long],
      k: Int,
      iters: Int,
      seed: Long): Array[Array[Double]] = {
    val keep = cands.indices.filter(i => wts(i) > 0).toArray
    val pts  = keep.map(cands(_))
    val w    = keep.map(wts(_).toDouble)
    require(pts.nonEmpty, "coreset has no weighted candidates")
    val kk  = math.min(k, pts.length)
    val rnd = new scala.util.Random(seed)
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    def normalize(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      if (n == 0) v.clone() else v.map(_ / n)
    }
    val centroids = new Array[Array[Double]](kk)
    centroids(0) = pts(rnd.nextInt(pts.length)).clone()
    val bestD = Array.tabulate(pts.length)(i => 1.0 - dot(pts(i), centroids(0)))
    for (c <- 1 until kk) {
      val scores = Array.tabulate(pts.length)(i => w(i) * bestD(i))
      val total  = scores.sum
      val pick =
        if (total <= 0) rnd.nextInt(pts.length)
        else {
          var r = rnd.nextDouble() * total; var i = 0
          while (i < pts.length - 1 && r > scores(i)) { r -= scores(i); i += 1 }
          i
        }
      centroids(c) = pts(pick).clone()
      var i = 0
      while (i < pts.length) {
        val d = 1.0 - dot(pts(i), centroids(c))
        if (d < bestD(i)) bestD(i) = d
        i += 1
      }
    }
    val assign = new Array[Int](pts.length)
    for (_ <- 0 until iters) {
      var i = 0
      while (i < pts.length) {
        var best = 0; var bestSim = dot(pts(i), centroids(0)); var c = 1
        while (c < kk) {
          val s = dot(pts(i), centroids(c))
          if (s > bestSim) { bestSim = s; best = c }
          c += 1
        }
        assign(i) = best
        i += 1
      }
      val sums   = Array.fill(kk)(new Array[Double](pts.head.length))
      val counts = new Array[Double](kk)
      i = 0
      while (i < pts.length) {
        val c = assign(i); counts(c) += w(i)
        var j = 0
        while (j < pts(i).length) { sums(c)(j) += w(i) * pts(i)(j); j += 1 }
        i += 1
      }
      for (c <- 0 until kk) {
        if (counts(c) > 0) centroids(c) = normalize(sums(c))
        else {
          val worst = pts.indices.maxBy(i => w(i) * (1.0 - dot(pts(i), centroids(assign(i)))))
          centroids(c) = pts(worst).clone()
        }
      }
    }
    centroids
  }

  /** Persist trained IVF centroids as a small parquet artifact — (cell_id,
    * dim_idx, value) scalars, the export convention the relational oracles
    * reassemble with `list(... ORDER BY dim_idx)`. Same artifact boundary
    * as [[PQ.saveCodebooks]]: train once per corpus snapshot; assignment /
    * probe jobs load the KB-scale artifact instead of re-running k-means.
    */
  def saveCentroids(spark: org.apache.spark.sql.SparkSession,
      centroids: Array[(Long, Array[Double])], path: String): Unit = {
    import spark.implicits._
    val rows = centroids.toSeq.flatMap { case (id, vec) =>
      vec.zipWithIndex.toSeq.map { case (x, d) => (id, d, x) }
    }
    rows.toDF("cell_id", "dim_idx", "value")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Load centroids persisted by [[saveCentroids]] (bounded collect: one
    * scalar row per centroid dimension).
    */
  def loadCentroids(spark: org.apache.spark.sql.SparkSession,
      path: String): Array[(Long, Array[Double])] = {
    val rows = spark.read.parquet(path)
      .select(col("cell_id").cast("long"), col("dim_idx").cast("int"),
        col("value").cast("double"))
      .collect()
    require(rows.nonEmpty, s"empty IVF centroid artifact at $path")
    rows.groupBy(_.getLong(0)).toArray.sortBy(_._1).map { case (id, rs) =>
      val vec = new Array[Double](rs.iterator.map(_.getInt(1)).max + 1)
      java.util.Arrays.fill(vec, Double.NaN)
      rs.foreach(r => vec(r.getInt(1)) = r.getDouble(2))
      require(vec.forall(!_.isNaN),
        s"IVF centroid artifact at $path has a sparse dim grid for cell $id")
      (id, vec)
    }
  }

  /** Nearest-centroid cell id as a single codegen'd column expression.
    * The similarity is rounded to 6 decimals before the argmax (ties then
    * break to the smallest cell id): an unrounded argmax would let a
    * different engine's float summation order flip near-tie assignments,
    * which is exactly what the cross-engine cell-assignment oracle
    * re-derives.
    */
  def ivfCellExpr(vecCol: String, centroids: Array[(Long, Array[Double])]): Column =
    // r8: one native argmax kernel with the centroid table as a codegen
    // reference object — the former array_max(array(struct(cosine(v, lit
    // cᵢ))…)) tree is linear in |cells| and passes the JVM 64 KB method
    // limit around ~1k cells (observed at the 200k-vector crossover),
    // dropping the scan to interpreted eval. Bit-identical pick order
    // (rounded sim desc, smallest id) — pinned by SimilaritySpec.
    graft.functions.NearestCell.nearestCell(col(vecCol), centroids)
      .getField("cell_id")

  def ivfAssign(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      nCells: Int): DataFrame =
    ivfAssign(df, vecCol, ivfCentroids(df, idCol, vecCol, nCells))

  /** Assignment against ALREADY-TRAINED centroids (training is a separate,
    * deterministic step — callers deriving several frames from one index
    * should train once and thread the centroids through).
    */
  def ivfAssign(
      df: DataFrame,
      vecCol: String,
      centroids: Array[(Long, Array[Double])]): DataFrame =
    df.withColumn("cell_id", ivfCellExpr(vecCol, centroids))

  /** Assignment plus the winning (rounded) centroid similarity itself —
    * one codegen scan emitting both `cell_id` and `centroid_sim`. The sim
    * is what SemDeDup-style keep policies rank on (drop the cluster
    * members MOST typical of the centroid, keep the least — Abbas et al.
    * 2023, arXiv:2303.09540 §3), so exporting it next to the assignment
    * saves consumers a second argmax pass over the centroid table.
    */
  def ivfAssignWithSim(
      df: DataFrame,
      vecCol: String,
      centroids: Array[(Long, Array[Double])]): DataFrame = {
    val best = graft.functions.NearestCell.nearestCell(col(vecCol), centroids)
    df.withColumn("__best", best)
      .withColumn("cell_id", col("__best").getField("cell_id"))
      .withColumn("centroid_sim", col("__best").getField("sim"))
      .drop("__best")
  }

  /** Query's `nProbe` nearest cell ids (descending centroid similarity,
    * same rounded-sim + smallest-id tie rule as [[ivfCellExpr]] — probing
    * 1 cell is exactly the argmax assignment).
    */
  def ivfProbeCellsExpr(
      vecCol: String,
      centroids: Array[(Long, Array[Double])],
      nProbe: Int): Column =
    // r8: native top-nProbe kernel ([[graft.functions.ProbeCells]]) — the
    // former slice(sort_array(array(struct…))) tree had the same linear-
    // in-|cells| 64 KB codegen hazard as the assignment argmax; pick order
    // (rounded sim desc, smallest id) is unchanged and spec-pinned
    graft.functions.ProbeCells.probeCells(col(vecCol), centroids, nProbe)

  /** IVF top-k: search only within the query vector's own cell(s). */
  def ivfTopK(
      df: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      nCells: Int,
      k: Int,
      nProbe: Int = 1): DataFrame =
    ivfTopK(df, queries, idCol, vecCol, k,
      ivfCentroids(df, idCol, vecCol, nCells), nProbe)

  /** IVF top-k against already-trained centroids (single-probe). */
  def ivfTopK(
      df: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      centroids: Array[(Long, Array[Double])]): DataFrame =
    ivfTopK(df, queries, idCol, vecCol, k, centroids, nProbe = 1)

  /** IVF top-k against already-trained centroids.
    *
    * `nProbe` is the standard recall lever: the query searches its
    * `nProbe` nearest cells instead of only its own (corpus vectors stay
    * single-cell, so candidates stay disjoint across probes and the
    * shuffle grows linearly in nProbe, not quadratically). Probing every
    * cell IS brute force — the spec pins that equivalence exactly.
    */
  def ivfTopK(
      df: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      centroids: Array[(Long, Array[Double])],
      nProbe: Int): DataFrame = {
    require(nProbe >= 1, s"nProbe must be >= 1: $nProbe")
    // Centroids trained/collected once; the corpus-wide assignment
    // expression runs in exactly one pass. Queries are assigned from their
    // OWN vectors (the query frame needn't be a corpus subset — external
    // query tables work, and a query id coinciding with a corpus id never
    // silently swaps in the corpus vector).
    val cellOf    = ivfCellExpr(vecCol, centroids)
    val qAssigned = queries.select(col(idCol), col(vecCol))
      .withColumn("cell_id",
        explode(ivfProbeCellsExpr(vecCol, centroids, nProbe)))
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

  /** Mutual k-NN graph: the undirected edge (a, b) exists iff b is in a's
    * cosine top-k AND a is in b's — the standard sparsification before
    * density-based clustering (mutual edges drop the hub/antihub
    * asymmetry that plain k-NN graphs suffer in high dimension). Emits
    * canonical (id_a < id_b) pairs with the rounded cosine.
    *
    * The top-k arm is pluggable: pass [[bruteForceTopK]] output for an
    * exact graph (as the oracle-checked query does, on a bounded sample)
    * or [[ivfTopK]]'s for the approximate scale path — mutuality is the
    * same self-join either way, on the (query, neighbor) pair key.
    */
  /** Hard-negative mining for contrastive training: for each query, the
    * top-k most cosine-similar corpus rows whose `labelCol` DIFFERS from
    * the query's — maximally confusable negatives, the pairs that
    * actually move an embedding model (easy random negatives carry ~zero
    * gradient). Same exact/brute arm shape as [[bruteForceTopK]]: the
    * bounded query set broadcasts, the corpus streams through one scan,
    * the per-query top-k ranks inside the query-partitioned window. For
    * web-scale corpora swap the candidate arm for [[ivfTopK]] and filter
    * labels post-hoc (over-fetch k' > k), exactly like the mutual-kNN
    * composition.
    */
  def hardNegatives(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      labelCol: String,
      k: Int,
      roundTo: Int = 6): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"),
      col(labelCol).as("__ql"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"),
      col(labelCol).as("__cl"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id") &&
        !(col("__ql") <=> col("__cl")))
      .withColumn("cosine", round(cosine(col("__qv"), col("__cv")), roundTo))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"),
        col("rank").cast("long").as("rank"))
  }

  def mutualKnnGraph(topk: DataFrame): DataFrame = {
    val fwd = topk.select(col("query_id").as("a"), col("neighbor_id").as("b"),
      col("cosine"))
    val rev = topk.select(col("query_id").as("b"), col("neighbor_id").as("a"))
    fwd.join(rev, Seq("a", "b"))
      .filter(col("a") < col("b"))
      .select(col("a").as("id_a"), col("b").as("id_b"), col("cosine"))
  }
}
