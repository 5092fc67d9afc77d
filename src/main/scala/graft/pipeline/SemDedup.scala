package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Semantic deduplication over an embedding column — SemDeDup (Abbas et
  * al. 2023, arXiv:2303.09540): k-means-partition the corpus embeddings,
  * call two vectors semantic duplicates when their cosine similarity
  * exceeds a threshold AND they share a cluster, and keep exactly one
  * member per duplicate group — the one LEAST similar to its cluster
  * centroid (the paper's diversity-preserving keep rule; ties break to the
  * smallest id so the result is deterministic and cross-engine checkable).
  *
  * This is the embedding-space sibling of the text-space near-dup chain
  * ([[Dedup.jaccardPairs]] → [[Dedup.clusters]] → [[Dedup.dedupByClusters]])
  * and the scale path for embedding-cosine dedup: the cell equijoin makes
  * the pair search per-cell quadratic instead of corpus quadratic. The
  * cluster count is the lever — size `k` so the expected cell holds a few
  * thousand vectors (k ≈ n / targetCellSize) and the per-cell pair work
  * stays bounded as the corpus grows; the centroids come from the same
  * trained-artifact boundary as IVF search ([[Similarity.ivfCentroids]] /
  * `loadCentroids`), so dedup and ANN share one index.
  *
  * Scale shape: one codegen assignment scan (no shuffle), one shuffle of
  * (cell_id, id, vector) for the self-join, per-cell pair generation, then
  * per-cell connected components inside ONE aggregate
  * ([[graft.functions.PairComponents]] — the pair graph is a disjoint
  * union of per-cell graphs, so union-find over each cell's cell-bounded
  * edge list replaces corpus-wide label propagation and its driver-synced
  * rounds entirely). The keep-rule window runs over the pair-bounded
  * component table, never the corpus. [[Dedup.clusters]] remains the tool
  * for graphs that genuinely span the corpus (the text near-dup chain).
  */
object SemDedup {

  /** Within-cell duplicate pairs: (cell_id, id_a, id_b, cosine) with
    * id_a < id_b and rounded cosine ≥ threshold. Rounding to 6 decimals
    * before the compare keeps the threshold decision identical across
    * engines (same convention as [[Similarity.ivfCellExpr]]).
    */
  def pairs(
      assigned: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double): DataFrame = {
    val a = assigned.select(col("cell_id"), col(idCol).as("id_a"),
      col(vecCol).as("__va"))
    val b = assigned.select(col("cell_id"), col(idCol).as("id_b"),
      col(vecCol).as("__vb"))
    a.join(b, Seq("cell_id"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine", round(Similarity.cosine(col("__va"), col("__vb")), 6))
      .filter(col("cosine") >= lit(threshold))
      .select(col("cell_id"), col("id_a"), col("id_b"), col("cosine"))
  }

  /** Incremental SemDeDup: which vectors of a NEW batch survive against an
    * already-deduplicated PRIOR corpus — the streaming-ingest contract
    * (train once, dedup each arriving batch against what's already kept),
    * the embedding-space mirror of [[Dedup.nearDupsAgainstPrior]]. A fresh
    * vector is dropped iff some prior vector in the SAME cell meets the
    * cosine threshold; no grouping or keep rule is needed because the
    * prior side is fixed and the new batch defers to it. Returns the kept
    * fresh rows as (id, cell_id).
    *
    * Scale shape: both sides take the codegen assignment scan, then one
    * cell equijoin (fresh × prior per cell) feeding a left-anti join on
    * the fresh ids — the prior corpus is never self-joined.
    */
  def incrKeep(
      fresh: DataFrame,
      prior: DataFrame,
      idCol: String,
      vecCol: String,
      centroids: Array[(Long, Array[Double])],
      threshold: Double): DataFrame = {
    // the fresh side feeds both the cell equijoin and the anti-join:
    // assign it once (the prior side is scanned once, no materialization)
    val fa = Dedup.materializeOnce(
      Similarity.ivfAssignWithSim(fresh, vecCol, centroids)
        .select(col(idCol), col(vecCol), col("cell_id")))
    val pa = Similarity.ivfAssignWithSim(prior, vecCol, centroids)
      .select(col(idCol).as("__pid"), col(vecCol).as("__pv"), col("cell_id"))
    val hit = fa.join(pa, Seq("cell_id"))
      .filter(round(Similarity.cosine(col(vecCol), col("__pv")), 6) >= lit(threshold))
      .select(col(idCol)).distinct()
    fa.join(hit, Seq(idCol), "left_anti")
      .select(col(idCol), col("cell_id"))
  }

  /** Full SemDeDup pass: returns the KEPT set as
    * (id, cell_id, centroid_sim). A vector survives iff it is unpaired or
    * is its duplicate group's keeper (minimum `centroid_sim`, then
    * minimum id). Connected components — not just pairwise drops — so a
    * chain a~b~c keeps exactly one member even when a~c itself is below
    * the threshold, matching the transitive grouping of the text-side
    * dedup chain. Components are computed per cell in one
    * [[graft.functions.PairComponents]] aggregation: duplicate pairs only
    * exist within a cell, so cell-local union-find yields exactly the
    * global components with no iteration. Ids must be long-castable (the
    * [[Dedup.clusters]] contract this operator inherited).
    */
  def keep(
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      centroids: Array[(Long, Array[Double])],
      threshold: Double): DataFrame = {
    // materialize the assignment ONCE: it feeds the pair self-join (both
    // sides), the centroid_sim lookup and the final anti-join — without
    // this the narrow assignment scan re-runs per consumer, and at
    // production cell counts (n/128 centroids) each re-run is a full
    // n×|cells| distance pass, the dominant cost of the whole operator
    val assigned = Dedup.materializeOnce(
      Similarity.ivfAssignWithSim(embeddings, vecCol, centroids)
        .select(col(idCol), col(vecCol), col("cell_id"), col("centroid_sim")))
    val p = pairs(assigned, idCol, vecCol, threshold)
    val comp = p.groupBy(col("cell_id"))
      .agg(graft.functions.PairComponents.pairComponents(
        col("id_a").cast("long"), col("id_b").cast("long")).as("__cs"))
      .select(explode(col("__cs")).as("__c"))
      .select(col("__c.id").as("id"), col("__c.comp").as("cluster_id"))
    val ranked = comp
      .join(assigned.select(col(idCol).as("id"), col("centroid_sim")), Seq("id"))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("cluster_id"))
          .orderBy(col("centroid_sim").asc, col("id").asc)))
    val drop = ranked.filter(col("__rn") > 1).select(col("id").as(idCol))
    assigned.join(drop, Seq(idCol), "left_anti")
      .select(col(idCol), col("cell_id"), col("centroid_sim"))
  }
}
