package graft.ops

import graft.pipeline.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph analytics over an edge list.
  *
  * The one operator here is PageRank, the canonical iterative fixed-point
  * a single-pass SQL engine cannot express without replaying the whole
  * recursion as N chained scans — on Spark each iteration is ONE
  * broadcast-joined aggregation over a checkpointed edge table.
  */
object Graph {

  /** Standard damped PageRank over a directed edge list, `iterations`
    * synchronous Jacobi steps from the uniform vector:
    *
    *   r'(v) = (1 - d) / n  +  d * Σ_{(u,v) ∈ E} r(u) / outdeg(u)
    *
    * Semantics (each choice replayed verbatim by the relational oracle):
    *  - the graph is made SIMPLE first: self-loops dropped, duplicate
    *    edges collapsed;
    *  - the node set is the union of sources and destinations;
    *  - dangling mass is NOT redistributed (nodes without out-edges leak
    *    their mass, the plain power-iteration formulation) — with the
    *    planted graphs used by the query inventory every node has an
    *    out-edge, so the two formulations coincide there.
    *
    * Scale shape: the out-degree-annotated edge table is checkpointed
    * ONCE and every iteration re-reads it from executor memory; the rank
    * vector (n rows, two columns) is the ONLY thing that moves per
    * iteration. While n stays under `broadcastNodeLimit` the per-iteration
    * join gets an explicit broadcast hint — the edge table never shuffles
    * at all, and one iteration = broadcast(ranks) + one map-side-combined
    * aggregate on dst. Beyond the gate the join falls back to a shuffled
    * hash join on src (a web-scale graph would pre-bucket edges by src so
    * every iteration reuses the layout; ranks are always exchanged on the
    * same key, so AQE coalesces the small side). Ranks are checkpointed
    * per iteration to keep the optimizer's plan depth constant instead of
    * growing 10 joins deep.
    */
  def pageRank(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iterations: Int = 10,
      damping: Double = 0.85,
      broadcastNodeLimit: Long = 4L << 20): DataFrame = {
    require(iterations >= 1, s"iterations must be positive: $iterations")
    require(damping > 0 && damping < 1, s"damping must be in (0, 1): $damping")
    val simple = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
    val deg = simple.groupBy(col("src"))
      .agg(count(lit(1)).cast("double").as("__od"))
    val ed = Dedup.materializeOnce(simple.join(deg, "src"))
    val nodes = Dedup.materializeOnce(
      ed.select(col("src").as("node"))
        .union(ed.select(col("dst").as("node"))).distinct())
    val n = nodes.count()
    require(n > 0, "pageRank: empty graph")
    val hint = n <= broadcastNodeLimit
    var ranks = nodes.select(col("node"), lit(1.0 / n).as("r"))
    for (_ <- 1 to iterations) {
      val rs = if (hint) broadcast(ranks) else ranks
      val contribs = ed.join(rs, ed("src") === rs("node"))
        .groupBy(ed("dst").as("node"))
        .agg(sum(col("r") / col("__od")).as("__c"))
      val next = nodes.as("nd")
        .join(if (hint) broadcast(contribs.as("c")) else contribs.as("c"),
          col("nd.node") === col("c.node"), "left")
        .select(col("nd.node").as("node"),
          (lit((1.0 - damping) / n) +
            lit(damping) * coalesce(col("__c"), lit(0.0))).as("r"))
      ranks = Dedup.materializeOnce(next)
    }
    ranks
  }

  /** Personalized PageRank: the teleport mass lands ONLY on `seeds`
    * (uniformly split across the seed nodes present in the graph)
    * instead of uniformly on all nodes —
    *
    *   r'(v) = (1 - d) · w(v)  +  d · Σ_{(u,v) ∈ E} r(u) / outdeg(u)
    *
    * with w the seed indicator / |seeds ∩ nodes| and r₀ = w. Ranks then
    * measure proximity to the seed set — the contamination-tracing /
    * related-content primitive. Same simple-graph normalization, scale
    * shape and iteration machinery as [[pageRank]]: the teleport vector
    * is one more (node, w) column riding the checkpointed node table,
    * so an iteration still moves nothing but the rank vector. Seeds not
    * present in the graph are ignored (they could receive no mass).
    */
  def personalizedPageRank(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      seeds: DataFrame,
      seedCol: String,
      iterations: Int = 10,
      damping: Double = 0.85,
      broadcastNodeLimit: Long = 4L << 20): DataFrame = {
    require(iterations >= 1, s"iterations must be positive: $iterations")
    require(damping > 0 && damping < 1, s"damping must be in (0, 1): $damping")
    val simple = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
    val deg = simple.groupBy(col("src"))
      .agg(count(lit(1)).cast("double").as("__od"))
    val ed = Dedup.materializeOnce(simple.join(deg, "src"))
    val nodes =
      ed.select(col("src").as("node"))
        .union(ed.select(col("dst").as("node"))).distinct()
    val seedNodes = Dedup.materializeOnce(
      nodes.join(seeds.select(col(seedCol).cast("long").as("node")).distinct(),
        Seq("node"), "left_semi"))
    val k = seedNodes.count()
    require(k > 0, "personalizedPageRank: no seed is a node of the graph")
    val tele = Dedup.materializeOnce(
      nodes.as("nd")
        .join(seedNodes.select(col("node"), lit(true).as("__is")).as("s"),
          Seq("node"), "left")
        .select(col("node"),
          when(col("__is"), lit(1.0 / k)).otherwise(lit(0.0)).as("__w")))
    val n = tele.count()
    val hint = n <= broadcastNodeLimit
    var ranks = tele.select(col("node"), col("__w").as("r"))
    for (_ <- 1 to iterations) {
      val rs = if (hint) broadcast(ranks) else ranks
      val contribs = ed.join(rs, ed("src") === rs("node"))
        .groupBy(ed("dst").as("node"))
        .agg(sum(col("r") / col("__od")).as("__c"))
      val next = tele.as("t")
        .join(if (hint) broadcast(contribs.as("c")) else contribs.as("c"),
          col("t.node") === col("c.node"), "left")
        .select(col("t.node").as("node"),
          (lit(1.0 - damping) * col("__w") +
            lit(damping) * coalesce(col("__c"), lit(0.0))).as("r"))
      ranks = Dedup.materializeOnce(next)
    }
    ranks
  }

  /** Connected components of the UNDIRECTED view of an edge list:
    * min-label propagation to fixpoint (each node's component is the
    * smallest node id it can reach), the Pregel formulation. Returns
    * (node, comp).
    *
    * Scale shape: the symmetrized edge table checkpoints once; one
    * round = one join + one map-side-combined min aggregate + one
    * size-gated broadcast join against the label vector, and the
    * convergence probe is a COUNT on the already-checkpointed next
    * frame (no extra scan of anything big). Rounds needed = graph
    * diameter — the right tool for the short-diameter graphs real link
    * data produces; a pathological long-chain graph bounded by
    * `maxRounds` fails loudly rather than silently returning a
    * half-propagated labeling. (The repo's other components engine —
    * the [[graft.functions.PairComponents]] union-find aggregate used
    * by dedup clustering — solves any diameter in ONE pass but holds
    * the whole id universe in one aggregation buffer; this one never
    * materializes more than (node, comp) rows anywhere, so it is the
    * web-scale path.)
    */
  def connectedComponents(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      maxRounds: Int = 64,
      broadcastNodeLimit: Long = 4L << 20): DataFrame = {
    val directed = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .filter(col("src") =!= col("dst"))
    val und = Dedup.materializeOnce(
      directed.union(directed.select(col("dst").as("src"), col("src").as("dst")))
        .distinct())
    val nodes = Dedup.materializeOnce(
      und.select(col("src").as("node")).distinct())
    val n = nodes.count()
    val hint = n <= broadcastNodeLimit
    var labels = Dedup.materializeOnce(
      nodes.select(col("node"), col("node").as("comp")))
    var round = 0
    var changed = 1L
    while (changed > 0) {
      round += 1
      require(round <= maxRounds,
        s"connectedComponents: no fixpoint after $maxRounds rounds " +
          "(graph diameter exceeds the bound; raise maxRounds)")
      val ls = if (hint) broadcast(labels) else labels
      val cand = und.join(ls, und("src") === ls("node"))
        .groupBy(und("dst").as("node"))
        .agg(min(col("comp")).as("__c"))
      val next = Dedup.materializeOnce(
        labels.as("l")
          .join(if (hint) broadcast(cand.as("c")) else cand.as("c"),
            col("l.node") === col("c.node"), "left")
          .select(col("l.node").as("node"),
            least(col("l.comp"), coalesce(col("__c"), col("l.comp"))).as("comp"),
            (col("__c").isNotNull && col("__c") < col("l.comp")).as("__chg")))
      changed = next.filter(col("__chg")).count()
      labels = next.select(col("node"), col("comp"))
    }
    labels
  }
}
