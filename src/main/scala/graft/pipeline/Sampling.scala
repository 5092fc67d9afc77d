package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, reproducible sampling for training-data pipelines.
  *
  * `sample(fraction)` on a DataFrame is seed-stable only for a fixed
  * partition layout — repartition the input and the sample changes. Hash
  * sampling keys the decision on the ROW (an id column), so the same row is
  * always in or out: stable across partitioning, engines, re-runs and
  * appends (new rows don't reshuffle old decisions), which is what
  * reproducible corpus subsetting needs. The hash is md5 (identically
  * defined everywhere), so an oracle reproduces the exact sample.
  *
  * Scale shape: a narrow filter — no shuffle, no sort, full codegen;
  * stratified rates are just a per-stratum threshold map applied in the
  * same single pass.
  */
object Sampling {

  /** Uniform [0, 1) sampling score for an id column: the first 8 hex chars
    * of `md5(id)` as an integer over 2³². Deterministic and engine-neutral.
    */
  def hashScore(idCol: Column): Column =
    conv(substring(md5(idCol.cast("string")), 1, 8), 16, 10).cast("long")
      .cast("double") / lit(4294967296.0)

  /** Keep each row iff its hash score < `fraction`. */
  def deterministicSample(df: DataFrame, idCol: String, fraction: Double): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction out of range: $fraction")
    df.filter(hashScore(col(idCol)) < fraction)
  }

  /** Contiguous token-budget packing (pretraining sequence packing): walk
    * the documents of each stratum in a deterministic order, accumulate
    * token counts, and assign bin `floor(startOffset / budget)` — docs
    * whose cumulative window crosses a budget boundary start the next
    * fill. A bin may overflow by at most its last document's tokens (the
    * standard greedy contiguous scheme; exact first-fit-with-reset is
    * inherently sequential state and does not distribute).
    *
    * Scale shape: one window cumsum per stratum — key-partitioned,
    * parallel across strata, no global window. Adds `bin_id` and
    * `bin_offset` (the doc's token start offset within its bin).
    * `orderCols` must define a TOTAL order within each stratum (include a
    * tiebreaker) or the cumsum — and therefore the packing — is
    * nondeterministic. One stratum's packing is one window task (the
    * hot-key caveat of every per-key running ordinal; see Sessionize).
    */
  def packByBudget(
      df: DataFrame,
      strataCol: String,
      tokenCol: String,
      budget: Long,
      orderCols: Seq[Column]): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol)).orderBy(orderCols: _*)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val start = coalesce(sum(col(tokenCol)).over(w), lit(0L))
    df.withColumn("bin_id", floor(start / lit(budget)).cast("long"))
      .withColumn("bin_offset", (start - floor(start / lit(budget)) * lit(budget)).cast("long"))
  }

  /** Deterministic weighted sample without replacement (Efraimidis–Spirakis
    * exponential race): each row gets score `-ln(u) / w` with `u` its
    * [[hashScore]] and `w` its weight; the `k` smallest scores are the
    * sample. Inclusion probability is proportional to weight, and because
    * `u` is hash-derived the same rows win on every engine, partitioning
    * and re-run. `u` is clamped away from 0 so a pathological all-zero hash
    * cannot produce an infinite score.
    *
    * Scale shape: narrow score arithmetic + TakeOrdered(k) — no full sort,
    * no shuffle beyond the top-k reduction; k rows reach the driver-side
    * heap merge regardless of corpus size.
    */
  def weightedSample(
      df: DataFrame,
      idCol: String,
      weightCol: String,
      k: Int): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val u     = greatest(hashScore(col(idCol)), lit(1e-12))
    val score = -log(u) / col(weightCol).cast("double")
    df.filter(col(weightCol) > 0)
      .withColumn("__score", score)
      .orderBy(col("__score").asc, col(idCol).asc)
      .limit(k)
      .drop("__score")
  }

  /** Deterministic proportional source interleave (pretraining data
    * mixing): stratum `s` with integer weight `p_s` gets every row a mix
    * key `(2r - 1) * (L / p_s)` where `r` is its 1-based rank within the
    * stratum (by `orderCols`) and `L` the LCM of all weights. Sorting by
    * `(mix_key, strata, id)` yields a stream whose every prefix holds each
    * stratum within one row of its target share — the standard
    * deterministic stride-scheduling order, in pure integer arithmetic so
    * any SQL engine reproduces it bit-for-bit. Zero-weight strata are
    * dropped.
    *
    * Scale shape: one keyed window per stratum (rank) + narrow arithmetic.
    * The GLOBAL order is carried by the key, never computed — consumers
    * that need physical order sort on read or bucket by `mix_key` range;
    * nothing here is a single-task global window.
    */
  def mixByParts(
      df: DataFrame,
      idCol: String,
      strataCol: String,
      parts: Map[String, Long],
      defaultPart: Long): DataFrame = {
    require((parts.values ++ Seq(defaultPart)).forall(_ >= 0), "weights must be >= 0")
    val weights = (parts.values.toSeq :+ defaultPart).filter(_ > 0)
    require(weights.nonEmpty, "at least one stratum must have positive weight")
    def gcd(a: Long, b: Long): Long = if (b == 0) a else gcd(b, a % b)
    val l = weights.foldLeft(1L)((a, b) => a / gcd(a, b) * b)
    def chain(f: Long => Long): Column =
      parts.foldLeft(lit(f(defaultPart))) { case (acc, (k, v)) =>
        when(col(strataCol) === lit(k), lit(f(v))).otherwise(acc)
      }
    val weight = chain(identity)
    val stride = chain(v => if (v == 0) 0L else l / v)
    val r = row_number().over(org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol)).orderBy(col(idCol).asc)).cast("long")
    df.filter(weight > 0)
      .withColumn("mix_rank", r)
      .withColumn("mix_key", (col("mix_rank") * 2L - 1L) * stride)
  }

  /** Per-key quota cap: keep at most `quota` rows per key, chosen by
    * `ordCols` order — the data-mixing primitive that stops one mega-domain
    * (or one bot user) from dominating a training mix. Deterministic given
    * a total (key, ordCols) order.
    *
    * Scale shape: one hash shuffle on the key, then Spark's
    * WindowGroupLimit keeps a running top-`quota` per partition BEFORE the
    * shuffle — a 10⁹-row domain ships only `quota` rows per map partition,
    * never its whole history.
    */
  def capPerKey(
      df: DataFrame,
      keyCols: Seq[String],
      quota: Int,
      ordCols: Seq[String]): DataFrame = {
    require(quota > 0, s"quota must be positive: $quota")
    require(ordCols.nonEmpty, "capPerKey needs a deterministic order")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*).orderBy(ordCols.map(col(_).asc): _*)
    // the rank predicate stays on the raw row_number so Spark plans
    // WindowGroupLimit; cast AFTER the filter if a BIGINT rank is needed
    df.withColumn("__rank", row_number().over(w))
      .filter(col("__rank") <= quota)
      .drop("__rank")
  }

  /** Leakage-safe train/heldout split: the split decision hashes the
    * document's DUP-CLUSTER root (its own id when unclustered), so two
    * near-duplicates can never straddle the boundary — the evaluation-
    * contamination failure mode of naive per-document splitting (a
    * heldout doc whose near-copy sits in train is a leaked answer).
    *
    * `clusters` is a `(id, cluster_id)` assignment (e.g.
    * [[Dedup.clusters]] over a near-dup pair set); documents absent from
    * it are singletons and split by their own id, so the split remains
    * append-stable: new unclustered docs don't move old decisions, and a
    * doc joining an existing cluster adopts that cluster's (stable)
    * side. Returns every row of `df` plus `split_unit` (the hashed id)
    * and `split`.
    *
    * Scale shape: one LEFT join against the pair-bounded cluster table
    * (far smaller than the corpus — broadcastable in practice) + the
    * narrow hash filter; no window, no corpus shuffle.
    *
    * The `clusters` frame's expected schema is `(id, cluster_id)` — the
    * [[graft.pipeline.Dedup.clusters]] output contract. Its columns are
    * renamed to internal names before the join, so a caller whose `df`
    * already carries a `cluster_id` (or `id`) column is unaffected.
    */
  def clusterAtomicSplit(
      df: DataFrame,
      idCol: String,
      clusters: DataFrame,
      trainFraction: Double,
      trainLabel: String = "train",
      heldoutLabel: String = "heldout"): DataFrame = {
    require(trainFraction >= 0.0 && trainFraction <= 1.0,
      s"trainFraction out of range: $trainFraction")
    val cl = clusters.select(col("id").as("__split_id"),
      col("cluster_id").as("__split_cluster"))
    df.join(cl, df(idCol) === cl("__split_id"), "left")
      .withColumn("split_unit", coalesce(col("__split_cluster"), col(idCol)))
      .drop("__split_id", "__split_cluster")
      .withColumn("split",
        when(hashScore(col("split_unit")) < trainFraction, trainLabel)
          .otherwise(heldoutLabel))
  }

  /** Per-stratum sampling rates (e.g. downweight a dominant source): rows in
    * a stratum missing from `rates` fall back to `defaultFraction`.
    */
  def stratifiedSample(
      df: DataFrame,
      idCol: String,
      strataCol: String,
      rates: Map[String, Double],
      defaultFraction: Double): DataFrame = {
    require((rates.values ++ Seq(defaultFraction)).forall(r => r >= 0.0 && r <= 1.0),
      "fractions must be in [0, 1]")
    val rate = rates.foldLeft(lit(defaultFraction)) { case (acc, (k, r)) =>
      when(col(strataCol) === lit(k), lit(r)).otherwise(acc)
    }
    df.filter(hashScore(col(idCol)) < rate)
  }

  /** Temperature-scaled source rebalancing — the multilingual α-sampling
    * scheme (mBERT/XLM-R exponential smoothing, Conneau & Lample 2019):
    * resample so stratum i's share moves from p_i ∝ n_i to q_i ∝ n_i^α,
    * flattening dominant strata while keeping small ones intact. Realized
    * purely by deterministic hash-thinning (rate ≤ 1, no upsampling), the
    * per-stratum keep rate has the closed form
    *
    *   rate_i = (n_min / n_i)^(1−α)
    *
    * (the normalizer Σ n_j^α cancels exactly; the smallest stratum is kept
    * whole — the largest feasible thinning-only realization of q). α = 1
    * keeps everything; α = 0 equalizes all strata to n_min in expectation.
    * Rates are rounded to 9 decimals before the compare so an independent
    * engine's pow ulp differences cannot flip a row.
    *
    * Scale shape: one tiny per-stratum count aggregate, rates broadcast
    * back, then the narrow hash-score filter — no corpus shuffle, append-
    * stable per row given stable counts.
    */
  def temperatureSample(
      df: DataFrame,
      idCol: String,
      strataCol: String,
      alpha: Double): DataFrame = {
    require(alpha >= 0.0 && alpha <= 1.0, s"alpha out of range: $alpha")
    val counts = df.groupBy(col(strataCol)).agg(count(lit(1)).as("__n"))
    val nmin = counts.agg(min(col("__n")).as("__nmin"))
    val rates = counts.crossJoin(broadcast(nmin))
      .select(col(strataCol),
        round(pow(col("__nmin").cast("double") / col("__n").cast("double"),
          lit(1d - alpha)), 9).as("__rate"))
    df.join(broadcast(rates), Seq(strataCol))
      .filter(hashScore(col(idCol)) < col("__rate"))
      .drop("__rate")
  }

  /** Deterministic train/val/test split assignment: partition [0, 1) into
    * cumulative-weight intervals and bucket each row by its [[hashScore]].
    * The same row always lands in the same split — across partitionings,
    * engines, re-runs and appends — which is the property an ML data split
    * must have (a repartition-dependent `randomSplit` leaks val rows into
    * train on every relayout). Weights must sum to 1 (±1e-9).
    *
    * Scale shape: a narrow projection — no shuffle, no sort, full codegen;
    * downstream per-split readers filter on the added column.
    */
  def assignSplit(
      df: DataFrame,
      idCol: String,
      splits: Seq[(String, Double)],
      outCol: String = "split"): DataFrame = {
    require(splits.nonEmpty, "splits must be non-empty")
    require(splits.forall(_._2 >= 0.0), s"negative split weight in $splits")
    require(math.abs(splits.map(_._2).sum - 1.0) <= 1e-9,
      s"split weights must sum to 1: $splits")
    val score = hashScore(col(idCol))
    // Last split takes the remainder interval (score < 1 always), so float
    // drift in the cumulative sums can never leave a row unassigned.
    val cuts = splits.scanLeft(0.0)(_ + _._2).tail
    val assigned = splits.init.zip(cuts).foldRight(lit(splits.last._1): Column) {
      case (((name, _), cut), acc) => when(score < cut, lit(name)).otherwise(acc)
    }
    df.withColumn(outCol, assigned)
  }

  /** EXACT-quota stratified split: within each stratum, rows rank by
    * (hash score, id) and the first `floor(n·f₁)` go to split 1, the next
    * up to `floor(n·(f₁+f₂))` to split 2, …, remainder to the last — so
    * every stratum's split sizes are exact integers, not binomial draws.
    * [[assignSplit]]'s probabilistic cut is the right tool when quota
    * jitter is acceptable and a window is not; this is the right tool
    * when an evaluation protocol demands "exactly 10% of every source".
    * Deterministic and append-stable WITHIN a snapshot (same rows → same
    * assignment); adding rows reshuffles assignments near quota
    * boundaries, which is inherent to exact quotas.
    *
    * Cut arithmetic: `floor(n · cum)` evaluated in doubles — both engines
    * multiply the same integer by the same literal and floor the same
    * product, so the boundary is cross-engine identical.
    *
    * Scale shape: ONE stratum shuffle; the rank window and the stratum
    * count window share the exchange. Strata are corpus-partition-sized
    * (a hot stratum serializes its own rank pass — same bound as any
    * per-stratum window op).
    */
  def exactQuotaSplit(
      df: DataFrame,
      idCol: String,
      stratumCol: String,
      splits: Seq[(String, Double)],
      outCol: String = "split"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(splits.nonEmpty, "splits must be non-empty")
    require(splits.forall(_._2 >= 0.0), s"negative split weight in $splits")
    require(math.abs(splits.map(_._2).sum - 1.0) <= 1e-9,
      s"split weights must sum to 1: $splits")
    val w  = Window.partitionBy(col(stratumCol))
      .orderBy(hashScore(col(idCol)).asc, col(idCol).asc)
    val wn = Window.partitionBy(col(stratumCol))
    val rn = row_number().over(w).cast("long")
    val n  = count(lit(1)).over(wn).cast("double")
    val cuts = splits.scanLeft(0.0)(_ + _._2).tail
    val assigned = splits.init.zip(cuts).foldRight(lit(splits.last._1): Column) {
      case (((name, _), cut), acc) =>
        when(rn <= floor(n * cut), lit(name)).otherwise(acc)
    }
    df.withColumn(outCol, assigned)
  }
}
