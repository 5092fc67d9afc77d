package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact per-key rank selection without a whole-key sort — the two-phase
  * quantile-grid trainer.
  *
  * The naive discrete-quantile trainer ranks every row with
  * `row_number() OVER (PARTITION BY key ORDER BY value)`: with few keys
  * (the event_type case — 5 values) every key's whole corpus slice
  * funnels through ONE task's sort, the low-cardinality-window
  * serialization this repo's NOTES record from the CUSUM fix. This
  * operator keeps the result bit-exact — the value at rank ⌈p·n⌉ is a
  * DATA value, deterministic regardless of tie order — while doing the
  * work in two bounded passes with no window at all:
  *
  *  1. **Band pass**: one `approx_percentile` aggregation per key (GK
  *     sketch, distributed combine) brackets each target rank
  *     `r_p = ⌈p·n⌉` with a value band `[lo_p, hi_p]` taken at fractions
  *     `p ∓ margin/accuracy`. The sketch guarantees rank error ≤
  *     n/accuracy, so with margin 3 the true rank-r_p value lies inside
  *     the band; overlapping bands merge into disjoint intervals.
  *  2. **Cell pass**: one aggregation groups rows by (key, segment,
  *     in-band value) — outside-interval segments collapse to a single
  *     count cell each, inside-interval segments keep one cell per
  *     DISTINCT value. Distinct in-band values are rank-bounded by the
  *     sketch accuracy (≈ 8·n/accuracy per band), so the collected cell
  *     table is O(|keys| · |ps| · n/accuracy) — bounded by the accuracy
  *     choice, independent of row count. A driver-side cumulative walk
  *     then reads the exact rank-r_p value straight off the counts.
  *
  * If a target rank lands in an outside segment (a sketch-guarantee
  * violation — never observed, but the guarantee is probabilistic-free
  * yet implementation-trusted), the affected key falls back to the exact
  * single-key sort path rather than returning a wrong value.
  *
  * Scale shape: both passes are map-side-combined aggregations keyed by
  * (key[, value]); nothing ever sorts more than one key's in-band slice,
  * and that only driver-side over the bounded cell table. The collected
  * artifacts are the per-key sketch row and the cell table. Bounded-key
  * contract like the literal-fold transform itself: with unbounded keys
  * the same two passes write their results as TABLES and the final walk
  * becomes a join — the documented lever.
  */
object RankSelect {

  /** Times the exact single-key sort fallback ran (test observability:
    * specs pin that ordinary data never pays the whole-key sort).
    */
  private[pipeline] val fallbackCount = new java.util.concurrent.atomic.AtomicLong

  /** Exact discrete quantile grid per key: for each key with ≥1 non-null
    * value, the deduped sorted array of the values at ranks
    * `⌈p·n_key⌉` for `p` in `ps`.
    *
    * `keyCol` must be string-typed (callers with numeric keys cast
    * first); `valueCol` double. `accuracy` trades cell-table size
    * (∝ n/accuracy) against sketch size (∝ accuracy).
    *
    * DETERMINISTIC-INPUT CONTRACT: the band pass and the cell pass are two
    * separate jobs over `df`. A source whose contents change between the
    * jobs (a table being appended to, a non-deterministic derivation) can
    * make pass-2 counts inconsistent with pass-1 plans — the walk then
    * reads a value at the wrong rank WITHOUT tripping the outside-segment
    * fallback. Hand this trainer an immutable snapshot (a parquet dir, a
    * cached frame); every in-repo caller reads fixed parquet. We do not
    * force a `.cache()` here because the trainer's whole point is that
    * neither pass needs the raw rows resident — caching a 100 TB input to
    * guard against a contract violation would invert the cost model.
    */
  def exactQuantileGrid(
      df: DataFrame,
      keyCol: String,
      valueCol: String,
      ps: Seq[Double],
      accuracy: Int = 2000): Map[String, Array[Double]] = {
    require(ps.nonEmpty && ps.forall(p => p > 0.0 && p <= 1.0), s"bad ps: $ps")
    val margin = 3.0 / accuracy
    // fraction ladder: every p plus its band edges, deduped, sorted
    val frs = ps.flatMap(p => Seq(math.max(p - margin, 1e-9), p,
        math.min(p + margin, 1.0)))
      .distinct.sorted
    val v = col(valueCol).cast("double")
    val rows = df.filter(v.isNotNull)
      .select(col(keyCol).cast("string").as("__k"), v.as("__v"))

    // pass 1: per-key count + sketch values at the fraction ladder
    val stats = rows.groupBy(col("__k"))
      .agg(count(lit(1)).as("__n"),
        percentile_approx(col("__v"),
          array(frs.map(lit): _*), lit(accuracy)).as("__apx"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1),
        r.getSeq[Double](2).toArray))

    if (stats.isEmpty) return Map.empty
    val frIdx = frs.zipWithIndex.toMap

    // driver: per key, target ranks and merged disjoint value intervals
    case class KeyPlan(n: Long, ranks: Array[Long], intervals: Array[(Double, Double)])
    val plans: Map[String, KeyPlan] = stats.map { case (k, n, apx) =>
      val ranks = ps.map(p => math.ceil(p * n).toLong.max(1L).min(n)).toArray
      val bands = ps.map { p =>
        (apx(frIdx(math.max(p - margin, 1e-9))), apx(frIdx(math.min(p + margin, 1.0))))
      }.sortBy(_._1)
      val merged = bands.foldLeft(List.empty[(Double, Double)]) {
        case ((lo0, hi0) :: tail, (lo, hi)) if lo <= hi0 =>
          (lo0, math.max(hi0, hi)) :: tail
        case (acc, b) => b :: acc
      }.reverse.toArray
      k -> KeyPlan(n, ranks, merged)
    }.toMap

    // pass 2: (key, segment, in-band value) cells. Segment ids alternate
    // outside/inside: seg 2i = values below interval i, seg 2i+1 = inside
    // interval i, last seg = above the final interval. The assignment is
    // ONE RankBucket kernel call — seg = upper-bound search over the
    // key's boundary ladder [lo₁, nextUp(hi₁), lo₂, nextUp(hi₂), …]
    // (v ≤ hi counts lo only → odd inside id; v > hi also counts
    // nextUp(hi) → even outside id). A per-key when-chain of interval
    // tests FAILS codegen compilation past ~60 keys (the 64 KB method
    // cliff — observed at 64 embedding dims) and runs interpreted; the
    // kernel's generated code is constant-size in the key count.
    val keyIdx = plans.keys.toSeq.sorted.zipWithIndex.toMap
    val boundaryFamily: Map[Int, Array[Double]] = plans.map { case (k, plan) =>
      keyIdx(k) -> plan.intervals.flatMap { case (lo, hi) =>
        Seq(lo, Math.nextUp(hi)) }.toArray
    }
    val segOf: Column = graft.functions.RankBucket.rankBucket(
        col("__v"), element_at(typedLit(keyIdx), col("__k")), boundaryFamily)
      .getField("q_bucket").cast("int")
    val inBand = (col("__seg") % 2) === 1
    val cells = rows
      .withColumn("__seg", segOf)
      .groupBy(col("__k"), col("__seg"),
        when(inBand, col("__v")).as("__bv"))
      .agg(count(lit(1)).as("__c"))
      .collect()
      .map(r => (r.getString(0), r.getInt(1),
        if (r.isNullAt(2)) Double.NaN else r.getDouble(2), r.getLong(3)))

    // driver: cumulative walk in (segment, value) order per key
    val byKey = cells.groupBy(_._1)
    plans.map { case (k, plan) =>
      val ordered = byKey.getOrElse(k, Array.empty)
        .sortBy { case (_, seg, bv, _) => (seg, bv) } // NaN (outside) sorts last,
                                                      // but outside segs hold 1 cell
      val targets = plan.ranks.distinct.sorted
      var cum = 0L
      var ti = 0
      val picked = Array.fill(targets.length)(Double.NaN)
      val inside = Array.fill(targets.length)(false)
      ordered.foreach { case (_, seg, bv, c) =>
        val lo = cum + 1; cum += c
        while (ti < targets.length && targets(ti) <= cum) {
          if (targets(ti) >= lo) { picked(ti) = bv; inside(ti) = seg % 2 == 1 }
          ti += 1
        }
      }
      val grid =
        if (inside.forall(identity) && ti == targets.length)
          picked.distinct.sorted
        else { // sketch band missed a target rank: exact per-key fallback
          fallbackCount.incrementAndGet()
          exactGridBySort(rows.filter(col("__k") === lit(k)), plan.ranks)
        }
      k -> grid
    }
  }

  /** Exact single-key fallback: the plain rank window, scoped to one key
    * (correct at any tie pathology; only used when a sketch band misses).
    */
  private def exactGridBySort(keyRows: DataFrame, ranks: Array[Long]): Array[Double] = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("__k")).orderBy(col("__v"))
    val rset = ranks.toSet
    keyRows.withColumn("__rn", row_number().over(w).cast("long"))
      .filter(col("__rn").isin(rset.toSeq: _*))
      .select(col("__v")).collect().map(_.getDouble(0))
      .distinct.sorted
  }
}
