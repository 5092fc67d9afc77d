package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-sequence product analytics: ordered-stage funnels and cohort
  * retention — the two reports every event stream grows eventually, and
  * both pure integer arithmetic (timestamps, counts), so the oracles are
  * hash-exact with no rounding anywhere.
  */
object Funnel {

  /** Ordered funnel: for each entity, the first time it completed each
    * stage STRICTLY AFTER completing the previous one (first `stages(0)`,
    * then the first `stages(1)` with `ts > that`, …). Output: one row per
    * entity that entered the funnel (did stage 0), with
    * `<stage>_ms` epoch columns (NULL once the chain breaks) and
    * `stages_reached`.
    *
    * "Strictly after" is on the timestamp alone: two stages inside the
    * same millisecond do NOT chain — the deterministic, cross-engine-safe
    * reading of "then" at ms granularity (an id-tiebreak variant would
    * chain them by ingestion accident, not by time).
    *
    * Scale shape: per stage, the events are FILTERED to that stage's type
    * first (narrow, pushed to the scan where the source allows), then
    * joined to the previous stage's per-entity frame — entity-keyed
    * shuffles of #entities-sized aggregates, never event×event. Stage
    * count is the loop bound, so the plan is `|stages|` filtered
    * aggregate-joins, each reusing the entity hash partitioning.
    */
  def funnelStages(
      df: DataFrame,
      entityCol: String,
      tsCol: String,
      typeCol: String,
      stages: Seq[String],
      windowMs: Option[Long] = None): DataFrame = {
    require(stages.nonEmpty, "need at least one stage")
    require(stages.distinct.size == stages.size, s"duplicate stages: $stages")
    require(windowMs.forall(_ > 0), s"non-positive conversion window: $windowMs")
    // each stage frame is REUSED (as the next stage's gate and as the left
    // side of its own join): materialize the per-entity aggregates once, or
    // the fold's lineage re-derives stage k from the raw events 2^(n-k)
    // times — the frames are #entities-sized, so the checkpoint is cheap
    // and the corpus is scanned exactly once per stage
    val first = graft.pipeline.Dedup.materializeOnce(
      df.filter(col(typeCol) === stages.head)
        .groupBy(col(entityCol))
        .agg(min(col(tsCol)).as(s"${stages.head}_ms")))
    val chained = stages.zipWithIndex.drop(1).foldLeft(first) {
      case (prev, (stage, i)) =>
        val prevName  = s"${stages(i - 1)}_ms"
        val entryName = s"${stages.head}_ms"
        val prevTs    = col(prevName)
        // conversion window (when set): every stage must complete within
        // windowMs of the entity's FUNNEL ENTRY (stage 0's ts) — the
        // standard anchored-window product-analytics semantics, greedy
        // first-completion per stage like the unbounded form (a later,
        // slower stage-k that would leave more window room is not
        // reconsidered; the oracle encodes the same greedy rule)
        val carry = (Seq(entityCol, prevName) ++
          (if (windowMs.isDefined) Seq(entryName) else Nil)).distinct.map(col)
        val gated = df.filter(col(typeCol) === stage)
          .select(col(entityCol), col(tsCol).as("__t"))
          .join(prev.select(carry: _*), Seq(entityCol))
          .filter(col("__t") > prevTs)
        val hits = windowMs.fold(gated)(w =>
            gated.filter(col("__t") <= col(entryName) + w))
          .groupBy(col(entityCol))
          .agg(min(col("__t")).as(s"${stage}_ms"))
        graft.pipeline.Dedup.materializeOnce(prev.join(hits, Seq(entityCol), "left"))
    }
    chained.withColumn("stages_reached",
      stages.map(s => when(col(s"${s}_ms").isNotNull, 1).otherwise(0))
        .reduce(_ + _))
  }

  /** Within-session co-occurrence counts: for every unordered pair of
    * event types, how many (entity, session) baskets contained BOTH — the
    * market-basket / association primitive (support counts; lift divides
    * two of these). Sessions come from [[Sessionize.assign]] under
    * `gapMs`; each type counts once per basket regardless of repeats.
    *
    * Scale shape: the sessionize window is the only full-frame pass; the
    * distinct (entity, session, type) frame is Zipf-shrunk (≤ #types per
    * basket), and the pair self-join is keyed on (entity, session) — a
    * basket-local equijoin bounded by basket cardinality, never
    * event × event. Exact integer counts.
    */
  def coOccurrence(
      df: DataFrame,
      entityCol: String,
      tsCol: String,
      typeCol: String,
      gapMs: Long,
      tieCols: Seq[String] = Nil): DataFrame = {
    // materialized once: the pair join reads baskets TWICE, and without
    // the checkpoint each side would re-run the sessionize window pass
    val baskets = graft.pipeline.Dedup.materializeOnce(
      Sessionize.assign(df, Seq(entityCol), tsCol, gapMs, tieCols)
        .select(col(entityCol), col("session_id"), col(typeCol))
        .distinct())
    val a = baskets.withColumnRenamed(typeCol, "item_a")
    val b = baskets.withColumnRenamed(typeCol, "item_b")
    a.join(b, Seq(entityCol, "session_id"))
      .filter(col("item_a") < col("item_b"))
      .groupBy(col("item_a"), col("item_b"))
      .agg(count(lit(1)).as("n_baskets"))
  }

  /** Daily + trailing-window active entities (DAU/WAU): per epoch day with
    * any activity, the distinct entities active THAT day and in the
    * trailing `windowDays` window ending that day.
    *
    * The window count uses COVERAGE-INTERVAL union (r8 rewrite): each
    * distinct (entity, day) activity row covers the target days
    * `day .. day+windowDays−1`; per entity, overlapping coverages merge
    * into disjoint intervals (one entity-keyed lag/cumsum pass over the
    * Zipf-shrunk activity frame), and each MERGED interval explodes its
    * day range once. The previous formulation exploded every activity
    * row ×windowDays — at 10M events / 30-day windows that is a 134M-row
    * fan-out feeding a count(DISTINCT); interval union emits each
    * (entity, covered day) exactly once, so the fan-out is proportional
    * to COVERED DAYS (≈ span + window per entity) and the final count
    * needs no distinct at all. count(DISTINCT) inside a sliding frame
    * isn't decomposable; this is. Target days inner-join the observed-day
    * set (broadcast — calendar-sized), so leading days with no activity
    * of their own never appear.
    *
    * Scale shape: ONE distinct pass over (entity, day) — materialized
    * once for both counts — one entity-partitioned window over it, two
    * map-side-combined aggregates; the only non-aggregate join is the
    * broadcast day-set filter. All exact integers.
    */
  def activeUsers(
      df: DataFrame,
      entityCol: String,
      tsCol: String,
      windowDays: Int = 7): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(windowDays >= 1, s"windowDays must be positive: $windowDays")
    val day = (col(tsCol) / 86400000L).cast("long")
    // r10: exchange ONCE, on the entity alone. HashPartitioning(entity)
    // satisfies the distinct's ClusteredDistribution((entity, day))
    // (subset rule), and the checkpoint preserves the partitioning, so the
    // per-entity interval window below runs with NO second exchange. The
    // previous shape exchanged the partial-deduped pairs on (entity, day)
    // and then re-exchanged the deduped frame on entity for the window —
    // two medium shuffles instead of this one raw one (measured 2.7 s →
    // 2.0 s on the 10M-event fixture).
    // SKEW ASSUMPTION (deliberate trade): because the explicit repartition
    // sits BELOW the aggregate, RAW (pre-dedup) events cross this exchange,
    // so one pathologically hot entity funnels its entire raw slice through
    // a single task — the map-side-combine protection the old (entity, day)
    // shape had is given up for the saved second exchange. That is the right
    // trade for product-analytics activity data, where per-entity event
    // counts are bounded by human behavior (thousands, not millions). For a
    // machine-generated source with unbounded per-key volume, pre-aggregate
    // to (entity, day) upstream first, or restore the two-exchange shape:
    // .select(...).distinct().repartition(col(entityCol)).
    val activity = graft.pipeline.Dedup.materializeOnce(
      df.select(col(entityCol), day.as("__day"))
        .repartition(col(entityCol)).distinct())
    val days = activity.select(col("__day").as("day")).distinct()
    val dau = activity.groupBy(col("__day").as("day"))
      .agg(count(lit(1)).as("dau")) // activity is distinct per (entity, day)
    val w  = Window.partitionBy(col(entityCol)).orderBy(col("__day"))
    val wc = w.rowsBetween(Window.unboundedPreceding, 0)
    // new interval when this day's coverage cannot touch the previous
    // active day's coverage: gap > windowDays − 1
    val newIv = when(col("__day") - lag(col("__day"), 1).over(w) > (windowDays - 1)
      || lag(col("__day"), 1).over(w).isNull, 1L).otherwise(0L)
    val intervals = activity
      .withColumn("__grp", sum(newIv).over(wc))
      .groupBy(col(entityCol), col("__grp"))
      .agg(min(col("__day")).as("__s"),
           (max(col("__day")) + (windowDays - 1)).as("__e"))
    val wau = intervals
      .withColumn("day", explode(sequence(col("__s"), col("__e"))))
      .join(broadcast(days), Seq("day"))
      .groupBy(col("day"))
      .agg(count(lit(1)).as("wau")) // intervals are disjoint per entity
    dau.join(wau, Seq("day"))
  }

  /** First-order Markov transition matrix of the event-type sequence per
    * entity: for every consecutive event pair in (`tsCol`, `tieCols`)
    * order, count the (from_type → to_type) transition and report its
    * conditional probability P(to | from) = n / Σ_to n — the "what do
    * users do next" report (and the baseline model behind next-event
    * anomaly scoring). Counts are exact integers; only the probability is
    * rounded (signed-zero-safe via the division of positive counts).
    *
    * Scale shape: one entity-keyed shuffle for the `lag` window (reusing
    * the same exchange pattern as sessionize), then a groupBy on the
    * (from, to) pair — |types|²-bounded, so the second aggregation and
    * the per-from normalization window are over a TINY frame regardless
    * of corpus size. Nothing event-sized shuffles twice.
    */
  def transitionMatrix(
      df: DataFrame,
      entityCol: String,
      tsCol: String,
      typeCol: String,
      tieCols: Seq[String] = Nil,
      roundTo: Int = 6): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val order = (col(tsCol) +: tieCols.map(col)).map(_.asc)
    val w = Window.partitionBy(col(entityCol)).orderBy(order: _*)
    val pairs = df
      .withColumn("__from", lag(col(typeCol), 1).over(w))
      .filter(col("__from").isNotNull && col(typeCol).isNotNull)
      .groupBy(col("__from").as("from_type"), col(typeCol).as("to_type"))
      .agg(count(lit(1)).as("n"))
    val wf = Window.partitionBy(col("from_type"))
    pairs.withColumn("prob",
      round(col("n").cast("double") / sum(col("n")).over(wf).cast("double"),
        roundTo))
  }

  /** Cohort retention triangle: entities grouped by the day they first
    * appeared (`cohort_day`, epoch days), counted once per later active
    * day at `day_offset` days after the cohort day. Row (c, k, n) reads
    * "n of cohort c's entities were active k days later"; `day_offset`
    * 0 is the cohort's own size. Pure integer epoch-day arithmetic.
    *
    * Scale shape: first-seen is one entity-keyed aggregate; activity is
    * the distinct (entity, day) frame (map-side combined); the join is
    * entity-keyed; the final groupBy emits #cohorts × #offsets rows.
    * Nothing wider than the distinct-activity frame ever shuffles.
    */
  def retentionCohorts(
      df: DataFrame,
      entityCol: String,
      tsCol: String): DataFrame = {
    val day = (col(tsCol) / 86400000L).cast("long")
    val activity = df.select(col(entityCol), day.as("__day")).distinct()
    val firstSeen = activity.groupBy(col(entityCol))
      .agg(min(col("__day")).as("cohort_day"))
    activity.join(firstSeen, Seq(entityCol))
      .groupBy(col("cohort_day"),
        (col("__day") - col("cohort_day")).as("day_offset"))
      .agg(countDistinct(col(entityCol)).as("n_entities"))
  }
}
