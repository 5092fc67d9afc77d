package graft.ops

import graft.time.Intervals
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Linear interpolation of an irregular series onto an epoch-aligned grid —
  * the lerp companion to [[Resampler]]'s last-value sampling (the reference
  * engine resamples by last-value only, classes.py:589-637; interpolation is
  * the standard next ask of a time-series engine: kdb/InfluxDB/Timescale all
  * pair locf with lerp).
  *
  * Semantics: for each key, every grid point `B = k*step` with
  * `t_first <= B < t_last` gets
  * `v_prev + (v_next - v_prev) * (B - t_prev)/(t_next - t_prev)` from its
  * bracketing events; a grid point ON an event takes that event's value
  * exactly (the lerp ratio is 0 there, so no special case), and `t_last`
  * itself is emitted iff it lies on the grid. No extrapolation beyond the
  * key's own span.
  */
object Interpolate {

  /** Per-key linear interpolation of `valueCol` onto the `interval` grid.
    *
    * `tsCol` must be epoch-ms Long; output is (keyCols..., tsCol = grid
    * boundary, valueCol = interpolated), one row per in-span grid point per
    * key. Pass `tieCols` whenever (keyCols, tsCol) isn't unique — equal-ts
    * events collapse to the max-by-tiebreak value first, and without a
    * tiebreak that pick is nondeterministic.
    *
    * Scale shape: one groupBy on (key, ts) with map-side combine, one keyed
    * window for the next-event lead, then a chunk-bounded explode of each
    * inter-event span ([[Resampler.chunkedExplode]] — a year-long quiet gap
    * never materializes as one array). No global window, no driver scalars;
    * the grid volume is span/step per key, the data volume never amplifies
    * beyond that.
    *
    * The lerp is written as `v + (vn - v) * ((B - t) / (tn - t))` — every
    * step a single IEEE operation on exactly-representable inputs, so an
    * independent engine evaluating the same shape reproduces it bit-for-bit
    * (no rounding slop needed in oracles).
    */
  def linearAtGrid(
      df: DataFrame,
      interval: String,
      keyCols: Seq[String],
      tsCol: String = graft.core.Fuser.TimestampCol,
      valueCol: String = "value",
      tieCols: Seq[String] = Nil): DataFrame = {
    require(keyCols.nonEmpty, "linearAtGrid requires key columns")
    val step = Intervals.toMillis(interval)
    val keys = keyCols.map(col)

    // collapse equal-ts events to one deterministic point. Pre-partition
    // by the KEYS alone: HashPartitioning(keys) satisfies the clustering
    // both the (keys, ts) aggregate and the keys-window require, so the
    // plan runs ONE full-volume exchange instead of two (agg exchange on
    // (keys, ts) + window re-exchange on keys). Trades documented: (a)
    // the exchange moves raw rows rather than partially-aggregated ones —
    // equal-(key, ts) collapse is rare in event data, so the volumes are
    // the same; (b) the full-volume AGGREGATE now runs at key-cardinality
    // parallelism, the same bound the window stage always had — with few
    // or heavily skewed keys the hot key's aggregate lands on one task
    // alongside its window. The window stage is the binding constraint
    // either way (it cannot be salted), so sharing its exchange costs
    // nothing NEW, but a caller with a handful of giant keys should know
    // both stages serialize per key.
    val ord = struct((col(tsCol) +: tieCols.map(col)): _*)
    val pts = df.repartition(keys: _*).groupBy(keys :+ col(tsCol): _*)
      .agg(max_by(col(valueCol), ord).as("__v"))

    // each point + its successor = one lerp segment; the last point gets a
    // degenerate (t+1, v) successor, which makes the generic k-range emit
    // exactly {t} when t is grid-aligned and nothing otherwise
    val w = Window.partitionBy(keys: _*).orderBy(col(tsCol))
    val seg = pts
      .withColumn("__tn", coalesce(lead(col(tsCol), 1).over(w), col(tsCol) + 1L))
      .withColumn("__vn", coalesce(lead(col("__v"), 1).over(w), col("__v")))
      // grid indices k with t <= k*step < tn (ts are epoch-ms, non-negative)
      .withColumn("__k1", expr(s"($tsCol + ${step - 1}) div $step"))
      .withColumn("__k2", expr(s"(__tn - 1) div $step"))
      .filter(col("__k1") <= col("__k2"))

    Resampler.chunkedExplode("__k1", "__k2", "__kg")(seg)
      .select(
        keys ++ Seq(
          (col("__kg") * lit(step)).as(tsCol),
          (col("__v") + (col("__vn") - col("__v")) *
            ((col("__kg") * lit(step) - col(tsCol)) /
              (col("__tn") - col(tsCol)))).as(valueCol)): _*)
  }
}
