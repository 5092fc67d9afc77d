package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Time-range (interval) join: every (left, right) pair with equal keys and
  * `right.ts ∈ [left.ts - lookbackMs, left.ts + lookaheadMs]`. The reference
  * engine has no joins (SURVEY §2.9) — this is the beyond-parity companion to
  * [[AsOfJoin]] ("all quotes within the last second of each trade", session
  * context windows, leakage-safe feature extraction).
  *
  * A naive inequality join compiles to BroadcastNestedLoopJoin — quadratic
  * work and a broadcast of a whole side, hopeless at scale. This is the
  * classic bucketed interval join instead:
  *
  *  - time is split into buckets of width `lookback + lookahead`;
  *  - each LEFT row explodes into the (at most 2) buckets its interval
  *    overlaps — bounded fan-out, independent of data volume;
  *  - RIGHT rows map to exactly one bucket — the big side is never inflated;
  *  - an equi-join on (keys, bucket) makes the match a hash/sort-merge join
  *    Catalyst can plan, shuffle-partitioned by key and time — AQE handles
  *    skew — and a final exact range filter trims bucket edges.
  *
  * Cost: one shuffle of each side on narrow keys + the true output size.
  */
object RangeJoin {

  /** @param left        probe frame (each row may match many right rows)
    * @param right       reference frame
    * @param keyCols     equality keys present on both sides
    * @param tsCol       epoch-ms Long event-time column name on both sides
    * @param lookbackMs  how far back a right row may be (>= 0)
    * @param lookaheadMs how far ahead a right row may be (>= 0)
    * @param rightCols   right columns to attach, renamed via `rightPrefix`
    * @param rightPrefix prefix for attached right columns (incl. its ts)
    *
    * Semantics are inner (matching pairs only) — compose with a left-anti
    * join on the keys for "rows with no context" queries.
    */
  def timeRange(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      lookbackMs: Long,
      lookaheadMs: Long,
      rightCols: Seq[String],
      rightPrefix: String = "right_"): DataFrame = {
    require(lookbackMs >= 0 && lookaheadMs >= 0 && lookbackMs + lookaheadMs > 0,
      s"window must be non-negative and non-empty: [-$lookbackMs, +$lookaheadMs]")
    val width = lookbackMs + lookaheadMs
    val rTs   = s"$rightPrefix$tsCol"
    require(!left.columns.contains("__b") && !right.columns.contains("__b"),
      "column name __b is reserved by RangeJoin")
    val reserved = (rightCols.map(c => s"$rightPrefix$c") :+ rTs).toSet
    val clash = left.columns.filter(reserved)
    require(clash.isEmpty,
      s"left columns ${clash.mkString(",")} clash with prefixed right columns; pick another rightPrefix")

    // floorDiv as integer column math (pmod keeps remainders non-negative).
    def bucketOf(ts: Column): Column =
      ((ts - pmod(ts, lit(width))) / lit(width)).cast("long")

    val l = left
      .withColumn("__b",
        explode(sequence(bucketOf(col(tsCol) - lit(lookbackMs)),
                         bucketOf(col(tsCol) + lit(lookaheadMs)))))
    val r = right.select(
      keyCols.map(col) :+ bucketOf(col(tsCol)).as("__b") :+
        col(tsCol).as(rTs) :+
        struct(rightCols.map(c => col(c).as(s"$rightPrefix$c")): _*).as("__rrow"): _*)

    // A left row exploded into 2 buckets can only meet a given right row in
    // the right row's own bucket, so the join never duplicates pairs; the
    // range filter just trims bucket edges.
    val joined = l.join(r, keyCols :+ "__b")
      .filter(col(rTs) >= col(tsCol) - lit(lookbackMs) &&
              col(rTs) <= col(tsCol) + lit(lookaheadMs))

    joined.select(left.columns.map(col).toSeq ++
      rightCols.map(c => col(s"__rrow.$rightPrefix$c").as(s"$rightPrefix$c")) :+
      col(rTs): _*)
  }

  /** Interval-OVERLAP join — both sides are intervals (sessions × outage
    * windows, shifts × incidents): every (left, right) pair with equal
    * keys and `l.start ≤ r.end && r.start ≤ l.end` (inclusive endpoints —
    * touching intervals overlap).
    *
    * Same bucketed shape as [[timeRange]], with both sides exploding into
    * the buckets their interval covers (fan-out = span/bucketMs + 1 per
    * row — pick `bucketMs` near the typical interval length to bound it;
    * there is no one-bucket side here, unlike the point-in-window join).
    * A pair can meet in several shared buckets, so each match is
    * ATTRIBUTED to exactly one: the bucket of `greatest(l.start, r.start)`
    * — an instant both intervals contain whenever they overlap, so the
    * attribution filter keeps each pair exactly once with no distinct.
    */
  def intervalOverlap(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftStart: String,
      leftEnd: String,
      rightStart: String,
      rightEnd: String,
      bucketMs: Long,
      rightCols: Seq[String],
      rightPrefix: String = "right_"): DataFrame = {
    require(bucketMs > 0, s"bucketMs must be positive: $bucketMs")
    require(!left.columns.contains("__b") && !right.columns.contains("__b"),
      "column name __b is reserved by RangeJoin")
    require(!rightCols.contains(rightStart) && !rightCols.contains(rightEnd),
      "the interval bounds are always attached — leave them out of rightCols")
    val rs = s"$rightPrefix$rightStart"
    val re = s"$rightPrefix$rightEnd"
    val reserved = (rightCols.map(c => s"$rightPrefix$c") ++ Seq(rs, re)).toSet
    val clash = left.columns.filter(reserved)
    require(clash.isEmpty,
      s"left columns ${clash.mkString(",")} clash with prefixed right columns; pick another rightPrefix")

    def bucketOf(ts: Column): Column =
      ((ts - pmod(ts, lit(bucketMs))) / lit(bucketMs)).cast("long")

    val l = left.withColumn("__b",
      explode(sequence(bucketOf(col(leftStart)), bucketOf(col(leftEnd)))))
    val r = right.select(
      keyCols.map(col) ++ Seq(
        col(rightStart).as(rs), col(rightEnd).as(re),
        struct(rightCols.map(c => col(c).as(s"$rightPrefix$c")): _*).as("__rrow")): _*)
      .withColumn("__b", explode(sequence(bucketOf(col(rs)), bucketOf(col(re)))))

    l.join(r, keyCols :+ "__b")
      .filter(col(leftStart) <= col(re) && col(rs) <= col(leftEnd) &&
        bucketOf(greatest(col(leftStart), col(rs))) === col("__b"))
      .select(left.columns.map(col).toSeq ++
        Seq(col(rs), col(re)) ++
        rightCols.map(c => col(s"__rrow.$rightPrefix$c").as(s"$rightPrefix$c")): _*)
  }

  /** Streaming time-range join: the same pairing semantics over two streams,
    * as a native stream-stream inner join. The range condition on event time
    * plus watermarks lets Spark bound each side's join state (old rows are
    * evicted once the other side's watermark passes the window), so state
    * size tracks the window span × arrival rate, not stream length.
    *
    * Both inputs must carry an epoch-ms Long `tsCol`; `watermarkDelay`
    * bounds out-of-order tolerance on both sides.
    */
  def timeRangeStream(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      lookbackMs: Long,
      lookaheadMs: Long,
      rightCols: Seq[String],
      rightPrefix: String = "right_",
      watermarkDelay: String = "10 seconds"): DataFrame = {
    require(lookbackMs >= 0 && lookaheadMs >= 0 && lookbackMs + lookaheadMs > 0,
      s"window must be non-negative and non-empty: [-$lookbackMs, +$lookaheadMs]")
    val rTs = s"$rightPrefix$tsCol"
    val l = left.withColumn("__levt", timestamp_millis(col(tsCol)))
      .withWatermark("__levt", watermarkDelay)
    val r = right.select(
        keyCols.map(c => col(c).as(s"__rk_$c")) :+ col(tsCol).as(rTs) :+
          struct(rightCols.map(c => col(c).as(s"$rightPrefix$c")): _*).as("__rrow"): _*)
      .withColumn("__revt", timestamp_millis(col(rTs)))
      .withWatermark("__revt", watermarkDelay)
    val keyCond = keyCols.map(c => col(c) === col(s"__rk_$c")).reduce(_ && _)
    val rangeCond = col("__revt") >= col("__levt") - expr(s"INTERVAL $lookbackMs MILLISECONDS") &&
      col("__revt") <= col("__levt") + expr(s"INTERVAL $lookaheadMs MILLISECONDS")
    l.join(r, keyCond && rangeCond)
      .select(left.columns.map(col).toSeq ++
        rightCols.map(c => col(s"__rrow.$rightPrefix$c").as(s"$rightPrefix$c")) :+
        col(rTs): _*)
  }
}
