package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal) join: for every left row, attach the most recent right
  * row with `right.ts <= left.ts` within the same key (and optional
  * tolerance). The reference engine has no joins at all (SURVEY §2.9) — this
  * is a beyond-parity operator every time-series stack needs (quote-to-trade
  * enrichment, feature lookups).
  *
  * Implementation is the union trick, not a nested-loop: tag both sides,
  * union by name, one window per key ordered by (ts, side) carrying the last
  * non-null right values forward, then keep left rows. Cost = one shuffle on
  * the key + a per-key sort — the same shape as a sort-merge join, no
  * broadcast of either side required, skew-safe under AQE. An event exactly
  * at a right timestamp sees that right row (inclusive `<=`, matching the
  * fuse engine's boundary rules).
  *
  * Hot-key caveat: the per-key carry window serializes ONE key's full
  * (left + right) history into a single task — inherent to per-key running
  * state, and AQE skew-split cannot split a window partition. For mega-keys
  * use [[graft.streaming.StreamingAsOfJoin]] (bounded state, no per-key
  * history) or shard the key by a coarse time bucket and stitch boundaries.
  */
object AsOfJoin {

  /** @param left       left (probe) frame
    * @param right      right (reference) frame
    * @param keyCols    equality keys present on both sides
    * @param tsCol      epoch-ms Long event-time column name on both sides
    * @param rightCols  right columns to attach, renamed via `rightPrefix`
    * @param toleranceMs optional max staleness: matches further than
    *                   `toleranceMs` from the left timestamp are nulled out
    * @param forward    false (default): most recent right row with
    *                   `right.ts <= left.ts`; true: earliest right row with
    *                   `right.ts >= left.ts` (both inclusive)
    */
  def asof(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      rightCols: Seq[String],
      rightPrefix: String = "right_",
      toleranceMs: Option[Long] = None,
      forward: Boolean = false): DataFrame = {

    val leftCols = left.columns.toSeq
    val rTs      = s"${rightPrefix}$tsCol"

    // The right row travels as ONE struct so the matched row attaches
    // atomically — a legitimately-null field in the newest right row must not
    // fall through to an older row's value.
    //
    // Side ordering makes the boundary inclusive in either direction:
    // backward sorts right rows (side 0) before coincident left rows and
    // carries the LAST right struct up to the current row; forward sorts
    // them after (side 2) and takes the FIRST right struct from the current
    // row on.
    val rightSide = if (forward) 2 else 0
    // Equi-join semantics: a NULL key never matches, but a window
    // partitionBy groups NULLs together — so null-keyed right rows must not
    // enter the union (null-keyed left rows then correctly attach nothing).
    val rightNonNullKeys = keyCols.map(col(_).isNotNull).reduce(_ && _)
    // Tiebreak struct restricted to ORDERABLE right columns: sorting by the
    // whole __rrow would fail at analysis if any attached column is
    // non-orderable (e.g. MapType). Rows tied on (ts, all orderable cols)
    // but differing in a non-orderable column pick arbitrarily — the
    // remaining nondeterminism is unobservable through ordering anyway.
    val orderableRight = rightCols.filter { c =>
      org.apache.spark.sql.catalyst.expressions.RowOrdering
        .isOrderable(right.schema(c).dataType)
    }
    val taggedRight = right.filter(rightNonNullKeys).select(
      keyCols.map(col) :+ col(tsCol) :+
        struct(col(tsCol).as(rTs) +: rightCols.map(c => col(c).as(s"$rightPrefix$c")): _*)
          .as("__rrow") :+
        struct(col(tsCol) +: orderableRight.map(col): _*).as("__rtie") :+
        lit(rightSide).as("__side"): _*)
    val taggedLeft = left.withColumn("__side", lit(1))

    val unioned = taggedLeft.unionByName(taggedRight, allowMissingColumns = true)

    // __rtie as the final order key makes right-side ties deterministic:
    // backward picks the struct-largest tied right row, forward the
    // smallest (left rows carry null __rtie and are unaffected).
    val base = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol), col("__side"), col("__rtie"))
    val attached = (if (forward)
      unioned.withColumn("__rrow",
        first(col("__rrow"), ignoreNulls = true)
          .over(base.rowsBetween(Window.currentRow, Window.unboundedFollowing)))
    else
      unioned.withColumn("__rrow",
        last(col("__rrow"), ignoreNulls = true)
          .over(base.rowsBetween(Window.unboundedPreceding, Window.currentRow))))
      .filter(col("__side") === 1)

    val withTol = toleranceMs match {
      case Some(tol) =>
        val stale =
          if (forward) col(s"__rrow.$rTs") > col(tsCol) + lit(tol)
          else col(s"__rrow.$rTs") < col(tsCol) - lit(tol)
        attached.withColumn("__rrow", when(stale, lit(null)).otherwise(col("__rrow")))
      case None => attached
    }
    withTol.select(leftCols.map(col) ++
      rightCols.map(c => col(s"__rrow.$rightPrefix$c").as(s"$rightPrefix$c")) :+
      col(s"__rrow.$rTs").as(rTs): _*)
  }

  /** Nearest-neighbor as-of: attach whichever right row is CLOSER in time,
    * before or after (ties prefer the backward match — "what was known
    * then" beats "what came next" when equidistant). The missing third
    * direction after backward/forward; kdb's `aj` family and pandas
    * `merge_asof(direction='nearest')` are the public analogs.
    *
    * Same union trick, same single key shuffle + per-key sort: BOTH
    * carries (last-right-so-far and first-right-from-here) run over the
    * one sorted window — two frame traversals, no second exchange. A right
    * row coincident with a left row sorts before it, so the backward carry
    * sees it at distance 0, which can never lose the nearest comparison.
    *
    * `toleranceMs` bounds the winning match's |distance| (both directions).
    */
  def nearest(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      rightCols: Seq[String],
      rightPrefix: String = "right_",
      toleranceMs: Option[Long] = None): DataFrame = {

    val leftCols = left.columns.toSeq
    val rTs      = s"${rightPrefix}$tsCol"

    val rightNonNullKeys = keyCols.map(col(_).isNotNull).reduce(_ && _)
    val orderableRight = rightCols.filter { c =>
      org.apache.spark.sql.catalyst.expressions.RowOrdering
        .isOrderable(right.schema(c).dataType)
    }
    val taggedRight = right.filter(rightNonNullKeys).select(
      keyCols.map(col) :+ col(tsCol) :+
        struct(col(tsCol).as(rTs) +: rightCols.map(c => col(c).as(s"$rightPrefix$c")): _*)
          .as("__rrow") :+
        struct(col(tsCol) +: orderableRight.map(col): _*).as("__rtie") :+
        lit(0).as("__side"): _*)
    val taggedLeft = left.withColumn("__side", lit(1))
    val unioned = taggedLeft.unionByName(taggedRight, allowMissingColumns = true)

    val base = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol), col("__side"), col("__rtie"))
    // deterministic tie picks WITHIN a side: backward takes the
    // struct-largest tied right row (last in order), forward the smallest
    // (first) — same rule as the directional joins
    val withBoth = unioned
      .withColumn("__bwd", last(col("__rrow"), ignoreNulls = true)
        .over(base.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__fwd", first(col("__rrow"), ignoreNulls = true)
        .over(base.rowsBetween(Window.currentRow, Window.unboundedFollowing)))
      .filter(col("__side") === 1)

    val bDt = col(tsCol) - col(s"__bwd.$rTs")
    val fDt = col(s"__fwd.$rTs") - col(tsCol)
    val chosen = when(col("__bwd").isNull, col("__fwd"))
      .when(col("__fwd").isNull, col("__bwd"))
      .when(fDt < bDt, col("__fwd"))
      .otherwise(col("__bwd"))
    val picked = withBoth.withColumn("__rrow", chosen)

    val withTol = toleranceMs match {
      case Some(tol) =>
        picked.withColumn("__rrow",
          when(abs(col(s"__rrow.$rTs") - col(tsCol)) > tol, lit(null))
            .otherwise(col("__rrow")))
      case None => picked
    }
    withTol.select(leftCols.map(col) ++
      rightCols.map(c => col(s"__rrow.$rightPrefix$c").as(s"$rightPrefix$c")) :+
      col(s"__rrow.$rTs").as(rTs): _*)
  }
}
