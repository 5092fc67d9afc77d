package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** `hilbert_key(x, y)` — the Hilbert space-filling-curve index of a 2-D
  * point, the locality-stronger sibling of [[graft.ops.Layout.zorderKey]]:
  * a Hilbert curve never takes the long diagonal jumps Morton order takes
  * at quadrant boundaries, so curve-contiguous file ranges cover tighter
  * 2-D boxes (better parquet min/max pruning for box reads at the cost of
  * a slightly dearer key).
  *
  * Standard public xy2d algorithm (quadrant rotation walk, e.g. Hamilton,
  * "Compact Hilbert indices", or the classic Warren formulation): per bit
  * level from the top, accumulate the sub-square index and rotate/reflect
  * the remaining coordinates. The per-level ROTATION is sequential state,
  * which plain column algebra cannot express (unlike Morton's independent
  * bit spreads) — hence a native kernel; the oracle replays the identical
  * loop in a recursive CTE.
  *
  * Inputs must already be quantized to `[0, 2^bits)` (same contract as
  * the z-order writers' validated quantization); out-of-range bits are
  * masked. Fixed `bits` per expression; nulls propagate.
  */
case class HilbertKey(left: Expression, right: Expression, bits: Int)
  extends BinaryExpression {

  require(bits >= 1 && bits <= 31, s"bits out of range: $bits")

  override def dataType: DataType = LongType
  override def nullable: Boolean  = left.nullable || right.nullable

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"hilbert_key requires (bigint, bigint), got (${left.dataType}, ${right.dataType})")

  override def nullSafeEval(a: Any, b: Any): Any =
    HilbertKey.xy2d(a.asInstanceOf[Long], b.asInstanceOf[Long], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.HilbertKey.xy2d($a, $b, $bits);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): HilbertKey =
    copy(left = l, right = r)
}

object HilbertKey {

  /** Static kernel invoked from generated code: the classic xy2d walk. */
  def xy2d(xIn: Long, yIn: Long, bits: Int): Long = {
    val mask = (1L << bits) - 1L
    var x = xIn & mask
    var y = yIn & mask
    var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      // rotate the sub-square: the reflection is the full-width bit
      // complement (mask − v) — bits at or above s become garbage but are
      // never read again (each later level masks strictly lower bits)
      if (ry == 0L) {
        if (rx == 1L) {
          x = mask - x
          y = mask - y
        }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  def hilbertKey(x: Column, y: Column, bits: Int): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      HilbertKey(
        org.apache.spark.sql.graftbridge.Bridge.expression(x),
        org.apache.spark.sql.graftbridge.Bridge.expression(y), bits))
}
