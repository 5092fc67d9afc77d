package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._

/** `rank_bucket(value, dim)` → `struct<q_bucket: long, denom: double>`:
  * the per-dimension discrete-quantile bucket — `q_bucket` = count of the
  * dim's trained grid splits ≤ value (the [[SearchSorted]] upper-bound
  * binary search, bit-identical loop), `denom` = |grid_dim| + 1 — with the
  * WHOLE per-dimension grid family attached as one flat codegen reference
  * object.
  *
  * Why it exists: dispatching `search_sorted` per dimension as a literal
  * `when` chain is an expression tree linear in the dim count; at 64
  * embedding dims × 19 splits the generated method passes the JVM's 64 KB
  * bytecode limit, codegen compilation FAILS, and the whole stage drops
  * to interpreted eval — the same cliff [[NearestCell]] documents for
  * centroid argmax (observed on this exact operator: the chain form's
  * compile error at 200k vectors). Here the grids are DATA (offsets +
  * flat splits), so generated code size is constant in the dim count.
  *
  * NULL contract: null value, null dim, a dim outside the trained range,
  * or a dim with no trained splits → null struct fields (the transform
  * emits NULL bucket/score for ungridded positions).
  */
case class RankBucket(left: Expression, right: Expression,
    grids: Map[Int, Array[Double]]) extends BinaryExpression {

  require(grids.nonEmpty, "rank_bucket requires a non-empty grid family")

  override def dataType: DataType = RankBucket.Shape
  override def nullable: Boolean  = false

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (DoubleType, IntegerType) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"rank_bucket requires (double, int), got $other")
  }

  @transient private lazy val table: RankBucket.Grids = RankBucket.Grids.build(grids)

  override def eval(input: InternalRow): Any = {
    val v = left.eval(input)
    val d = right.eval(input)
    RankBucket.bucket(
      v != null, if (v == null) 0.0 else v.asInstanceOf[Double],
      d != null, if (d == null) 0 else d.asInstanceOf[Int], table)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("rbGrids", table, "graft.functions.RankBucket$Grids")
    val l = left.genCode(ctx)
    val r = right.genCode(ctx)
    ev.copy(
      isNull = FalseLiteral,
      code = code"""
        ${l.code}
        ${r.code}
        InternalRow ${ev.value} = graft.functions.RankBucket.bucket(
          !${l.isNull}, ${l.value}, !${r.isNull}, ${r.value}, $ref);
      """)
  }

  // content equality over the grid family (CSE must not conflate two
  // different trained grids — the NearestCell contract)
  override def equals(other: Any): Boolean = other match {
    case RankBucket(l, r, g) =>
      l == left && r == right && g.keySet == grids.keySet &&
        g.keySet.forall(k => java.util.Arrays.equals(g(k), grids(k)))
    case _ => false
  }
  override def hashCode(): Int =
    31 * (31 * left.hashCode() + right.hashCode()) +
      grids.toSeq.sortBy(_._1).map { case (k, v) =>
        31 * k + java.util.Arrays.hashCode(v) }.hashCode()

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): RankBucket =
    copy(left = newLeft, right = newRight)
}

object RankBucket {

  val Shape: StructType = StructType(Seq(
    StructField("q_bucket", LongType, nullable = true),
    StructField("denom", DoubleType, nullable = true)))

  /** Flat grid family: dim d's splits live at `flat[offsets(d) until
    * offsets(d + 1))`; dims outside `[0, nDims)` or with an empty slice
    * have no grid. Serializable codegen reference object.
    */
  final class Grids(val offsets: Array[Int], val flat: Array[Double])
    extends Serializable {
    def nDims: Int = offsets.length - 1
  }

  object Grids {
    def build(grids: Map[Int, Array[Double]]): Grids = {
      val maxDim = grids.keys.max
      require(grids.keys.min >= 0, s"negative dim in grid family")
      val offsets = new Array[Int](maxDim + 2)
      var pos = 0
      for (d <- 0 to maxDim) {
        offsets(d) = pos
        pos += grids.get(d).map(_.length).getOrElse(0)
      }
      offsets(maxDim + 1) = pos
      val flat = new Array[Double](pos)
      for (d <- 0 to maxDim; g <- grids.get(d))
        System.arraycopy(g, 0, flat, offsets(d), g.length)
      new Grids(offsets, flat)
    }
  }

  private val NullRow: InternalRow = new GenericInternalRow(Array[Any](null, null))

  /** Static kernel invoked from generated code. The search is the
    * [[SearchSorted]] upper-bound loop verbatim, on the dim's flat slice.
    */
  def bucket(vSet: Boolean, v: Double, dSet: Boolean, d: Int,
      grids: Grids): InternalRow = {
    if (!vSet || !dSet || d < 0 || d >= grids.nDims) return NullRow
    val lo0 = grids.offsets(d)
    val hi0 = grids.offsets(d + 1)
    if (hi0 == lo0) return NullRow
    var lo = lo0
    var hi = hi0
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (grids.flat(mid) <= v) lo = mid + 1 else hi = mid
    }
    new GenericInternalRow(Array[Any]((lo - lo0).toLong, (hi0 - lo0 + 1).toDouble))
  }

  /** Column API. */
  def rankBucket(value: Column, dim: Column, grids: Map[Int, Array[Double]]): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      RankBucket(
        org.apache.spark.sql.graftbridge.Bridge.expression(value),
        org.apache.spark.sql.graftbridge.Bridge.expression(dim),
        grids))
}
