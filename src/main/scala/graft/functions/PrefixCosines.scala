package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** `prefix_cosines(a, b, dims)` — cosine similarity of two numeric arrays
  * at EVERY prefix length in `dims`, in one pass: the Matryoshka-style
  * truncation eval ([[graft.Queries.embedPrefixRecall]]) needs
  * `cos(a[1:d], b[1:d])` for a ladder of d's, and each prefix's
  * dot/norm accumulators are literally intermediate states of the full
  * vector's sequential accumulation — so one walk over the arrays emits
  * them all. Each element of the result is bit-identical to
  * `cosine_sim(slice(a,1,d), slice(b,1,d))` (same left-to-right double
  * summation, same `dot/(sqrt·sqrt)` shape), so oracle parity carries over
  * from [[CosineSim]] unchanged — this expression exists purely to
  * collapse |dims| corpus passes into one.
  *
  * `dims` must be ascending positive prefix lengths; a dim beyond the
  * array length degrades to the full vector (slice semantics). Null input
  * or a null element → null, exactly like [[CosineSim]].
  */
case class PrefixCosines(left: Expression, right: Expression, dims: Seq[Int])
    extends BinaryExpression {

  require(dims.nonEmpty && dims.head > 0 && dims == dims.sorted &&
    dims.distinct == dims,
    s"prefix_cosines: dims must be ascending positive, got $dims")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean  = true

  private def elemIsFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _)  => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(
      s"prefix_cosines requires array<float|double>, got $other")
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _                                                  => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"prefix_cosines requires array<float|double> args, got ${left.dataType}, ${right.dataType}")
  }

  private lazy val dimsArr: Array[Int] = dims.toArray

  override def nullSafeEval(a: Any, b: Any): Any =
    PrefixCosines.cosines(a.asInstanceOf[ArrayData], elemIsFloat(left),
      b.asInstanceOf[ArrayData], elemIsFloat(right), dimsArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val (lf, rf) = (elemIsFloat(left), elemIsFloat(right))
    val dimsRef = ctx.addReferenceObj("pcDims", dimsArr, "int[]")
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value}_r =
         |  graft.functions.PrefixCosines.cosines($a, $lf, $b, $rf, $dimsRef);
         |${ev.isNull} = ${ev.value}_r == null;
         |${ev.value} = ${ev.value}_r;
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): PrefixCosines =
    copy(left = l, right = r)
}

object PrefixCosines {

  /** Static kernel invoked from generated code: one walk, a cosine emitted
    * at each dim boundary. Null (not an array) when either input holds a
    * null element — [[CosineSim]]'s contract.
    */
  def cosines(a: ArrayData, aFloat: Boolean, b: ArrayData, bFloat: Boolean,
      dims: Array[Int]): ArrayData = {
    val n = a.numElements()
    require(b.numElements() == n,
      s"prefix_cosines: length mismatch ${n} vs ${b.numElements()}")
    val out = new Array[Any](dims.length)
    var dot = 0.0
    var na  = 0.0
    var nb  = 0.0
    var i   = 0
    var k   = 0
    while (k < dims.length) {
      val bound = math.min(dims(k), n)
      while (i < bound) {
        if (a.isNullAt(i) || b.isNullAt(i)) return null
        val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
        val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
        dot += x * y
        na += x * x
        nb += y * y
        i += 1
      }
      out(k) = dot / (math.sqrt(na) * math.sqrt(nb))
      k += 1
    }
    new GenericArrayData(out)
  }

  /** Column API. */
  def prefixCosines(a: Column, b: Column, dims: Seq[Int]): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      PrefixCosines(org.apache.spark.sql.graftbridge.Bridge.expression(a),
        org.apache.spark.sql.graftbridge.Bridge.expression(b), dims))
}
