package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `cosine_sim(a, b)` — cosine similarity of two numeric arrays as one
  * native expression: a single loop accumulates the dot product and both
  * norms, with no intermediate arrays.
  *
  * Numerically identical to the builtin formulation
  * {{{ aggregate(zip_with(a,b,(x,y)->x*y), 0d, +) / (sqrt(dot(a,a)) * sqrt(dot(b,b))) }}}
  * — same left-to-right double summation, same `dot/(sqrt*sqrt)` shape — so
  * DuckDB-oracle results (compared at 1e-6 rounding) are unaffected. The
  * builtin chain allocates a boxed 64-element array per pair per pass (3
  * passes); over an O(n·m) similarity join those allocations dominate.
  *
  * Elements may be float or double; float reads are widened exactly like
  * `cast(x as double)` in the builtin form. Null input → null; mismatched
  * lengths → error (matching zip_with's null-extension would silently give
  * NaN; failing loudly is safer for embeddings).
  */
case class CosineSim(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  // null when an input array is null OR contains a null element (matching
  // the builtin zip_with/aggregate formulation)
  override def nullable: Boolean  = true

  private def elemIsFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _)  => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(
      s"cosine_sim requires array<float|double>, got $other")
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _                                                  => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"cosine_sim requires array<float|double> args, got ${left.dataType}, ${right.dataType}")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    CosineSim.cosine(a.asInstanceOf[ArrayData], elemIsFloat(left),
      b.asInstanceOf[ArrayData], elemIsFloat(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val (lf, rf) = (elemIsFloat(left), elemIsFloat(right))
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |java.lang.Double ${ev.value}_r = graft.functions.CosineSim.cosine($a, $lf, $b, $rf);
         |${ev.isNull} = ${ev.value}_r == null;
         |${ev.value} = ${ev.isNull} ? 0.0 : ${ev.value}_r.doubleValue();
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSim =
    copy(left = l, right = r)
}

object CosineSim {

  /** Static kernel invoked from generated code. Returns null (boxed) when
    * either array contains a null element — reading through a null slot
    * would silently yield 0.0; the builtin formulation returns NULL.
    */
  def cosine(a: ArrayData, aFloat: Boolean, b: ArrayData, bFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    require(b.numElements() == n,
      s"cosine_sim: length mismatch ${n} vs ${b.numElements()}")
    var dot = 0.0
    var na  = 0.0
    var nb  = 0.0
    var i   = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    java.lang.Double.valueOf(dot / (math.sqrt(na) * math.sqrt(nb)))
  }

  /** Column API. */
  def cosineSim(a: Column, b: Column): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      CosineSim(org.apache.spark.sql.graftbridge.Bridge.expression(a),
        org.apache.spark.sql.graftbridge.Bridge.expression(b)))
}
