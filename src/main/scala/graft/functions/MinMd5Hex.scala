package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `min_md5_hex(array<string>)` — the lexicographic minimum of the md5 hex
  * digests of the array's elements, as one native Catalyst expression.
  *
  * Semantically identical to `array_min(transform(arr, s -> md5(s)))`, but:
  *  - digests are compared as raw bytes (hex is order-preserving), so only
  *    the final minimum is hex-encoded — no 32-char string allocation per
  *    element;
  *  - one expression node stays inside whole-stage codegen (`doGenCode`
  *    emits a static call, the standard pattern for loop-heavy kernels),
  *    where the builtin composition allocates a full intermediate digest
  *    array per row.
  *
  * Used by [[graft.pipeline.TextAnalysis.minFingerprint]]; the DuckDB oracle
  * reproduces it with `list_aggregate(list_transform(...md5...), 'min')`.
  */
case class MinMd5Hex(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean  = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"min_md5_hex requires array<string>, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    MinMd5Hex.evalArray(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.MinMd5Hex.evalArray($c);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinMd5Hex =
    copy(child = newChild)
}

object MinMd5Hex {

  private val HexChars = "0123456789abcdef".toCharArray

  /** Static kernel invoked from generated code. Returns null for empty
    * arrays (matching `array_min` over an empty transform) and skips null
    * elements (matching `md5(null)` + `array_min` null handling).
    */
  def evalArray(arr: ArrayData): UTF8String = {
    val n = arr.numElements()
    if (n == 0) return null
    val md               = java.security.MessageDigest.getInstance("MD5")
    var best: Array[Byte] = null
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        md.reset()
        val digest = md.digest(arr.getUTF8String(i).getBytes)
        if (best == null || unsignedCompare(digest, best) < 0) best = digest
      }
      i += 1
    }
    if (best == null) return null
    val hex = new Array[Char](32)
    var j   = 0
    while (j < 16) {
      hex(j * 2) = HexChars((best(j) >> 4) & 0xf)
      hex(j * 2 + 1) = HexChars(best(j) & 0xf)
      j += 1
    }
    UTF8String.fromString(new String(hex))
  }

  private def unsignedCompare(a: Array[Byte], b: Array[Byte]): Int = {
    var i = 0
    while (i < a.length) {
      val cmp = (a(i) & 0xff) - (b(i) & 0xff)
      if (cmp != 0) return cmp
      i += 1
    }
    0
  }

  /** Column API. */
  def minMd5Hex(c: Column): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      MinMd5Hex(org.apache.spark.sql.graftbridge.Bridge.expression(c)))

  /** SQL registration: `SELECT min_md5_hex(arr) ...`. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "min_md5_hex", exprs => MinMd5Hex(exprs.head), "scala_udf")
}
