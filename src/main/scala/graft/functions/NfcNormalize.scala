package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `nfc_normalize(string)` — Unicode NFC canonical normalization as a native
  * codegen'd expression (named after DuckDB's builtin so oracles read the
  * same).
  *
  * Canonicalization is the step BEFORE any text hashing at corpus scale:
  * the same visible text arrives both precomposed (U+00E9) and decomposed
  * (U+0065 U+0301) from real crawls, and every digest/shingle/signature
  * operator in this library would treat them as different documents. Spark
  * has no builtin for it (a Scala UDF would break whole-stage codegen and
  * serialize each row through a boxed String).
  *
  * Fast path: `Normalizer.isNormalized` scans without allocating — already-
  * NFC text (the overwhelming majority) returns the INPUT UTF8String,
  * zero-copy. Only denormalized rows pay the String round trip.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean  = child.nullable

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"nfc_normalize requires string, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {

  /** Static kernel invoked from generated code. NOT named `eval`: the case
    * class inherits `eval(InternalRow)` from `Expression`, which suppresses
    * the Scala static forwarder for a same-named companion method — generated
    * Java then fails to compile and Spark silently drops the whole stage out
    * of codegen.
    */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  /** Column API. */
  def nfcNormalize(c: Column): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      NfcNormalize(org.apache.spark.sql.graftbridge.Bridge.expression(c)))

  /** SQL registration: `SELECT nfc_normalize(s) ...`. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "nfc_normalize", exprs => NfcNormalize(exprs.head), "scala_udf")
}
