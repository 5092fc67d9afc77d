package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `rolling_min_hash(text, w)` — minimum Rabin-Karp rolling hash over all
  * `w`-byte windows of the text: the classic winnowing-style document
  * fingerprint (same sketch family as MOSS/winnowing; see Schleimer et al.,
  * SIGMOD'03). One O(n) pass with an O(1) update per byte — reference
  * fingerprinting re-expressed as a single codegen'd kernel instead of
  * materializing every shingle.
  *
  * Hash: `h(i) = Σ_j byte(i+j)·B^(w-1-j) mod M` with B=257, M=1e9+7 —
  * pure integer math, so an ASCII oracle can reproduce it exactly from
  * `ascii()` code points. Returns null when the text is shorter than `w`
  * bytes.
  */
case class RollingMinHash(child: Expression, window: Int) extends UnaryExpression {

  require(window > 0 && window <= 64, s"window out of range: $window")

  override def dataType: DataType = LongType
  override def nullable: Boolean  = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"rolling_min_hash requires string, got $other")
    }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else {
      val r = RollingMinHash.minHash(v.asInstanceOf[UTF8String], window)
      if (r < 0) null else r
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.RollingMinHash.minHash($c, $window);
         |${ev.isNull} = ${ev.value} < 0;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RollingMinHash =
    copy(child = newChild)
}

object RollingMinHash {

  final val Mod  = 1000000007L
  final val Base = 257L

  /** Static kernel (also invoked from generated code). Returns -1 when the
    * text has fewer than `w` bytes.
    */
  def minHash(text: UTF8String, w: Int): Long = {
    val bytes = text.getBytes
    val n     = bytes.length
    if (n < w) return -1L
    // B^(w-1) mod M for the outgoing byte
    var bw = 1L
    var k  = 1
    while (k < w) { bw = bw * Base % Mod; k += 1 }
    var h = 0L
    var i = 0
    while (i < w) { h = (h * Base + (bytes(i) & 0xff)) % Mod; i += 1 }
    var min = h
    while (i < n) {
      h = ((h - (bytes(i - w) & 0xff) * bw % Mod + Mod) % Mod * Base +
        (bytes(i) & 0xff)) % Mod
      if (h < min) min = h
      i += 1
    }
    min
  }

  /** Column API. */
  def rollingMinHash(c: Column, window: Int): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      RollingMinHash(org.apache.spark.sql.graftbridge.Bridge.expression(c), window))
}
