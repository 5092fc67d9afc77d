package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `token_stats(text)` — the scalar word-census of a document in ONE byte
  * scan: `struct<n_tokens, n_types, max_tf: bigint>`, exactly equivalent
  * to aggregating [[WordCounts]]'s array (`sum(tf)`, `size`, `max(tf)`)
  * but with NO array materialization, NO explode and — the point — NO
  * aggregation exchange: consumers that only need the census (quality
  * features, length gates) stay a pure narrow map over the scan, which
  * also makes them trivially streamable (stateless per row).
  *
  * Same byte-level `\s+` tokenizer and full byte-slice interning as
  * [[WordCounts]] (hashes only pick buckets — collisions compare bytes),
  * so the census is exact, not probabilistic.
  */
case class TokenStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = TokenStats.Shape
  override def nullable: Boolean  = child.nullable

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"token_stats requires string, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    TokenStats.evalTokenStats(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.TokenStats.evalTokenStats($c);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): TokenStats =
    copy(child = newChild)
}

object TokenStats {

  val Shape: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_types", LongType, nullable = false),
    StructField("max_tf", LongType, nullable = false)))

  @inline private def isSpace(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0b || b == '\f' || b == '\r'

  private def nextPow2(x: Int): Int = Integer.highestOneBit(math.max(16, x) * 2 - 1) << 1

  /** Static kernel invoked from generated code. */
  def evalTokenStats(text: UTF8String): org.apache.spark.sql.catalyst.expressions.GenericInternalRow = {
    val bytes = text.getBytes
    val len   = bytes.length
    var starts = new Array[Int](16)
    var ends   = new Array[Int](16)
    var nWords = 0
    var i      = 0
    while (i < len) {
      while (i < len && isSpace(bytes(i))) i += 1
      if (i < len) {
        val s = i
        while (i < len && !isSpace(bytes(i))) i += 1
        if (nWords == starts.length) {
          starts = java.util.Arrays.copyOf(starts, nWords * 2)
          ends = java.util.Arrays.copyOf(ends, nWords * 2)
        }
        starts(nWords) = s; ends(nWords) = i; nWords += 1
      }
    }
    if (nWords == 0)
      return new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](0L, 0L, 0L))
    val cap    = nextPow2(nWords)
    val mask   = cap - 1
    val table  = new Array[Int](cap); java.util.Arrays.fill(table, -1)
    val counts = new Array[Int](nWords)
    var distinct = 0
    var maxTf    = 0
    var w        = 0
    while (w < nWords) {
      val ws = starts(w); val we = ends(w)
      var h  = 1
      var p  = ws
      while (p < we) { h = h * 31 + bytes(p); p += 1 }
      var slot = h & mask
      var done = false
      while (!done) {
        val e = table(slot)
        if (e == -1) {
          table(slot) = w; counts(w) = 1; distinct += 1
          if (maxTf < 1) maxTf = 1
          done = true
        } else if (sameSlice(bytes, starts(e), ends(e), ws, we)) {
          counts(e) += 1
          if (counts(e) > maxTf) maxTf = counts(e)
          done = true
        } else slot = (slot + 1) & mask
      }
      w += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](nWords.toLong, distinct.toLong, maxTf.toLong))
  }

  @inline private def sameSlice(b: Array[Byte], s1: Int, e1: Int, s2: Int, e2: Int): Boolean = {
    if (e1 - s1 != e2 - s2) return false
    var i = 0
    val n = e1 - s1
    while (i < n) {
      if (b(s1 + i) != b(s2 + i)) return false
      i += 1
    }
    true
  }

  /** Column API. */
  def tokenStats(c: Column): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      TokenStats(org.apache.spark.sql.graftbridge.Bridge.expression(c)))
}
