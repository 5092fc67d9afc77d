package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `word_counts(text)` — per-document term frequencies in ONE pass:
  * `array<struct<term: string, tf: bigint>>`, one entry per DISTINCT word
  * (first-occurrence order), exactly equivalent to
  * `explode(split \s+) → groupBy(doc, term) → count` but with no explode
  * row blow-up and, crucially, no aggregation exchange: the per-document
  * grouping is a row-local intern table (full byte-slice comparison on
  * every probe — hashes only pick buckets), so the distributed plan goes
  * straight from the scan to already-aggregated (doc, term, tf) rows.
  *
  * Shares [[RepetitionCounts]]'s byte-level `\s+` tokenizer (the six Java
  * ASCII whitespace bytes, safe for multi-byte UTF-8).
  */
case class WordCounts(child: Expression) extends UnaryExpression {

  override def dataType: DataType = WordCounts.Shape
  override def nullable: Boolean  = child.nullable

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"word_counts requires string, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    WordCounts.evalWordCounts(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.WordCounts.evalWordCounts($c);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): WordCounts =
    copy(child = newChild)
}

object WordCounts {

  val Shape: DataType = ArrayType(StructType(Seq(
    StructField("term", StringType, nullable = false),
    StructField("tf", LongType, nullable = false))), containsNull = false)

  @inline private def isSpace(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0b || b == '\f' || b == '\r'

  private def nextPow2(x: Int): Int = Integer.highestOneBit(math.max(16, x) * 2 - 1) << 1

  /** Static kernel invoked from generated code. */
  def evalWordCounts(text: UTF8String): GenericArrayData = {
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
    if (nWords == 0) return new GenericArrayData(Array.empty[Any])
    val cap    = nextPow2(nWords)
    val mask   = cap - 1
    val table  = new Array[Int](cap); java.util.Arrays.fill(table, -1)
    val order  = new Array[Int](nWords) // distinct word slots, first-occurrence order
    val counts = new Array[Int](nWords) // multiplicity, indexed by first-occurrence idx
    var distinct = 0
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
          table(slot) = w; counts(w) = 1
          order(distinct) = w; distinct += 1
          done = true
        } else if (sameSlice(bytes, starts(e), ends(e), ws, we)) {
          counts(e) += 1
          done = true
        } else slot = (slot + 1) & mask
      }
      w += 1
    }
    val out = new Array[Any](distinct)
    var d   = 0
    while (d < distinct) {
      val e  = order(d)
      val wl = ends(e) - starts(e)
      val buf = new Array[Byte](wl)
      System.arraycopy(bytes, starts(e), buf, 0, wl)
      out(d) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](UTF8String.fromBytes(buf), counts(e).toLong))
      d += 1
    }
    new GenericArrayData(out)
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
  def wordCounts(c: Column): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      WordCounts(org.apache.spark.sql.graftbridge.Bridge.expression(c)))
}
