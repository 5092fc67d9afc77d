package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `word_shingles(text, n)` — space-joined word n-grams as one native
  * Catalyst expression.
  *
  * Semantically identical to the builtin composition
  * {{{ transform(sequence(0, size(words)-n), i -> concat_ws(" ", slice(words, i+1, n))) }}}
  * with `words = filter(split(text, "\\s+"), w -> length(w) > 0)`, but built
  * in a single pass over the UTF-8 bytes: word boundaries are found once
  * (Java regex `\s` = ASCII `[ \t\n\f\r]`, so byte tests are exact even
  * for multi-byte text), and each shingle is materialized directly from byte
  * slices. The builtin form allocates a words array plus `n`-element slices
  * and join buffers per shingle — this is the hot inner loop of Jaccard
  * dedup, MinHash and fingerprinting over a document corpus.
  *
  * Returns an empty array when the text has fewer than `n` words; null input
  * → null (UnaryExpression default).
  */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, s"shingle size must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean  = child.nullable

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"word_shingles requires string, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    WordShingles.evalShingles(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WordShingles.evalShingles($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object WordShingles {

  @inline private def isSpace(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0b || b == '\f' || b == '\r'

  /** Static kernel invoked from generated code. */
  def evalShingles(text: UTF8String, n: Int): ArrayData = {
    val bytes = text.getBytes
    val len   = bytes.length
    // Pass 1: word boundaries (byte offsets).
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
    if (nWords < n) return new GenericArrayData(Array.empty[Any])
    // Pass 2: one byte-slice copy per shingle.
    val out = new Array[Any](nWords - n + 1)
    var w   = 0
    while (w <= nWords - n) {
      var size = n - 1 // separators
      var k    = 0
      while (k < n) { size += ends(w + k) - starts(w + k); k += 1 }
      val buf = new Array[Byte](size)
      var pos = 0
      k = 0
      while (k < n) {
        if (k > 0) { buf(pos) = ' '; pos += 1 }
        val wl = ends(w + k) - starts(w + k)
        System.arraycopy(bytes, starts(w + k), buf, pos, wl)
        pos += wl
        k += 1
      }
      out(w) = UTF8String.fromBytes(buf)
      w += 1
    }
    new GenericArrayData(out)
  }

  /** Column API. */
  def wordShingles(c: Column, n: Int): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      WordShingles(org.apache.spark.sql.graftbridge.Bridge.expression(c), n))

  /** SQL registration: `SELECT word_shingles(text, 3)`. `n` must be a
    * foldable integer literal.
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "word_shingles",
      exprs => {
        require(exprs.length == 2 && exprs(1).foldable,
          "word_shingles requires (text, <integer literal n>)")
        exprs(1).eval(null) match {
          case n: java.lang.Number => WordShingles(exprs.head, n.intValue())
          case other => throw new IllegalArgumentException(
            s"word_shingles n must be an integer literal, got $other")
        }
      },
      "scala_udf")
}
