package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `repetition_counts(text)` — all five Gopher-style repetition counts in
  * ONE pass over the raw UTF-8 bytes:
  * `(n_words, n_distinct, top_c, n_tri, nd_tri)`.
  *
  * Semantically identical to tokenizing with `split(text, "\\s+")` (the
  * same byte-level scanner as [[WordShingles]] — the six Java `\s` ASCII
  * whitespace bytes, which never occur inside multi-byte UTF-8 sequences)
  * and then counting totals, distincts, the top word multiplicity, and
  * distinct word trigrams. The builtin composition costs two regex splits,
  * an array sort and interpreted higher-order folds per row (measured
  * ~10 s over 500k 50-word docs); this kernel is a single byte scan plus
  * two small open-addressing tables and runs inside whole-stage codegen.
  *
  * Exactness: words INTERN through the hash table with full byte-slice
  * comparison on every probe (hashes only pick buckets, equality is
  * always verified), and a trigram is then an exact (id, id, id) triple —
  * so no hash collision can ever change a count, at any corpus size.
  */
case class RepetitionCounts(child: Expression) extends UnaryExpression {

  override def dataType: DataType = RepetitionCounts.Shape
  override def nullable: Boolean  = child.nullable

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"repetition_counts requires string, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    RepetitionCounts.evalCounts(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.RepetitionCounts.evalCounts($c);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RepetitionCounts =
    copy(child = newChild)
}

object RepetitionCounts {

  val Shape: StructType = StructType(Seq(
    StructField("n_words", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("top_c", LongType, nullable = false),
    StructField("n_tri", LongType, nullable = false),
    StructField("nd_tri", LongType, nullable = false)))

  @inline private def isSpace(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0b || b == '\f' || b == '\r'

  private def nextPow2(x: Int): Int = Integer.highestOneBit(math.max(16, x) * 2 - 1) << 1

  /** Static kernel invoked from generated code. */
  def evalCounts(text: UTF8String): InternalRow = {
    val bytes = text.getBytes
    val len   = bytes.length
    // word boundaries (byte offsets), same scanner as WordShingles
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
    val out = new Array[Any](5)
    out(0) = nWords.toLong
    if (nWords == 0) {
      out(1) = 0L; out(2) = 0L; out(3) = 0L; out(4) = 0L
      return new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(out)
    }
    // intern words: open addressing; hashes pick buckets, byte-slices decide
    val cap    = nextPow2(nWords)
    val mask   = cap - 1
    val table  = new Array[Int](cap); java.util.Arrays.fill(table, -1)
    val ids    = new Array[Int](nWords) // intern id = index of first occurrence
    val counts = new Array[Int](nWords) // multiplicity, indexed by intern id
    var distinct = 0
    var top      = 0
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
          table(slot) = w; ids(w) = w; counts(w) = 1; distinct += 1
          if (top < 1) top = 1
          done = true
        } else if (sameSlice(bytes, starts(e), ends(e), ws, we)) {
          val id = ids(e)
          counts(id) += 1; ids(w) = id
          if (counts(id) > top) top = counts(id)
          done = true
        } else slot = (slot + 1) & mask
      }
      w += 1
    }
    // trigrams as exact intern-id triples
    val nTri = math.max(0, nWords - 2)
    var ndTri = 0
    if (nTri > 0) {
      val tcap  = nextPow2(nTri)
      val tmask = tcap - 1
      val ttab  = new Array[Int](tcap); java.util.Arrays.fill(ttab, -1)
      var t = 0
      while (t < nTri) {
        val h = (ids(t) * 31 + ids(t + 1)) * 31 + ids(t + 2)
        var slot = h & tmask
        var done = false
        while (!done) {
          val e = ttab(slot)
          if (e == -1) { ttab(slot) = t; ndTri += 1; done = true }
          else if (ids(e) == ids(t) && ids(e + 1) == ids(t + 1) &&
            ids(e + 2) == ids(t + 2)) done = true
          else slot = (slot + 1) & tmask
        }
        t += 1
      }
    }
    out(1) = distinct.toLong; out(2) = top.toLong
    out(3) = nTri.toLong; out(4) = ndTri.toLong
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(out)
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
  def repetitionCounts(c: Column): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      RepetitionCounts(org.apache.spark.sql.graftbridge.Bridge.expression(c)))
}
