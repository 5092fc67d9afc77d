package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** `shingle_hashes(text, n)` — the xxhash64 of every space-joined word
  * n-gram, as one native pass that never materializes a shingle string.
  *
  * Bit-identical to the composition
  * {{{ transform(word_shingles(text, n), s -> xxhash64(s)) }}}
  * (seed 42, Spark's default): each shingle's bytes are composed into ONE
  * reusable per-row scratch buffer (sized once to the longest shingle)
  * and hashed with the same `XXH64.hashUnsafeBytes` the builtin
  * expression uses. The composition allocates a `UTF8String` per shingle
  * — at corpus scale (24M trigrams per 500k docs) that allocation burst
  * IS the GC band the ngram-novelty crossover run recorded (9–35 s
  * spread); this kernel's only per-row garbage is the hash array itself.
  *
  * Returns an empty array when the text has fewer than `n` words; null
  * input → null (UnaryExpression default).
  *
  * Reference semantics: the downstream consumers (first-occurrence
  * novelty, minhash banding) only need an injective-in-practice shingle
  * key, but keeping the exact `xxhash64(word_shingles(...))` value means
  * every existing artifact, spec, and oracle derivation stays valid.
  */
case class ShingleHashes(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, s"shingle size must be >= 1, got $n")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean  = child.nullable

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"shingle_hashes requires string, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    ShingleHashes.evalHashes(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShingleHashes.evalHashes($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

object ShingleHashes {

  @inline private def isSpace(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0b || b == '\f' || b == '\r'

  /** Static kernel invoked from generated code. */
  def evalHashes(text: UTF8String, n: Int): ArrayData = {
    val bytes = text.getBytes
    val len   = bytes.length
    // Pass 1: word boundaries (byte offsets) — same scan as WordShingles.
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
    if (nWords < n) return new GenericArrayData(Array.empty[Long])
    // Scratch sized to the longest shingle in this row — one allocation.
    var maxSize = 0
    var w = 0
    while (w <= nWords - n) {
      var size = n - 1
      var k    = 0
      while (k < n) { size += ends(w + k) - starts(w + k); k += 1 }
      if (size > maxSize) maxSize = size
      w += 1
    }
    val buf = new Array[Byte](maxSize)
    // Pass 2: compose each shingle into the scratch, hash in place.
    val out = new Array[Long](nWords - n + 1)
    w = 0
    while (w <= nWords - n) {
      var pos = 0
      var k   = 0
      while (k < n) {
        if (k > 0) { buf(pos) = ' '; pos += 1 }
        val wl = ends(w + k) - starts(w + k)
        System.arraycopy(bytes, starts(w + k), buf, pos, wl)
        pos += wl
        k += 1
      }
      out(w) = XXH64.hashUnsafeBytes(buf, Platform.BYTE_ARRAY_OFFSET, pos, 42L)
      w += 1
    }
    new GenericArrayData(out)
  }

  /** Column API. */
  def shingleHashes(c: Column, n: Int): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      ShingleHashes(org.apache.spark.sql.graftbridge.Bridge.expression(c), n))

  /** SQL registration: `SELECT shingle_hashes(text, 3)`. `n` must be a
    * foldable integer literal.
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "shingle_hashes",
      exprs => {
        require(exprs.length == 2 && exprs(1).foldable,
          "shingle_hashes requires (text, <integer literal n>)")
        exprs(1).eval(null) match {
          case nn: java.lang.Number => ShingleHashes(exprs.head, nn.intValue())
          case other => throw new IllegalArgumentException(
            s"shingle_hashes n must be an integer literal, got $other")
        }
      },
      "scala_udf")
}
