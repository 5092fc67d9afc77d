package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** `min_hash_sig(text, n, k)` — the full k-hash MinHash signature of a
  * document's word n-gram set, as ONE native byte-scan pass.
  *
  * Bit-identical to the relational formulation it replaces
  * ([[graft.pipeline.Dedup.minhashSignatures]] pre-r10):
  * {{{ explode(word_shingles(text, n)) → groupBy(doc) →
  *     agg(min(xxhash64(lit(i), shingle)) for i < k) }}}
  * Hash family replicated exactly: Spark's multi-argument `xxhash64`
  * chains seeds, so `xxhash64(i, s)` =
  * `XXH64.hashUnsafeBytes(sBytes, XXH64.hashInt(i, 42))` — the per-i
  * seeds are precomputed once and the shingle bytes are composed into a
  * reusable per-row scratch (the [[ShingleHashes]] pattern).
  * Duplicate shingles are harmless under `min`, so no dedup pass exists
  * in either formulation.
  *
  * Why: the relational form explodes one STRING per shingle and pushes
  * every (shingle, i) pair through hash-aggregate buffers and a
  * corpus-wide (doc-keyed) SHUFFLE — for a 500k-doc corpus at k = 16
  * that is ~400M aggregate updates behind an exchange. This kernel makes
  * the signature a NARROW per-row expression: no shuffle, no shingle
  * string, no aggregation state; LSH banding then runs directly on the
  * returned array.
  *
  * Returns null when the text has fewer than `n` words (the relational
  * form emits no row for such docs — callers filter nulls to keep that
  * contract) and null for null input.
  */
case class MinHashSig(child: Expression, n: Int, k: Int) extends UnaryExpression {

  require(n >= 1, s"shingle size must be >= 1, got $n")
  require(k >= 1, s"signature length must be >= 1, got $k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean  = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"min_hash_sig requires string, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    MinHashSig.evalSig(input.asInstanceOf[UTF8String], n, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.MinHashSig.evalSig($c, $n, $k);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {

  @inline private def isSpace(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0b || b == '\f' || b == '\r'

  // private seed for the duplicate-shingle guard's content hash — distinct
  // from every signature seed (those chain from 42 via hashInt)
  private val DedupSeed = 0x9E3779B97F4A7C15L

  // per-k seed ladder: seed_i = XXH64.hashInt(i, 42) — the chained seed
  // Spark's XxHash64(lit(i), s) produces before hashing the string bytes.
  // Tiny and immutable; cached per signature length.
  private val seedCache =
    new java.util.concurrent.ConcurrentHashMap[Integer, Array[Long]]()
  private def seeds(k: Int): Array[Long] =
    seedCache.computeIfAbsent(k, kk => {
      val s = new Array[Long](kk)
      var i = 0
      while (i < kk) { s(i) = XXH64.hashInt(i, 42L); i += 1 }
      s
    })

  /** Static kernel invoked from generated code; null when < n words. */
  def evalSig(text: UTF8String, n: Int, k: Int): ArrayData = {
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
    if (nWords < n) return null
    var maxSize = 0
    var w = 0
    while (w <= nWords - n) {
      var size = n - 1
      var j    = 0
      while (j < n) { size += ends(w + j) - starts(w + j); j += 1 }
      if (size > maxSize) maxSize = size
      w += 1
    }
    val buf   = new Array[Byte](maxSize)
    val sd    = seeds(k)
    val mins  = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    // per-row duplicate-shingle guard: hashing a repeated shingle again
    // would not change any min but costs k hash passes — dedup by a
    // 64-bit content hash in a small open-addressed set (1 extra hash per
    // shingle buys k skipped ones per duplicate; a cross-shingle collision
    // would merely skip one distinct shingle's k candidates, ~2^-64 per
    // pair — the same accepted-odds stance as jaccardPairs' hashed join
    // keys). 0 marks an empty slot; a shingle hashing to exactly 0 is
    // remapped to 1 (harmless: worst case one extra k-pass for that pair).
    val nShingles = nWords - n + 1
    // long arithmetic + 2^30 ceiling: at ~1e9+ shingles an Int nShingles*2
    // would overflow negative, collapse cap to 4, and the open-addressing
    // probe below would spin forever once >4 distinct keys landed. With the
    // ceiling, a hotter-than-capacity table merely degrades the dedup guard
    // (the `insertMax` gate below stops inserting and re-hashes duplicates
    // instead) — the probe loop always terminates.
    val wantCap = math.min(1L << 30, math.max(4L, nShingles.toLong * 2L)).toInt
    var cap = java.lang.Integer.highestOneBit(wantCap - 1) << 1
    val seen = new Array[Long](cap)
    val mask = cap - 1
    // once the table holds cap-1 keys, stop inserting and hash every
    // remaining shingle unconditionally (duplicates included) — correctness
    // is unaffected (re-hashing a seen shingle cannot change any min), and
    // the probe loop can no longer spin on a full table
    var inserted  = 0
    val insertMax = cap - 1
    w = 0
    while (w <= nWords - n) {
      var pos = 0
      var j   = 0
      while (j < n) {
        if (j > 0) { buf(pos) = ' '; pos += 1 }
        val wl = ends(w + j) - starts(w + j)
        System.arraycopy(bytes, starts(w + j), buf, pos, wl)
        pos += wl
        j += 1
      }
      var fresh = true
      if (inserted < insertMax) {
        var key = XXH64.hashUnsafeBytes(buf, Platform.BYTE_ARRAY_OFFSET, pos, DedupSeed)
        if (key == 0L) key = 1L
        var slot = (key & mask).toInt
        while (seen(slot) != 0L && seen(slot) != key) slot = (slot + 1) & mask
        if (seen(slot) == 0L) { seen(slot) = key; inserted += 1 }
        else fresh = false
      }
      if (fresh) {
        var h = 0
        while (h < k) {
          val x = XXH64.hashUnsafeBytes(buf, Platform.BYTE_ARRAY_OFFSET, pos, sd(h))
          if (x < mins(h)) mins(h) = x
          h += 1
        }
      }
      w += 1
    }
    new GenericArrayData(mins)
  }

  /** Column API. */
  def minHashSig(c: Column, n: Int, k: Int): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      MinHashSig(org.apache.spark.sql.graftbridge.Bridge.expression(c), n, k))
}
