package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `dsir_bucket_counts(text, buckets)` — the whole DSIR feature-hash
  * pipeline for one document in ONE byte scan: tokenize on `\s+`, md5 each
  * token, take the first 32 bits, bucket mod `buckets`, count.
  *
  * Why native: the declarative formulation (explode every token, md5 +
  * `conv` + `substring` per ROW, then a corpus-wide (doc, bucket) groupBy)
  * shuffles one row per token — ~75M rows at 500k docs — and pays a
  * string-allocating hex digest chain per token. This kernel emits one
  * 64-slot vector per document with no explode and NO wide exchange
  * anywhere in the resulting plan ([[graft.pipeline.Dsir.logWeights]]).
  *
  * Exact equivalences with the declarative path (spec-pinned):
  *  - tokens = maximal runs of non-`[ \t\n\f\r]` bytes — Java's
  *    ASCII-only `\s` class, the same split `TextAnalysis.words` performs;
  *    multi-byte UTF-8 units are never whitespace, so the byte scan
  *    tokenizes identically and md5 runs over the identical token bytes;
  *  - bucket = (first 4 md5 bytes as unsigned int) % buckets, which is
  *    exactly `pmod(conv(substring(md5(tok), 1, 8), 16, 10), buckets)` —
  *    8 hex chars ARE the first 4 bytes, and the value is non-negative so
  *    pmod degenerates to `%`.
  *
  * Output is `array<double>` (exact small integers) rather than ints so
  * the per-document weight can finish as a codegen'd [[VectorDot]] against
  * a broadcast log-ratio literal instead of an interpreted lambda fold.
  * NULL for null text AND for zero-token text — the explode formulation
  * emits no rows for either, so both must vanish from the output.
  */
object DsirBucketCounts {

  private val mdPool = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  def counts(text: UTF8String, buckets: Int): GenericArrayData = {
    val bytes = text.getBytes
    val out = new Array[Double](buckets)
    val md = mdPool.get()
    var i = 0
    val n = bytes.length
    var any = false
    while (i < n) {
      while (i < n && isWs(bytes(i))) i += 1
      val start = i
      while (i < n && !isWs(bytes(i))) i += 1
      if (i > start) {
        any = true
        md.reset()
        md.update(bytes, start, i - start)
        val d = md.digest()
        val v = ((d(0) & 0xFFL) << 24) | ((d(1) & 0xFFL) << 16) |
          ((d(2) & 0xFFL) << 8) | (d(3) & 0xFFL)
        out((v % buckets).toInt) += 1.0
      }
    }
    if (!any) null else new GenericArrayData(out)
  }

  /** Column API. */
  def dsirBucketCounts(text: Column, buckets: Int): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      DsirBucketCountsExpr(
        org.apache.spark.sql.graftbridge.Bridge.expression(text), buckets))
}

case class DsirBucketCountsExpr(child: org.apache.spark.sql.catalyst.expressions.Expression,
    buckets: Int) extends UnaryExpression {

  require(buckets >= 1 && buckets <= (1 << 20), s"buckets out of range: $buckets")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean  = true // null/empty text yields NULL

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"dsir_bucket_counts requires string, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    DsirBucketCounts.counts(input.asInstanceOf[UTF8String], buckets)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.DsirBucketCounts.counts($c, $buckets);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override def prettyName: String = "dsir_bucket_counts"

  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression): DsirBucketCountsExpr =
    copy(child = newChild)
}
