package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `quality_counts(text)` — every integer quality signal in ONE byte scan:
  * `struct<n_chars, n_tokens, n_punct, n_alnum, n_upper, n_stops: bigint>`.
  *
  * Byte-level equivalences to the regex formulation the DuckDB oracles use
  * (each class is ASCII-only, so multi-byte UTF-8 sequences can never
  * match, and a continuation byte can never start or extend a run):
  *  - `n_chars`  = codepoint count (bytes with `(b & 0xC0) != 0x80`),
  *    Spark `length()` / DuckDB `length()`;
  *  - `n_tokens` = `regexp_count(text, '[A-Za-z0-9]+')` — maximal ASCII
  *    alnum runs;
  *  - `n_punct`  = `regexp_count(text, '[.,!?;:]')`;
  *  - `n_alnum`  = `length(text) - regexp_count(text, '[^A-Za-z0-9]')` —
  *    i.e. the count of ASCII-alnum codepoints;
  *  - `n_upper`  = `regexp_count(text, '[A-Z]')`;
  *  - `n_stops`  = `regexp_count(lower(text), '\b(w1|...|wN)\b')` for the
  *    `\w`-only stopword list — same maximal-`\w`-run argument as
  *    [[WordListHits]], whose matcher this kernel inlines.
  *
  * Replacing the five separate regex passes with this kernel is what took
  * `q_text_quality` out of the regex engine entirely: the per-row cost is
  * one linear walk with a handful of branch-predictable comparisons, and
  * the expression stays inside whole-stage codegen. Callers read multiple
  * fields out of one value via `getField`; codegen subexpression
  * elimination evaluates the kernel once per row (the expression is a
  * case class over `(child, words)`, so equal instances are CSE-able).
  */
case class QualityCounts(child: Expression, stopwords: Seq[String])
  extends UnaryExpression {

  require(stopwords.nonEmpty && stopwords.forall(_.matches("[A-Za-z0-9_]+")),
    s"quality_counts requires non-empty \\w-only stopwords, got $stopwords")

  private lazy val targets: Array[Array[Byte]] =
    stopwords.map(_.toLowerCase(java.util.Locale.ROOT).getBytes("UTF-8")).toArray

  override def dataType: DataType = QualityCounts.Shape
  override def nullable: Boolean  = child.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"quality_counts requires string, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    QualityCounts.evalCounts(input.asInstanceOf[UTF8String], targets)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val targetsRef = ctx.addReferenceObj("qcTargets", targets, "byte[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.QualityCounts.evalCounts($c, $targetsRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): QualityCounts =
    copy(child = newChild)
}

object QualityCounts {

  val Shape: DataType = StructType(Seq(
    StructField("n_chars", LongType, nullable = false),
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_punct", LongType, nullable = false),
    StructField("n_alnum", LongType, nullable = false),
    StructField("n_upper", LongType, nullable = false),
    StructField("n_stops", LongType, nullable = false)))

  @inline private def isAlnum(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z') || (b >= '0' && b <= '9')

  @inline private def isWordByte(b: Byte): Boolean = isAlnum(b) || b == '_'

  @inline private def lower(b: Byte): Byte =
    if (b >= 'A' && b <= 'Z') (b + 32).toByte else b

  /** Static kernel invoked from generated code. */
  def evalCounts(text: UTF8String, targets: Array[Array[Byte]]): GenericInternalRow = {
    val bytes = text.getBytes
    val len   = bytes.length
    var nChars  = 0L
    var nTokens = 0L
    var nPunct  = 0L
    var nAlnum  = 0L
    var nUpper  = 0L
    var nStops  = 0L
    var inTok     = false
    var wordStart = -1
    var i         = 0
    while (i < len) {
      val b = bytes(i)
      if ((b & 0xC0) != 0x80) nChars += 1
      val al = isAlnum(b)
      if (al) {
        nAlnum += 1
        if (!inTok) nTokens += 1
        inTok = true
        if (b >= 'A' && b <= 'Z') nUpper += 1
      } else {
        inTok = false
        if (b == '.' || b == ',' || b == '!' || b == '?' || b == ';' || b == ':')
          nPunct += 1
      }
      if (al || b == '_') {
        if (wordStart < 0) wordStart = i
      } else if (wordStart >= 0) {
        if (matchesTarget(bytes, wordStart, i, targets)) nStops += 1
        wordStart = -1
      }
      i += 1
    }
    if (wordStart >= 0 && matchesTarget(bytes, wordStart, len, targets)) nStops += 1
    new GenericInternalRow(
      Array[Any](nChars, nTokens, nPunct, nAlnum, nUpper, nStops))
  }

  @inline private def matchesTarget(
      bytes: Array[Byte], s: Int, e: Int, targets: Array[Array[Byte]]): Boolean = {
    val wl = e - s
    var t  = 0
    while (t < targets.length) {
      val tgt = targets(t)
      if (tgt.length == wl) {
        var j = 0
        while (j < wl && lower(bytes(s + j)) == tgt(j)) j += 1
        if (j == wl) return true
      }
      t += 1
    }
    false
  }

  /** Column API. */
  def qualityCounts(c: Column, stopwords: Seq[String]): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      QualityCounts(org.apache.spark.sql.graftbridge.Bridge.expression(c), stopwords))
}
