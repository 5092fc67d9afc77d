package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `word_list_hits(text, words)` — number of whole-word, case-insensitive
  * occurrences of any of `words` in `text`, as one native expression.
  *
  * Exactly equivalent to
  * {{{ regexp_count(lower(text), "\\b(w1|w2|...)\\b") }}}
  * when every target word consists of `\w` characters (`[A-Za-z0-9_]`),
  * because then each regex match is a maximal word-character run equal to a
  * target: a run can't contain a boundary, and a prefix/suffix match fails
  * the `\b` test. So the scan tokenizes maximal `\w` runs (byte-level —
  * Java's `\w`/`\b` are ASCII-only by default) and counts runs present in
  * the target set, lowercasing ASCII inline. One pass, no regex engine, no
  * lowercased copy of the text.
  *
  * The word lists are tiny (stopword sets), so membership is a linear probe
  * over length-bucketed candidates — cheaper than hashing for <16 words.
  */
case class WordListHits(child: Expression, words: Seq[String]) extends UnaryExpression {

  require(words.nonEmpty && words.forall(_.matches("[A-Za-z0-9_]+")),
    s"word_list_hits requires non-empty \\w-only words, got $words")

  private lazy val targets: Array[Array[Byte]] =
    words.map(_.toLowerCase(java.util.Locale.ROOT).getBytes("UTF-8")).toArray

  override def dataType: DataType = LongType
  override def nullable: Boolean  = child.nullable

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"word_list_hits requires string, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    WordListHits.countHits(input.asInstanceOf[UTF8String], targets)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val targetsRef = ctx.addReferenceObj("targets", targets, "byte[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WordListHits.countHits($c, $targetsRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): WordListHits =
    copy(child = newChild)
}

object WordListHits {

  @inline private def isWordByte(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z') || (b >= '0' && b <= '9') || b == '_'

  @inline private def lower(b: Byte): Byte =
    if (b >= 'A' && b <= 'Z') (b + 32).toByte else b

  /** Static kernel invoked from generated code. */
  def countHits(text: UTF8String, targets: Array[Array[Byte]]): Long = {
    val bytes = text.getBytes
    val len   = bytes.length
    var count = 0L
    var i     = 0
    while (i < len) {
      while (i < len && !isWordByte(bytes(i))) i += 1
      if (i < len) {
        val s = i
        while (i < len && isWordByte(bytes(i))) i += 1
        val wl = i - s
        var t  = 0
        var hit = false
        while (!hit && t < targets.length) {
          val tgt = targets(t)
          if (tgt.length == wl) {
            var j = 0
            while (j < wl && lower(bytes(s + j)) == tgt(j)) j += 1
            hit = j == wl
          }
          t += 1
        }
        if (hit) count += 1
      }
    }
    count
  }

  /** Column API. */
  def wordListHits(c: Column, words: Seq[String]): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      WordListHits(org.apache.spark.sql.graftbridge.Bridge.expression(c), words))
}
