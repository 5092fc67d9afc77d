package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Byte kernels for the HTML boilerplate-strip family
  * ([[graft.pipeline.TextAnalysis.htmlStrip]] /
  * [[graft.pipeline.TextAnalysis.htmlTagCount]]) — the web-crawl
  * text-extraction pass taken out of the regex engine (the
  * [[PiiCounts]]/[[PiiScrub]] r12 precedent: Java's backtracking regex on
  * multi-KB documents is the cost, not the logic; measured 2.8× DuckDB as
  * a regexp_replace chain at 500k docs).
  *
  * Each pass is bit-equal to the declarative formulation the DuckDB
  * oracles keep (spec-pinned against the original Column chain on random
  * and adversarial inputs), applied in the SAME sequence — the passes are
  * observable: a style element whose content holds a script open tag whose
  * close lies beyond the style close is consumed by the SCRIPT pass first,
  * which a fused single walk would get wrong:
  *
  *  1. `(?is)<script[^>]*>.*?</script[ \t\n\r\f]*>` → `' '` — open tag is
  *     `<script` (ASCII case-folded) to the first `'>'`; the non-greedy
  *     close is the first `</script` (case-folded) whose ws-run ends in
  *     `'>'`. An unclosed element leaves the open tag for the generic
  *     tag pass — content survives, exactly like the regex.
  *  2. the same for `<style>` elements, over pass 1's output.
  *  3. `(?s)<[^>]*>` → `' '` (strip) or non-overlapping count (tag count);
  *     `[^>]` matches ANY byte except `'>'` including `'<'` and newlines.
  *  4. strip only: the six-entity decode fold (`&nbsp; &lt; &gt; &quot;
  *     &#39; &amp;` — `&amp;` LAST, so decoded ampersands are never
  *     re-decoded; no earlier replacement can create a later pattern, so
  *     one leftmost-first walk reproduces the sequential fold), then
  *     `[ \t\n\r\f]+` → `' '` collapse, then the trailing `trim` (which
  *     strips `' '` only — a surviving vertical tab blocks it, exactly
  *     like `trim()` over the regex chain).
  *
  * All patterns are ASCII-only, so UTF-8 continuation bytes pass through
  * untouched and case folding is the ASCII fold Java applies to them.
  */
object HtmlKernels {

  @inline private def isWs5(b: Byte): Boolean = // the pattern's [ \t\n\r\f]
    b == ' ' || b == '\t' || b == '\n' || b == '\r' || b == '\f'

  @inline private def lower(b: Byte): Byte =
    if (b >= 'A' && b <= 'Z') (b + 32).toByte else b

  /** ASCII case-insensitive match of `name` at `off`. */
  private def matchesCI(bytes: Array[Byte], off: Int, name: Array[Byte]): Boolean = {
    if (off + name.length > bytes.length) return false
    var i = 0
    while (i < name.length) {
      if (lower(bytes(off + i)) != name(i)) return false
      i += 1
    }
    true
  }

  private val Script = "script".getBytes("US-ASCII")
  private val Style  = "style".getBytes("US-ASCII")

  /** One element-removal pass: every `<name[^>]*>.*?</name[ws]*>` span
    * (case-insensitive, leftmost non-greedy) becomes one `' '`. Returns
    * the input array unchanged (no copy) when nothing matches.
    */
  private def removeElements(bytes: Array[Byte], name: Array[Byte]): Array[Byte] = {
    val len = bytes.length
    var out: java.io.ByteArrayOutputStream = null
    var cur = 0
    var i = 0
    while (i < len) {
      if (bytes(i) == '<' && matchesCI(bytes, i + 1, name)) {
        // open tag: [^>]* then '>'
        var k = i + 1 + name.length
        while (k < len && bytes(k) != '>') k += 1
        if (k < len) {
          // leftmost close: first </name (CI) whose ws* run ends in '>'
          var c = k + 1
          var close = -1
          while (close < 0 && c + 2 + name.length <= len) {
            if (bytes(c) == '<' && bytes(c + 1) == '/' &&
                matchesCI(bytes, c + 2, name)) {
              var w = c + 2 + name.length
              while (w < len && isWs5(bytes(w))) w += 1
              if (w < len && bytes(w) == '>') close = w
            }
            c += 1
          }
          if (close >= 0) {
            if (out == null) out = new java.io.ByteArrayOutputStream(len)
            out.write(bytes, cur, i - cur)
            out.write(' ')
            cur = close + 1
            i = close + 1
          } else i += 1 // unclosed: the open tag is NOT this pass's match
        } else i += 1   // '>'-less open tag: no match possible
      } else i += 1
    }
    if (out == null) bytes
    else { out.write(bytes, cur, len - cur); out.toByteArray }
  }

  /** Generic tag pass `(?s)<[^>]*>` → `' '`. */
  private def removeTags(bytes: Array[Byte]): Array[Byte] = {
    val len = bytes.length
    var out: java.io.ByteArrayOutputStream = null
    var cur = 0
    var i = 0
    while (i < len) {
      if (bytes(i) == '<') {
        var k = i + 1
        while (k < len && bytes(k) != '>') k += 1
        if (k < len) {
          if (out == null) out = new java.io.ByteArrayOutputStream(len)
          out.write(bytes, cur, i - cur)
          out.write(' ')
          cur = k + 1
          i = k + 1
        } else i = len // no '>' left: nothing later can match either
      } else i += 1
    }
    if (out == null) bytes
    else { out.write(bytes, cur, len - cur); out.toByteArray }
  }

  private def countTags(bytes: Array[Byte]): Long = {
    val len = bytes.length
    var n = 0L
    var i = 0
    while (i < len) {
      if (bytes(i) == '<') {
        var k = i + 1
        while (k < len && bytes(k) != '>') k += 1
        if (k < len) { n += 1; i = k + 1 } else i = len
      } else i += 1
    }
    n
  }

  private val Entities: Array[(Array[Byte], Byte)] = Array(
    "&nbsp;".getBytes("US-ASCII") -> ' '.toByte,
    "&lt;".getBytes("US-ASCII") -> '<'.toByte,
    "&gt;".getBytes("US-ASCII") -> '>'.toByte,
    "&quot;".getBytes("US-ASCII") -> '"'.toByte,
    "&#39;".getBytes("US-ASCII") -> '\''.toByte,
    "&amp;".getBytes("US-ASCII") -> '&'.toByte)

  private def matchesAt(bytes: Array[Byte], off: Int, pat: Array[Byte]): Boolean = {
    if (off + pat.length > bytes.length) return false
    var i = 0
    while (i < pat.length) {
      if (bytes(off + i) != pat(i)) return false
      i += 1
    }
    true
  }

  /** Fused entity decode + whitespace collapse + trim (the fold's tail:
    * entities first, so a decoded `&nbsp;` joins its neighboring run).
    */
  private def decodeCollapseTrim(bytes: Array[Byte]): Array[Byte] = {
    val len = bytes.length
    val out = new java.io.ByteArrayOutputStream(len)
    var pendingWs = false
    var started = false
    var i = 0
    while (i < len) {
      val b = bytes(i)
      if (isWs5(b)) { pendingWs = true; i += 1 }
      else if (b == '&') {
        var e = 0
        var hit = -1
        while (hit < 0 && e < Entities.length) {
          if (matchesAt(bytes, i, Entities(e)._1)) hit = e
          e += 1
        }
        if (hit >= 0) {
          val c = Entities(hit)._2
          if (c == ' ') pendingWs = true
          else {
            if (pendingWs && started) out.write(' ')
            pendingWs = false
            out.write(c)
            started = true
          }
          i += Entities(hit)._1.length
        } else {
          if (pendingWs && started) out.write(' ')
          pendingWs = false
          out.write(b)
          started = true
          i += 1
        }
      } else {
        if (pendingWs && started) out.write(' ')
        pendingWs = false
        out.write(b)
        started = true
        i += 1
      }
    }
    out.toByteArray // trailing pendingWs dropped = the trim
  }

  /** Static strip kernel invoked from generated code. */
  def evalStrip(text: UTF8String): UTF8String = {
    val p1 = removeElements(text.getBytes, Script)
    val p2 = removeElements(p1, Style)
    UTF8String.fromBytes(decodeCollapseTrim(removeTags(p2)))
  }

  /** Static tag-count kernel invoked from generated code. */
  def evalTagCount(text: UTF8String): Long = {
    val p1 = removeElements(text.getBytes, Script)
    countTags(removeElements(p1, Style))
  }

  /** Column APIs. */
  def htmlStrip(c: Column): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      HtmlStrip(org.apache.spark.sql.graftbridge.Bridge.expression(c)))

  def htmlTagCount(c: Column): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      HtmlTagCount(org.apache.spark.sql.graftbridge.Bridge.expression(c)))
}

/** `html_strip(text)` — the full boilerplate-strip chain as one kernel
  * call, bit-equal to the regexp_replace fold the DuckDB oracles keep.
  */
case class HtmlStrip(child: Expression) extends UnaryExpression
    with ImplicitCastInputTypes {

  override def dataType: DataType = StringType
  override def nullable: Boolean  = child.nullable

  // same coercion contract as the regexp_replace chain this replaces
  override def inputTypes: Seq[DataType] = Seq(StringType)

  override def nullSafeEval(input: Any): Any =
    HtmlKernels.evalStrip(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HtmlKernels.evalStrip($c);")

  override protected def withNewChildInternal(newChild: Expression): HtmlStrip =
    copy(child = newChild)
}

/** `html_tag_count(text)` — tags remaining after the script/style element
  * drop, bit-equal to `regexp_count` over the same two passes.
  */
case class HtmlTagCount(child: Expression) extends UnaryExpression
    with ImplicitCastInputTypes {

  override def dataType: DataType = LongType
  override def nullable: Boolean  = child.nullable

  override def inputTypes: Seq[DataType] = Seq(StringType)

  override def nullSafeEval(input: Any): Any =
    HtmlKernels.evalTagCount(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HtmlKernels.evalTagCount($c);")

  override protected def withNewChildInternal(newChild: Expression): HtmlTagCount =
    copy(child = newChild)
}
