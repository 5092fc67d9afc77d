package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `pii_counts(text)` — non-overlapping match counts for the four
  * scrub-family PII patterns in one kernel call:
  * `struct<n_emails, n_urls, n_phones, n_ips: bigint>`.
  *
  * Each field is bit-equal to `regexp_count(text, P)` for the
  * corresponding [[graft.pipeline.TextAnalysis]] pattern (spec-pinned on
  * random and adversarial inputs):
  *  - `n_emails`: `[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}` — the
  *    scanner visits each '@', requires ≥1 local-class byte immediately
  *    before it (at or after the non-overlap pointer), takes the maximal
  *    domain-class run after it and replays the regex backtrack exactly:
  *    the RIGHTMOST '.' in the run followed by ≥2 letters wins, and the
  *    match ends after that greedy letter run (possibly mid-run — the
  *    `a@bc.de-f` case);
  *  - `n_urls`: `https?://[^\s]+` — literal prefix then maximal
  *    non-whitespace run. Java counts `\x0B` (vertical tab) as `\s` while
  *    RE2 does not; this kernel follows Java. The two engines' parity on
  *    this corpus already proves the byte never occurs here;
  *  - `n_phones`: `\+?[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}` — fixed window,
  *    no boundary assertions (digits before/after do not disqualify);
  *  - `n_ips`: `\b[0-9]{1,3}(\.[0-9]{1,3}){3}\b` — the {1,3}+\b interplay
  *    reduces to: four COMPLETE digit runs of length 1-3 joined by '.',
  *    with non-word CODEPOINTS (or string edges) on both flanks — a
  *    >3-digit run can never backtrack into a match because the byte
  *    after any shorter prefix is still a digit. Java's `\b` is
  *    Unicode-aware even in plain mode, so the flank test decodes UTF-8.
  *
  * All four classes are ASCII-only, so multi-byte UTF-8 sequences never
  * match and continuation bytes never extend a run. Replacing the four
  * regex passes with this kernel is what takes the PII census out of the
  * regex engine: one branch-predictable walk per pattern inside
  * whole-stage codegen (measured: 21× DuckDB as four `regexp_count`s at
  * 500k docs — Java regex cost, the r8 normalize lesson repeating).
  */
case class PiiCounts(child: Expression) extends UnaryExpression
    with ImplicitCastInputTypes {

  override def dataType: DataType = PiiCounts.Shape
  override def nullable: Boolean  = child.nullable

  // ImplicitCastInputTypes so non-string columns coerce exactly as they
  // did under the regexp_count formulation this kernel replaced
  override def inputTypes: Seq[DataType] = Seq(StringType)

  override def nullSafeEval(input: Any): Any =
    PiiCounts.evalCounts(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.PiiCounts.evalCounts($c);")

  override protected def withNewChildInternal(newChild: Expression): PiiCounts =
    copy(child = newChild)
}

object PiiCounts {

  val Shape: DataType = StructType(Seq(
    StructField("n_emails", LongType, nullable = false),
    StructField("n_urls", LongType, nullable = false),
    StructField("n_phones", LongType, nullable = false),
    StructField("n_ips", LongType, nullable = false)))

  @inline private def isDigit(b: Byte): Boolean = b >= '0' && b <= '9'
  @inline private def isAlpha(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z')
  // Java's \b is Unicode-aware even WITHOUT UNICODE_CHARACTER_CLASS (a
  // known asymmetry vs its ASCII \w: OpenJDK's Bound node tests
  // `ch == '_' || Character.isLetterOrDigit(ch)`), so the IP boundary
  // check must decode the flanking CODEPOINT, not the flanking byte —
  // probed live: "…5Ünïcode" has NO boundary after the '5' in plain Java.
  @inline private def isWordCp(cp: Int): Boolean =
    cp == '_' || Character.isLetterOrDigit(cp)

  /** Codepoint of the UTF-8 sequence starting at `i` (malformed tails
    * decode as U+FFFD, a non-word letter-class-free codepoint).
    */
  private def cpAt(bytes: Array[Byte], i: Int): Int = {
    val len = bytes.length
    val b0  = bytes(i) & 0xFF
    if (b0 < 0x80) b0
    else if ((b0 & 0xE0) == 0xC0 && i + 1 < len)
      ((b0 & 0x1F) << 6) | (bytes(i + 1) & 0x3F)
    else if ((b0 & 0xF0) == 0xE0 && i + 2 < len)
      ((b0 & 0x0F) << 12) | ((bytes(i + 1) & 0x3F) << 6) | (bytes(i + 2) & 0x3F)
    else if ((b0 & 0xF8) == 0xF0 && i + 3 < len)
      ((b0 & 0x07) << 18) | ((bytes(i + 1) & 0x3F) << 12) |
        ((bytes(i + 2) & 0x3F) << 6) | (bytes(i + 3) & 0x3F)
    else 0xFFFD
  }

  /** Codepoint of the UTF-8 sequence ENDING at `i - 1`. */
  private def cpBefore(bytes: Array[Byte], i: Int): Int = {
    var s = i - 1
    while (s > 0 && (bytes(s) & 0xC0) == 0x80) s -= 1
    cpAt(bytes, s)
  }
  // [A-Za-z0-9._%+-]
  @inline private def isLocal(b: Byte): Boolean =
    isAlpha(b) || isDigit(b) || b == '.' || b == '_' || b == '%' ||
      b == '+' || b == '-'
  // [A-Za-z0-9.-]
  @inline private def isDomain(b: Byte): Boolean =
    isAlpha(b) || isDigit(b) || b == '.' || b == '-'
  // Java \s = [ \t\n\x0B\f\r]
  @inline private def isSpace(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'
  @inline private def isSep(b: Byte): Boolean =
    b == '-' || b == '.' || b == ' '

  /** Static kernel invoked from generated code. */
  def evalCounts(text: UTF8String): GenericInternalRow = {
    val bytes = text.getBytes
    new GenericInternalRow(Array[Any](
      countEmails(bytes), countUrls(bytes), countPhones(bytes), countIps(bytes)))
  }

  /** Leftmost email match starting at or after `from`, packed as
    * `(start << 32) | end`, or -1. Java find() semantics: ascending '@'
    * positions give the leftmost viable start (a local run can never
    * contain '@'), and the match start is the local run's beginning
    * clamped to `from` (the non-overlap pointer / region start).
    */
  private[functions] def nextEmail(bytes: Array[Byte], from: Int): Long = {
    val len = bytes.length
    var a = math.max(from + 1, 1)
    while (a < len) {
      if (bytes(a) == '@' && a - 1 >= from && isLocal(bytes(a - 1))) {
        // maximal domain-class run after '@'
        var e0 = a + 1
        while (e0 < len && isDomain(bytes(e0))) e0 += 1
        // rightmost '.' in (a+1, e0) with >=2 letters after it wins; the
        // + must keep >=1 byte, so the dot index k ranges over [a+2, e0)
        var k = e0 - 1
        var end = -1
        while (end < 0 && k >= a + 2) {
          if (bytes(k) == '.') {
            var g = k + 1
            while (g < len && isAlpha(bytes(g))) g += 1
            if (g - (k + 1) >= 2) end = g
          }
          k -= 1
        }
        if (end > 0) {
          var s = a - 1
          while (s - 1 >= from && isLocal(bytes(s - 1))) s -= 1
          return (s.toLong << 32) | end.toLong
        }
      }
      a += 1
    }
    -1L
  }

  /** Leftmost URL match starting at or after `from`, packed like
    * [[nextEmail]].
    */
  private[functions] def nextUrl(bytes: Array[Byte], from: Int): Long = {
    val len = bytes.length
    var i = math.max(from, 0)
    while (i + 7 <= len) { // shortest match "http://" + 1 byte needs 8
      if (bytes(i) == 'h' && bytes(i + 1) == 't' && bytes(i + 2) == 't' &&
          bytes(i + 3) == 'p') {
        var j = i + 4
        if (j < len && bytes(j) == 's') j += 1
        if (j + 3 <= len && bytes(j) == ':' && bytes(j + 1) == '/' &&
            bytes(j + 2) == '/') {
          var e = j + 3
          while (e < len && !isSpace(bytes(e))) e += 1
          if (e > j + 3) return (i.toLong << 32) | e.toLong // >=1 non-space
        }
      }
      i += 1
    }
    -1L
  }

  private def countEmails(bytes: Array[Byte]): Long = {
    var n = 0L
    var m = nextEmail(bytes, 0)
    while (m >= 0) {
      n += 1
      m = nextEmail(bytes, (m & 0xFFFFFFFFL).toInt)
    }
    n
  }

  private def countUrls(bytes: Array[Byte]): Long = {
    var n = 0L
    var m = nextUrl(bytes, 0)
    while (m >= 0) {
      n += 1
      m = nextUrl(bytes, (m & 0xFFFFFFFFL).toInt)
    }
    n
  }

  private def countPhones(bytes: Array[Byte]): Long = {
    val len = bytes.length
    var n = 0L
    var i = 0
    while (i < len) {
      var k = if (bytes(i) == '+') i + 1 else i
      // 3 digits, sep, 3 digits, sep, 4 digits
      if (k + 12 <= len &&
          isDigit(bytes(k)) && isDigit(bytes(k + 1)) && isDigit(bytes(k + 2)) &&
          isSep(bytes(k + 3)) &&
          isDigit(bytes(k + 4)) && isDigit(bytes(k + 5)) && isDigit(bytes(k + 6)) &&
          isSep(bytes(k + 7)) &&
          isDigit(bytes(k + 8)) && isDigit(bytes(k + 9)) &&
          isDigit(bytes(k + 10)) && isDigit(bytes(k + 11))) {
        n += 1
        i = k + 12
      } else i += 1
    }
    n
  }

  private def countIps(bytes: Array[Byte]): Long = {
    val len = bytes.length
    var n = 0L
    var i = 0
    while (i < len) {
      // candidate start: digit with a non-word codepoint (or BOS) before it
      if (isDigit(bytes(i)) && (i == 0 || !isWordCp(cpBefore(bytes, i)))) {
        var ok = true
        var pos = i
        var comp = 0
        while (ok && comp < 4) {
          var r = 0
          while (pos + r < len && isDigit(bytes(pos + r))) r += 1
          if (r < 1 || r > 3) ok = false // complete run must be 1-3 digits
          else {
            pos += r
            if (comp < 3) {
              if (pos < len && bytes(pos) == '.') pos += 1 else ok = false
            } else if (pos < len && isWordCp(cpAt(bytes, pos))) ok = false // \b
          }
          comp += 1
        }
        if (ok) { n += 1; i = pos } else i += 1
      } else i += 1
    }
    n
  }

  /** Column API. */
  def piiCounts(c: Column): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      PiiCounts(org.apache.spark.sql.graftbridge.Bridge.expression(c)))

  private val EmailToken = "<EMAIL>".getBytes("UTF-8")
  private val UrlToken   = "<URL>".getBytes("UTF-8")

  /** Static scrub kernel invoked from generated code: the exact two-pass
    * `regexp_replace(regexp_replace(text, email, '<EMAIL>'), url, '<URL>')`
    * rewrite — emails first, then URLs over the REWRITTEN bytes (order is
    * observable: a URL whose userinfo part is an email gets its email
    * replaced in pass one, and pass two then swallows the whole rewritten
    * run). Each pass is one linear walk via the shared match steppers.
    */
  def evalScrub(text: UTF8String): UTF8String = {
    val pass1 = replaceAll(text.getBytes, email = true, EmailToken)
    UTF8String.fromBytes(replaceAll(pass1, email = false, UrlToken))
  }

  private def replaceAll(
      bytes: Array[Byte], email: Boolean, token: Array[Byte]): Array[Byte] = {
    var m = if (email) nextEmail(bytes, 0) else nextUrl(bytes, 0)
    if (m < 0) return bytes // common case: no PII, zero copies
    val buf = new java.io.ByteArrayOutputStream(bytes.length + 16)
    var cur = 0
    while (m >= 0) {
      val s = (m >>> 32).toInt
      val e = (m & 0xFFFFFFFFL).toInt
      buf.write(bytes, cur, s - cur)
      buf.write(token, 0, token.length)
      cur = e
      m = if (email) nextEmail(bytes, cur) else nextUrl(bytes, cur)
    }
    buf.write(bytes, cur, bytes.length - cur)
    buf.toByteArray
  }

  /** Scrub Column API ([[PiiScrub]]). */
  def piiScrub(c: Column): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      PiiScrub(org.apache.spark.sql.graftbridge.Bridge.expression(c)))
}

/** `pii_scrub(text)` — the [[graft.pipeline.TextAnalysis.scrub]] rewrite
  * (emails then URLs replaced with placeholder tokens) as one kernel call,
  * bit-equal to the chained `regexp_replace` formulation the DuckDB
  * oracles keep (spec-pinned). Shares [[PiiCounts]]'s match steppers, so
  * the count and rewrite faces can never drift apart.
  */
case class PiiScrub(child: Expression) extends UnaryExpression
    with ImplicitCastInputTypes {

  override def dataType: DataType = StringType
  override def nullable: Boolean  = child.nullable

  // same coercion contract as PiiCounts (regexp_replace callers relied
  // on implicit string casts)
  override def inputTypes: Seq[DataType] = Seq(StringType)

  override def nullSafeEval(input: Any): Any =
    PiiCounts.evalScrub(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.PiiCounts.evalScrub($c);")

  override protected def withNewChildInternal(newChild: Expression): PiiScrub =
    copy(child = newChild)
}
