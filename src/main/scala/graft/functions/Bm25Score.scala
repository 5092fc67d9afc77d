package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `bm25_score(text)` → `struct<dl: bigint, score: double>` — Okapi BM25
  * of one fixed query against each document, in ONE byte scan.
  *
  * The query model (query-term bytes, their trained idf weights, `k1`,
  * `b`, the corpus `avgdl`) rides along as a flat codegen reference
  * object, the [[RankBucket]]/[[NearestCell]] pattern: the driver
  * collects the ≤|query| idf rows from the trained term artifact
  * (bounded — never the vocabulary), so scoring is PURE per-row narrow
  * work — no tokenize-explode, no tf aggregation exchange, no term join.
  * The same plan therefore runs identically over a batch or a stream
  * (the [[graft.pipeline.RankSelect.transformAgainstGrids]] contract).
  *
  * Per document: walk the [[WordCounts]] byte tokenizer (the six Java
  * ASCII whitespace bytes — `\s+` splitting, safe for multi-byte UTF-8),
  * count `dl` = total tokens and `tf_i` per query term (linear probe over
  * the ≤|query| term slots — the query is tiny by construction), then
  *
  * {{{
  * score = Σ_i idf_i · (tf_i · (k1+1)) / (tf_i + k1·(1 − b + b·(dl/avgdl)))
  * }}}
  *
  * summed in query-term order (deterministic). Unmatched terms (tf=0)
  * contribute nothing; a document matching no query term scores 0.0 with
  * its true `dl` — callers filter `score > 0` for retrieval. Null text →
  * null struct (the expression-null contract).
  */
case class Bm25Score(child: Expression, model: Bm25Score.QueryModel)
  extends UnaryExpression {

  override def dataType: DataType = Bm25Score.Shape
  override def nullable: Boolean  = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bm25_score requires string, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    Bm25Score.score(input.asInstanceOf[UTF8String], model)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bm25Model", model,
      "graft.functions.Bm25Score$QueryModel")
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.Bm25Score.score($c, $ref);
       """.stripMargin
    })
  }

  // content equality over the query model (CSE must not conflate two
  // different queries/models — the NearestCell contract)
  override def equals(other: Any): Boolean = other match {
    case Bm25Score(c, m) => c == child && m.contentEquals(model)
    case _ => false
  }
  override def hashCode(): Int = 31 * child.hashCode() + model.contentHash

  override protected def withNewChildInternal(newChild: Expression): Bm25Score =
    copy(child = newChild)
}

object Bm25Score {

  val Shape: StructType = StructType(Seq(
    StructField("dl", LongType, nullable = false),
    StructField("score", DoubleType, nullable = false)))

  /** Flat serializable query model: term i's UTF-8 bytes in `terms(i)`,
    * trained idf in `idfs(i)`. Terms must be distinct (the pipeline face
    * dedups); OOV query terms are simply absent (the trained artifact has
    * no row to collect), matching the scoring joins' INNER-join contract.
    */
  final class QueryModel(val terms: Array[Array[Byte]], val idfs: Array[Double],
      val k1: Double, val b: Double, val avgdl: Double) extends Serializable {
    require(terms.length == idfs.length, "terms/idfs length mismatch")
    require(avgdl > 0.0, s"avgdl must be positive: $avgdl (empty corpus?)")

    def contentEquals(o: QueryModel): Boolean =
      k1 == o.k1 && b == o.b && avgdl == o.avgdl &&
        terms.length == o.terms.length &&
        terms.indices.forall(i => java.util.Arrays.equals(terms(i), o.terms(i))) &&
        java.util.Arrays.equals(idfs, o.idfs)

    def contentHash: Int =
      java.util.Arrays.hashCode(idfs) * 31 +
        terms.map(java.util.Arrays.hashCode).toSeq.hashCode()
  }

  @inline private def isSpace(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0b || b == '\f' || b == '\r'

  /** Static kernel invoked from generated code. */
  def score(text: UTF8String, m: QueryModel): InternalRow = {
    val bytes = text.getBytes
    val len   = bytes.length
    val nq    = m.terms.length
    val tfs   = new Array[Long](nq)
    var dl    = 0L
    var i     = 0
    while (i < len) {
      while (i < len && isSpace(bytes(i))) i += 1
      if (i < len) {
        val s = i
        while (i < len && !isSpace(bytes(i))) i += 1
        dl += 1
        // linear probe over the ≤|query| term slots (query is tiny)
        var q = 0
        var matched = false
        while (q < nq && !matched) {
          val t = m.terms(q)
          if (t.length == i - s) {
            var p = 0
            while (p < t.length && t(p) == bytes(s + p)) p += 1
            if (p == t.length) { tfs(q) += 1; matched = true }
          }
          q += 1
        }
      }
    }
    var score = 0.0
    if (dl > 0) {
      // one shared length normalizer per document; contribution order =
      // query-term index order (deterministic). Arithmetic shape mirrored
      // verbatim by the SQL oracle: k1*(1 - b + b*(dl/avgdl)), then
      // idf * (tf*(k1+1)) / (tf + norm).
      val norm = m.k1 * (1.0 - m.b + m.b * (dl.toDouble / m.avgdl))
      val k1p1 = m.k1 + 1.0
      var q = 0
      while (q < nq) {
        val tf = tfs(q)
        if (tf > 0)
          score += m.idfs(q) * (tf.toDouble * k1p1) / (tf.toDouble + norm)
        q += 1
      }
    }
    new GenericInternalRow(Array[Any](dl, score))
  }

  /** Column API. */
  def bm25Score(text: Column, model: QueryModel): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      Bm25Score(org.apache.spark.sql.graftbridge.Bridge.expression(text), model))
}
