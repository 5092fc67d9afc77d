package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{CosineSim, MinMd5Hex, NfcNormalize, NormalizeForDedup, PairComponents, RollingMinHash, SearchSorted, ShingleHashes, VectorCovSums, VectorDot, WordListHits, WordShingles}

/** SparkSessionExtensions entry point: makes the engine's native expressions
  * available to pure-SQL users on any cluster via
  *
  * {{{ spark.sql.extensions=graft.GraftExtensions }}}
  *
  * (or `.withExtensions(new GraftExtensions)` on a builder). Scala users can
  * keep calling the Column APIs directly.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def arity(exprs: Seq[Expression], n: Int, fn: String): Unit =
    require(exprs.length == n, s"$fn takes $n argument(s), got ${exprs.length}")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("min_md5_hex"),
      new ExpressionInfo(classOf[MinMd5Hex].getName, "min_md5_hex"),
      (exprs: Seq[Expression]) => { arity(exprs, 1, "min_md5_hex"); MinMd5Hex(exprs.head) }))
    ext.injectFunction((
      new FunctionIdentifier("word_shingles"),
      new ExpressionInfo(classOf[WordShingles].getName, "word_shingles"),
      (exprs: Seq[Expression]) => { arity(exprs, 2, "word_shingles"); WordShingles(exprs.head,
        foldableArg(exprs, 1, "word_shingles", "an integer n") match {
          case n: java.lang.Number => n.intValue()
          case other => throw new IllegalArgumentException(
            s"word_shingles n must be an integer literal, got $other")
        }) }))
    ext.injectFunction((
      new FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "nfc_normalize"),
      (exprs: Seq[Expression]) => { arity(exprs, 1, "nfc_normalize"); NfcNormalize(exprs.head) }))
    ext.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSim].getName, "cosine_sim"),
      (exprs: Seq[Expression]) => { arity(exprs, 2, "cosine_sim"); CosineSim(exprs.head, exprs(1)) }))
    ext.injectFunction((
      new FunctionIdentifier("vector_dot"),
      new ExpressionInfo(classOf[VectorDot].getName, "vector_dot"),
      (exprs: Seq[Expression]) => { arity(exprs, 2, "vector_dot"); VectorDot(exprs.head, exprs(1)) }))
    ext.injectFunction((
      new FunctionIdentifier("rolling_min_hash"),
      new ExpressionInfo(classOf[RollingMinHash].getName, "rolling_min_hash"),
      (exprs: Seq[Expression]) => { arity(exprs, 2, "rolling_min_hash"); RollingMinHash(exprs.head,
        foldableArg(exprs, 1, "rolling_min_hash", "an integer window") match {
          case n: java.lang.Number => n.intValue()
          case other => throw new IllegalArgumentException(
            s"rolling_min_hash window must be an integer literal, got $other")
        }) }))
    ext.injectFunction((
      new FunctionIdentifier("word_list_hits"),
      new ExpressionInfo(classOf[WordListHits].getName, "word_list_hits"),
      (exprs: Seq[Expression]) => { arity(exprs, 2, "word_list_hits"); WordListHits(exprs.head,
        foldableArg(exprs, 1, "word_list_hits", "an array literal of words") match {
          case arr: org.apache.spark.sql.catalyst.util.ArrayData =>
            val ws = arr.toObjectArray(org.apache.spark.sql.types.StringType)
            require(!ws.contains(null), "word_list_hits word list must not contain nulls")
            ws.map(_.toString).toSeq
          case other => throw new IllegalArgumentException(
            s"word_list_hits requires an array literal of words, got $other")
        }) }))
    ext.injectFunction((
      new FunctionIdentifier("search_sorted"),
      new ExpressionInfo(classOf[SearchSorted].getName, "search_sorted"),
      (exprs: Seq[Expression]) => { arity(exprs, 2, "search_sorted"); SearchSorted(exprs.head,
        foldableArg(exprs, 1, "search_sorted", "an array literal of sorted numbers") match {
          case arr: org.apache.spark.sql.catalyst.util.ArrayData =>
            // extract with the literal's ACTUAL element type — toObjectArray
            // with DoubleType would ClassCastException on array(10, 20)
            val elemType = exprs(1).dataType match {
              case org.apache.spark.sql.types.ArrayType(et, _) => et
              case other => throw new IllegalArgumentException(
                s"search_sorted requires an array literal, got $other")
            }
            val ds = arr.toObjectArray(elemType)
            require(!ds.contains(null), "search_sorted splits must not contain nulls")
            ds.toIndexedSeq.map {
              case n: java.lang.Number => n.doubleValue()
              case other => throw new IllegalArgumentException(
                s"search_sorted splits must be numeric, got $other")
            }
          case other => throw new IllegalArgumentException(
            s"search_sorted requires an array literal of numbers, got $other")
        }) }))
    ext.injectFunction((
      new FunctionIdentifier("min_hash_sig"),
      new ExpressionInfo(classOf[graft.functions.MinHashSig].getName, "min_hash_sig"),
      (exprs: Seq[Expression]) => { arity(exprs, 3, "min_hash_sig")
        def intArg(i: Int, what: String): Int =
          foldableArg(exprs, i, "min_hash_sig", what) match {
            case n: java.lang.Number => n.intValue()
            case other => throw new IllegalArgumentException(
              s"min_hash_sig $what must be an integer literal, got $other")
          }
        graft.functions.MinHashSig(exprs.head,
          intArg(1, "shingle width n"), intArg(2, "signature length k")) }))
    ext.injectFunction((
      new FunctionIdentifier("shingle_hashes"),
      new ExpressionInfo(classOf[ShingleHashes].getName, "shingle_hashes"),
      (exprs: Seq[Expression]) => { arity(exprs, 2, "shingle_hashes"); ShingleHashes(exprs.head,
        foldableArg(exprs, 1, "shingle_hashes", "an integer n") match {
          case n: java.lang.Number => n.intValue()
          case other => throw new IllegalArgumentException(
            s"shingle_hashes n must be an integer literal, got $other")
        }) }))
    ext.injectFunction((
      new FunctionIdentifier("token_stats"),
      new ExpressionInfo(classOf[graft.functions.TokenStats].getName, "token_stats"),
      (exprs: Seq[Expression]) => { arity(exprs, 1, "token_stats")
        graft.functions.TokenStats(exprs.head) }))
    ext.injectFunction((
      new FunctionIdentifier("pii_counts"),
      new ExpressionInfo(classOf[graft.functions.PiiCounts].getName, "pii_counts"),
      (exprs: Seq[Expression]) => { arity(exprs, 1, "pii_counts")
        graft.functions.PiiCounts(exprs.head) }))
    ext.injectFunction((
      new FunctionIdentifier("pii_scrub"),
      new ExpressionInfo(classOf[graft.functions.PiiScrub].getName, "pii_scrub"),
      (exprs: Seq[Expression]) => { arity(exprs, 1, "pii_scrub")
        graft.functions.PiiScrub(exprs.head) }))
    injectR8(ext)
  }

  /** r8 additions: the dedup normalizer, the union-find components
    * aggregate, and the one-pass covariance aggregate — the kernels whose
    * arguments are plain columns/literals (the centroid-table kernels
    * NearestCell/ProbeCells carry driver-built reference objects and have
    * no SQL-literal construction, so they stay Column-API-only).
    */
  private def injectR8(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("normalize_for_dedup"),
      new ExpressionInfo(classOf[NormalizeForDedup].getName, "normalize_for_dedup"),
      (exprs: Seq[Expression]) => { arity(exprs, 1, "normalize_for_dedup")
        NormalizeForDedup(exprs.head) }))
    ext.injectFunction((
      new FunctionIdentifier("pair_components"),
      new ExpressionInfo(classOf[PairComponents].getName, "pair_components"),
      (exprs: Seq[Expression]) => { arity(exprs, 2, "pair_components")
        PairComponents(exprs.head, exprs(1)) }))
    ext.injectFunction((
      new FunctionIdentifier("vector_cov_sums"),
      new ExpressionInfo(classOf[VectorCovSums].getName, "vector_cov_sums"),
      (exprs: Seq[Expression]) => { arity(exprs, 2, "vector_cov_sums")
        VectorCovSums(exprs.head,
          foldableArg(exprs, 1, "vector_cov_sums", "an integer dim") match {
            case n: java.lang.Number => n.intValue()
            case other => throw new IllegalArgumentException(
              s"vector_cov_sums dim must be an integer literal, got $other")
          }) }))
  }

  /** Evaluate a constructor argument that must be a foldable literal, with a
    * clear error instead of an NPE for column arguments.
    */
  private def foldableArg(exprs: Seq[Expression], i: Int, fn: String,
      what: String): Any = {
    require(exprs.length > i && exprs(i).foldable,
      s"$fn requires $what as argument ${i + 1}")
    val v = exprs(i).eval(null)
    require(v != null, s"$fn argument ${i + 1} must not be null")
    v
  }
}
