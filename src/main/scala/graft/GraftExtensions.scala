package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{CosineSim, MinMd5Hex, RollingMinHash, VectorDot, WordListHits, WordShingles}

/** SparkSessionExtensions entry point: makes the engine's native expressions
  * available to pure-SQL users on any cluster via
  *
  * {{{ spark.sql.extensions=graft.GraftExtensions }}}
  *
  * (or `.withExtensions(new GraftExtensions)` on a builder). Scala users can
  * keep calling the Column APIs directly.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("min_md5_hex"),
      new ExpressionInfo(classOf[MinMd5Hex].getName, "min_md5_hex"),
      (exprs: Seq[Expression]) => MinMd5Hex(exprs.head)))
    ext.injectFunction((
      new FunctionIdentifier("word_shingles"),
      new ExpressionInfo(classOf[WordShingles].getName, "word_shingles"),
      (exprs: Seq[Expression]) => WordShingles(exprs.head,
        exprs(1).eval(null).asInstanceOf[Int])))
    ext.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSim].getName, "cosine_sim"),
      (exprs: Seq[Expression]) => CosineSim(exprs.head, exprs(1))))
    ext.injectFunction((
      new FunctionIdentifier("vector_dot"),
      new ExpressionInfo(classOf[VectorDot].getName, "vector_dot"),
      (exprs: Seq[Expression]) => VectorDot(exprs.head, exprs(1))))
    ext.injectFunction((
      new FunctionIdentifier("rolling_min_hash"),
      new ExpressionInfo(classOf[RollingMinHash].getName, "rolling_min_hash"),
      (exprs: Seq[Expression]) => RollingMinHash(exprs.head,
        exprs(1).eval(null).asInstanceOf[Int])))
    ext.injectFunction((
      new FunctionIdentifier("word_list_hits"),
      new ExpressionInfo(classOf[WordListHits].getName, "word_list_hits"),
      (exprs: Seq[Expression]) => WordListHits(exprs.head, {
        // the word list must be a foldable array literal
        val arr = exprs(1).eval(null)
          .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        arr.toObjectArray(org.apache.spark.sql.types.StringType)
          .map(_.toString).toSeq
      })))
  }
}
