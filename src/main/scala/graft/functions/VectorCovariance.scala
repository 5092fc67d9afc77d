package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** `vector_cov_sums(vec)` — one-pass co-moment sums over a fixed-dimension
  * vector column: `n`, per-dimension sums `S_i = Σ x_i`, and the upper
  * triangle of pairwise product sums `S_ij = Σ x_i·x_j` (i ≤ j), all in a
  * single flat `double[1 + d + d(d+1)/2]` buffer.
  *
  * Why it exists: the covariance matrix of an embedding corpus (the input
  * to PCA/whitening/drift monitoring) is the canonical "small answer from a
  * huge scan" statistic — at 100 TB the only viable plan is a map-side
  * partial aggregate whose state is the d(d+3)/2+1 doubles above, merged
  * elementwise. The declarative alternatives either explode n·d² rows
  * through a shuffle (posexplode self-join) or run d(d+1)/2 separate
  * `covar_pop` aggregates each re-reading the array column; this kernel is
  * ONE tight loop per row, one ~34 KB buffer per partition at d = 64.
  *
  * Output is `array<struct<i,j,n,si,sj,sij>>` of length d(d+1)/2 — one row
  * per (i ≤ j) pair after `posexplode`, carrying exactly the sums needed to
  * finish `cov_pop(i,j) = (S_ij − S_i·S_j/n)/n` (and correlations) in plain
  * column arithmetic. Raw sums, not finished covariances, so callers choose
  * population/sample normalization and rounding, and partial results stay
  * mergeable.
  *
  * Null vectors, short vectors, and vectors with a null element in the
  * first `dim` slots contribute nothing (the whole row is skipped, keeping
  * `n` consistent across all pairs — per-pair null handling would make the
  * matrix entries come from different row subsets). Float inputs are
  * widened exactly like Spark's float→double cast.
  */
case class VectorCovSums(
    child: Expression,
    dim: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]] with UnaryLike[Expression] {

  require(dim >= 1 && dim <= 4096, s"dim out of range: $dim")

  private val nTri = dim * (dim + 1) / 2
  private val bufLen = 1 + dim + nTri

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"vector_cov_sums requires array<float|double>, got $other")
  }

  private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def createAggregationBuffer(): Array[Double] = new Array[Double](bufLen)

  override def update(buffer: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      if (arr.numElements() >= dim) {
        var i = 0
        var ok = true
        while (ok && i < dim) { if (arr.isNullAt(i)) ok = false; i += 1 }
        if (ok) {
          // hoist the row into a local double[] once: the triangle loop
          // reads each element d/2 times on average
          val x = new Array[Double](dim)
          i = 0
          while (i < dim) {
            x(i) = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
            i += 1
          }
          buffer(0) += 1.0
          var k = 1 + dim
          i = 0
          while (i < dim) {
            val xi = x(i)
            buffer(1 + i) += xi
            var j = i
            while (j < dim) {
              buffer(k) += xi * x(j)
              j += 1
              k += 1
            }
            i += 1
          }
        }
      }
    }
    buffer
  }

  override def merge(buffer: Array[Double], other: Array[Double]): Array[Double] = {
    var i = 0
    while (i < bufLen) { buffer(i) += other(i); i += 1 }
    buffer
  }

  override def eval(buffer: Array[Double]): Any = {
    val n = buffer(0).toLong
    val out = new Array[Any](nTri)
    var k = 0
    var i = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        out(k) = InternalRow(i, j, n, buffer(1 + i), buffer(1 + j), buffer(1 + dim + k))
        j += 1
        k += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buffer: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(bufLen * 8)
    var i = 0
    while (i < bufLen) { bb.putDouble(buffer(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = ByteBuffer.wrap(bytes)
    val buffer = new Array[Double](bufLen)
    var i = 0
    while (i < bufLen) { buffer(i) = bb.getDouble(); i += 1 }
    buffer
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("i", IntegerType, nullable = false),
    StructField("j", IntegerType, nullable = false),
    StructField("n", LongType, nullable = false),
    StructField("si", DoubleType, nullable = false),
    StructField("sj", DoubleType, nullable = false),
    StructField("sij", DoubleType, nullable = false))), containsNull = false)

  override def nullable: Boolean  = false
  override def prettyName: String = "vector_cov_sums"

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorCovSums =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorCovSums =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): VectorCovSums =
    copy(child = newChild)
}

object VectorCovSums {

  /** Column API: co-moment sums of a `dim`-dimensional vector column as
    * `array<struct<i,j,n,si,sj,sij>>` over the (i ≤ j) triangle.
    */
  def vectorCovSums(vec: Column, dim: Int): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      VectorCovSums(
        org.apache.spark.sql.graftbridge.Bridge.expression(vec), dim)
        .toAggregateExpression())
}
