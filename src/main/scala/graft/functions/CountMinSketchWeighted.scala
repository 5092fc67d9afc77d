package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

/** `count_min_sketch_weighted(item, weight)` — a count-min sketch aggregate
  * that inserts each item `weight` times in one call.
  *
  * Why it exists: CM sketches are LINEAR — `add(item, n)` lands on exactly
  * the same cells as `n` row-wise `add(item)` calls, and partial sketches
  * merge cell-wise — so a sketch built from an already-aggregated
  * `(item, count)` frame is bit-identical (same eps/confidence/seed) to one
  * built from the raw rows. That turns "sketch the corpus AND take its
  * exact top-k" from two full scans of the expensive raw frame into ONE
  * scan + two passes over the tiny vocabulary frame
  * ([[graft.pipeline.Sketches.heavyHitters]]).
  *
  * Items are inserted as raw UTF-8 bytes (`addBinary`), matching what
  * Spark's builtin `count_min_sketch` aggregate does for strings, so
  * estimates probed with `CountMinSketch.estimateCount(bytes)` agree with
  * the row-wise sketch. Null items, null weights, and non-positive weights
  * contribute nothing. Output is the sketch's serialized bytes.
  */
case class CountMinSketchWeighted(
    left: Expression,
    right: Expression,
    eps: Double,
    confidence: Double,
    seed: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CountMinSketch] with BinaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"count_min_sketch_weighted requires (string, bigint), got ($l, $r)")
    }

  override def createAggregationBuffer(): CountMinSketch =
    CountMinSketch.create(eps, confidence, seed)

  override def update(buffer: CountMinSketch, input: InternalRow): CountMinSketch = {
    val item = left.eval(input)
    val w    = right.eval(input)
    if (item != null && w != null) {
      val n = w.asInstanceOf[Long]
      if (n > 0L) buffer.addBinary(item.asInstanceOf[UTF8String].getBytes, n)
    }
    buffer
  }

  override def merge(buffer: CountMinSketch, other: CountMinSketch): CountMinSketch =
    buffer.mergeInPlace(other)

  override def eval(buffer: CountMinSketch): Any = serialize(buffer)

  override def serialize(buffer: CountMinSketch): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    buffer.writeTo(out)
    out.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): CountMinSketch =
    CountMinSketch.readFrom(new ByteArrayInputStream(bytes))

  override def dataType: DataType  = BinaryType
  override def nullable: Boolean   = false
  override def prettyName: String  = "count_min_sketch_weighted"

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinSketchWeighted =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinSketchWeighted =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CountMinSketchWeighted =
    copy(left = newLeft, right = newRight)
}

object CountMinSketchWeighted {

  /** Column API: aggregate `(item, weight)` rows into serialized CM bytes. */
  def cmSketchWeighted(item: Column, weight: Column,
      eps: Double, confidence: Double, seed: Int): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      CountMinSketchWeighted(
        org.apache.spark.sql.graftbridge.Bridge.expression(item),
        org.apache.spark.sql.graftbridge.Bridge.expression(weight),
        eps, confidence, seed).toAggregateExpression())
}
