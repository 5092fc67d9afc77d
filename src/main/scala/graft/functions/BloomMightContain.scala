package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** `bloom_might_contain(item)` — membership probe of a serialized
  * `org.apache.spark.util.sketch.BloomFilter` artifact baked into the plan.
  *
  * Exists for the blocklist / decontamination shape at corpus scale: a
  * membership set built ONCE (eval-set fingerprints, banned documents,
  * already-ingested ids) is carried to every corpus row as a fixed-size
  * bit array instead of a shuffle join. A 1M-entry blocklist at 1% FPP is
  * ~1.2 MB — executor-constant-pool size — and the probe is two hash
  * functions per row inside whole-stage codegen, so the corpus scan stays
  * a narrow map with NO exchange regardless of corpus size. False
  * positives are possible (bounded by the build-time `fpp`); false
  * negatives are not — the safe direction for blocklisting (over-drop
  * at fpp, never under-drop).
  *
  * The filter deserializes once per executor (broadcast via the plan's
  * reference objects), not per row; `eval` and `doGenCode` share the same
  * probe kernel. String items probe the filter's UTF-8 binary encoding —
  * identical to how `DataFrameStatFunctions.bloomFilter` inserted them.
  */
case class BloomMightContain(child: Expression, bloomBytes: Array[Byte])
    extends UnaryExpression {

  require(bloomBytes.nonEmpty, "bloom_might_contain: empty filter bytes")

  // case-class equality on Array is reference identity, which would defeat
  // Catalyst canonicalization for equal filters; compare/hash contents once
  override def equals(other: Any): Boolean = other match {
    case b: BloomMightContain =>
      child == b.child && java.util.Arrays.equals(bloomBytes, b.bloomBytes)
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() + java.util.Arrays.hashCode(bloomBytes)

  @transient private lazy val filter: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bloomBytes))

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain requires string or bigint, got ${other.simpleString}")
  }

  override def nullSafeEval(v: Any): Any = child.dataType match {
    case StringType =>
      // putString == putBinary(utf8 bytes); probe the same encoding
      filter.mightContainBinary(v.asInstanceOf[UTF8String].getBytes)
    case LongType => filter.mightContainLong(v.asInstanceOf[Long])
    case other => throw new IllegalStateException(s"unreachable: $other")
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // one deserialized filter per generated class, shared by all rows
    val bf = ctx.addReferenceObj("bloomFilter", filter,
      classOf[BloomFilter].getName)
    child.dataType match {
      case StringType =>
        nullSafeCodeGen(ctx, ev, c =>
          s"${ev.value} = $bf.mightContainBinary(($c).getBytes());")
      case _ =>
        nullSafeCodeGen(ctx, ev, c =>
          s"${ev.value} = $bf.mightContainLong($c);")
    }
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}

object BloomMightContain {
  def mightContain(item: Column, bloomBytes: Array[Byte]): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      BloomMightContain(
        org.apache.spark.sql.graftbridge.Bridge.expression(item), bloomBytes))
}
