package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** `walk_agg(src, dst)` — ALL deterministic hash-seeded walks from the
  * model's seed set over the edge rows in the group, as ONE mergeable
  * aggregate: the result is `array<struct<walk_id, step, node>>` ordered
  * by (walk_id, step).
  *
  * The [[PageRankAgg]] gate applied to [[graft.ops.Graph.randomWalks]]:
  * below the caller's edge budget, every walk's whole trajectory runs
  * inside one aggregation instead of `steps` driver-synchronized join
  * rounds. Semantics match the relational path exactly: next hop from
  * node u at step t is the out-neighbor d minimizing the first 8 hex
  * chars of md5("u:t:d") as an integer, ties by d; duplicate edges are
  * argmin-invariant; a dead-end walk halts; EVERY seed emits its step-0
  * row (an off-graph seed is a 1-row walk). The hash work is
  * frontier-proportional — |seeds| · steps · out-degree digests, never
  * |edges| · steps.
  */
case class WalkAgg(
    left: Expression,
    right: Expression,
    model: WalkAgg.Model,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[PageRankAgg.EdgeBuf]
  with BinaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"walk_agg requires (bigint, bigint), got $other")
    }

  override def createAggregationBuffer(): PageRankAgg.EdgeBuf =
    new PageRankAgg.EdgeBuf()

  override def update(buffer: PageRankAgg.EdgeBuf, input: InternalRow): PageRankAgg.EdgeBuf = {
    val a = left.eval(input)
    val b = right.eval(input)
    if (a != null && b != null)
      buffer.add(a.asInstanceOf[Long], b.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: PageRankAgg.EdgeBuf, other: PageRankAgg.EdgeBuf): PageRankAgg.EdgeBuf = {
    buffer.addAll(other)
    buffer
  }

  override def eval(buffer: PageRankAgg.EdgeBuf): Any =
    WalkAgg.run(buffer, model)

  override def serialize(buffer: PageRankAgg.EdgeBuf): Array[Byte] =
    buffer.serializeEdges()

  override def deserialize(bytes: Array[Byte]): PageRankAgg.EdgeBuf = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new PageRankAgg.EdgeBuf()
    while (bb.remaining() >= 16) buf.add(bb.getLong(), bb.getLong())
    buf
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("walk_id", LongType, nullable = false),
    StructField("step", IntegerType, nullable = false),
    StructField("node", LongType, nullable = false))), containsNull = false)

  override def nullable: Boolean  = false
  override def prettyName: String = "walk_agg"

  override def equals(other: Any): Boolean = other match {
    case WalkAgg(l, r, m, mo, io) =>
      l == left && r == right && m.contentEquals(model) &&
        mo == mutableAggBufferOffset && io == inputAggBufferOffset
    case _ => false
  }
  override def hashCode(): Int =
    ((31 * left.hashCode() + right.hashCode()) * 31) + model.contentHash

  override def withNewMutableAggBufferOffset(newOffset: Int): WalkAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): WalkAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WalkAgg =
    copy(left = newLeft, right = newRight)
}

object WalkAgg {

  final class Model(val seeds: Array[Long], val steps: Int)
    extends Serializable {
    def contentEquals(o: Model): Boolean =
      steps == o.steps && java.util.Arrays.equals(seeds, o.seeds)
    def contentHash: Int =
      31 * steps + java.util.Arrays.hashCode(seeds)
  }

  /** First 8 hex chars of md5("u:t:d") as an unsigned 32-bit value in a
    * long — [[graft.pipeline.Sampling.hashScore]]'s integer, the same
    * rule the relational path and the DuckDB oracle evaluate.
    */
  private def stepHash(md: java.security.MessageDigest,
      u: Long, t: Int, d: Long): Long = {
    md.reset()
    val digest = md.digest(s"$u:$t:$d".getBytes(StandardCharsets.US_ASCII))
    ((digest(0) & 0xffL) << 24) | ((digest(1) & 0xffL) << 16) |
      ((digest(2) & 0xffL) << 8) | (digest(3) & 0xffL)
  }

  private[graft] def run(buffer: PageRankAgg.EdgeBuf,
      model: Model): GenericArrayData = {
    // id -> dense index over sources only (walks only ever LEAVE through
    // an out-edge; destinations stay raw longs)
    val idx = scala.collection.mutable.LongMap.empty[Int]
    var nIds = 0
    def indexOf(id: Long): Int = idx.getOrElseUpdate(id, {
      nIds += 1; nIds - 1
    })
    val eSrc = new Array[Int](buffer.n)
    val eDst = new Array[Long](buffer.n)
    var m = 0
    var i = 0
    while (i < buffer.n) {
      val s = buffer.srcs(i); val d = buffer.dsts(i)
      if (s != d) { eSrc(m) = indexOf(s); eDst(m) = d; m += 1 }
      i += 1
    }
    val n = nIds
    // CSR over out-edges; duplicates kept (argmin-invariant)
    val offs = new Array[Int](n + 1)
    i = 0
    while (i < m) { offs(eSrc(i) + 1) += 1; i += 1 }
    i = 0
    while (i < n) { offs(i + 1) += offs(i); i += 1 }
    val adj = new Array[Long](m)
    val cur = offs.clone()
    i = 0
    while (i < m) { adj(cur(eSrc(i))) = eDst(i); cur(eSrc(i)) += 1; i += 1 }
    val md  = java.security.MessageDigest.getInstance("MD5")
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    model.seeds.foreach { seed =>
      out += InternalRow(seed, 0, seed)
      var node = seed
      var t    = 1
      var live = true
      while (live && t <= model.steps) {
        idx.get(node) match {
          case Some(si) if offs(si + 1) > offs(si) =>
            var best  = 0L
            var bestH = Long.MaxValue
            var p     = offs(si)
            val end   = offs(si + 1)
            while (p < end) {
              val d = adj(p)
              val h = stepHash(md, node, t - 1, d)
              if (h < bestH || (h == bestH && d < best)) { bestH = h; best = d }
              p += 1
            }
            out += InternalRow(seed, t, best)
            node = best
            t += 1
          case _ => live = false
        }
      }
    }
    new GenericArrayData(out.toArray)
  }

  /** Column API: every walk from `seeds` over the (src, dst) edge rows in
    * the group, as `array<struct<walk_id, step, node>>`.
    */
  def walkAgg(src: Column, dst: Column, seeds: Array[Long],
      steps: Int): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      WalkAgg(
        org.apache.spark.sql.graftbridge.Bridge.expression(src),
        org.apache.spark.sql.graftbridge.Bridge.expression(dst),
        new Model(seeds, steps))
        .toAggregateExpression())
}
